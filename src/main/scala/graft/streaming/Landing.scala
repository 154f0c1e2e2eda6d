package graft.streaming

import java.net.URI
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame

/** Fixture-side landing writer for the streaming gates: bounded gate
  * slices land as single-file NDJSON micro-batch inputs, one file per
  * element (`None` = an empty flush file), mtime-pinned in sequence
  * order for deterministic replay.
  *
  * Each file is produced by ONE job (`Dataset.toJSON` → collect — the
  * same Jackson writer path the JSON file sink uses, so the bytes
  * match the previous spelling line for line) and written by the
  * driver directly. The previous per-file
  * `coalesce(1).write.json(tmp)` + glob + rename paid a full
  * file-sink commit protocol (temp dir, task commit, job commit,
  * listing, rename) per micro-batch file — pure fixture overhead the
  * bench's setup clock was charging every run. Gate slices are
  * bounded by design (the q104 convention), so the driver-side write
  * is a few KB, never a data path.
  */
object Landing {
  def jsonFiles(landing: String, files: Seq[Option[DataFrame]],
                hadoopConf: org.apache.hadoop.conf.Configuration): Unit = {
    val fs = FileSystem.get(new URI("file:///"), hadoopConf)
    fs.mkdirs(new Path(landing))
    files.zipWithIndex.foreach { case (dfOpt, i) =>
      val dst = new Path(landing, f"$i%02d.json")
      val out = fs.create(dst, true)
      try dfOpt.foreach { df =>
        df.toJSON.collect().foreach { line =>
          out.write(line.getBytes(StandardCharsets.UTF_8))
          out.write('\n')
        }
      } finally out.close()
      fs.setTimes(dst, 1000000000000L + i * 60000L, -1) // pin replay order
    }
  }
}
