package graft.sources

import java.nio.channels.Channels

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter, ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit}
import org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Arrow IPC export/import (round 19) — `FORMAT Arrow` (the random-
  * access FILE format) and `FORMAT ArrowStream` (the streaming
  * format), the one client-format family the Formats map still
  * lacked: reference users export query results to TypeScript/Python
  * apps, and Arrow is what modern clients ask for.
  *
  * Spark-first shape: the WRITE runs distributed — each partition
  * lands its own `part-NNNNN` IPC file via the Hadoop FileSystem (the
  * same layout every Spark writer produces, so INTO OUTFILE's
  * coalesce(1)+rename contract holds unchanged); rows stream straight
  * out of `queryExecution.toRdd` (InternalRow, no external-type
  * detour) into Arrow vectors in 4096-row record batches. The READ
  * lists the part files and decodes them in parallel, one executor
  * task per file.
  *
  * Type surface: the ClickHouse-exportable scalars — integers, floats,
  * boolean, string, binary, date, timestamp (µs, UTC), decimal-128.
  * Nested arrays/maps/structs refuse loudly at plan time (CH's own
  * Arrow export restricts similarly); nothing is silently stringified.
  *
  * Deliberate non-goal: the file reader buffers ONE part file in
  * memory (Arrow's random-access format needs a seekable channel).
  * This is the console/script export surface — part files are
  * batch-sized by construction; the bulk landing path stays Parquet.
  */
object ArrowIpc {

  private val BatchRows = 4096

  // ------------------------------------------------------ schema map

  private[sources] def toArrowField(f: StructField): Field = {
    val t: ArrowType = f.dataType match {
      case BooleanType   => ArrowType.Bool.INSTANCE
      case ByteType      => new ArrowType.Int(8, true)
      case ShortType     => new ArrowType.Int(16, true)
      case IntegerType   => new ArrowType.Int(32, true)
      case LongType      => new ArrowType.Int(64, true)
      case FloatType     => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case DoubleType    => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case StringType    => ArrowType.Utf8.INSTANCE
      case BinaryType    => ArrowType.Binary.INSTANCE
      case DateType      => new ArrowType.Date(DateUnit.DAY)
      case TimestampType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")
      case TimestampNTZType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, null)
      case d: DecimalType => new ArrowType.Decimal(d.precision, d.scale, 128)
      case other => throw new UnsupportedOperationException(
        s"FORMAT Arrow/ArrowStream: column '${f.name}' has type ${other.sql} — supported are " +
          "the scalar types (integers, floats, boolean, string, binary, date, timestamp, " +
          "decimal); export nested data as Parquet or flatten first")
    }
    new Field(f.name, new FieldType(f.nullable, t, null), java.util.Collections.emptyList())
  }

  private def fromArrowField(f: Field): StructField = {
    val dt: DataType = f.getType match {
      case _: ArrowType.Bool => BooleanType
      case i: ArrowType.Int if i.getIsSigned => i.getBitWidth match {
        case 8 => ByteType; case 16 => ShortType; case 32 => IntegerType; case 64 => LongType
        case w => throw new UnsupportedOperationException(s"Arrow int width $w")
      }
      case fp: ArrowType.FloatingPoint => fp.getPrecision match {
        case FloatingPointPrecision.SINGLE => FloatType
        case FloatingPointPrecision.DOUBLE => DoubleType
        case p => throw new UnsupportedOperationException(s"Arrow float precision $p")
      }
      case _: ArrowType.Utf8 => StringType
      case _: ArrowType.Binary => BinaryType
      case d: ArrowType.Date if d.getUnit == DateUnit.DAY => DateType
      case t: ArrowType.Timestamp if t.getUnit == TimeUnit.MICROSECOND =>
        if (t.getTimezone == null) TimestampNTZType else TimestampType
      case d: ArrowType.Decimal => DecimalType(d.getPrecision, d.getScale)
      case other => throw new UnsupportedOperationException(
        s"Arrow read: unsupported field type $other for column '${f.getName}'")
    }
    StructField(f.getName, dt, f.isNullable)
  }

  // ------------------------------------------------------ write path

  /** Per-column setter from an InternalRow into an Arrow vector slot. */
  private def setter(vec: FieldVector, dt: DataType, ord: Int): (InternalRow, Int) => Unit =
    (dt, vec) match {
      case (BooleanType, v: BitVector)      => (r, i) =>
        if (r.isNullAt(ord)) v.setNull(i) else v.setSafe(i, if (r.getBoolean(ord)) 1 else 0)
      case (ByteType, v: TinyIntVector)     => (r, i) =>
        if (r.isNullAt(ord)) v.setNull(i) else v.setSafe(i, r.getByte(ord))
      case (ShortType, v: SmallIntVector)   => (r, i) =>
        if (r.isNullAt(ord)) v.setNull(i) else v.setSafe(i, r.getShort(ord))
      case (IntegerType, v: IntVector)      => (r, i) =>
        if (r.isNullAt(ord)) v.setNull(i) else v.setSafe(i, r.getInt(ord))
      case (DateType, v: DateDayVector)     => (r, i) =>
        if (r.isNullAt(ord)) v.setNull(i) else v.setSafe(i, r.getInt(ord))
      case (LongType, v: BigIntVector)      => (r, i) =>
        if (r.isNullAt(ord)) v.setNull(i) else v.setSafe(i, r.getLong(ord))
      case (TimestampType, v: TimeStampMicroTZVector) => (r, i) =>
        if (r.isNullAt(ord)) v.setNull(i) else v.setSafe(i, r.getLong(ord))
      case (TimestampNTZType, v: TimeStampMicroVector) => (r, i) =>
        if (r.isNullAt(ord)) v.setNull(i) else v.setSafe(i, r.getLong(ord))
      case (FloatType, v: Float4Vector)     => (r, i) =>
        if (r.isNullAt(ord)) v.setNull(i) else v.setSafe(i, r.getFloat(ord))
      case (DoubleType, v: Float8Vector)    => (r, i) =>
        if (r.isNullAt(ord)) v.setNull(i) else v.setSafe(i, r.getDouble(ord))
      case (StringType, v: VarCharVector)   => (r, i) =>
        if (r.isNullAt(ord)) v.setNull(i) else v.setSafe(i, r.getUTF8String(ord).getBytes)
      case (BinaryType, v: VarBinaryVector) => (r, i) =>
        if (r.isNullAt(ord)) v.setNull(i) else v.setSafe(i, r.getBinary(ord))
      case (d: DecimalType, v: DecimalVector) => (r, i) =>
        if (r.isNullAt(ord)) v.setNull(i)
        else v.setSafe(i, r.getDecimal(ord, d.precision, d.scale).toJavaBigDecimal)
      case (t, v) => throw new IllegalStateException(
        s"ArrowIpc: no setter for $t over ${v.getClass.getSimpleName}")
    }

  /** Write `df` as a directory of `part-NNNNN` Arrow IPC files — one
    * per partition, empty partitions skipped (partition 0 always
    * writes, so an empty result still lands a schema-carrying file).
    * `stream = true` → IPC streaming format; false → the random-access
    * file format. */
  def writeDir(df: DataFrame, path: String, stream: Boolean): Unit = {
    val schema = df.schema
    // validate the whole schema DRIVER-side: an unsupported column
    // must refuse before any task launches
    schema.fields.foreach(toArrowField)
    val spark = df.sparkSession
    val out = new HPath(path)
    val fs = out.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(out, true)
    fs.mkdirs(out)
    val fileExt = if (stream) "arrows" else "arrow"
    val pathStr = out.toString
    df.queryExecution.toRdd.mapPartitionsWithIndex[Int] { (idx, iter) =>
      if (iter.isEmpty && idx != 0) Iterator.empty
      else {
        val partPath = new HPath(f"$pathStr/part-$idx%05d.$fileExt")
        // executor-side FS from the default config — same resolution
        // every Hadoop output committer uses on the executor classpath
        val pfs = partPath.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val allocator = new RootAllocator(Long.MaxValue)
        val arrowSchema = new ArrowSchema(schema.fields.map(toArrowField).toList.asJava)
        val root = VectorSchemaRoot.create(arrowSchema, allocator)
        val os = pfs.create(partPath, true)
        val channel = Channels.newChannel(os)
        val writer = if (stream) new ArrowStreamWriter(root, null, channel)
                     else new ArrowFileWriter(root, null, channel)
        try {
          writer.start()
          val vecs = root.getFieldVectors.asScala.toArray
          val sets = schema.fields.zipWithIndex.map { case (f, i) => setter(vecs(i), f.dataType, i) }
          var n = 0
          while (iter.hasNext) {
            val row = iter.next()
            var c = 0
            while (c < sets.length) { sets(c)(row, n); c += 1 }
            n += 1
            if (n == BatchRows) {
              root.setRowCount(n)
              writer.writeBatch()
              vecs.foreach(_.reset())
              n = 0
            }
          }
          if (n > 0 || idx == 0) {
            root.setRowCount(n)
            writer.writeBatch()
          }
          writer.end()
        } finally {
          writer.close()
          channel.close()
          root.close()
          allocator.close()
        }
        Iterator.single(1)
      }
    }.count() // materialize the write
    // a fully-empty input can plan as a ZERO-partition RDD — no task
    // ever runs, so land the schema-carrying file driver-side (an
    // export that reads back schema-less is a broken round trip)
    if (partFiles(fs, out).isEmpty) {
      val allocator = new RootAllocator(Long.MaxValue)
      val arrowSchema = new ArrowSchema(schema.fields.map(toArrowField).toList.asJava)
      val root = VectorSchemaRoot.create(arrowSchema, allocator)
      val os = fs.create(new HPath(s"$pathStr/part-00000.$fileExt"), true)
      val channel = Channels.newChannel(os)
      val writer = if (stream) new ArrowStreamWriter(root, null, channel)
                   else new ArrowFileWriter(root, null, channel)
      try {
        writer.start()
        root.setRowCount(0)
        writer.writeBatch()
        writer.end()
      } finally { writer.close(); channel.close(); root.close(); allocator.close() }
    }
  }

  // ------------------------------------------------------- read path

  private def getter(vec: FieldVector, dt: DataType): Int => Any = (dt, vec) match {
    case (BooleanType, v: BitVector)      => i => if (v.isNull(i)) null else v.get(i) == 1
    case (ByteType, v: TinyIntVector)     => i => if (v.isNull(i)) null else v.get(i)
    case (ShortType, v: SmallIntVector)   => i => if (v.isNull(i)) null else v.get(i)
    case (IntegerType, v: IntVector)      => i => if (v.isNull(i)) null else v.get(i)
    case (DateType, v: DateDayVector)     => i =>
      if (v.isNull(i)) null else java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.get(i).toLong))
    case (LongType, v: BigIntVector)      => i => if (v.isNull(i)) null else v.get(i)
    case (TimestampType, v: TimeStampMicroTZVector) => i =>
      if (v.isNull(i)) null else {
        val us = v.get(i)
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))
      }
    case (TimestampNTZType, v: TimeStampMicroVector) => i =>
      if (v.isNull(i)) null else {
        val us = v.get(i)
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      }
    case (FloatType, v: Float4Vector)     => i => if (v.isNull(i)) null else v.get(i)
    case (DoubleType, v: Float8Vector)    => i => if (v.isNull(i)) null else v.get(i)
    case (StringType, v: VarCharVector)   => i =>
      if (v.isNull(i)) null else new String(v.get(i), java.nio.charset.StandardCharsets.UTF_8)
    case (BinaryType, v: VarBinaryVector) => i => if (v.isNull(i)) null else v.get(i)
    case (_: DecimalType, v: DecimalVector) => i => if (v.isNull(i)) null else v.getObject(i)
    case (t, v) => throw new IllegalStateException(
      s"ArrowIpc: no getter for $t over ${v.getClass.getSimpleName}")
  }

  private def partFiles(fs: FileSystem, dir: HPath): Seq[HPath] =
    fs.listStatus(dir).map(_.getPath)
      .filter(p => !p.getName.startsWith(".") && !p.getName.startsWith("_"))
      .sortBy(_.getName).toSeq

  private def decodeFile(bytes: Array[Byte], stream: Boolean,
                         schema: StructType): Iterator[Row] = {
    val allocator = new RootAllocator(Long.MaxValue)
    val reader =
      if (stream) new ArrowStreamReader(new java.io.ByteArrayInputStream(bytes), allocator)
      else new ArrowFileReader(new ByteArrayReadableSeekableByteChannel(bytes), allocator)
    val rows = Vector.newBuilder[Row]
    try {
      val root = reader.getVectorSchemaRoot
      while (reader.loadNextBatch()) {
        val vecs = root.getFieldVectors.asScala.toArray
        val gets = schema.fields.zipWithIndex.map { case (f, i) => getter(vecs(i), f.dataType) }
        var i = 0
        val n = root.getRowCount
        while (i < n) {
          rows += Row.fromSeq(gets.toIndexedSeq.map(g => g(i)))
          i += 1
        }
      }
    } finally {
      reader.close()
      allocator.close()
    }
    rows.result().iterator
  }

  /** Read a directory of Arrow IPC part files (or a single file) back
    * into a DataFrame: schema from the first file's IPC header, then
    * one executor task per file. */
  def readDir(spark: SparkSession, path: String, stream: Boolean): DataFrame = {
    val in = new HPath(path)
    val fs = in.getFileSystem(spark.sessionState.newHadoopConf())
    val files =
      if (fs.getFileStatus(in).isDirectory) partFiles(fs, in)
      else Seq(in)
    if (files.isEmpty) throw new IllegalArgumentException(
      s"FORMAT Arrow read: no part files under $path")
    // schema off the first file, driver-side
    val head = readBytes(fs, files.head)
    val arrowSchema = {
      val allocator = new RootAllocator(Long.MaxValue)
      val r = if (stream) new ArrowStreamReader(new java.io.ByteArrayInputStream(head), allocator)
              else new ArrowFileReader(new ByteArrayReadableSeekableByteChannel(head), allocator)
      try r.getVectorSchemaRoot.getSchema finally { r.close(); allocator.close() }
    }
    val schema = StructType(arrowSchema.getFields.asScala.map(fromArrowField).toArray)
    val fileStrs = files.map(_.toString)
    val rdd = spark.sparkContext.parallelize(fileStrs, math.max(1, fileStrs.length))
      .flatMap { f =>
        val p = new HPath(f)
        val pfs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
        decodeFile(readBytes(pfs, p), stream, schema)
      }
    spark.createDataFrame(rdd, schema)
  }

  private def readBytes(fs: FileSystem, p: HPath): Array[Byte] = {
    val len = fs.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val is = fs.open(p)
    try is.readFully(0, buf) finally is.close()
    buf
  }
}
