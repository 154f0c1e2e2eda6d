package graft.plans

/** The unpartitioned mutation/OPTIMIZE swap must never leave a state
  * where the table location is missing with no well-known recovery
  * name: old data moves to `__graft_backup` BEFORE the new data is
  * renamed in, and a stale backup from a crashed swap is recovered
  * (dst missing) or cleared (dst present) on the next attempt. */
class SwapInPlaceSpec extends graft.SparkSpec {

  private def dir(tag: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(s"graft_swap_$tag")

  private def mk(root: java.nio.file.Path, name: String, marker: String): String = {
    val d = root.resolve(name)
    java.nio.file.Files.createDirectories(d)
    java.nio.file.Files.writeString(d.resolve("part-0.parquet"), marker)
    d.toString
  }

  private def markerOf(path: String): String =
    java.nio.file.Files.readString(java.nio.file.Paths.get(path, "part-0.parquet"))

  test("swap replaces dst, leaves no backup behind") {
    val root = dir("ok")
    val dst = mk(root, "t", "old")
    val tmp = mk(root, "t__graft_mutating", "new")
    ChCommands.swapInPlace(spark, tmp, dst)
    assert(markerOf(dst) == "new")
    assert(!java.nio.file.Files.exists(root.resolve("t__graft_backup")))
    assert(!java.nio.file.Files.exists(root.resolve("t__graft_mutating")))
  }

  test("stale backup with dst MISSING (crash between renames) is recovered as the live data") {
    val root = dir("recover")
    mk(root, "t__graft_backup", "survivor")
    val tmp = mk(root, "t__graft_mutating", "new")
    val dst = root.resolve("t").toString
    // the recovery promotes the backup to dst, then the swap proceeds
    ChCommands.swapInPlace(spark, tmp, dst)
    assert(markerOf(dst) == "new")
    assert(!java.nio.file.Files.exists(root.resolve("t__graft_backup")))
  }

  test("stale backup with dst PRESENT is cleared, not resurrected") {
    val root = dir("stale")
    mk(root, "t__graft_backup", "ancient")
    val dst = mk(root, "t", "current")
    val tmp = mk(root, "t__graft_mutating", "new")
    ChCommands.swapInPlace(spark, tmp, dst)
    assert(markerOf(dst) == "new")
    assert(!java.nio.file.Files.exists(root.resolve("t__graft_backup")))
  }
}
