package graft

import org.apache.spark.sql.functions._
import graft.sources.Snapshots

/** x50's erasure contract: after purgeKeys no version — pinned,
  * resolved, or the deletes-version's own key set — can produce the
  * purged keys; everything else is byte-for-byte intact semantics. */
class PurgeSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("purge").toString + "/t"

  test("purge erases the key from every version including the DV's key set") {
    val dir = freshDir()
    Snapshots.commit(Seq((1L, "a"), (97L, "b"), (3L, "c")).toDF("k", "v"), dir)
    Snapshots.commitDeletes(Seq(Tuple1(1L), Tuple1(97L)).toDF("k"), dir, base = 1)
    Snapshots.commit(Seq((97L, "b2"), (4L, "d")).toDF("k", "v"), dir)
    val purged = Snapshots.purgeKeys(spark, dir, Seq(Tuple1(97L)).toDF("k"))
    assert(purged == Seq(1, 2, 3), "all three versions contain the key column")
    // v1 pinned: 97 gone, others intact
    assert(Snapshots.read(spark, dir, Some(1)).collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 3L))
    // the DV's raw key set no longer NAMES the purged user
    assert(Snapshots.read(spark, dir, Some(2)).collect().map(_.getLong(0))
      .toSeq == Seq(1L))
    // resolved v2: base minus DV = {3}
    assert(Snapshots.readResolved(spark, dir, Some(2)).collect()
      .map(_.getLong(0)).toSeq == Seq(3L))
    assert(Snapshots.read(spark, dir, Some(3)).collect().map(_.getLong(0))
      .toSeq == Seq(4L))
  }

  test("purge reaches append versions AND staged DV key sets (the x58 chain)") {
    val dir = freshDir()
    // the merge-on-read shape: data v1, STAGED mask DV v2, append v3
    Snapshots.commit(Seq((1L, "a"), (97L, "b")).toDF("k", "v"), dir)
    val dv = Snapshots.commitDeletes(Seq(Tuple1(97L)).toDF("k"), dir,
      base = 1, staged = true)
    Snapshots.commitAppend(Seq((97L, "b2"), (4L, "d")).toDF("k", "v"),
      dir, base = dv)
    val purged = Snapshots.purgeKeys(spark, dir, Seq(Tuple1(97L)).toDF("k"))
    assert(purged == Seq(1, 2, 3),
      "the staged DV and the append hold the key column too")
    // the appended rows no longer carry the purged user …
    assert(Snapshots.read(spark, dir, Some(3)).collect().map(_.getLong(0))
      .toSeq == Seq(4L))
    // … the STAGED DV no longer names them (erasure covers staged
    // ghosts — they are invisible, not gone) …
    assert(Snapshots.read(spark, dir, Some(2)).count() == 0)
    // … and the resolved merge state is the survivors only
    assert(Snapshots.readResolved(spark, dir).collect().map(_.getLong(0))
      .sorted.toSeq == Seq(1L, 4L))
  }

  test("partitioned versions are rewritten in their own layout") {
    val dir = freshDir()
    Snapshots.commit(Seq((1L, "x"), (2L, "x"), (97L, "y")).toDF("k", "pv"),
      dir, partitionBy = Seq("pv"))
    Snapshots.purgeKeys(spark, dir, Seq(Tuple1(97L)).toDF("k"))
    val dirs = Snapshots.filesPerDir(spark, dir, 1).keys
    assert(dirs.nonEmpty && dirs.forall(_.contains("pv=")),
      s"rewrite must keep the hive layout, got $dirs")
    assert(Snapshots.read(spark, dir, Some(1)).collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 2L))
  }

  test("versions without the key column and clones are skipped untouched") {
    val (dir, cloneDir) = (freshDir(), freshDir())
    Snapshots.commit(Seq((97L, "gone")).toDF("k", "v"), dir)
    Snapshots.commit(Seq(("statsrow", 5L)).toDF("name", "n"), dir) // no k column
    Snapshots.commitClone(spark, cloneDir, dir, 1)
    val sigBefore = Snapshots.fileSignature(spark, dir, 2)
    assert(Snapshots.purgeKeys(spark, dir, Seq(Tuple1(97L)).toDF("k")) == Seq(1))
    assert(Snapshots.fileSignature(spark, dir, 2) == sigBefore,
      "a version that cannot contain the key must not be rewritten")
    assert(Snapshots.read(spark, dir, Some(1)).count() == 0)
    // the clone's own table was untouched by the source purge run
    assert(Snapshots.purgeKeys(spark, cloneDir,
      Seq(Tuple1(97L)).toDF("k")).isEmpty, "clone versions carry no files")
    // and it now serves the purged source state (documented contract)
    assert(Snapshots.readResolved(spark, cloneDir, Some(1)).count() == 0)
  }
}
