package graft

import org.apache.spark.sql.functions._
import graft.sources.Snapshots

/** x49's log-checkpoint contract: the checkpoint is a faithful,
  * prunable rollup of the entry files — never an alternative truth.
  * Fresher entry files overlay it, prune only removes verbatim
  * copies, and vacuum rewrites it so dropped versions cannot
  * resurrect. */
class LogCheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("ckpt").toString + "/t"

  private def entryFiles(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).toSeq.flatten.map(_.getName)
      .filter(_.matches("_entry_v\\d+\\.json"))
  }

  test("checkpoint + prune: the log serves identically from one rollup file") {
    val dir = freshDir()
    (1 to 3).foreach(i =>
      Snapshots.commit(Seq((i.toLong, s"v$i")).toDF("k", "v"), dir))
    val before = Snapshots.versions(spark, dir)
    assert(Snapshots.checkpointLog(spark, dir) == 3)
    assert(Snapshots.pruneLogEntries(spark, dir) == 3)
    assert(entryFiles(dir).isEmpty, "all entry files covered and pruned")
    assert(Snapshots.versions(spark, dir) == before)
    assert(Snapshots.read(spark, dir, Some(2)).collect()
      .map(_.getString(1)).toSeq == Seq("v2"))
    // the next commit claims version 4 against the checkpointed log
    assert(Snapshots.commit(Seq((4L, "v4")).toDF("k", "v"), dir) == 4)
    assert(Snapshots.versions(spark, dir) == Seq(1, 2, 3, 4))
  }

  test("an entry republished after the checkpoint overlays it and survives prune") {
    val dir = freshDir()
    Snapshots.commit(Seq((1L, "a")).toDF("k", "v"), dir)
    val staged = Snapshots.commitStaged(Seq((2L, "b")).toDF("k", "v"), dir)
    Snapshots.checkpointLog(spark, dir) // carries v2 as STAGED
    Snapshots.publish(spark, dir, staged) // the entry file is now fresher
    assert(Snapshots.versions(spark, dir) == Seq(1, 2),
      "the published entry file must beat the checkpoint's staged copy")
    val pruned = Snapshots.pruneLogEntries(spark, dir)
    assert(pruned == 1, "only v1's verbatim copy may be pruned")
    assert(Snapshots.versions(spark, dir) == Seq(1, 2))
  }

  test("vacuum after checkpoint+prune cannot resurrect dropped versions") {
    val dir = freshDir()
    (1 to 4).foreach(i =>
      Snapshots.commit(Seq((i.toLong, s"v$i")).toDF("k", "v"), dir))
    Snapshots.checkpointLog(spark, dir)
    Snapshots.pruneLogEntries(spark, dir)
    val dropped = Snapshots.vacuum(spark, dir, keepLast = 2)
    assert(dropped == Seq(1, 2))
    assert(Snapshots.versions(spark, dir) == Seq(3, 4),
      "the rewritten checkpoint must not carry the vacuumed versions")
    intercept[Exception] { Snapshots.read(spark, dir, Some(1)).collect() }
    assert(Snapshots.read(spark, dir).collect()
      .map(_.getString(1)).toSeq == Seq("v4"))
  }
}
