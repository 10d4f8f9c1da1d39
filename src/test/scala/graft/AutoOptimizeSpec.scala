package graft

import org.apache.spark.sql.functions._
import graft.ops.AutoOptimize
import graft.sources.Snapshots

/** x93's contract: the hook fires only past the threshold, never
  * changes rows, never feeds CDC, stands down cleanly when it loses
  * the OCC race to a concurrent writer, and converges under
  * concurrent commuting appends. */
class AutoOptimizeSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String) = {
    val dir = s"target/autoopt_${tag}_${System.nanoTime()}"
    Snapshots.drop(spark, dir)
    dir
  }

  test("fires past the threshold only; rows, feed, and listing hold the contract") {
    val dir = freshDir("basic")
    AutoOptimize.enable(dir, maxFiles = 5, targetFiles = 2)
    try {
      Snapshots.commit((1 to 40).toDF("id").repartition(3), dir)
      assert(Snapshots.versions(spark, dir) == Seq(1), "3 files: below threshold")
      Snapshots.commitAppend((41 to 60).toDF("id").repartition(3), dir, base = 1)
      // 6 > 5: the hook compacted inside the append call
      assert(Snapshots.versions(spark, dir) == Seq(1, 2, 3),
        "the layout version must land within the triggering commit")
      assert(AutoOptimize.chainFileCount(spark, dir) <= 2)
      assert(Snapshots.readResolved(spark, dir).count() == 60)
      assert(Snapshots.readResolved(spark, dir).agg(sum($"id")).head.getLong(0)
        == 60L * 61 / 2, "maintenance must never change the rows")
      assert(Snapshots.stepChanges(spark, dir, 3, Seq("id")).count() == 0,
        "a maintenance commit must never feed CDC")
    } finally AutoOptimize.disable(dir)
  }

  test("a staged ghost never stalls maintenance: the layout lands past it") {
    val dir = freshDir("occ")
    // fragment past the threshold with the hook OFF, then squat the
    // next entry number with a staged ghost (a pending txn/WAP stage
    // or an open branch's chain): OCC conflicts are about
    // reader-visible states, so the hook's layout commit (planned
    // against published head v2) must step past the ghost's number
    // and land — an open branch must not disable auto-maintenance
    Snapshots.commit((1 to 30).toDF("id").repartition(3), dir)
    Snapshots.commitAppend((31 to 60).toDF("id").repartition(3), dir, base = 1)
    Snapshots.commitStaged((999 to 999).toDF("id"), dir) // ghost owns v3
    AutoOptimize.enable(dir, maxFiles = 5, targetFiles = 1)
    try {
      // drive the hook directly (what any commit verb dispatches)
      AutoOptimize.afterCommit(spark, dir)
      assert(Snapshots.versions(spark, dir) == Seq(1, 2, 4),
        "the layout lands at the next free number, past the ghost")
      assert(Snapshots.readResolved(spark, dir).count() == 60)
      assert(AutoOptimize.chainFileCount(spark, dir) <= 1,
        "maintenance compacted despite the ghost")
      assert(Snapshots.stepChanges(spark, dir, 4, Seq("id")).count() == 0,
        "the layout commit stays CDC-quiet")
      // the ghost is untouched: publishing its transaction later
      // still works (it stays an ordinary staged version)
      assert(Snapshots.allVersions(spark, dir) == Seq(1, 2, 3, 4))
    } finally AutoOptimize.disable(dir)
  }

  test("concurrent commuting appends with the hook on: no lost rows, convergence after") {
    val dir = freshDir("conc")
    Snapshots.commit((1 to 10).toDF("id").repartition(2), dir)
    AutoOptimize.enable(dir, maxFiles = 4, targetFiles = 1)
    try {
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (0 until 3).map { i =>
        new Thread(() =>
          try Snapshots.commitAppendCommuting(
            ((100 + i * 10) until (110 + i * 10)).toDF("id").repartition(2),
            dir, base = 1)
          catch { case e: Throwable => errs.add(e) })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(errs.isEmpty, s"concurrent appends must all land: $errs")
      assert(Snapshots.readResolved(spark, dir).count() == 40,
        "no append's rows may be lost to a racing compaction")
      // one more quiet commit converges the layout
      Snapshots.commitAppendCommuting(Seq(999).toDF("id"), dir,
        base = Snapshots.versions(spark, dir).last)
      assert(AutoOptimize.chainFileCount(spark, dir) <= 4,
        "maintenance converges once the writers go quiet")
    } finally AutoOptimize.disable(dir)
  }
}
