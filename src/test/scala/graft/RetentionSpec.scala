package graft

import graft.ops.Retention
import graft.sources.Snapshots

/** Auto-vacuum retention (x100): the window enforces itself inside
  * the commit verbs, chain closure keeps every version the latest
  * still resolves through, and disabling stops the hook. */
class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("retention").toString + "/t"

  test("the window enforces itself on commit; below-window reads fail loudly") {
    val dir = freshDir()
    Retention.enable(dir, keepLast = 2)
    try {
      Snapshots.commit(Seq((1L, "a")).toDF("id", "v"), dir)
      Snapshots.commit(Seq((1L, "b")).toDF("id", "v"), dir)
      assert(Snapshots.versions(spark, dir) == Seq(1, 2), "window holds at 2")
      Snapshots.commit(Seq((1L, "c")).toDF("id", "v"), dir)
      assert(Snapshots.versions(spark, dir) == Seq(2, 3),
        "the third commit prunes v1 inside the commit call")
      intercept[Throwable] { Snapshots.read(spark, dir, Some(1)).count() }
      assert(Snapshots.read(spark, dir, Some(2)).head.getString(1) == "b",
        "the kept window still time-travels")
    } finally Retention.disable(dir)
  }

  test("chain closure: an append chain pins its bases past the window") {
    val dir = freshDir()
    Snapshots.commit(Seq((1L, "a")).toDF("id", "v"), dir)
    Snapshots.commitAppend(Seq((2L, "b")).toDF("id", "v"), dir, base = 1)
    Retention.enable(dir, keepLast = 1)
    try {
      Snapshots.commitAppend(Seq((3L, "c")).toDF("id", "v"), dir, base = 2)
      // keepLast=1, but v3 resolves through v2 through v1: closure
      // protects the whole chain — latest reads can never break
      assert(Snapshots.versions(spark, dir) == Seq(1, 2, 3))
      assert(Snapshots.readResolved(spark, dir).count() == 3)
      // a FULL commit ends the chain: everything below it now prunes
      Snapshots.commit(Seq((9L, "z")).toDF("id", "v"), dir)
      assert(Snapshots.versions(spark, dir) == Seq(4))
      assert(Snapshots.read(spark, dir).count() == 1)
    } finally Retention.disable(dir)
  }

  test("x106: age vacuum keeps at-or-after the horizon; a restore inside the horizon pins its target") {
    val day = 86400000L
    val dir = freshDir()
    Snapshots.commitAt(Seq((1L, "d1")).toDF("id", "v"), dir, day)
    Snapshots.commitAt(Seq((2L, "d2")).toDF("id", "v"), dir, 2 * day)
    Snapshots.commitAt(Seq((3L, "d3")).toDF("id", "v"), dir, 3 * day)
    // a restore (untimed, inside the horizon by recency) pins v2
    Snapshots.commitRestore(spark, dir, 2)
    assert(Snapshots.vacuumOlderThan(spark, dir, 3 * day) == Seq(1),
      "v1 ages out; v2 survives ONLY through the kept restore's closure")
    assert(Snapshots.readResolved(spark, dir).head.getString(1) == "d2",
      "the restored state still serves after the age vacuum")
    assert(Snapshots.read(spark, dir, Some(2)).head.getString(1) == "d2")
    intercept[Throwable] { Snapshots.read(spark, dir, Some(1)).count() }
    // the standing age policy fires inside a timed commit
    Retention.enableAge(dir, maxAgeMillis = day)
    try {
      Snapshots.commitAt(Seq((9L, "d9")).toDF("id", "v"), dir, 9 * day)
      assert(!Snapshots.versions(spark, dir).contains(3),
        "v3 aged past the standing window inside the commit")
      // v2 still pinned by the untimed restore's chain closure
      assert(Snapshots.read(spark, dir, Some(2)).count() == 1)
    } finally Retention.disable(dir)
  }

  test("x106: the age clock is the MAX recorded instant — an untimed head never stalls it") {
    val day = 86400000L
    val dir = freshDir()
    Snapshots.commitAt(Seq((1L, "d1")).toDF("id", "v"), dir, day)
    Snapshots.commitAt(Seq((2L, "d2")).toDF("id", "v"), dir, 5 * day)
    assert(Snapshots.latestPublishedTs(spark, dir).contains(5 * day))
    Retention.enableAge(dir, maxAgeMillis = day)
    try {
      // an UNTIMED append lands at head: the clock must stay the max
      // across ALL published instants (5*day), so the hook still
      // ages v1 out — a head-only clock would return None here and
      // silently no-op MaxAge retention until the next timed commit
      Snapshots.commitAppend(Seq((3L, "d3")).toDF("id", "v"), dir, base = 2)
      assert(Snapshots.latestPublishedTs(spark, dir).contains(5 * day),
        "the untimed head does not move (or erase) the recorded clock")
      assert(!Snapshots.versions(spark, dir).contains(1),
        "v1 aged out inside the untimed commit's hook")
      assert(Snapshots.readResolved(spark, dir).count() == 2,
        "latest = v2's row + the appended row")
    } finally Retention.disable(dir)
  }

  test("disable stops the hook") {
    val dir = freshDir()
    Retention.enable(dir, keepLast = 1)
    Retention.disable(dir)
    Snapshots.commit(Seq((1L, "a")).toDF("id", "v"), dir)
    Snapshots.commit(Seq((1L, "b")).toDF("id", "v"), dir)
    assert(Snapshots.versions(spark, dir) == Seq(1, 2))
  }
}
