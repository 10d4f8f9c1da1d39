package graft

import org.apache.spark.sql.functions._
import graft.ops.Diff

class DiffSpec extends SparkSpec {
  import spark.implicits._

  private def oldSnap = Seq(
    (1L, "alice", 10.0),
    (2L, "bob", 20.0),
    (3L, "carol", 30.0),
    (4L, "dave", 40.0)
  ).toDF("id", "name", "bal")

  test("snapshot diff tags inserts, updates, deletes; unchanged rows are absent") {
    val newSnap = Seq(
      (1L, "alice", 10.0),  // unchanged
      (2L, "bob", 99.0),    // updated
      (4L, "david", 40.0),  // updated (non-numeric column)
      (5L, "erin", 50.0)    // inserted; 3 deleted
    ).toDF("id", "name", "bal")
    val out = Diff.snapshot(oldSnap, newSnap, Seq("id"))
      .select("op", "id").orderBy("id")
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("U", 2L), ("D", 3L), ("U", 4L), ("I", 5L)))
  }

  test("before/after values are carried on each change row") {
    val newSnap = Seq((2L, "bob", 99.0)).toDF("id", "name", "bal")
    val rows = Diff.snapshot(oldSnap, newSnap, Seq("id"))
      .filter($"op" === "U")
      .select("id", "old_bal", "new_bal")
      .as[(Long, Double, Double)].collect().toSeq
    assert(rows == Seq((2L, 20.0, 99.0)))
  }

  test("null vs value counts as a change in both directions") {
    val o = Seq((1L, Some(10.0)), (2L, Option.empty[Double])).toDF("id", "bal")
    val n = Seq((1L, Option.empty[Double]), (2L, Some(20.0))).toDF("id", "bal")
    val out = Diff.snapshot(o, n, Seq("id"))
      .select("op", "id").orderBy("id").as[(String, Long)].collect().toSeq
    assert(out == Seq(("U", 1L), ("U", 2L)))
  }

  test("null <=> null is NOT a change") {
    val o = Seq((1L, Option.empty[Double])).toDF("id", "bal")
    val n = Seq((1L, Option.empty[Double])).toDF("id", "bal")
    assert(Diff.snapshot(o, n, Seq("id")).count() == 0)
  }

  test("identical snapshots produce an empty diff") {
    assert(Diff.snapshot(oldSnap, oldSnap, Seq("id")).count() == 0)
  }

  test("schema mismatch fails fast") {
    val bad = oldSnap.withColumnRenamed("bal", "balance")
    val e = intercept[IllegalArgumentException] {
      Diff.snapshot(oldSnap, bad, Seq("id"))
    }
    assert(e.getMessage.contains("share a schema"))
  }

  test("funnel steps gate strictly on the previous step's earliest time") {
    // user 1 converts fully; user 2 clicked BEFORE viewing (no
    // conversion); user 3 views only
    // ts is long nanos, matching the fixture format Tables.load expects
    val ev = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "click", 5L), (2L, "view", 6L), (2L, "purchase", 7L),
      (3L, "view", 1L)
    ).map { case (u, t, sec) => (u, t, sec * 1000000000L) }
      .toDF("user_id", "event_type", "ts")
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("s4_funnel")(spark, dir)
      .as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(("1_view", 3L, 1.0), ("2_click", 1L, 0.3333),
      ("3_purchase", 1L, 0.3333)))
  }
}
