package graft

import org.apache.spark.sql.functions._
import graft.ops.Merge

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def snap = Seq(
    (1L, "alice", 10.0),
    (2L, "bob", 20.0),
    (3L, "carol", 30.0)
  ).toDF("id", "name", "bal")

  test("upsert applies updates, inserts, and deletes; untouched rows survive") {
    val changes = Seq(
      (2L, "bob", 99.0, "U"),   // update
      (3L, "carol", 0.0, "D"),  // delete
      (4L, "dave", 40.0, "U")   // insert
    ).toDF("id", "name", "bal", "op")
    val out = Merge.upsert(snap, changes, "id")
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "alice", 10.0), (2L, "bob", 99.0), (4L, "dave", 40.0)))
  }

  test("column order in the result matches the snapshot") {
    val changes = Seq((1L, "alice", 11.0, "U")).toDF("id", "name", "bal", "op")
    assert(Merge.upsert(snap, changes, "id").columns.toSeq == Seq("id", "name", "bal"))
  }

  test("empty changeset is the identity") {
    val changes = Seq.empty[(Long, String, Double, String)].toDF("id", "name", "bal", "op")
    val out = Merge.upsert(snap, changes, "id").orderBy("id")
      .as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "alice", 10.0), (2L, "bob", 20.0), (3L, "carol", 30.0)))
  }

  test("missing changeset columns fail fast with a clear message") {
    val bad = Seq((1L, "U")).toDF("id", "op")
    val e = intercept[IllegalArgumentException] {
      Merge.upsert(snap, bad, "id")
    }
    assert(e.getMessage.contains("missing columns"))
  }

  test("a delete for an absent key is a no-op") {
    val changes = Seq((9L, "nobody", 0.0, "D")).toDF("id", "name", "bal", "op")
    assert(Merge.upsert(snap, changes, "id").count() == 3)
  }

  test("one shuffle: the plan has a single aggregate exchange and no sort") {
    val changes = Seq((2L, "bob", 99.0, "U")).toDF("id", "name", "bal", "op")
    val plan = Merge.upsert(snap, changes, "id").queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("sortmerge"), s"unexpected sort-merge join:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
  }
}
