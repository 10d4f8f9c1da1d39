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

  // ---- mergeInto: the general four-arm MERGE INTO ----

  private def tgt = Seq(
    (1L, "alice", 10.0),  // matched, source says delete (bal < 0 signal)
    (2L, "bob", 20.0),    // matched, update-cond true  → source row
    (3L, "carol", 30.0),  // matched, update-cond false → kept as-is
    (4L, "dave", -5.0),   // not matched by source, negative → deleted
    (5L, "erin", 50.0)    // not matched by source, kept
  ).toDF("id", "name", "bal")

  private def src = Seq(
    (1L, "alice", -1.0),  // matched-delete arm (negative restatement)
    (2L, "bob", 99.0),    // matched-update arm
    (3L, "carol", 30.5),  // matched but below the update line → keep target
    (6L, "frank", 60.0),  // not matched, insert-cond true
    (7L, "grace", 0.5)    // not matched, insert-cond false → dropped
  ).toDF("id", "name", "bal")

  test("mergeInto drives all six arm outcomes in one pass") {
    val out = Merge.mergeInto(tgt, src, "id",
        matchedDelete = (_, s) => s("bal") < 0,
        matchedUpdate = (_, s) => s("bal") >= 50,
        notMatchedInsert = s => s("bal") >= 1,
        bySourceDelete = t => t("bal") < 0)
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(out == Seq(
      (2L, "bob", 99.0),    // updated
      (3L, "carol", 30.0),  // matched fallthrough: target kept
      (5L, "erin", 50.0),   // by-source fallthrough: target kept
      (6L, "frank", 60.0))) // inserted
  }

  test("mergeInto defaults are upsert semantics: update all matched, insert all new, delete nothing") {
    val out = Merge.mergeInto(tgt, src, "id")
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(out == Seq(
      (1L, "alice", -1.0), (2L, "bob", 99.0), (3L, "carol", 30.5),
      (4L, "dave", -5.0), (5L, "erin", 50.0),
      (6L, "frank", 60.0), (7L, "grace", 0.5)))
  }

  test("mergeInto: delete outranks update when both matched arms fire") {
    val out = Merge.mergeInto(tgt, src, "id",
        matchedDelete = (_, s) => s("bal") > 90,  // bob qualifies for both
        matchedUpdate = (_, s) => s("bal") > 0)
      .filter($"id" === 2L).count()
    assert(out == 0L)
  }

  test("a multi-match source raises BY DEFAULT (SQL MERGE's contract); opt-out is explicit") {
    val dup = Seq((2L, "bob", 1.0), (2L, "bob", 2.0), (6L, "frank", 60.0))
      .toDF("id", "name", "bal")
    val e = intercept[IllegalArgumentException] {
      Merge.mergeInto(tgt, dup, "id")
    }
    assert(e.getMessage.contains("one-row-per-key"))
    val e2 = intercept[IllegalArgumentException] {
      Merge.mergeDeltas(tgt, dup, "id")
    }
    assert(e2.getMessage.contains("one-row-per-key"))
    // a unique source passes the gate and merges normally
    val ok = Merge.mergeInto(tgt, dup.dropDuplicates("id"), "id")
    assert(ok.filter($"id" === 6L).count() == 1L)
    // the pre-deduplicated hot path may opt out — caller's contract
    assert(Merge.mergeInto(tgt, dup, "id", checkUniqueSource = false)
      .filter($"id" === 2L).count() == 2L)
  }

  test("mergeInto preserves target column order and fails fast on missing source columns") {
    assert(Merge.mergeInto(tgt, src, "id").columns.toSeq == Seq("id", "name", "bal"))
    val e = intercept[IllegalArgumentException] {
      Merge.mergeInto(tgt, Seq((1L, "x")).toDF("id", "name"), "id")
    }
    assert(e.getMessage.contains("missing columns"))
  }

  test("mergeDeltas: base anti-join mask, union images ≡ mergeInto (the MoR identity)") {
    val del = (_: org.apache.spark.sql.Column, s: org.apache.spark.sql.Column) => s("bal") < 0
    val upd = (_: org.apache.spark.sql.Column, s: org.apache.spark.sql.Column) => s("bal") >= 50
    val ins = (s: org.apache.spark.sql.Column) => s("bal") >= 1
    val bys = (t: org.apache.spark.sql.Column) => t("bal") < 0
    val (mask, images) = Merge.mergeDeltas(tgt, src, "id", del, upd, ins, bys)
    val mor = tgt.join(mask, Seq("id"), "left_anti").unionByName(images)
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    val cow = Merge.mergeInto(tgt, src, "id", del, upd, ins, bys)
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(mor == cow, "merge-on-read must equal copy-on-write row for row")
    // the mask holds exactly the removed-or-superseded TARGET keys
    assert(mask.orderBy("id").as[Long].collect().toSeq == Seq(1L, 2L, 4L))
  }

  test("mergeInto plans one join, no window, no extra data pass") {
    val plan = Merge.mergeInto(tgt, src, "id").queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
    assert("(?i)join".r.findAllIn(plan).size >= 1)
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"non-equi join shape:\n$plan")
  }
}
