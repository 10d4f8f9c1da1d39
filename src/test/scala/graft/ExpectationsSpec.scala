package graft

import org.apache.spark.sql.functions._
import graft.ops.Expectations

/** x47's split semantics: one pass, disjoint + complete, every failed
  * constraint named in declaration order, and NULL results quarantine
  * (the strict reading a quality gate needs — SQL CHECK's null-passes
  * would let unknowns into the corpus). */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, "ok row here", 10L),
    (2L, "short", 2L),
    (3L, null.asInstanceOf[String], 2L), // fails text AND length
    (4L, "fine but null-length", -1L)
  ).toDF("id", "text", "len")

  private val constraints = Seq(
    "min_len" -> (col("len") >= 5L),
    "has_text" -> col("text").isNotNull)

  test("split is disjoint and complete; multi-violations list in declaration order") {
    val (clean, quar) = Expectations.split(df, constraints)
    assert(clean.columns.toSeq == df.columns.toSeq, "clean keeps the input schema")
    assert(clean.count() + quar.count() == df.count())
    val v = quar.select("id", "violations").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(clean.select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(v == Map(2L -> "min_len", 3L -> "min_len,has_text", 4L -> "min_len"))
  }

  test("a NULL constraint result quarantines (strict gate, not SQL CHECK)") {
    val withNull = Seq((1L, Some(5L)), (2L, Option.empty[Long]))
      .toDF("id", "len")
    val (clean, quar) = Expectations.split(withNull,
      Seq("min_len" -> (col("len") >= 5L)))
    assert(clean.select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(quar.select("id", "violations").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((2L, "min_len")))
  }

  test("declared x47 lands clean and quarantine atomically and completely") {
    val rows = SparkEntry.queries("x47_constrained_commit")(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("atomic_gate")))
      assert(r.getBoolean(r.fieldIndex("split_complete")))
    }
    // the gate's invariant holds on the committed corpus itself
    import graft.sources.Snapshots
    val cleanDir = s"target/x47_clean_${math.abs(Sf0001.hashCode)}"
    val bad = Snapshots.read(spark, cleanDir)
      .filter(col("n_chars") < graft.queries.ExtQ.X47MinChars).count()
    assert(bad == 0, "no constraint-violating row may exist in the clean table")
  }
}
