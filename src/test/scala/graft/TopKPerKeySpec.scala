package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.{TopK, TopKPerKeyExec}

/** The custom top-k-per-key operator (LogicalPlan + Strategy +
  * SparkPlan): result parity with the window row_number form, plan
  * shape (TopKPerKeyExec, no WindowExec, exchange on the key), and
  * edge cases.
  */
class TopKPerKeySpec extends SparkSpec {

  private lazy val events = Tables.load(spark, Sf0001, "events")

  private def windowed(k: Int) = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    events.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
  }

  test("matches the window row_number form exactly") {
    for (k <- Seq(1, 3, 7)) {
      val fast = TopK.perKey(events, Seq("user_id"),
          Seq(col("value").desc, col("event_id")), k)
        .orderBy(col("user_id"), col("value").desc, col("event_id")).collect()
      val ref = windowed(k)
        .orderBy(col("user_id"), col("value").desc, col("event_id")).collect()
      assert(fast.length == ref.length && fast.sameElements(ref), s"k=$k")
    }
  }

  test("plans TopKPerKeyExec with a key exchange and no Window/Sort") {
    val df = TopK.perKey(events, Seq("user_id"), Seq(col("value").desc), 3)
    // AQE wraps the tree, so assert on the printed plan (the exec node
    // prints without its Exec suffix) — operator present with k=3, a
    // clustered exchange on the key, and no window/sort fallback.
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("TopKPerKey [user_id"), phys)
    assert(phys.matches("(?s).*TopKPerKey \\[user_id[^\\n]*, 3\\n.*"), phys)
    assert(!phys.contains("Window"), "heap operator must not fall back to a window")
    assert(phys.contains("hashpartitioning(user_id"), "expected clustered exchange on the key")
    assert(!phys.contains("Sort "), "no sort should follow the exchange")
  }

  test("k >= group size keeps whole groups; composes with downstream ops") {
    val n = TopK.perKey(events, Seq("user_id"), Seq(col("event_id")), 1000000)
      .count()
    assert(n == events.count())
    // downstream aggregation over the operator's output
    val agg = TopK.perKey(events, Seq("user_id"), Seq(col("value").desc), 2)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 2)
    assert(agg.count() == 0)
  }
}
