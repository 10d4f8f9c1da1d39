package graft

import org.apache.spark.sql.functions._
import graft.ops.IncrementalAgg

/** merge(state(A), state(B)) == state(A ∪ B) for disjoint batches —
  * the monoid law incremental maintenance rests on — plus
  * associativity across three batches in either merge order.
  */
class IncrementalAggSpec extends SparkSpec {

  private lazy val orders = Tables.load(spark, Sf001, "orders")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("o_custkey").collect().toSeq

  test("merging two disjoint batches equals the one-shot aggregate") {
    val cut = lit("1997-01-01").cast("timestamp")
    val merged = IncrementalAgg.merge(
      IncrementalAgg.state(orders.filter(col("o_orderdate") < cut), "o_custkey", "o_totalprice"),
      IncrementalAgg.state(orders.filter(col("o_orderdate") >= cut), "o_custkey", "o_totalprice"),
      "o_custkey")
    val oneShot = IncrementalAgg.state(orders, "o_custkey", "o_totalprice")
    assert(rows(merged) == rows(oneShot))
  }

  test("x35's delta quadrants are all non-empty in the fixture") {
    // the IVM query only exercises all three delta-join terms
    // (ΔO⋈L, O⋈ΔL, ΔO⋈ΔL) if old orders receive new lineitems and
    // vice versa — guard the fixture property the query's coverage
    // claim rests on, so a testdata regeneration can't silently turn
    // x35 into a single-term append test
    val cut = lit("1997-01-01").cast("timestamp")
    val o = Tables.load(spark, Sf001, "orders")
    val l = Tables.load(spark, Sf001, "lineitem")
    val j = o.join(l, col("o_orderkey") === col("l_orderkey"))
    val quadrants = j.groupBy(
        (col("o_orderdate") >= cut).as("o_new"),
        (col("l_shipdate") >= cut).as("l_new"))
      .count().collect()
    assert(quadrants.length == 4,
      s"expected all 4 (o_new, l_new) quadrants populated, got ${quadrants.length}")
  }

  test("merge is associative: ((A+B)+C) == (A+(B+C))") {
    def part(i: Int) = IncrementalAgg.state(
      orders.filter(col("o_orderkey") % 3 === i), "o_custkey", "o_totalprice")
    val left = IncrementalAgg.merge(
      IncrementalAgg.merge(part(0), part(1), "o_custkey"), part(2), "o_custkey")
    val right = IncrementalAgg.merge(
      part(0), IncrementalAgg.merge(part(1), part(2), "o_custkey"), "o_custkey")
    assert(rows(left) == rows(right))
    assert(rows(left) == rows(IncrementalAgg.state(orders, "o_custkey", "o_totalprice")))
  }
}
