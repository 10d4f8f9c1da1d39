package graft

import org.apache.spark.sql.functions._

/** Correctness anchor for the sketch queries x1/x4 (their oracles
  * check the error ENVELOPE — these tests pin the tighter per-value
  * behavior the envelope alone can't see).
  */
class ApproxQuantileSpec extends SparkSpec {

  test("approx quantiles land within rank-error bound of exact percentiles") {
    val li = Tables.load(spark, Sf001, "lineitem")
    // independent recompute of the sketch next to the exact path —
    // the declared x4 output carries only the envelope booleans
    val both = li.groupBy(col("l_returnflag"))
      .agg(percentile(col("l_quantity"), lit(0.5)).as("m"),
        percentile(col("l_quantity"), lit(0.9)).as("p90"),
        approx_percentile(col("l_quantity"), lit(0.5), lit(1000)).as("approx_median"),
        approx_percentile(col("l_quantity"), lit(0.9), lit(1000)).as("approx_p90"))
      .collect()
    assert(both.nonEmpty)
    // l_quantity spans ~[1, 50]; with accuracy 1000 the rank error is
    // 1/1000, which on this distribution keeps the value within 1.0.
    both.foreach { r =>
      assert(math.abs(r.getAs[Double]("m") - r.getAs[Double]("approx_median")) <= 1.0, r)
      assert(math.abs(r.getAs[Double]("p90") - r.getAs[Double]("approx_p90")) <= 1.0, r)
    }
    // and the declared query's own envelope verdicts hold
    val declared = SparkEntry.queries("x4_approx_quantiles")(spark, Sf001).collect()
    declared.foreach { r =>
      assert(r.getAs[Boolean]("median_ok") && r.getAs[Boolean]("p90_ok"), r)
      assert(r.getAs[Double]("median_lo") <= r.getAs[Double]("median_hi"), r)
      assert(r.getAs[Double]("p90_lo") <= r.getAs[Double]("p90_hi"), r)
    }
  }

  test("x1's HLL estimate lands within the configured rsd of the exact count") {
    // x1 declares rsd = 0.02; HLL++ error is probabilistic, so allow
    // 5 sigma — a deterministic fixture makes this a stable pin, and
    // a wrong rsd argument or broken sketch blows straight past it.
    // (The declared x1 output carries only the 3-sigma envelope
    // boolean; recompute the estimate here for the per-value pin.)
    val rows = Tables.load(spark, Sf001, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) <= 5 * 0.02 * exact + 1,
        s"HLL estimate $approx too far from exact $exact")
    }
    assert(SparkEntry.queries("x1_approx_distinct")(spark, Sf001)
      .collect().forall(_.getAs[Boolean]("approx_ok")))
  }

  test("percentile switchover: exact under the bound, sketch (flagged) above it") {
    import graft.ops.Percentiles
    val li = Tables.load(spark, Sf001, "lineitem")
    val pts = Seq("median_qty" -> 0.5, "p90_qty" -> 0.9)

    val small = Percentiles.grouped(li, "l_returnflag", "l_quantity", pts)
    assert(small.collect().forall(_.getAs[Boolean]("exact")))

    // force the degrade path: every group exceeds one row
    val degraded = Percentiles.grouped(li, "l_returnflag", "l_quantity", pts,
      maxExactGroupRows = 1)
    val rows = degraded.collect()
    assert(rows.forall(!_.getAs[Boolean]("exact")))
    // schema identical across modes; sketch stays within the x4 bound
    assert(degraded.schema == small.schema)
    val exactByFlag = small.collect()
      .map(r => r.getString(0) -> r.getAs[Double]("median_qty")).toMap
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("median_qty") - exactByFlag(r.getString(0))) <= 1.0, r)
    }
  }

  test("switchover flips exactly at the largest-group row count") {
    import graft.ops.Percentiles
    val li = Tables.load(spark, Sf0001, "lineitem")
    val largest = li.groupBy(col("l_returnflag")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(largest > 1)
    val pts = Seq("median_qty" -> 0.5)
    // bound == largest group: still fits one buffer — exact path
    val atBound = Percentiles.grouped(li, "l_returnflag", "l_quantity", pts,
      maxExactGroupRows = largest)
    assert(atBound.collect().forall(_.getAs[Boolean]("exact")),
      s"largest group ($largest rows) == bound must stay exact")
    // one row past the bound: the sketch must take over
    val pastBound = Percentiles.grouped(li, "l_returnflag", "l_quantity", pts,
      maxExactGroupRows = largest - 1)
    assert(pastBound.collect().forall(!_.getAs[Boolean]("exact")),
      s"largest group ($largest rows) > bound (${largest - 1}) must degrade")
  }
}
