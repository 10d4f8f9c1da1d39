package graft

import org.apache.spark.sql.functions._

/** Correctness anchor for the rows-only x4_approx_quantiles entry:
  * the sketch's group quantiles must sit within the accuracy bound of
  * the exact sort-based percentiles (q21's path).
  */
class ApproxQuantileSpec extends SparkSpec {

  test("approx quantiles land within rank-error bound of exact percentiles") {
    val li = Tables.load(spark, Sf001, "lineitem")
    val exact = li.groupBy(col("l_returnflag"))
      .agg(percentile(col("l_quantity"), lit(0.5)).as("m"),
        percentile(col("l_quantity"), lit(0.9)).as("p90"))
    val approx = SparkEntry.queries("x4_approx_quantiles")(spark, Sf001)
    val joined = exact.join(approx, "l_returnflag").collect()
    assert(joined.nonEmpty)
    // l_quantity spans ~[1, 50]; with accuracy 1000 the rank error is
    // 1/1000, which on this distribution keeps the value within 1.0.
    joined.foreach { r =>
      assert(math.abs(r.getAs[Double]("m") - r.getAs[Double]("approx_median")) <= 1.0, r)
      assert(math.abs(r.getAs[Double]("p90") - r.getAs[Double]("approx_p90")) <= 1.0, r)
    }
  }

  test("x1's HLL estimate lands within the configured rsd of the exact count") {
    // x1 declares rsd = 0.02; HLL++ error is probabilistic, so allow
    // 5 sigma — a deterministic fixture makes this a stable pin, and
    // a wrong rsd argument or broken sketch blows straight past it.
    val rows = SparkEntry.queries("x1_approx_distinct")(spark, Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) <= 5 * 0.02 * exact + 1,
        s"HLL estimate $approx too far from exact $exact")
    }
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
}
