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
}
