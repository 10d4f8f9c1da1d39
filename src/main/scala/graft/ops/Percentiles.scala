package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-vs-sketch percentile SWITCHOVER — the bounded-memory guard
  * for per-group quantiles, in the operator instead of in prose.
  *
  * Spark's exact `percentile` buffers every group value in the
  * aggregation buffer (a per-group sort), so its memory is O(largest
  * group) — fine until one group outgrows an executor, then it's the
  * classic scale OOM. `approx_percentile` is the mergeable-sketch
  * path: one pass, bounded state, rank error ≤ 1/accuracy
  * (ApproxQuantileSpec pins the bound). This operator makes the trade
  * explicit and automatic:
  *
  *  1. one cheap count-only pre-pass (map-side combinable partials,
  *     k-row result) finds the largest group;
  *  2. if it fits `maxExactGroupRows` (default 10M values ≈ 80 MB of
  *     doubles in one buffer — a sane executor budget), run EXACT
  *     percentiles; otherwise degrade to the sketch;
  *  3. the chosen mode is a visible `exact` column, so a consumer —
  *     or an oracle — sees WHICH semantics it got instead of
  *     silently trusting the small-data behavior at 100×.
  */
object Percentiles {

  val DefaultMaxExactGroupRows: Long = 10L * 1000 * 1000

  /** Per-group quantiles at the given (outputName, fraction) points,
    * plus `n_rows` and the `exact` mode flag. Output value columns
    * are double in both modes (schema-stable across the switchover).
    */
  def grouped(df: DataFrame, groupCol: String, valCol: String,
              points: Seq[(String, Double)],
              maxExactGroupRows: Long = DefaultMaxExactGroupRows,
              sketchAccuracy: Int = 1000): DataFrame = {
    require(points.nonEmpty)
    val largest = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_n"))
      .agg(max(col("_n"))).head() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
    val exact = largest <= maxExactGroupRows
    val aggs = points.map { case (name, p) =>
      val c = if (exact) percentile(col(valCol), lit(p))
        else approx_percentile(col(valCol), lit(p), lit(sketchAccuracy))
      c.cast("double").as(name)
    } :+ count(lit(1)).as("n_rows")
    df.groupBy(col(groupCol))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("exact", lit(exact))
  }
}
