package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the nightly-ETL pattern: keep
  * a per-key state table of MERGEABLE statistics (count / sum / min /
  * max; avg derives from sum÷count at read time), fold each new batch
  * into it, and never recompute history. At 100 TB the difference is
  * scanning one day instead of five years: the state table is
  * key-cardinality-sized, the nightly cost is O(batch) + one
  * combine shuffle on the key.
  *
  * Correctness rests on the statistics being commutative monoids —
  * `merge(state(A), state(B)) == state(A ∪ B)` for disjoint batches —
  * which is exactly what makes the same shapes safe as map-side
  * partials inside Spark's own aggregation. Sums go through
  * DECIMAL so the merge is also order-independent bit-for-bit
  * (the engine-parity rule every oracle query follows).
  */
object IncrementalAgg {

  /** Aggregate one batch into state shape:
    * (keyCol, n, sum_v DECIMAL(28,2), min_v, max_v). */
  def state(batch: DataFrame, keyCol: String, valCol: String): DataFrame =
    batch.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n"),
      sum(col(valCol).cast("decimal(28,2)")).as("sum_v"),
      min(col(valCol)).as("min_v"),
      max(col(valCol)).as("max_v"))

  /** Fold a new batch's state into the existing state — one shuffle
    * on the key (both sides are already key-aggregated), keys present
    * in either side survive. */
  def merge(prev: DataFrame, next: DataFrame, keyCol: String): DataFrame = {
    val both = prev.select(col(keyCol), col("n"), col("sum_v"), col("min_v"), col("max_v"))
      .unionByName(next.select(col(keyCol), col("n"), col("sum_v"), col("min_v"), col("max_v")))
    both.groupBy(col(keyCol)).agg(
      sum(col("n")).as("n"),
      sum(col("sum_v")).cast("decimal(28,2)").as("sum_v"),
      min(col("min_v")).as("min_v"),
      max(col("max_v")).as("max_v"))
  }
}
