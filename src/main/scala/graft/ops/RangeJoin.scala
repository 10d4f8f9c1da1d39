package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed point-in-interval range join — the keyless
  * interval-containment join Spark's built-in operators turn into a
  * BroadcastNestedLoopJoin (O(n·m) compares; a driver-killing
  * broadcast once neither side is small).
  *
  * The standard binning rewrite (what warehouse engines do under a
  * RANGE_JOIN hint): quantize time into buckets of `bucketWidth`
  * seconds, explode each interval into the buckets it covers, tag
  * each point with its single bucket, hash-join on the bucket id,
  * then apply the exact containment predicate to the co-bucketed
  * candidates. With `bucketWidth` ≥ the maximum interval length every
  * interval covers at most 2 buckets, so the build side at most
  * doubles while the probe side stays 1:1 — a shuffle-partitionable
  * equi join whose per-bucket candidate volume is
  * O(points_per_bucket · intervals_per_bucket), the plan that
  * survives 100 TB of events.
  *
  * Pairs are emitted at most once: a point belongs to exactly one
  * bucket, so no post-join dedup is needed.
  */
object RangeJoin {

  /** Join every `points` row to every `intervals` row whose
    * `[startCol, endCol]` (inclusive both ends) contains `tsCol`.
    * All three are timestamp columns. `bucketWidth` (seconds) must be
    * ≥ the maximum interval length — intervals are exploded into
    * ⌈len/width⌉+1 buckets, so an undersized width still returns the
    * exact answer, just with a larger build-side expansion.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      tsCol: String, startCol: String, endCol: String,
                      bucketWidth: Int): DataFrame = {
    require(bucketWidth > 0, "rangeJoin: bucketWidth must be positive")
    def bucketOf(c: Column): Column = floor(unix_timestamp(c) / bucketWidth)
    val iv = intervals.withColumn("_bucket",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    val pt = points.withColumn("_bucket", bucketOf(col(tsCol)))
    pt.join(iv, Seq("_bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_bucket")
  }
}
