package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Scale-safe dense global row index (0-based) in the total order of
  * the given key columns — the replacement for the single-reducer
  * `row_number().over(Window.orderBy(...))` anti-pattern.
  *
  * Two-pass shape (the classic distributed global-numbering scheme,
  * and exactly what RDD.zipWithIndex implements):
  *   1. range-repartition on the ordering key and sort within each
  *      partition → a total order across partition boundaries;
  *   2. count rows per partition (one tiny job: #partitions values,
  *      bounded by cluster size, not data size), turn the counts into
  *      cumulative start offsets shipped to every partition, and add
  *      the within-partition position.
  *
  * No global shuffle to one reducer anywhere: the data-sized work is
  * a range shuffle + local sorts, both fully parallel. The index is
  * deterministic whatever the sampled range boundaries are, because
  * it equals the rank in the total order (callers must pass a
  * tie-free key).
  *
  * Used by the oracle-parity chunk queries (KgQ k1/k8) for the
  * reference's GLOBAL `chunk_index` audit column
  * (reference: data/ingestion.py:188's running counter).
  */
object GlobalIndex {

  /** Append `out` (LONG, 0-based) numbering `df`'s rows by `ordering`.
    * `ordering` must be a unique key of `df`.
    */
  def withGlobalIndex(df: DataFrame, ordering: Seq[Column], out: String,
                      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (numPartitions > 0) numPartitions
            else spark.sparkContext.defaultParallelism
    val sorted = df.repartitionByRange(p, ordering: _*)
      .sortWithinPartitions(ordering: _*)
    val schema = sorted.schema.add(out, LongType, nullable = false)
    val indexed = sorted.rdd.zipWithIndex()
      .map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    spark.createDataFrame(indexed, schema)
  }
}
