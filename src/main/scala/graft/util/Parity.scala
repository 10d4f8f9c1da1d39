package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass multiset-equality witness.
  *
  * The proof-harness idiom `a.exceptAll(b).isEmpty &&
  * b.exceptAll(a).isEmpty` runs TWO jobs and evaluates each side
  * TWICE (each exceptAll scans both inputs) — four evaluations of
  * frames that are often whole resolution chains (readResolved,
  * change-feed replays, descents). Multiset equality needs only the
  * per-row counts: group each side by every column, full-outer join
  * the two count maps null-safely, and the multisets are equal iff no
  * joined row disagrees — ONE job, each side evaluated once. Same
  * null/NaN/-0.0 semantics as exceptAll (grouping and `<=>` both
  * treat null = null and NaN = NaN, and Spark normalizes -0.0 in
  * grouping and join keys).
  *
  * Columns are matched by POSITION (exceptAll's rule): `b` is
  * relabeled to `a`'s column names first.
  */
object Parity {
  def multisetEqual(a: DataFrame, b: DataFrame): Boolean = {
    val cols = a.columns.toSeq
    val ga = a.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__ca"))
    val gb = b.toDF(cols: _*)
      .groupBy(cols.map(col): _*).agg(count(lit(1)).as("__cb"))
      .select(cols.map(c => col(c).as("__pb_" + c)) :+ col("__cb"): _*)
    val cond = cols.map(c => ga(c) <=> gb("__pb_" + c))
      .reduceOption(_ && _).getOrElse(lit(true))
    ga.join(gb, cond, "full_outer")
      .filter(!(col("__ca") <=> col("__cb")))
      .isEmpty
  }
}
