package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

package object queries {
  /** Driver contract: (session, sfDir) → result. */
  type Q = (SparkSession, String) => DataFrame

  /** Exact, order-independent sum of a 2-decimal double column.
    * Double group-sums are merge-order-dependent (shuffle fetch order
    * is nondeterministic), so every money sum goes through decimal —
    * exact and associative — and back to double for the oracle hash.
    * DuckDB twin: `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`.
    */
  def dsum2(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** Same for derived per-row doubles (e.g. price*(1-disc)): the
    * per-row product is IEEE-identical in Spark and DuckDB; summing at
    * scale 6 keeps the result exact and order-independent.
    * DuckDB twin: `CAST(SUM(CAST(x AS DECIMAL(24,6))) AS DOUBLE)`.
    */
  def dsum6(c: Column): Column = sum(c.cast("decimal(24,6)")).cast("double")
}
