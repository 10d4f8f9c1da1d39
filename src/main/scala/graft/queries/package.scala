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

  /** The snapshot-fixture prologue ~30 lakehouse queries share: one
    * deterministic per-(query, sf-dir) table directory, dropped first
    * so every run lands the same version numbers — the property the
    * oracles' pinned `n_versions` columns depend on. */
  def freshSnapDir(s: SparkSession, d: String, tag: String): String = {
    val dir = s"target/${tag}_${math.abs(d.hashCode)}"
    graft.sources.Snapshots.drop(s, dir)
    dir
  }
}
