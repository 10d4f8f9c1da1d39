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

  /** DuckDB CTE-materialization hint (an oracle-side execution fix,
    * zero semantics): DuckDB 1.0 INLINES a plain CTE per reference,
    * so an unrolled multi-round chain (graph build+walk, BPE merge
    * rounds) re-derives its whole prefix per mention — measured at
    * 500 vectors, v31's replay took 250 s plain vs 1.2 s
    * materialized, byte-identical frames. `AS MATERIALIZED`
    * evaluates each chain stage once. Applied as a text pass over
    * SQL these modules generate, where every CTE header sits at
    * line start — and that invariant is CHECKED, not assumed: each
    * line-leading `x AS (` must be preceded (ignoring whitespace) by
    * `WITH`, a comma, or nothing, i.e. be a genuine CTE-list header.
    * A future oracle with a line-leading `x AS (` in any other
    * position (a WINDOW clause, some derived-table shape) fails
    * LOUDLY here instead of being silently corrupted into invalid
    * SQL. */
  def materializeCtes(sql: String): String = {
    val header = "(?m)^(WITH )?([A-Za-z_][A-Za-z0-9_]*) AS \\(".r
    header.findAllMatchIn(sql).foreach { m =>
      val before = sql.substring(0, m.start).reverse.dropWhile(_.isWhitespace)
      val ok = m.group(1) != null || before.isEmpty ||
        before.head == ',' ||
        before.take(4).reverse.equalsIgnoreCase("WITH")
      require(ok,
        s"materializeCtes: line-leading '${m.group(2)} AS (' is not a " +
          s"CTE-list header (preceded by '...${before.take(12).reverse}') — " +
          "the MATERIALIZED rewrite would corrupt this SQL")
    }
    header.replaceAllIn(sql, "$1$2 AS MATERIALIZED (")
  }

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
