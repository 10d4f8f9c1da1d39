package graft.queries

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-session materialization cache for derived tables.
  *
  * The reference materializes chunks/nodes/edges ONCE at ingest and
  * every query reads the tables (sql/01_create_schema.sql); our
  * oracle queries instead re-derive them from raw documents so each
  * query is self-contained. Without sharing, eight KG queries in one
  * session each pay the full chunk→extract pipeline. This cache
  * gives the production shape back: the first query materializes a
  * derivation (persisted), later queries in the same session reuse
  * it. Keyed by (session, sfDir, name); entries are just persisted
  * DataFrames — if something unpersists them (Bench/Verify hygiene,
  * memory pressure) the plans transparently recompute, so
  * correctness never depends on the cache.
  */
object Derived {

  private val cache = new ConcurrentHashMap[(Int, String, String), DataFrame]()

  def of(spark: SparkSession, dir: String, name: String)(build: => DataFrame): DataFrame =
    cache.computeIfAbsent(
      (System.identityHashCode(spark), dir, name),
      _ => build.persist())
}
