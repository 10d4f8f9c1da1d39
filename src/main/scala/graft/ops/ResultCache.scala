package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Snapshots

/** QUERY-RESULT CACHE keyed by input table VERSIONS (x46) — the
  * Snowflake result-reuse contract reduced to its load-bearing parts:
  * a query's result may be served from storage iff the query is the
  * same AND every input table still stands at the exact version the
  * result was computed from. The cache itself is a Snapshots table
  * whose entries carry the fingerprint in their log metadata
  * ([[Snapshots.commitKeyed]]), so a lookup is ONE metadata listing —
  * no data is touched to decide hit vs miss, and a hit's read plan
  * scans only the result-sized cached version, never the input
  * corpus (ResultCacheSpec proves it by deleting the input outright).
  *
  * Version-exact keying makes invalidation free: nobody tracks
  * dependencies or purges entries — a refreshed input simply has a
  * new version number, so old fingerprints stop matching and age out
  * under the cache table's ordinary vacuum retention. At 100 TB this
  * is the warehouse result-reuse economics: repeated dashboard-style
  * aggregates over a slow-changing corpus cost one metadata listing
  * instead of a corpus scan, and correctness never depends on a
  * cache-coherence protocol — only on the snapshot log's version
  * numbers, which the commit protocol already makes authoritative.
  */
object ResultCache {

  /** Canonical fingerprint: query id + every input pinned to an exact
    * version, order-independent. The separators are load-bearing for
    * the PURGE path (Purge's CacheEntries arm parses `qid|dir@vN,…`
    * to find entries derived from an erased table), so the format is
    * enforced here: a '|' in the query id or a '|'/',' in a dir would
    * make the parse ambiguous and could hide an entry from erasure. */
  def fingerprint(queryId: String, inputs: Seq[(String, Int)]): String = {
    require(!queryId.contains('|'),
      s"result-cache queryId must not contain '|': $queryId")
    inputs.foreach { case (d, _) =>
      require(!d.contains('|') && !d.contains(','),
        s"result-cache input dir must not contain '|' or ',': $d")
    }
    queryId + "|" +
      inputs.sortBy(_._1).map { case (d, v) => s"$d@v$v" }.mkString(",")
  }

  /** Serve a committed result for the same fingerprint if one exists
    * (metadata-only decision); otherwise run `compute`, commit it
    * under the fingerprint, and serve the committed copy (one uniform
    * read path — the miss also proves the round-trip). Returns
    * (result, cacheHit). */
  def getOrCompute(spark: SparkSession, cacheDir: String, queryId: String,
                   inputs: Seq[(String, Int)],
                   compute: => DataFrame): (DataFrame, Boolean) = {
    val fp = fingerprint(queryId, inputs)
    Snapshots.findKeyed(spark, cacheDir, fp) match {
      case Some(v) => (Snapshots.read(spark, cacheDir, Some(v)), true)
      case None =>
        val v = Snapshots.commitKeyed(compute, cacheDir, fp)
        (Snapshots.read(spark, cacheDir, Some(v)), false)
    }
  }

  /** [[getOrCompute]] with the version pin taken HERE, exactly once:
    * each input's latest published version is resolved a single time,
    * and those SAME versions key the fingerprint AND feed `compute`
    * (as version-pinned frames, immutable by the snapshot contract) —
    * carried through to the entry commit. An input commit racing the
    * materialization can therefore neither change what is computed
    * nor key the result to a version it was not computed from: the
    * racer's new version simply makes the NEXT lookup miss, and this
    * entry stays a correctly old-keyed hit (ResultCacheSpec
    * interleaves a commit inside `compute` to prove all three).
    * Returns (result, cacheHit, the pinned versions). */
  def getOrComputeLatest(spark: SparkSession, cacheDir: String, queryId: String,
                         inputDirs: Seq[String])
                        (compute: Seq[DataFrame] => DataFrame)
      : (DataFrame, Boolean, Seq[(String, Int)]) = {
    val pinned = inputDirs.map(d => d -> Snapshots.versions(spark, d).last)
    val frames = pinned.map { case (d, v) => Snapshots.read(spark, d, Some(v)) }
    val (df, hit) = getOrCompute(spark, cacheDir, queryId, pinned, compute(frames))
    (df, hit, pinned)
  }
}
