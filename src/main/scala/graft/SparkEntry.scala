package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query groups (full inventory in SURVEY.md §2.13 / COVERAGE.md):
  *  - RelationalQ (q1–q20, q30, q32, q34): SURVEY.md §2.1–2.8
  *    relational inventory + window analytics (lead/lag/ntile,
  *    distribution ranks, value-based RANGE frames)
  *  - VectorQ (v1–v32): §2.9 vector ops + ANN (brute-force, IVF,
  *    learned-centroid IVF, LSH, product + scalar quantization,
  *    composed IVF-PQ, class centroids, feature standardization,
  *    truncated-prefilter rerank, recall@k evaluation, MMR
  *    re-ranking, radius search, incremental index append, v22
  *    filtered search with the pre-/post-filter recall trap
  *    quantified, v23 hybrid BM25⊕cosine reciprocal-rank fusion,
  *    v24 persisted vector index — IVF committed as lakehouse
  *    tables in one transaction, searched by a cold process —
  *    and v25 index drift monitoring: the metadata-sized
  *    retrain trigger over batch-vs-stored cluster shares)
  *  - DedupQ (d1–d14, x14): dedup suite (exact, Jaccard, MinHash,
  *    SimHash, Hamming pairs, embedding, clustering, edit distance,
  *    exact + fuzzy decontamination, n-gram containment,
  *    canonical selection, perceptual-hash image dedup,
  *    incremental batch-vs-corpus dedup, duplicated-span detection)
  *  - TextQ (t1–t26, m1–m3, s1, q28, q31): text analysis, sampling,
  *    boilerplate removal, perplexity scoring, vocabulary coverage,
  *    DSIR weights, Gopher rules, profiling, CCNet buckets, grouping
  *    sets, NFC normalization, multimodal (binary metadata, decode +
  *    frame sampling, frame-overlap dedup), windowed events
  *  - KgQ (k1–k24): chunker / knowledge-graph pipeline + flagship
  *    search + graph analytics (2-hop, PageRank, personalized
  *    PageRank, triangles, clustering coefficients,
  *    label-propagation communities, connected components,
  *    (p,q)-core peeling, node similarity, BFS shortest paths,
  *    co-occurrence lift, seed-set harmonic closeness, effective
  *    diameter via the sampled neighborhood function) +
  *    skew-capped edge generation
  *  - ExtQ (j5, p6, s2–s8, q21–q27, q29, q33, x1–x60, v6, v14, v21):
  *    §2.5–2.13
  *    extensions (sketches, range/as-of joins, packing, merge, SCD-2,
  *    incremental aggregation, exact k-means, semantic dedup, funnel,
  *    z-order layout, compaction planning + execution (x26: the plan
  *    materialized as a partitioned snapshot commit), retention,
  *    snapshot diff, salted join, copy-on-write time travel, the
  *    x25 composed lakehouse pipeline: x14 admission + v20 vector
  *    append + x24 snapshot commit in one declared query, x27
  *    deletion-vector merge-on-read deletes, x28 dynamic partition
  *    overwrite — both with listing-checked immutability flags —
  *    x29 vacuum retention, x30 CDC apply with a checked round-trip,
  *    x31 additive schema evolution with aligned historic reads,
  *    x32 write-audit-publish with staged commits, x33 log-native
  *    change feed, x34 per-column table statistics (ANALYZE),
  *    x35 incremental join-view maintenance (delta-join), x36
  *    sketch-mode ANALYZE (one-scan HLL NDV with a 3σ envelope),
  *    x37 stats-driven broadcast planning (the ANALYZE→planner
  *    loop, the decision hash-pinned in the output), x38 Bloom
  *    runtime-filter join (dim-bounded sketch prunes the fact
  *    before the exchange), x39 k-anonymity audit, x40 skew-planned
  *    join, x41 incremental (mergeable) ANALYZE, x42 catalog-pruned
  *    scans, x43 stats-ordered star join, x44 zero-copy clone, x45
  *    multi-table atomic transactions (one decision marker = the
  *    cross-table commit point), x46 version-keyed result cache
  *    (metadata-only hit/miss, free invalidation), x47 constrained
  *    commit (CHECK constraints + atomic quarantine), x48 partition
  *    evolution (per-version layout, pruning on the evolved key),
  *    x49 log checkpointing (one-file rollup, O(Δ) log reads),
  *    x50 right-to-be-forgotten purge (physical history rewrite),
  *    x51 general MERGE INTO (four arms, one OCC commit), x52
  *    z-order layout executed (rank-sliced snapshot + zone-map
  *    skipping), x53 histogram-planned filter join (equi-depth
  *    BETWEEN selectivity), x54 SQL-surface time travel
  *    (snapshot_at bindings), x55 incremental z-order maintenance
  *    (append kind + dataChange=false OPTIMIZE re-land), x56
  *    SQL-surface change feed (table_changes bindings), x57
  *    catalog-driven deterministic range partitioner, x58
  *    merge-on-read MERGE (staged DV + atomic append publish),
  *    x59 catalog-driven shuffle sizing (metadata-only), x60
  *    expectations-gated MERGE (quality gate + quarantine under
  *    one txn marker), q33
  *    correlated EXISTS, s7
  *    at-least-once delivery dedup, and v21 cluster-blocked kNN
  *    self-join at a corpus-derived cluster count)
  *  - SqlDmlQ (x82–x92, x95, x98, x109, x119, x122, x123): the SQL
  *    statement surface — MERGE
  *    INTO / DELETE / UPDATE / OPTIMIZE [ZORDER] / CTAS+INSERT /
  *    table_files / PURGE / transactions / ALTER TABLE / masking
  *    policies / branch DDL, each verb routed through the existing
  *    operators and hash-matching a Scala-API oracle (x82→x51,
  *    x83→x27, x92→x31, x98→x96's shape)
  *  - LakehouseQ adds x91 (OCC conflict commutation), x93
  *    (auto-OPTIMIZE on commit), x94 (dynamic partition pruning),
  *    x96 (branches/tags over the snapshot log), x118 (position-
  *    aware CDC apply — the keyless feed's D halves), x120 (row-axis
  *    feed throttling under a (version, offset) cursor); SqlDmlQ
  *    adds x119 (column defaults / generated columns as metadata);
  *    ExtQ adds s9 (stream-stream FULL OUTER interval join's batch
  *    twin); MvQ adds x97 (log-driven MV maintenance with delete
  *    retraction); VectorQ adds v30–v32 (graph ANN: NN-descent
  *    build + beam walk, the persisted/incremental lifecycle, and
  *    the DiskANN-style PQ-priced walk with exact re-rank) and v38
  *    (the HNSW layer hierarchy with hash-derived levels and greedy
  *    descent)
  *
  * Every entry has a DuckDB oracle twin in `oracleSql` with identical
  * column names/types and a deterministic total ORDER BY. The four
  * approximate operators (v6, x1, x4, x5) publish bound-checking
  * envelopes — exact oracle-computable quantities plus literal-true
  * verdict booleans — so they hash-check too (the estimate itself
  * never reaches the compared output). (v8/v9 train their ANN models
  * with the decimal-exact variants and carry full hash oracles since
  * round 4.)
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("k7_search_chunks")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQ.defs ++ VectorQ.defs ++ DedupQ.defs ++ TextQ.defs ++
      KgQ.defs ++ ExtQ.defs ++ LakehouseQ.defs ++ StatsQ.defs ++
      MvQ.defs ++ SqlDmlQ.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQ.oracles ++ VectorQ.oracles ++ DedupQ.oracles ++ TextQ.oracles ++
      KgQ.oracles ++ ExtQ.oracles ++ LakehouseQ.oracles ++ StatsQ.oracles ++
      MvQ.oracles ++ SqlDmlQ.oracles
}
