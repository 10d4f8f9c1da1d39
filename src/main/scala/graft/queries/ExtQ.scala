package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Lineage.CutOps
import graft.Tables
import graft.functions.VectorAgg
import graft.ops.VectorOps

/** Coverage-completing + scale-extension queries:
  *  - j5: zip-join of parallel arrays (SURVEY.md §2.3 J5,
  *    reference data/ingestion.py:195)
  *  - p6: error-row skip via PERMISSIVE JSON parsing (§2.2 P6,
  *    reference agent.py:107-119 try/except-continue)
  *  - x1: approx_count_distinct — the §7.2 scale path for A2 (no
  *    oracle: approximation algorithms differ across engines; the
  *    driver records a rows-only check)
  *  - v6: IVF k-NN with single-pass VectorSumAgg centroids (no
  *    oracle: float-sum centroids are partition-order dependent;
  *    correctness vs the exact v5 path is covered by VectorAggSpec)
  */
object ExtQ {

  /** x9 range join: attribution-window length (seconds; also the
    * time-bucket width, so every interval spans ≤ 2 buckets) and the
    * purchase-value floor that opens a window. */
  val RangeWindowSec = 900
  val RangeValueMin = 100.0

  /** x11 exact k-means: cluster count and assignment passes (updates
    * run between passes; see KMeans.fitExact). */
  val KmK = 4
  val KmPasses = 3

  /** v14 SemDeDup cosine threshold (same family as DedupQ.CosineMin). */
  val SemTau = 0.35

  /** x36 sketch-mode ANALYZE: HyperLogLog++ relative standard
    * deviation; the hash-pinned envelope allows 3·rsd (3σ). */
  val X36Rsd = 0.02

  /** Columns x36 profiles (both modes). */
  val X36Cols = Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")

  /** x36's PRODUCTION mode — the plan the operator exists for at
    * 100 TB: EVERY column's NDV sketch from ONE corpus scan (C
    * fixed-size HLL buffers updated side by side, merged map-side, C
    * rows out) and NOTHING else — no exact-NDV envelope legs, which
    * each pay x34's per-column value-cardinality shuffle and exist
    * only so the declared audit-mode query can hash-pin the 3σ bound.
    * Audit mode (`x36_table_stats_hll` in [[queries]]) = this sketch
    * pass joined to the exact legs with the envelope verdict;
    * production mode = this DataFrame alone. PlanShapeSpec pins the
    * production plan at exactly one scan with no Expand/exact
    * distinct; [[graft.Bench]] times it as `x36_prod_only_sec` so the
    * mode split is a measurement, not prose. */
  def x36SketchOnly(s: SparkSession, d: String): DataFrame = {
    val li = Tables.load(s, d, "lineitem")
    li.agg(
        approx_count_distinct(col(X36Cols.head), X36Rsd).as(X36Cols.head),
        X36Cols.tail.map(c => approx_count_distinct(col(c), X36Rsd).as(c)): _*)
      .select(explode(map(X36Cols.flatMap(c => Seq(lit(c), col(c))): _*))
        .as(Seq("col_name", "ndv_est")))
  }

  /** x39: minimum equivalence-class size for k-anonymity. */
  val KAnonK = 10L

  /** x41 incremental ANALYZE: DataSketches-HLL log2(registers) and
    * the matching relative standard deviation (1.04/√2^lgK); the
    * hash-pinned envelope allows 3·rsd with a small absolute floor
    * (sketches are exact at tiny cardinalities, the floor only
    * guards the envelope arithmetic itself). */
  val X41LgK = 12
  val X41Rsd = 1.04 / math.sqrt(1 << X41LgK)

  /** x42 catalog-pruned probes: one range inside the profiled
    * o_totalprice domain, one provably above it at every SF. */
  val X42InLo = 1000.0
  val X42InHi = 2000.0
  val X42OutLo = 9000000.0
  val X42OutHi = 9900000.0

  /** x53 probes on the o_totalprice domain (near-uniform on
    * [1e3, 5e5] at every SF): the narrow slice holds ~4% of orders
    * (histogram estimate 0/16), the wide one ~56% (~9/16) — both
    * sit > 2 equi-depth buckets from [[X53MaxSixteenths]], so the
    * ±1-bucket-per-end histogram envelope cannot flip either
    * decision (Analyze.histSelectivity16's soundness line). */
  val X53NarrowLo = 1000.0
  val X53NarrowHi = 20000.0
  val X53WideLo = 20000.0
  val X53WideHi = 300000.0
  val X53MaxSixteenths = 4

  /** x59 shuffle sizing: bytes per target shuffle partition at
    * fixture scale (stands in for the production ~128 MiB) and the
    * partition-count ceiling (task-overhead guard). */
  val X59TargetBytes = 1L << 20
  val X59MaxParts = 64

  /** x60 admission constraint: a restated balance above this is a
    * suspicious restatement — quarantined for audit, never merged.
    * Sits inside the o_totalprice domain so real violations exist at
    * every SF (the domain tops out near 555k). */
  val X60MaxBal = 400000.0

  /** x51 merge arms: the account-closure line (a restated balance
    * below it deletes the row; it also gates the insert arm so the
    * insert CONDITION is exercised, not just the arm) and the key
    * shift that makes branch-account rows provably unmatched
    * (custkeys stay far below it at every SF — x30's maxKey move). */
  val X51CloseBelow = 30000.0
  val X51KeyShift = 1000000L

  /** v21 kNN self-join: neighbors kept per vector. */
  val KnnJoinK = 3

  /** v21's blocking-cluster sizing: target rows per k-means cluster.
    * The cluster count is DERIVED from the corpus size
    * ([[knnJoinClusters]]) so within-cluster candidate pairs stay
    * ~n·[[KnnBlockRows]] — linear — instead of the n²/k a fixed k
    * degenerates to (d14's count-based-switch precedent applied to
    * kNN-join blocking; the r7 smoke measured 50.07M pairs at 10×
    * under fixed k vs 5.06M with k scaled). */
  val KnnBlockRows = 125L

  /** x47's CHECK constraints: the length floor a real corpus gate
    * enforces (~30% of the fixture quarantines) and the known-language
    * allowlist (all-passing on the fixture — a gate that never fires
    * must still hash-replay). */
  val X47MinChars = 200L
  val X47Langs = Seq("en", "fr", "de", "es", "zh")

  /** Scale-aware cluster count for [[queries]]' v21: `max(KmK,
    * n / KnnBlockRows)` — KmK floors small fixtures (sf0.01 keeps the
    * original k = 4 blocking), integer division matches the oracle's
    * DuckDB `//`. */
  def knnJoinClusters(nVectors: Long): Int =
    math.max(KmK.toLong, nVectors / KnnBlockRows).toInt

  /** v6's showcased plan ALONE — single-pass [[VectorAgg.vectorSum]]
    * centroids (one shuffle of d-length buffers, never an n×d gram
    * explode), broadcast-assigned probe, heap top-k. The declared
    * `v6_knn_ivf_fast` wraps this in the agrees-exact envelope (which
    * runs v5's decimal-exact twin INSIDE the query), so the sweep time
    * of the declared query is dominated by the twin; [[Bench]] times
    * this method separately and reports it as `v6_fast_only_sec`, the
    * number the fast path actually earns. */
  def v6FastPath(s: SparkSession, d: String): DataFrame = {
    VectorOps.ensureRegistered(s)
    VectorAgg.register(s)
    val e = Tables.load(s, d, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"))
    val cvecs = e.groupBy(col("label"))
      .agg(VectorAgg.vectorSum(col("embedding")).as("vs"), count(lit(1)).as("n"))
      .select(col("label").as("clabel"),
        transform(col("vs"), x => x / col("n")).as("cvec"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val wAssign = Window.partitionBy(col("qid")).orderBy(col("craw").desc, col("clabel"))
    val assigned = q.crossJoin(broadcast(cvecs))
      .withColumn("craw", VectorOps.dot(col("qe").cast("array<double>"), col("cvec")))
      .withColumn("crn", row_number().over(wAssign))
      .filter(col("crn") === 1)
      .select(col("qid"), col("qe"), col("clabel"))
    // heap-select the 3 best neighbors per query (graft.plans.TopK,
    // no per-query sort), then rank the ≤3 survivors with a window.
    val probed = assigned.join(e,
        col("label") === col("clabel") && col("vec_id") =!= col("qid"))
      .withColumn("raw", VectorOps.dot(col("qe"), col("embedding")))
    val top = graft.plans.TopK.perKey(probed, Seq("qid"),
      Seq(col("raw").desc, col("vec_id")), 3)
    val wRank = Window.partitionBy(col("qid")).orderBy(col("raw").desc, col("vec_id"))
    top.withColumn("nb_rank", row_number().over(wRank))
      .select(col("qid"), col("clabel").as("probe_label"), col("vec_id").as("nb_id"),
        col("nb_rank"), round(col("raw"), 4).as("score"))
  }

  /** x5 envelope: the float trainer's final inertia must sit within
    * this relative tolerance of the decimal-exact objective (x11's
    * path). Measured drift ≤ 0.0024 across all three fixture SFs. */
  val InertiaRelTol = 0.01

  /** x4 envelope half-width: 4 × (1/accuracy) with accuracy = 1000 —
    * the SINGLE source for both the Spark bounds and the oracle's
    * quantile_cont probe points (interpolated below), so the two
    * sides can never drift apart. */
  val QuantEps = 0.004

  /** x10 heavy hitters: report terms with frequency > n/[[HhDen]]
    * (exact), found via a Misra–Gries sketch of capacity [[HhK]].
    * The guarantee needs HhK ≥ HhDen (summary error ≤ n/(HhK+1) <
    * threshold n/HhDen, so no true heavy hitter can be evicted). */
  /** x16 training-shard count — tiny at fixture scale; at 100 TB the
    * same round-robin over the global rank yields any shard count
    * without replanning. */
  val ShufShards = 8

  val HhK = 400
  val HhDen = 200

  val defs: Map[String, Q] = Map(
    // j5 — arrays_zip + posexplode: pair parallel arrays positionally.
    "j5_zip_arrays" -> ((s, d) => {
      Tables.load(s, d, "documents")
        .withColumn("words", graft.ops.TextFns.tokens(col("text")))
        .withColumn("lens", transform(col("words"), w => length(w)))
        .select(col("doc_id"),
          posexplode(arrays_zip(col("words"), col("lens"))).as(Seq("pos", "z")))
        .select(col("doc_id"), (col("pos") + 1).as("ord"),
          col("z.words").as("word"), col("z.lens").as("wlen"))
        .orderBy(col("doc_id"), col("ord"))
    }),

    // p6 — PERMISSIVE parse: malformed rows yield null and are
    // skipped, valid rows aggregate (the reference's per-row
    // try/except continue made declarative).
    "p6_error_skip" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
        .withColumn("j",
          when(col("event_id") % 7 === 0, substring(col("props"), 2, 1000))
            .otherwise(col("props")))
        .withColumn("parsed", from_json(col("j"), "map<string,int>",
          Map.empty[String, String]))
      ev.agg(
        sum(when(col("parsed").isNull, 1).otherwise(0)).cast("long").as("n_bad"),
        sum(when(col("parsed").isNotNull, 1).otherwise(0)).cast("long").as("n_ok"),
        sum(col("parsed").getItem("k")).cast("long").as("sum_k"))
    }),

    // x1 — HLL++ distinct estimate next to the exact count (scale
    // path for A2: one pass, constant memory, mergeable sketches).
    // DuckDB can't replay the sketch, so the estimate itself never
    // reaches the compared output; instead `approx_ok` pins that it
    // landed inside 3×rsd of the exact count — which IS
    // oracle-computable (the oracle emits literal true). Measured
    // error at sf0.01/sf0.1 is <1.5%, so the 6% envelope has margin
    // while still failing on any real sketch regression.
    "x1_approx_distinct" -> ((s, d) => {
      Tables.load(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          count(lit(1)).as("n_rows"))
        .select(col("l_returnflag"), col("exact_parts"), col("n_rows"),
          (abs(col("approx_parts") - col("exact_parts")) <=
            col("exact_parts") * 0.06).as("approx_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // x13 — SALTED two-phase aggregation (ops.Skew.saltedCount) on a
    // deliberately hot key: l_returnflag has 3 values over the whole
    // fact table, so a plain groupBy funnels a third of the corpus
    // into each of 3 reducers. The salt (deterministic hash of the
    // tie-break column, never random — retries stay reproducible)
    // spreads each hot key over `shards` partial aggregations; the
    // final combine touches keys × shards rows. The oracle is the
    // plain COUNT the two-phase plan must reproduce exactly.
    "x13_salted_count" -> ((s, d) => {
      graft.ops.Skew.saltedCount(
          Tables.load(s, d, "lineitem"), "l_returnflag",
          shards = 32, tieBreak = "l_orderkey")
        .orderBy(col("l_returnflag"))
    }),

    // x4 — approximate quantiles: the mergeable-sketch scale path for
    // q21's exact percentiles (same trade as x1's HLL for exact
    // distinct): one pass, bounded memory per group, partials merge
    // associatively. DuckDB can't replay the GK sketch, so the
    // estimates never reach the compared output; instead the query
    // emits the sketch's DEFINED rank-error envelope — exact
    // interpolated percentiles at p ± 4/accuracy (conservative cover
    // of the ±1/accuracy rank guarantee; quantile_cont parity with
    // DuckDB is already proven by q21) — and booleans pinning the
    // estimates inside it. Tighter per-value behavior is pinned by
    // ApproxQuantileSpec.
    "x4_approx_quantiles" -> ((s, d) => {
      val eps = QuantEps // 4 × (1/accuracy); accuracy = 1000 below
      Tables.load(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          approx_percentile(col("l_quantity"), lit(0.5), lit(1000)).as("am"),
          approx_percentile(col("l_quantity"), lit(0.9), lit(1000)).as("a90"),
          percentile(col("l_quantity"), lit(0.5 - eps)).as("median_lo"),
          percentile(col("l_quantity"), lit(0.5 + eps)).as("median_hi"),
          percentile(col("l_quantity"), lit(0.9 - eps)).as("p90_lo"),
          percentile(col("l_quantity"), lit(0.9 + eps)).as("p90_hi"),
          count(lit(1)).as("n_rows"))
        .select(col("l_returnflag"),
          col("median_lo"), col("median_hi"),
          col("am").between(col("median_lo"), col("median_hi")).as("median_ok"),
          col("p90_lo"), col("p90_hi"),
          col("a90").between(col("p90_lo"), col("p90_hi")).as("p90_ok"),
          col("n_rows"))
        .orderBy(col("l_returnflag"))
    }),

    // x5 — k-means clustering of the embedding corpus (ops.KMeans:
    // deterministic Lloyd's, k-smallest-ids seeding, TopK-heap
    // assignment, VectorSumAgg centroid updates). Float centroid
    // iterations aren't cross-engine reproducible, so the trained
    // assignment never reaches the compared output; instead the query
    // emits the BOUND-CHECKING envelope (x1/x4 pattern): the exact
    // Lloyd's objective from the decimal-exact twin (x11's path —
    // fully oracle-computable as a decimal sum of rounded per-point
    // distances) plus `inertia_ok`, pinning the float trainer's final
    // inertia within [[InertiaRelTol]] of the exact objective.
    // Measured |ratio−1| ≤ 0.0024 across sf0.001/0.01/0.1; the 1%
    // envelope has 4× margin yet fails on any real trainer regression
    // (lost pass, wrong assignment, buffer merge bug — each moves
    // inertia by percents). Per-assignment optimality/determinism
    // stays pinned by KMeansSpec. Runs training jobs at DataFrame
    // construction (iterative), like d6.
    "x5_kmeans" -> ((s, d) => {
      val vecs = Tables.load(s, d, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val (_, assign) = graft.ops.KMeans.fit(vecs, "vec_id", "embedding",
        k = KmK, maxIters = KmPasses)
      val fastAgg = assign.agg(
        sum(col("sq_dist")).as("fast_inertia"))
      val exactAgg = graft.ops.KMeans.fitExact(vecs, "vec_id", "embedding",
          k = KmK, assignPasses = KmPasses)
        .agg(count(lit(1)).as("n_points"),
          sum(round(col("sq_dist"), 4).cast("decimal(28,4)"))
            .cast("double").as("exact_inertia"))
      exactAgg.crossJoin(broadcast(fastAgg))
        .select(lit(KmK).as("k"), col("n_points"), col("exact_inertia"),
          (abs(col("fast_inertia") / col("exact_inertia") - 1) <=
            lit(InertiaRelTol)).as("inertia_ok"))
    }),

    // x12 — INCREMENTAL AGGREGATE MAINTENANCE: fold the "new" batch
    // (1997+) into aggregate state built from history (pre-1997) and
    // read the merged state — proving merge(state(A), state(B)) ==
    // state(A ∪ B), which the oracle states as the plain one-shot
    // aggregate over everything. At scale the nightly cost is
    // O(batch) + a key-cardinality combine, never a history rescan.
    // avg derives from sum÷count at read time (single division, both
    // engines), sums in decimal so the merge order can't matter.
    "x12_incremental_agg" -> ((s, d) => {
      import graft.ops.IncrementalAgg
      val orders = Tables.load(s, d, "orders")
      val cut = lit("1997-01-01").cast("timestamp")
      val hist = IncrementalAgg.state(
        orders.filter(col("o_orderdate") < cut), "o_custkey", "o_totalprice")
      val batch = IncrementalAgg.state(
        orders.filter(col("o_orderdate") >= cut), "o_custkey", "o_totalprice")
      IncrementalAgg.merge(hist, batch, "o_custkey")
        // avg stays the RAW double quotient: the decimal sum and the
        // count are engine-identical, so the single IEEE division is
        // bit-exact — while round(…,4) would sit on a half-way edge
        // whenever an exact 2-decimal sum divides to a 5th-decimal 5
        // (Spark rounds the shortest decimal repr, DuckDB the binary
        // value, and they disagree there).
        .select(col("o_custkey"), col("n"),
          col("sum_v").cast("double").as("sum_spend"),
          (col("sum_v").cast("double") / col("n")).as("avg_spend"),
          col("min_v").as("min_spend"), col("max_v").as("max_spend"))
        .orderBy(col("o_custkey"))
    }),

    // x11 — ORACLE-EXACT k-means: the same Lloyd's loop as x5, but
    // with decimal-explode centroid means (bit-identical on any
    // engine/partitioning), so the flagship ML operator carries a
    // full hash-checked oracle — the DuckDB side unrolls the 3
    // assignment passes as a CTE chain, k11-style. x5 remains the
    // d-length-buffer scale path. Runs training jobs at construction.
    "x11_kmeans_exact" -> ((s, d) => {
      val vecs = Tables.load(s, d, "embeddings")
        .select(col("vec_id"), col("embedding"))
      graft.ops.KMeans.fitExact(vecs, "vec_id", "embedding",
          k = KmK, assignPasses = KmPasses)
        .select(col("vec_id"), col("cluster_id"),
          round(col("sq_dist"), 4).as("sq_dist"))
        .orderBy(col("vec_id"))
    }),

    // s2 — gap-based sessionization, batch form (streaming twin with
    // flatMapGroupsWithState state+timeout lives in
    // graft.streaming.Sessionize; parity covered by SessionizeSpec).
    "s2_sessionize" -> ((s, d) => {
      graft.streaming.Sessionize.sessionsBatch(
        Tables.load(s, d, "events"), gapSeconds = 900)
        .orderBy(col("user_id"), col("session_start"))
    }),

    // s3 — the stream-stream INTERVAL JOIN's batch twin, oracle-
    // checked: purchases joined to the same user's views from the
    // preceding hour. The exact operator streaming runs with
    // watermark-evictable state (StreamingSpec parity) — here the
    // driver's hash gate pins its semantics. Keyed by user, so the
    // join is a plain shuffle-partitionable equi join with a time
    // band, no binning needed (contrast keyless x9).
    "s3_interval_join" -> ((s, d) => {
      graft.streaming.EventStream.purchaseViewJoin(Tables.load(s, d, "events"))
        .orderBy(col("p_id"), col("v_id"))
    }),

    // s8 — the LEFT-OUTER stream-stream interval join's batch twin:
    // every purchase emits, null view columns for purchases with no
    // prior-hour view. The outer semantics are the streaming-hard
    // part (null rows may only emit once the watermark proves no
    // future match — EventStream.purchaseViewOuterJoin, parity in
    // StreamingSpec); the batch twin is what the driver's hash gate
    // can pin. Same user-keyed shuffle-partitionable shape as s3.
    "s8_outer_interval_join" -> ((s, d) => {
      graft.streaming.EventStream.purchaseViewOuterJoin(
          Tables.load(s, d, "events"))
        .orderBy(col("p_id"), col("v_id"))
    }),

    // q21 — exact interpolated percentiles per group (sort-based, so
    // engine-order independent; matches DuckDB quantile_cont) behind
    // the BOUNDED-MEMORY switchover (ops.Percentiles): a count-only
    // pre-pass sizes the largest group, exact percentiles run only
    // while that fits one aggregation buffer, and past the bound the
    // query degrades to the x4 mergeable sketch instead of OOMing an
    // executor. The mode is the visible `exact` column — the oracle
    // pins that the exact path was taken at this SF.
    "q21_percentiles" -> ((s, d) => {
      graft.ops.Percentiles.grouped(
          Tables.load(s, d, "lineitem"), "l_returnflag", "l_quantity",
          Seq("median_qty" -> 0.5, "p90_qty" -> 0.9))
        .orderBy(col("l_returnflag"))
    }),

    // q22 — ROLLUP hierarchy totals (absent from the reference;
    // SURVEY.md §2.4 lists grouping sets as an engine extension).
    "q22_rollup" -> ((s, d) => {
      Tables.load(s, d, "orders")
        .rollup(year(col("o_orderdate")).as("o_year"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          dsum2(col("o_totalprice")).as("sum_price"))
        .orderBy(coalesce(col("o_year"), lit(9999)),
          coalesce(col("o_orderpriority"), lit("~")))
    }),

    // q25 — CUBE: all grouping-set combinations over (year, priority)
    // with grouping_id disambiguating total rows from genuine nulls.
    // Same partial-agg + single-shuffle shape as a plain groupBy; the
    // 2^k set expansion happens map-side.
    "q25_cube" -> ((s, d) => {
      Tables.load(s, d, "orders")
        .cube(year(col("o_orderdate")).as("o_year"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          dsum2(col("o_totalprice")).as("sum_price"),
          grouping_id().cast("int").as("gid"))
        .orderBy(col("gid"), coalesce(col("o_year"), lit(9999)),
          coalesce(col("o_orderpriority"), lit("~")))
    }),

    // q23 — scalar subquery: decimal-exact global average as the
    // broadcast threshold.
    "q23_scalar_subquery" -> ((s, d) => {
      val o = Tables.load(s, d, "orders")
      val t = o.agg((sum(col("o_totalprice").cast("decimal(18,2)")).cast("double") /
        count(lit(1))).as("avgp"))
      o.crossJoin(broadcast(t))
        .filter(col("o_totalprice") > col("avgp") * 1.5)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // q24 — correlated EXISTS over a date window (TPC-H Q4 shape):
    // order-priority distribution of orders with any line shipped
    // after the order date. Left-semi join, dims grouped after.
    "q24_order_priority_check" -> ((s, d) => {
      val ord = Tables.load(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      val late = Tables.load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      ord.join(late,
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // x3 — top-k per key via the CUSTOM OPERATOR (graft.plans.TopK:
    // LogicalPlan + Strategy + SparkPlan with bounded per-key heaps,
    // O(n log k) and k-row state instead of the window form's full
    // per-group sort). Oracle = the row_number window definition.
    "x3_topk_per_key" -> ((s, d) => {
      graft.plans.TopK.perKey(
          Tables.load(s, d, "events")
            .select(col("event_id"), col("user_id"), col("value")),
          Seq("user_id"), Seq(col("value").desc, col("event_id")), 3)
        .orderBy(col("user_id"), col("value").desc, col("event_id"))
    }),

    // x2 — backward AS-OF join (graft.ops.AsofJoin): attribute every
    // purchase event to the user's most recent view event at or
    // before it — the classic time-series attribution join. Views are
    // pre-deduped per (user, ts) with max_by so "latest" is unique
    // (the same determinism contract DuckDB's ASOF has). One shuffle
    // per side + one window sweep; no range-join blowup.
    "x2_asof_attrib" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id").as("v_user"), col("ts").as("v_ts"))
        .agg(max(col("event_id")).as("v_event_id"),
          max_by(col("value"), col("event_id")).as("v_value"))
      graft.ops.AsofJoin.backward(purchases, views,
          "user_id", "v_user", "ts", "v_ts",
          Seq("v_event_id", "v_ts", "v_value"), "m")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("m.v_event_id").as("view_event_id"),
          col("m.v_ts").as("view_ts"),
          col("m.v_value").as("view_value"),
          (unix_micros(col("ts")) - unix_micros(col("m.v_ts"))).as("lag_us"))
        .orderBy(col("event_id"))
    }),

    // x6 — the training-data CLEANING PIPELINE as ONE declarative
    // plan: quality gate (token count + max word length) → exact
    // dedup (first-wins per md5) → deterministic train/val/test split
    // (t6's salted hash buckets) → per-(split, lang) corpus summary.
    // This is the composition story: each stage is an operator the
    // suite already checks in isolation (t2/d1/t6); composed, Catalyst
    // still plans it as scans + two shuffles (dedup key, summary key)
    // with every filter pushed below the joins — no materialization
    // between stages, which at 100 TB is the difference between one
    // pass and four.
    "x6_clean_pipeline" -> ((s, d) => {
      import graft.ops.TextFns
      val toks = TextFns.tokens(col("text"))
      val filtered = Tables.load(s, d, "documents")
        .withColumn("n_words", size(toks))
        .withColumn("max_wlen", array_max(transform(toks, t => length(t))))
        .filter(col("n_words").between(30, 5000) && col("max_wlen") <= 50)
        .withColumn("k", md5(col("text")))
      // keepers = the min doc_id of every md5 group; a doc survives
      // dedup iff its own id is a keeper id (ids are unique), so the
      // semi join needs only doc_id — no ambiguous self-join on k.
      val keepers = filtered.groupBy(col("k"))
        .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
      val deduped = filtered.join(keepers, Seq("doc_id"), "left_semi")
      val bucket = TextFns.hash60(concat(lit("split|"), col("doc_id").cast("string"))) % 100
      deduped
        .withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).cast("long").as("total_tokens"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy(col("split"), col("lang"))
    }),

    // x7 — sequence PACKING: assign documents to fixed token-budget
    // packs (the batch-assembly step before pretraining). Docs are
    // concatenated in deterministic order and a doc belongs to the
    // pack where its first token lands. Packing runs within
    // (lang, shard) where shard is a salted hash of doc_id — real
    // pipelines pack per shard precisely so that NO global (or even
    // per-language) ordered cumsum exists: every window partition is
    // bounded by corpus_size / n_shards, and n_shards scales with the
    // data (8 here; ~1 shard per executor-sized slice at 100 TB).
    // Output is still a pure function of the data, independent of
    // cluster partitioning.
    "x7_pack_sequences" -> ((s, d) => {
      import graft.ops.TextFns
      val budget = 2048
      val shard = (TextFns.hash60(concat(lit("pack|"), col("doc_id").cast("string"))) % 8)
        .cast("int")
      val w = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          TextFns.wordCount(col("text")).as("n_tokens"), shard.as("shard"))
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .withColumn("pack_id",
          floor((col("cum") - col("n_tokens")) / budget).cast("int"))
        .groupBy(col("lang"), col("shard"), col("pack_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("pack_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("lang"), col("shard"), col("pack_id"))
    }),

    // x8 — SCD-1 MERGE (ops.Merge): apply a latest-wins changeset to
    // the customer snapshot in one shuffle (union + max_by per key —
    // no window over the 100 TB side, no sort). The changeset is
    // CDC-shaped from orders: each customer's latest 1997+ order
    // updates their balance; cheap latest orders (< 30k) are account
    // closures (deletes).
    "x8_merge_upsert" -> ((s, d) => {
      import graft.ops.Merge
      val snapshot = Tables.load(s, d, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      val wl = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      val changes = Tables.load(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
        .withColumn("rn", row_number().over(wl))
        .filter(col("rn") === 1)
        .join(snapshot.select(col("c_custkey"), col("c_name")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"),
          col("o_totalprice").as("c_acctbal"),
          when(col("o_totalprice") < 30000, "D").otherwise("U").as("op"))
      Merge.upsert(snapshot, changes, "c_custkey")
        .select(col("c_custkey"), col("c_name"),
          round(col("c_acctbal"), 2).as("c_acctbal"))
        .orderBy(col("c_custkey"))
    }),

    // x9 — POINT-IN-INTERVAL RANGE JOIN (no equi key): attribute
    // click events to the 15-minute windows opened by high-value
    // purchases. The naive plan is a cross join with a BETWEEN
    // filter — O(n·m) and a BroadcastNestedLoopJoin at any scale.
    // Bucketizing time into window-length buckets turns it into an
    // EQUI join: each interval covers at most 2 buckets (exploded),
    // each event has exactly 1, so candidates are only co-bucketed
    // pairs and the exact BETWEEN cut runs on those. Pair volume is
    // O(events_per_bucket · windows_per_bucket) per bucket — the
    // standard range-join binning that survives 100 TB, with the
    // bucket width tied to the interval length so the expansion
    // factor stays ≤ 2.
    "x9_range_join" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
      val iv = ev.filter(col("event_type") === "purchase" &&
          col("value") >= RangeValueMin)
        .select(col("event_id").as("window_id"), col("ts").as("w_start"),
          (col("ts") + expr(s"INTERVAL $RangeWindowSec SECONDS")).as("w_end"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.ops.RangeJoin.pointInInterval(clicks, iv,
          "ts", "w_start", "w_end", RangeWindowSec)
        .select(col("window_id"), col("event_id"), col("user_id"))
        .orderBy(col("window_id"), col("event_id"))
    }),

    // x10 — EXACT heavy hitters via the two-pass sketch plan: pass 1
    // collapses the term stream into one k-counter Misra–Gries
    // summary per partition (constant memory, map-side combine,
    // k-sized shuffle rows — functions/HeavyHittersAgg); pass 2
    // recounts ONLY the ≤ k candidates (broadcast semi-join keeps the
    // filter narrow; the groupBy then aggregates a few dozen terms,
    // not the raw stream) and thresholds on the exact count. The
    // sketch's no-false-negative guarantee (freq > n/(k+1) ⇒ in
    // summary) makes the final answer exact — unlike x1/x4 this
    // sketch query carries a full DuckDB oracle.
    "x10_heavy_hitters" -> ((s, d) => {
      graft.functions.HeavyHittersAgg.register(s)
      val toks = Tables.load(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(explode(graft.ops.TextFns.tokens(col("text"))).as("tok"))
        .select(lower(col("tok")).as("term"))
      // ONE sketch pass carries both the MG summary and the stream
      // length; Derived-persisted (it's a single row) so the candidate
      // explode and the threshold read it without recomputing — the
      // raw term stream is scanned exactly twice: sketch + recount.
      val sketch = Derived.of(s, d, "hh_sketch") {
        toks.agg(
          graft.functions.HeavyHittersAgg.heavyHitters(col("term"), HhK).as("cands"),
          count(lit(1)).as("n_toks"))
      }
      val cand = sketch.select(explode(col("cands")).as("term"))
      val tot = sketch.select(col("n_toks"))
      toks.join(broadcast(cand), Seq("term"), "left_semi")
        .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(tot))
        .filter(col("cnt") * HhDen > col("n_toks"))
        .select(col("term"), col("cnt"))
        .orderBy(col("cnt").desc, col("term"))
    }),

    // x15 — heavy hitters PER GROUP: the same Misra–Gries
    // TypedImperativeAggregate running under groupBy(lang) — one
    // k-counter buffer per (group × partition), merged per group —
    // proving the sketch is a first-class grouped aggregate, not a
    // global-only pass (the per-language frequent-terms shape every
    // corpus report needs). Same two-pass exactness: per-group
    // candidates recounted exactly, thresholded on the group's own
    // stream length.
    "x15_heavy_hitters_grouped" -> ((s, d) => {
      graft.functions.HeavyHittersAgg.register(s)
      val toks = Tables.load(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("lang"),
          explode(graft.ops.TextFns.tokens(col("text"))).as("tok"))
        .select(col("lang"), lower(col("tok")).as("term"))
      val sketch = Derived.of(s, d, "hh_sketch_grouped") {
        toks.groupBy(col("lang")).agg(
          graft.functions.HeavyHittersAgg.heavyHitters(col("term"), HhK).as("cands"),
          count(lit(1)).as("n_toks"))
      }
      val cand = sketch.select(col("lang"), explode(col("cands")).as("term"))
      toks.join(broadcast(cand), Seq("lang", "term"), "left_semi")
        .groupBy(col("lang"), col("term")).agg(count(lit(1)).as("cnt"))
        .join(broadcast(sketch.select(col("lang"), col("n_toks"))), Seq("lang"))
        .filter(col("cnt") * HhDen > col("n_toks"))
        .select(col("lang"), col("term"), col("cnt"))
        .orderBy(col("lang"), col("cnt").desc, col("term"))
    }),

    // x16 — DETERMINISTIC GLOBAL SHUFFLE + SHARD ASSIGNMENT: the
    // "shuffle before training" step. Every doc gets a pseudorandom
    // but reproducible position (rank of hash60("shuf|"+id) in the
    // total order), then round-robin sharding gives N balanced shards
    // whose contents are independent of input partitioning. The
    // global rank comes from GlobalIndexExec (range exchange +
    // Tungsten-row numbering) — NOT a row_number over an
    // unpartitioned window, which would funnel 100 TB through one
    // reducer. The hash is md5-reconstructible, so the oracle
    // replays the exact permutation in SQL.
    "x16_global_shuffle" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"))
        .withColumn("shuffle_key",
          graft.ops.TextFns.hash60(concat(lit("shuf|"), col("doc_id").cast("string"))))
      graft.ops.GlobalIndex
        .withGlobalIndex(docs, Seq(col("shuffle_key"), col("doc_id")), "pos")
        .select(col("doc_id"), col("shuffle_key"),
          (col("pos") % ShufShards).cast("int").as("shard"),
          expr(s"pos div $ShufShards").as("pos_in_shard"))
        .orderBy(col("shard"), col("pos_in_shard"))
    }),

    // x17 — SCD-2 HISTORY MERGE (type-2 slowly-changing dimension):
    // x8 keeps only the latest value; this builds the full validity
    // history a warehouse dimension actually stores — one row per
    // (key, version) with [valid_from, valid_to) intervals and an
    // is_current flag. The change stream is orders-as-CDC (each 1997+
    // order restates the customer's balance). Plan: union snapshot
    // seed + changes, ONE per-key window (row_number + lead) ordered
    // by (valid_from, change_seq). The window's state is bounded by
    // versions-per-key (orders per customer, ~dozens) — per-key
    // history sorts, never a global sort, so the shape is flat at
    // 100 TB: shuffle on the dimension key, sort within key groups.
    "x17_scd2_history" -> ((s, d) => {
      val seed = Tables.load(s, d, "customer")
        .select(col("c_custkey"), col("c_acctbal").as("balance"),
          lit("1996-12-31").cast("timestamp").as("valid_from"),
          lit(-1L).as("chg_seq"))
      val changes = Tables.load(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
        .select(col("o_custkey").as("c_custkey"),
          col("o_totalprice").as("balance"),
          col("o_orderdate").as("valid_from"),
          col("o_orderkey").cast("long").as("chg_seq"))
      val w = Window.partitionBy(col("c_custkey"))
        .orderBy(col("valid_from"), col("chg_seq"))
      seed.unionByName(changes)
        .withColumn("version", row_number().over(w))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
        .select(col("c_custkey"), col("version"),
          round(col("balance"), 2).as("balance"),
          col("valid_from"), col("valid_to"),
          col("valid_to").isNull.cast("int").as("is_current"))
        .orderBy(col("c_custkey"), col("version"))
    }),

    // q29 — the S8 SQL SURFACE end to end: fixture tables registered
    // as views, a multi-statement SQL script (comment line, temp-view
    // statement, final select) run through SqlRunner, and the
    // custom codegen'd graft_dot expression invoked from PURE SQL
    // text — proving the extension functions exist on the SQL
    // surface, not just the Column API. Decimal-exact energy sum
    // (order-independent, see dsum2's rationale).
    "q29_sql_script" -> ((s, d) => {
      VectorOps.ensureRegistered(s)
      graft.Tables.registerAll(s, d)
      val script =
        """-- S8: statements split on ';', '--' comment lines stripped,
          |-- one DataFrame per statement, last result returned.
          |CREATE OR REPLACE TEMPORARY VIEW q29_energy AS
          |SELECT label,
          |  count(*) AS n_vectors,
          |  CAST(sum(CAST(round(graft_dot(embedding, reverse(embedding)), 4)
          |    AS DECIMAL(18,4))) AS DOUBLE) AS energy
          |FROM embeddings
          |GROUP BY label;
          |SELECT label, n_vectors, energy
          |FROM q29_energy
          |ORDER BY label""".stripMargin
      graft.util.SqlRunner.runScript(s, script).last
    }),

    // v6 — IVF with single-pass centroid aggregation: one shuffle of
    // d-length buffers instead of exploding n×d rows (v5's
    // oracle-exact path). Same probe/rank shape as v5.
    //
    // BOUND-CHECKING ORACLE (the x1/x4 envelope pattern): the float-
    // summed centroids can't be replayed in SQL, so the fast path's
    // rows never reach the compared output. Instead the query emits
    // v5's decimal-exact result (fully oracle-computable) plus
    // `agrees_exact` — per-query equality of the fast path's
    // (probe_label, ranked neighbors, rounded scores) against v5's.
    // The identity is not luck: centroid argmax margins measured at
    // sf0.001/0.01/0.1 are ≥ 4e-4 while float-vs-decimal centroid
    // error is ~1e-12 (n·ulp), so the fast path picks the same
    // bucket — and within a bucket both paths score with the SAME
    // exact dot products. A real divergence (agg bug, tie-break
    // drift) flips the boolean → hash mismatch. VectorAggSpec keeps
    // the stronger full-row identity at both fixture scales.
    //
    // BENCH NARRATIVE: since the envelope runs v5's decimal-exact
    // path INSIDE this query, v6's sweep time is dominated by the
    // exact twin + comparison join, not the d-length-buffer fast
    // path it showcases — the fast path's own cost is timed
    // separately by Bench ([[v6FastPath]]) and reported as
    // `v6_fast_only_sec` in the bench JSON.
    "v6_knn_ivf_fast" -> ((s, d) => {
      val fast = v6FastPath(s, d)
      val exact = graft.queries.VectorQ.defs("v5_knn_ivf")(s, d)
      def sig(df: org.apache.spark.sql.DataFrame, label: String, nbs: String) =
        df.groupBy(col("qid")).agg(
          max(col("probe_label")).as(label),
          sort_array(collect_list(struct(col("nb_rank"), col("nb_id"),
            col("score")))).as(nbs))
      val agree = sig(fast, "f_label", "f_nbs")
        .join(sig(exact, "e_label", "e_nbs"), Seq("qid"))
        .select(col("qid"),
          (col("f_label") === col("e_label") &&
            col("f_nbs") === col("e_nbs")).as("agrees_exact"))
      exact.join(agree, Seq("qid"))
        .select(col("qid"), col("probe_label"), col("nb_id"), col("nb_rank"),
          col("score"), col("agrees_exact"))
        .orderBy(col("qid"), col("nb_rank"))
    }),

    // v14 — SEMANTIC DEDUPLICATION (SemDeDup, Abbas et al. 2023):
    // cluster the embedding space with k-means, then search for
    // near-duplicate pairs ONLY inside each cluster — the learned-
    // partition twin of d5's label blocking (no pre-existing label
    // needed) and the semantic complement of the lexical d2/d3.
    // Training uses KMeans.fitExact (decimal-explode means), so the
    // cluster assignment — and with it the whole result — replays
    // bit-exactly in the oracle's unrolled CTE chain. At 100 TB:
    // the model is a k×d broadcast, assignment a narrow map, and the
    // pair join is blocked by cluster_id (candidate pairs are
    // Σ cluster², never n²) — cluster count is the knob that keeps
    // blocks bounded, exactly as in the paper.
    "v14_semdedup" -> ((s, d) => {
      VectorOps.ensureRegistered(s)
      val vecs = Tables.load(s, d, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val asg = graft.ops.KMeans.fitExact(vecs, "vec_id", "embedding",
          k = KmK, assignPasses = KmPasses)
        .select(col("vec_id"), col("cluster_id"))
      val ev = vecs.join(asg, Seq("vec_id"))
      val a = ev.select(col("cluster_id"), col("vec_id").as("keep_id"),
        col("embedding").as("ea"))
      val b = ev.select(col("cluster_id").as("cb"), col("vec_id").as("drop_id"),
        col("embedding").as("eb"))
      a.join(b, col("cluster_id") === col("cb") && col("keep_id") < col("drop_id"))
        .withColumn("raw", VectorOps.dot(col("ea"), col("eb")) /
          (VectorOps.l2norm(col("ea")) * VectorOps.l2norm(col("eb"))))
        .filter(col("raw") >= SemTau)
        .select(col("cluster_id"), col("keep_id"), col("drop_id"),
          round(col("raw"), 4).as("cosine"))
        .orderBy(col("keep_id"), col("drop_id"))
    }),

    // v21 — k-NN SELF-JOIN (batch all-pairs top-k, cluster-blocked):
    // every vector finds its K best neighbors in one pass — the
    // corpus-wide companion of the per-query ANN family (v4–v12 serve
    // "neighbors of THIS query"; v21 materializes "neighbors of
    // EVERYONE", the input to SemDeDup-style pruning, kNN-graph
    // construction, and NN-descent seeding). Candidates are blocked
    // by the SAME exact-k-means partition as v14 (declared semantics:
    // neighbors within the assigned cluster — the scale contract, and
    // the oracle replays the identical blocking), then a bounded
    // TopKPerKey heap keeps K per vector — no per-vector sort, no
    // n² join. The cluster count is SCALE-AWARE in the declared plan
    // (knnJoinClusters: max(KmK, n/KnnBlockRows), replayed by the
    // oracle's training CTE from the same count): a fixed k makes the
    // blocked join n²/k — quadratic — while k ∝ n pins candidate
    // pairs to ~n·KnnBlockRows, the linear regime the r7 smoke
    // measured (50.07M pairs at 10× fixed-k vs 5.06M scaled). The
    // sizing count is a plan-time statistic over parquet metadata
    // (k-means training is driver-iterative anyway). At 100 TB:
    // candidate pairs are Σ cluster² ≈ n·KnnBlockRows, and the heap
    // bounds both memory and the shuffle to K rows per vector.
    "v21_knn_join" -> ((s, d) => {
      VectorOps.ensureRegistered(s)
      val vecs = Tables.load(s, d, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val asg = graft.ops.KMeans.fitExact(vecs, "vec_id", "embedding",
          k = knnJoinClusters(vecs.count()), assignPasses = KmPasses)
        .select(col("vec_id"), col("cluster_id"))
      val ev = vecs.join(asg, Seq("vec_id"))
      val a = ev.select(col("cluster_id"), col("vec_id"), col("embedding").as("ea"))
      val b = ev.select(col("cluster_id").as("cb"), col("vec_id").as("nb_id"),
        col("embedding").as("eb"))
      val pairs = a.join(b,
          col("cluster_id") === col("cb") && col("vec_id") =!= col("nb_id"))
        .withColumn("raw", VectorOps.dot(col("ea"), col("eb")) /
          (VectorOps.l2norm(col("ea")) * VectorOps.l2norm(col("eb"))))
      val top = graft.plans.TopK.perKey(pairs, Seq("vec_id"),
        Seq(col("raw").desc, col("nb_id")), KnnJoinK)
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("raw").desc, col("nb_id"))
      top.withColumn("nb_rank", row_number().over(w))
        .select(col("vec_id"), col("cluster_id"), col("nb_id"),
          col("nb_rank"), round(col("raw"), 4).as("cosine"))
        .orderBy(col("vec_id"), col("nb_rank"))
    }),

    // s4 — ORDERED FUNNEL (sequential event-pattern match): how many
    // users progressed view → click → purchase, where each step must
    // occur STRICTLY AFTER the user's earliest previous step — the
    // conversion query every event warehouse runs, and a shape none
    // of s1–s3 cover (those window/join on time, not on order).
    // Per step: earliest qualifying timestamp per user, then the next
    // step filters on it. At 100 TB each stage is one groupBy(user) +
    // one equi join on user — all shuffles on the same key, so a
    // co-partitioned exchange reuse; the step tables shrink
    // monotonically, and nothing is ever globally sorted or windowed.
    "s4_funnel" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
        .select(col("user_id"), col("event_type"), col("ts"))
      def earliest(step: String, after: Option[DataFrame]): DataFrame = {
        val base = ev.filter(col("event_type") === step)
        val gated = after match {
          case Some(prev) => base.join(prev, Seq("user_id"))
            .filter(col("ts") > col("t_prev"))
          case None => base
        }
        gated.groupBy(col("user_id")).agg(min(col("ts")).as("t_prev"))
      }
      val s1 = earliest("view", None)
      val s2 = earliest("click", Some(s1))
      val s3 = earliest("purchase", Some(s2))
      val counts = Seq(("1_view", s1), ("2_click", s2), ("3_purchase", s3))
        .map { case (name, df) =>
          df.agg(count(lit(1)).as("n_users"))
            .select(lit(name).as("step"), col("n_users"))
        }
        .reduce(_.unionAll(_))
      // pct-of-first via a broadcast 1-row scalar — lazy, no action
      val first = counts.filter(col("step") === "1_view")
        .select(col("n_users").as("n_first"))
      counts.crossJoin(broadcast(first))
        .select(col("step"), col("n_users"),
          round(col("n_users") / col("n_first"), 4).as("pct_of_first"))
        .orderBy(col("step"))
    }),

    // s5 — COHORT RETENTION (the companion report to s4's funnel):
    // users grouped by first-active day (cohort), counted on every
    // later day they return, reported as a fraction of the cohort's
    // day-0 size — the canonical growth-analytics matrix. (Day grain
    // rather than week: the events fixture spans one month, so weeks
    // would collapse to a single cohort; the plan is grain-agnostic.)
    // Plan: one distinct over (user, day) [the only event-sized
    // shuffle], a per-user min, a user-keyed join back, then a
    // cohort-sized aggregate — no window anywhere, and the day-0 base
    // joins back on cohort_day (cohort-count-sized, broadcast). At
    // 100 TB every shuffle is keyed by user or by (cohort, offset);
    // nothing is ever globally sorted.
    "s5_retention" -> ((s, d) => {
      val wk = Tables.load(s, d, "events")
        .select(col("user_id"), col("ts").cast("date").as("day"))
        .distinct()
      val coh = wk.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      val act = wk.join(coh, Seq("user_id"))
        .select(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).as("day_offset"),
          col("user_id"))
      val m = act.groupBy(col("cohort_day"), col("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
      val base = m.filter(col("day_offset") === 0)
        .select(col("cohort_day"), col("n_users").as("n_cohort"))
      m.join(broadcast(base), Seq("cohort_day"))
        .select(col("cohort_day"), col("day_offset"), col("n_users"),
          round(col("n_users") / col("n_cohort"), 4).as("retention"))
        .orderBy(col("cohort_day"), col("day_offset"))
    }),

    // x18 — SNAPSHOT DIFF / CHANGE-DATA FEED (ops.Diff): compare two
    // versions of the customer table and emit only the I/U/D change
    // rows. The "new" snapshot is derived deterministically from the
    // old one (drop key%97=0, bump balance where key%13=0, re-key a
    // slice past the max key as inserts) so the oracle replays it
    // exactly. The diff itself is one full-outer shuffle join plus a
    // null-safe struct compare — see ops/Diff.scala for why that is
    // the 100 TB-minimal plan.
    "x18_snapshot_diff" -> ((s, d) => {
      val old = Tables.load(s, d, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      val maxKey = 1000000L
      val neu = old.filter(col("c_custkey") % 97 =!= 0)
        .withColumn("c_acctbal",
          when(col("c_custkey") % 13 === 0, round(col("c_acctbal") + 100.0, 2))
            .otherwise(col("c_acctbal")))
        .unionAll(old.filter(col("c_custkey") % 31 === 0)
          .select((col("c_custkey") + maxKey).as("c_custkey"),
            col("c_name"), col("c_acctbal")))
      graft.ops.Diff.snapshot(old, neu, Seq("c_custkey"))
        .select(col("op"), col("c_custkey"),
          round(col("old_c_acctbal"), 2).as("old_bal"),
          round(col("new_c_acctbal"), 2).as("new_bal"))
        .orderBy(col("c_custkey"), col("op"))
    }),

    // x32 — WRITE-AUDIT-PUBLISH (WAP, the staged-commit quality
    // gate): tonight's quality-gated refresh is committed STAGED —
    // fully durable, owns its version number, but invisible to every
    // reader resolving `latest` (the log entry carries staged:true).
    // The query proves the whole protocol in one hash: (1)
    // `staged_invisible` — a latest read taken WHILE v2 was staged
    // still counts v1's rows; (2) the audit — a pinned read of the
    // staged version checks the quality gate held (zero short docs
    // remain), and only then (3) Snapshots.publish flips the flag
    // with a metadata-only log rewrite, after which latest serves the
    // refresh. The oracle states v1, the gated v2, and both literal
    // verdicts from source. At 100 TB: the audit is the barrier
    // between an ingest run and production readers — bad data is
    // never served, and un-publishing is free because publication
    // never touched a data file.
    "x32_write_audit_publish" -> ((s, d) => {
      import graft.sources.Snapshots
      val dir = s"target/x32_snap_${math.abs(d.hashCode)}"
      Snapshots.drop(s, dir) // deterministic version numbers per run
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      Snapshots.commit(docs, dir)
      val staged = Snapshots.commitStaged(
        docs.filter(col("n_chars") >= X32MinChars), dir)
      // the reader's view while v2 is staged: latest must still be v1
      val stagedInvisible =
        Snapshots.read(s, dir).count() == docs.count()
      // the audit: a pinned read of the staged version, gate checked
      val auditPass = Snapshots.read(s, dir, Some(staged))
        .filter(col("n_chars") < X32MinChars).count() == 0
      if (auditPass) Snapshots.publish(s, dir, staged)
      val before = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_v1"), sum(col("doc_id")).as("idsum_v1"))
      val after = Snapshots.read(s, dir).groupBy(col("source"))
        .agg(count(lit(1)).as("n_published"),
          sum(col("doc_id")).as("idsum_published"))
      before.join(after, Seq("source"))
        .select(col("source"), col("n_v1"), col("idsum_v1"),
          col("n_published"), col("idsum_published"),
          lit(stagedInvisible).as("staged_invisible"),
          lit(auditPass).as("audit_pass"))
        .orderBy(col("source"))
    }),

    // x33 — LOG-NATIVE CHANGE FEED (table_changes): the change rows
    // introduced by each commit of a data → DV → partition-overwrite
    // chain, derived from the version LOG (Snapshots.stepChanges) so
    // CDC cost follows recorded churn, not table size: the DV step
    // reads ONLY the key-sized deletion vector (zero base scans —
    // PlanShapeSpec pins exactly one file scan in its plan), the
    // replace step diffs exactly one partition-pruned slice, and only
    // a data-over-data commit pays the honest full-outer diff. The
    // oracle replays every step from source (takedown hash for the D
    // set; the within-partition keep/rescore split for the D/U set),
    // so the per-(version, op) counts + key checksums pin the whole
    // feed. This is x18/x30's CDC family moved INTO the table format:
    // x18 computes a diff between two states it must scan; x33 reads
    // the changes the log already knows about. At 100 TB that is the
    // difference between scanning a table and reading a manifest.
    "x33_log_changes" -> ((s, d) => {
      import graft.sources.Snapshots
      val dir = s"target/x33_snap_${math.abs(d.hashCode)}"
      x33CommitHistory(s, d, dir)
      (1 to 3).map(v =>
          Snapshots.stepChanges(s, dir, v, Seq("doc_id"))
            .withColumn("to_version", lit(v)))
        .reduce(_ unionByName _)
        .groupBy(col("to_version"), col("op"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("keysum"))
        .orderBy(col("to_version"), col("op"))
    }),

    // x34 — TABLE STATISTICS (ANALYZE): per-column null count / exact
    // NDV / min / max / string-length profile — the inputs a cost-based
    // optimizer and a zone-map writer both need. One aggregate per
    // column, unioned: over COLUMNAR files each leg's scan is pruned
    // to exactly its one column (ReadSchema shows a single field), so
    // C per-column stats cost the same bytes as one C-column scan and
    // the legs parallelize across the cluster; each NDV is an exact
    // distinct on a single column (map-side partial dedup, then a
    // value-cardinality shuffle). Timestamps profile as epoch micros
    // (exact in double to 2^53) so every min/max stays engine-typed —
    // never a string-formatting parity bet. The oracle states each
    // column's stats directly; the hash pins NDV semantics (exact,
    // null-excluding) and the length profile's integer-sum division.
    "x34_table_stats" -> ((s, d) => {
      import graft.ops.Analyze
      val li = Tables.load(s, d, "lineitem")
      Analyze.numLeg(li, "l_orderkey", col("l_orderkey"))
        .unionByName(Analyze.numLeg(li, "l_quantity", col("l_quantity")))
        .unionByName(Analyze.strLeg(li, "l_returnflag"))
        // parquet timestamps load as NTZ; the UTC session makes the
        // cast a wall-clock identity, so epoch micros match DuckDB's
        // epoch_us on the same naive values
        .unionByName(Analyze.numLeg(li, "l_shipdate",
          unix_micros(col("l_shipdate").cast("timestamp"))))
        .orderBy(col("col_name"))
    }),

    // x36 — ANALYZE, SKETCH MODE (the wide-table twin of x34): NDV
    // per column via HyperLogLog++ instead of an exact distinct —
    // the mode a 100 TB ANALYZE actually runs, where x34's exact
    // value-cardinality shuffle PER COLUMN is the one knob that
    // doesn't scale (a 500-column table would pay 500 corpus-keyed
    // exchanges; the sketch pays 500 fixed-size buffers merged
    // map-side). x1's envelope pattern keeps it oracle-checkable:
    // the estimate never reaches the compared output — each leg
    // emits the exact NDV plus a literal-checked bound verdict
    // (|hll − exact| ≤ 3·rsd·exact, the standard-error band at 3σ),
    // so a sketch drifting out of its guarantee flips a hash-pinned
    // boolean instead of hiding in an approximate column.
    // This is the AUDIT mode; the production (sketch-only, one-scan)
    // mode is [[x36SketchOnly]] — same sketch pass, no exact legs.
    "x36_table_stats_hll" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem")
      val cols = X36Cols
      // EVERY column's sketch from ONE corpus scan — the wide-table
      // win itself: C fixed-size HLL buffers updated side by side
      // (never mixed into the exact legs' expand — the r8 smoke
      // measured the fused form 10× slower), merged map-side, C rows
      // out. The exact legs below exist only for the envelope check.
      val hll = x36SketchOnly(s, d).withColumnRenamed("ndv_est", "hll")
      def exact(c: String) = li.agg(
          count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col(c))).as("n_nulls"),
          countDistinct(col(c)).as("n_distinct"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"))
      cols.map(exact).reduce(_ unionByName _)
        .join(broadcast(hll), Seq("col_name"))
        .select(col("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"),
          (abs(col("hll") - col("n_distinct")) <=
            col("n_distinct") * lit(3 * X36Rsd)).as("ndv_ok"))
        .orderBy(col("col_name"))
    }),

    // x41 — INCREMENTAL ANALYZE (stats maintenance under append):
    // the catalog-freshness operator. A 100 TB table's stats cannot
    // be recomputed over history per ingest batch — every component
    // of the stored state must be MERGEABLE, so maintenance costs
    // O(|Δ|): counts and null counts add, min/max combine, and NDV
    // carries as a DataSketches HLL sketch whose union is the
    // register-wise max (Agarwal et al., "Mergeable Summaries" —
    // the x1/x36 family's missing update path). The query splits
    // lineitem at a date cut, profiles base and delta SEPARATELY,
    // merges the two states, and hash-checks the merge against the
    // full table: exact fields (n_rows/n_nulls/min/max) must equal
    // the one-shot recompute BY VALUE — the stats-merge identity,
    // x12's monoid argument applied to ANALYZE — while the merged
    // sketch's estimate stays behind a 3σ envelope verdict (x1's
    // pattern; the estimate itself never reaches the hash). The
    // exact-NDV leg exists only for the envelope, as in x36's audit
    // mode.
    "x41_incremental_analyze" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem")
      val cut = lit("1997-01-01").cast("timestamp")
      val base = li.filter(col("l_shipdate") < cut)
      val delta = li.filter(col("l_shipdate") >= cut || col("l_shipdate").isNull)
      // one mergeable state row per (partition, column)
      def state(df: DataFrame, c: String, asNum: Option[Column]) = df.agg(
          count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col(c))).as("n_nulls"),
          asNum.map(a => min(a).cast("double")).getOrElse(lit(null).cast("double"))
            .as("min_num"),
          asNum.map(a => max(a).cast("double")).getOrElse(lit(null).cast("double"))
            .as("max_num"),
          hll_sketch_agg(col(c), lit(X41LgK)).as("sk"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
          col("min_num"), col("max_num"), col("sk"))
      def merge(c: String, asNum: Option[Column]) =
        state(base, c, asNum).unionByName(state(delta, c, asNum))
          .groupBy(col("col_name"))
          .agg(sum(col("n_rows")).as("n_rows"), sum(col("n_nulls")).as("n_nulls"),
            min(col("min_num")).as("min_num"), max(col("max_num")).as("max_num"),
            hll_union_agg(col("sk"), lit(false)).as("sk"))
      def exact(c: String) = li.agg(countDistinct(col(c)).as("n_distinct"))
        .select(lit(c).as("col_name"), col("n_distinct"))
      val cols = Seq("l_orderkey" -> Some(col("l_orderkey")),
        "l_returnflag" -> None)
      cols.map { case (c, a) => merge(c, a) }.reduce(_ unionByName _)
        .join(broadcast(cols.map(c => exact(c._1)).reduce(_ unionByName _)),
          Seq("col_name"))
        .select(col("col_name"), col("n_rows"), col("n_nulls"),
          col("min_num"), col("max_num"), col("n_distinct"),
          (abs(hll_sketch_estimate(col("sk")) - col("n_distinct")) <=
            greatest(col("n_distinct") * lit(3 * X41Rsd), lit(8.0))).as("ndv_ok"))
        .orderBy(col("col_name"))
    }),

    // x79 — AUTO-ANALYZE ON COMMIT (the stats catalog's write loop
    // closed; x41's merge identity productionized as a Snapshots
    // commit hook): enable(dir) opts the table in, a full commit
    // profiles the landed version, an APPEND folds the delta's
    // mergeable state at O(|Δ|) — counts add, min/max combine, NDV
    // unions register-wise — and every maintenance re-lands a
    // catalog version plus a zero-job planner summary. The declared
    // probes: exact merged fields per column (BY VALUE against the
    // oracle's one-shot recompute — the stats-merge identity), the
    // NDV estimate behind x41's 3σ envelope, FRESH after the hooked
    // commits with no manual ANALYZE anywhere, x37's broadcast
    // decision taken from the auto-maintained stats, and a deletes
    // commit (not foldable — sketches cannot subtract) flipping the
    // staleness verdict: detected, never silently served.
    "x79_auto_analyze" -> ((s, d) => {
      import graft.sources.Snapshots
      import graft.ops.{Analyze, AutoAnalyze, StatsCatalog}
      val factDir = s"target/x79_fact_${math.abs(d.hashCode)}"
      AutoAnalyze.dropState(s, factDir)
      Snapshots.drop(s, factDir)
      AutoAnalyze.enable(factDir)
      val orders = Tables.load(s, d, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderpriority"), col("o_orderdate"))
      val cut0 = lit("1997-01-01").cast("timestamp")
      val cut1 = lit("1997-07-01").cast("timestamp")
      Snapshots.commit(
        orders.filter(col("o_orderdate") < cut0).drop("o_orderdate"), factDir)
      Snapshots.commitAppend(
        orders.filter(col("o_orderdate") >= cut0 && col("o_orderdate") < cut1)
          .drop("o_orderdate"), factDir, base = 1)
      val served = AutoAnalyze.stats(s, factDir).getOrElse(
        throw new IllegalStateException("hooked commits must leave stats"))
      val fresh = AutoAnalyze.isFresh(s, factDir)
      // x37's decision over the auto-maintained stats — zero manual
      // ANALYZE of the fact anywhere in this query
      val li = Tables.load(s, d, "lineitem").select(col("l_orderkey"))
      val (_, strategy) = Analyze.statsChosenJoin(
        li, StatsCatalog.stats(s, d, "lineitem"),
        Snapshots.readResolved(s, factDir), served.cols,
        col("l_orderkey") === col("o_orderkey"), maxBroadcastBytes = 10L << 20)
      // deletes are not foldable: the staleness verdict must flip
      Snapshots.commitDeletes(
        Snapshots.read(s, factDir).select(col("o_orderkey")).limit(1),
        factDir, base = 2)
      val staleDetected = !AutoAnalyze.isFresh(s, factDir)
      AutoAnalyze.disable(factDir)
      // exact NDV legs for the envelope only (x41/x36's audit shape)
      val profiled = served.cols.keys.toSeq.sorted
      val fact = Snapshots.readResolved(s, factDir, asOf = Some(2))
      val exact = fact.select(
        profiled.map(c => countDistinct(col(c)).as(s"nd_$c")): _*).collect().head
      val rows = profiled.map { c =>
        val st = served.cols(c)
        val nd = exact.getAs[Long](s"nd_$c")
        val ndvOk = math.abs(st.nDistinct.toDouble - nd) <=
          math.max(3 * AutoAnalyze.Rsd * nd, 8.0)
        (c, st.nRows, st.nNulls, st.minNum, st.maxNum, st.avgLen,
          ndvOk, fresh, strategy, staleDetected)
      }
      import s.implicits._
      rows.toDF("col_name", "n_rows", "n_nulls", "min_num", "max_num",
          "avg_len", "ndv_ok", "fresh", "strategy", "stale_detected")
        .orderBy(col("col_name"))
    }),

    // x81 — MAINTENANCE VERBS ON THE SQL SURFACE (RESTORE + VACUUM
    // as statements — the retention lifecycle x61/x29 serve from
    // Scala, reachable from pure SQL text like Delta's): `RESTORE
    // TABLE '<dir>' TO VERSION 1` lands the metadata-only rollback
    // (v3, zero data files), `VACUUM '<dir>' KEEP 1` then physically
    // drops v2 while the chain closure PROTECTS v1 (the restored
    // head's base — retention can never break what latest serves).
    // The read-back script pins all of it: v1's balances served via
    // the restore, the surviving version count, and the head's kind.
    // Statements run in their own script because table references
    // bind BEFORE statements execute (the x78 two-script pattern).
    "x81_sql_maintenance" -> ((s, d) => {
      val dir = s"target/x81_bal_${math.abs(d.hashCode)}"
      commitBalanceVersions(s, d, dir) // v1 pre-1997, v2 refresh
      graft.util.SqlRunner.runScriptWithSnapshots(s,
        s"""RESTORE TABLE '$dir' TO VERSION 1;
           |VACUUM '$dir' KEEP 1""".stripMargin)
      graft.util.SqlRunner.runScriptWithSnapshots(s,
        s"""SELECT b.o_custkey, b.balance, b.n_orders,
           |  (SELECT CAST(COUNT(*) AS INT) FROM table_history('$dir'))
           |    AS n_versions,
           |  (SELECT kind FROM table_history('$dir') WHERE version = 3)
           |    AS latest_kind
           |FROM snapshot_at('$dir', 3) b
           |ORDER BY o_custkey""".stripMargin).last
    }),

    // x80 — AUTO-STATS ON THE SQL SURFACE (the x54/x71/x74/x78
    // symmetry rule applied to x79: every engine artifact reachable
    // from pure SQL text): `auto_stats('<dir>')` binds the commit
    // hook's served summary — profiled fields + the freshness
    // verdict — so a pure-SQL audit (or an external planner) reads
    // what the hook maintains, zero data-sized jobs at bind time.
    // The script runs after a hooked base commit + delta fold; exact
    // fields replay from orders and fresh=TRUE pins the re-stamp.
    "x80_sql_auto_stats" -> ((s, d) => {
      import graft.sources.Snapshots
      import graft.ops.AutoAnalyze
      val factDir = s"target/x80_fact_${math.abs(d.hashCode)}"
      AutoAnalyze.dropState(s, factDir); Snapshots.drop(s, factDir)
      AutoAnalyze.enable(factDir)
      val orders = Tables.load(s, d, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate"))
      val cut0 = lit("1997-01-01").cast("timestamp")
      val cut1 = lit("1997-07-01").cast("timestamp")
      Snapshots.commit(
        orders.filter(col("o_orderdate") < cut0).drop("o_orderdate"), factDir)
      Snapshots.commitAppend(
        orders.filter(col("o_orderdate") >= cut0 && col("o_orderdate") < cut1)
          .drop("o_orderdate"), factDir, base = 1)
      val out = graft.util.SqlRunner.runScriptWithSnapshots(s,
        s"""SELECT col_name, n_rows, n_nulls, min_num, max_num, fresh
           |FROM auto_stats('$factDir') ORDER BY col_name""".stripMargin).last
      AutoAnalyze.disable(factDir)
      out
    }),

    // x53 — HISTOGRAM-PLANNED FILTER JOIN: the stats→planner loop's
    // FOURTH decision, and the catalog's first HISTOGRAM consumer.
    // x42 answers probes DISJOINT with the committed [min,max]; the
    // real planning question is the overlapping ones — how much of
    // the fact does a BETWEEN keep, and is the filtered slice worth
    // broadcasting into the fact⋈fact join? Spark's static threshold
    // sizes files, so it cannot see a 4%-selective predicate; the
    // committed 16-bucket equi-depth histogram of o_totalprice
    // (exact order statistics — see StatsCatalog.equiDepth) answers
    // in integer SIXTEENTHS with zero plan-time jobs. The narrow
    // probe (est 0/16) broadcasts the filtered orders side under
    // lineitem's join; the wide one (est ~9/16) stays a shuffle
    // join. Both estimates AND both decisions are hash-pinned, the
    // oracle recomputes boundaries/estimates/verdicts from exact
    // SQL (ROW_NUMBER ranks → the same ceil(i·n/16) order
    // statistics), and the ±1-bucket equi-depth envelope plus the
    // > 2-bucket probe margins make the replay sound, not lucky —
    // x40's MG argument, histogram edition. PlanShapeSpec pins the
    // two plan shapes with the static threshold disabled.
    "x53_hist_planned_join" -> ((s, d) => {
      import graft.ops.{Analyze, StatsCatalog}
      val hist = StatsCatalog.stats(s, d, "orders")("o_totalprice")
        .histogram.get
      val probes = Seq(("narrow", X53NarrowLo, X53NarrowHi),
        ("wide", X53WideLo, X53WideHi))
      probes.map { case (label, lo, hi) =>
        val est16 = Analyze.histSelectivity16(hist, lo, hi)
        val li = Tables.load(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_extendedprice"))
        val fo = Tables.load(s, d, "orders")
          .filter(col("o_totalprice").between(lo, hi))
          .select(col("o_orderkey"))
        val (joined, strategy) = Analyze.histChosenJoin(
          li, fo, col("l_orderkey") === col("o_orderkey"),
          est16, X53MaxSixteenths)
        joined.agg(count(lit(1)).as("n_items"),
            dsum2(col("l_extendedprice")).as("sum_price"))
          .select(lit(label).as("probe"),
            lit(est16).as("est_sixteenths"), lit(strategy).as("strategy"),
            col("n_items"), col("sum_price"))
      }.reduce(_ unionByName _).orderBy(col("probe"))
    }),

    // x51 — GENERAL MERGE INTO (ops.Merge.mergeInto): the lakehouse's
    // primary write verb, all four arms live in ONE statement landing
    // as ONE optimistic-concurrency snapshot commit. Target: the
    // customer balance table, committed as v1 — the state the merge
    // is planned against. Source: a CDC-shaped restatement — each
    // customer's latest 1997+ order restates their balance, and
    // customers with key % 31 == 0 also open a branch account under
    // a shifted key (guaranteed unmatched). Arms: WHEN MATCHED AND
    // restated < [[X51CloseBelow]] THEN DELETE (account closure),
    // WHEN MATCHED THEN UPDATE (source wins), WHEN NOT MATCHED AND
    // restated >= the line THEN INSERT (the branch accounts, gated by
    // the same line so the insert CONDITION is live too), WHEN NOT
    // MATCHED BY SOURCE AND balance < 0 THEN DELETE (dormant
    // negative-balance purge). The merged state commits with
    // expectedVersion = 1 — the CAS that SnapshotsSpec races against
    // an interleaved writer — and the output reads the COMMITTED v2
    // back, so the hash proves merge semantics AND the commit
    // round-trip at once. Plan: one full-outer join on the key +
    // narrow arm select (see mergeInto's scaladoc) — at 100 TB this
    // is the nightly-upsert shape; a tiny delete-only source would
    // take x27's deletion-vector path instead of copy-on-write.
    "x51_merge_into" -> ((s, d) => {
      import graft.sources.Snapshots
      val dir = s"target/x51_snap_${math.abs(d.hashCode)}"
      Snapshots.drop(s, dir) // deterministic version numbers per run
      val target = x51Target(s, d)
      Snapshots.commit(target, dir)
      val merged = graft.ops.Merge.mergeInto(target, x51Changeset(s, d, target),
        "c_custkey",
        matchedDelete = (_, sr) => sr("c_acctbal") < X51CloseBelow,
        notMatchedInsert = sr => sr("c_acctbal") >= X51CloseBelow,
        bySourceDelete = t => t("c_acctbal") < 0)
      Snapshots.commit(merged, dir, expectedVersion = 1)
      Snapshots.read(s, dir, Some(2))
        .select(col("c_custkey"), col("c_name"),
          round(col("c_acctbal"), 2).as("c_acctbal"),
          lit(Snapshots.versions(s, dir).size).as("n_versions"))
        .orderBy(col("c_custkey"))
    }),

    // x52 — Z-ORDER LAYOUT EXECUTED (x19's report made physical —
    // Delta/Iceberg OPTIMIZE ZORDER end to end): the events are
    // z-RANKED through GlobalIndexExec (range shuffle + local sorts,
    // no single reducer — the k1 global-index operator reused as the
    // clustering writer), cut into [[ZExecFiles]] equal-row rank
    // slices (what an OPTIMIZE job actually writes; x19's equal-
    // z-span files were the report's simulation), and COMMITTED as a
    // snapshot version with one data file per slice (listing-checked,
    // x26's witness). The 2-D box query then runs off the committed
    // layout: the bit-aligned box is ONE contiguous z interval
    // ([[zOf]]), the per-file zone maps pick the overlapping files —
    // `pruned` pins that files were really skipped — and the exact
    // ub/tb BETWEEN runs as a residual pushed into the parquet scan
    // of the survivors (pruning is a superset selection, never a
    // correctness dependency). File sizing reads the committed stats
    // catalog's row count — zero plan-time jobs (the x38 rule).
    // PlanShapeSpec pins the skip ratio and the pushed residual. At
    // 100 TB this is the difference between scanning a corpus for a
    // 2-D predicate and opening ~p·files of it: the rank write is one
    // range exchange, the zone maps ride in the write's manifest, and
    // the probe is driver-side metadata.
    "x52_zorder_exec" -> ((s, d) => x52Frame(s, d)._1),

    // x55 — INCREMENTAL Z-ORDER MAINTENANCE (x52 × the append kind —
    // OPTIMIZE for a table that keeps growing): v1 commits the
    // z-ordered table (x52's 16 rank slices); tonight's batch lands
    // as an APPEND (Snapshots.commitAppend — the most common
    // lakehouse commit: one unsorted bucket, NO base file touched,
    // read, or rewritten, witnessed by the file listing). The
    // unsorted bucket's zone map spans the whole z domain, so every
    // 2-D box query rescans the entire delta — the measurable decay
    // OPTIMIZE exists to fix. The incremental OPTIMIZE then re-lands
    // ONLY the delta, z-ranked into its own 16 slices, as a
    // dataChange=false append against the SAME base (Delta's
    // OPTIMIZE commit shape): state is unchanged, the change feed
    // skips it (stepChanges), the base rides by reference, and the
    // box query now prunes BOTH file families. All four protocol
    // facts ride as hash-pinned flags; the rows are the plain box
    // answer. At 100 TB this is the difference between re-sorting a
    // corpus nightly and sorting each day's delta once — OPTIMIZE
    // cost tracks the CHURN, scan cost stays ~p·files forever.
    "x55_incremental_zorder" -> ((s, d) => x55Frame(s, d)._1),

    // x58 — MERGE-ON-READ MERGE (x51's statement, x27's physics):
    // the SAME four-arm changeset, but landed as DELTAS instead of a
    // copy-on-write rewrite — Merge.mergeDeltas derives the mask DV
    // (matched deletes + superseded updates + by-source deletes) and
    // the new images (updates + inserts) from one arm evaluation;
    // the DV commits STAGED (invisible to latest), then ONE append
    // whose base chain runs through it publishes — the append's
    // entry is the atomic commit point, so no reader ever sees the
    // masks without the images (SnapshotsSpec pins the torn-state
    // window shut). base_files_untouched states the v1 listing is
    // byte-identical after the whole merge — the claim x51's
    // copy-on-write cannot make — and the resolved state hash-matches
    // x51's oracle CTE verbatim (same merge, different physics). At
    // 100 TB a low-churn nightly MERGE costs a key-sized DV + a
    // delta-sized append + a broadcast-able anti-join at read,
    // instead of rewriting the table.
    "x58_merge_on_read" -> ((s, d) => {
      import graft.sources.Snapshots
      val dir = s"target/x58_snap_${math.abs(d.hashCode)}"
      Snapshots.drop(s, dir) // deterministic version numbers per run
      val target = x51Target(s, d)
      Snapshots.commit(target, dir)
      val sig1 = Snapshots.fileSignature(s, dir, 1)
      val (mask, images) = graft.ops.Merge.mergeDeltas(
        target, x51Changeset(s, d, target), "c_custkey",
        matchedDelete = (_, sr) => sr("c_acctbal") < X51CloseBelow,
        notMatchedInsert = sr => sr("c_acctbal") >= X51CloseBelow,
        bySourceDelete = t => t("c_acctbal") < 0)
      val dv = Snapshots.commitDeletes(mask, dir, base = 1, staged = true)
      Snapshots.commitAppend(images, dir, base = dv)
      val untouched = Snapshots.fileSignature(s, dir, 1) == sig1
      Snapshots.readResolved(s, dir)
        .select(col("c_custkey"), col("c_name"),
          round(col("c_acctbal"), 2).as("c_acctbal"),
          lit(Snapshots.versions(s, dir).size).as("n_versions"),
          lit(untouched).as("base_files_untouched"))
        .orderBy(col("c_custkey"))
    }),

    // x60 — EXPECTATIONS-GATED MERGE (x51's statement × x47's
    // quality gate, landed atomically): the production nightly-merge
    // path is never "merge whatever arrived" — malformed changeset
    // rows must be rejected WITHOUT blocking the batch, and the
    // reject set must be auditable the moment the merge is visible.
    // The changeset splits on a CHECK constraint (suspicious
    // restatements above [[X60MaxBal]] quarantine with their named
    // violations); only the clean rows drive the four-arm merge; the
    // merged state and the quarantine table stage under ONE txn
    // marker (x45's commit point), so no reader ever sees a merge
    // whose rejects are not yet auditable, or vice versa. The oracle
    // replays the same CTE with the constraint folded into the
    // changeset (`src0` → `src`), plus the quarantine count and the
    // protocol flags. At 100 TB this is the ingest contract: quality
    // gates cost one predicate pass, quarantine is churn-sized, and
    // atomicity is one marker create — none of it rescans the
    // target.
    "x60_gated_merge" -> ((s, d) => {
      import graft.sources.Snapshots
      val mergeDir = s"target/x60_merge_${math.abs(d.hashCode)}"
      val quarDir = s"target/x60_quar_${math.abs(d.hashCode)}"
      val txnDir = s"target/x60_txn_${math.abs(d.hashCode)}"
      Seq(mergeDir, quarDir, txnDir).foreach(Snapshots.drop(s, _))
      val target = x51Target(s, d)
      Snapshots.commit(target, mergeDir)
      val (clean, quar) = graft.ops.Expectations.split(
        x51Changeset(s, d, target),
        Seq("bal_in_domain" -> (col("c_acctbal") <= X60MaxBal)))
      val merged = graft.ops.Merge.mergeInto(target, clean, "c_custkey",
        matchedDelete = (_, sr) => sr("c_acctbal") < X51CloseBelow,
        notMatchedInsert = sr => sr("c_acctbal") >= X51CloseBelow,
        bySourceDelete = t => t("c_acctbal") < 0)
      val t = java.util.UUID.randomUUID().toString
      Snapshots.txnStage(merged, mergeDir, txnDir, t)
      Snapshots.txnStage(quar, quarDir, txnDir, t)
      // the torn window, witnessed: the merge table still serves v1
      // and the quarantine does not exist until the marker lands
      val gate = Snapshots.versions(s, mergeDir) == Seq(1) &&
        Snapshots.versions(s, quarDir).isEmpty
      Snapshots.txnCommit(s, txnDir, t, Seq(mergeDir, quarDir))
      val nQuar = Snapshots.read(s, quarDir).count()
      Snapshots.read(s, mergeDir)
        .select(col("c_custkey"), col("c_name"),
          round(col("c_acctbal"), 2).as("c_acctbal"),
          lit(nQuar).as("n_quarantined"),
          lit(gate).as("atomic_gate"),
          lit(Snapshots.versions(s, mergeDir).size).as("n_versions"))
        .orderBy(col("c_custkey"))
    }),

    // x59 — CATALOG-DRIVEN SHUFFLE SIZING (the planner loop's sixth
    // decision, and the most operational knob it owns): choosing
    // spark.sql.shuffle.partitions is the first thing every Spark
    // job tunes by hand — too few partitions spill/OOM, too many
    // drown in task overhead, and AQE can coalesce or split-skew but
    // only from whatever initial count the plan asked for. The
    // catalog answers it with ZERO scans: est_bytes = rows × an
    // integer row width (8 per non-string column, floor(avg_len)+4
    // per string — x37's estBytes rule, integer-pinned so the oracle
    // replays it exactly), n_parts = clamp(ceil(est/target), 1,
    // [[X59MaxParts]]). The whole declared query is METADATA — the
    // driver-side summary plus the schema; `parts_applied` then
    // pins that a keyed exchange built with the decision really has
    // that partition count (a plan property, no job). Target is
    // [[X59TargetBytes]] at fixture scale standing in for the
    // production ~128 MiB. At 100 TB this is the difference between
    // one global partitions knob for every query and a per-exchange
    // size derived from what ANALYZE measured.
    "x59_stats_shuffle_plan" -> ((s, d) => {
      import org.apache.spark.sql.types.StringType
      Seq("lineitem", "orders").map { t =>
        val st = graft.ops.StatsCatalog.stats(s, d, t)
        val nRows = graft.ops.StatsCatalog.nRows(st)
        val schema = Tables.load(s, d, t).schema
        val width = schema.fields.map { f =>
          if (f.dataType == StringType)
            math.floor(st(f.name).avgLen.get).toLong + 4L
          else 8L
        }.sum
        val est = nRows * width
        val nParts = math.min(X59MaxParts.toLong, math.max(1L,
          (est + X59TargetBytes - 1) / X59TargetBytes)).toInt
        val applied = Tables.load(s, d, t)
          .repartition(nParts, col(schema.fields.head.name))
          .rdd.getNumPartitions == nParts
        s.range(1).select(lit(t).as("table_name"),
          lit(nRows).as("n_rows"), lit(width).as("width_bytes"),
          lit(est).as("est_bytes"), lit(nParts).as("n_parts"),
          lit(applied).as("parts_applied"))
      }.reduce(_ unionByName _).orderBy(col("table_name"))
    }),

    // x61 — RESTORE / ROLLBACK (Snapshots.commitRestore): the
    // lakehouse's undo verb. A bad batch landed (v2 refreshed the
    // balances with post-1997 orders); RESTORE re-points latest at
    // v1 with a METADATA-ONLY commit — nothing rewritten, nothing
    // lost (v2 stays time-travelable for forensics), and the entry's
    // `base` pointer means vacuum's chain closure protects the
    // restore target automatically (SnapshotsSpec pins both). The
    // output fuses three proofs into one hashed frame: the resolved
    // latest IS the v1 state (balances), the restore wrote ZERO data
    // files (fileSignature from the listing), and the change feed of
    // the restore step is the exact v2→v1 diff (op per customer —
    // 'D' for customers only the bad batch introduced, 'U' where it
    // changed a balance), which the oracle restates entirely from
    // orders. CDC consumers therefore see a rollback as ordinary
    // change rows — the property that makes restoring under live
    // downstream pipelines safe. At 100 TB: Delta's RESTORE TABLE
    // ... VERSION AS OF is this exact shape — one catalog entry, no
    // data movement, O(changed keys) downstream work.
    "x61_restore" -> ((s, d) => {
      import graft.sources.Snapshots
      val dir = s"target/x61_restore_${math.abs(d.hashCode)}"
      commitBalanceVersions(s, d, dir) // v1 pre-1997, v2 refresh
      val v3 = Snapshots.commitRestore(s, dir, 1)
      val feed = Snapshots.stepChanges(s, dir, v3, Seq("o_custkey"))
        .select(col("o_custkey"), col("op"))
      val latest = Snapshots.read(s, dir)
      val zeroFiles = Snapshots.fileSignature(s, dir, v3).isEmpty
      latest.join(feed, Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          col("balance").as("bal_restored"),
          col("n_orders").as("n_orders_restored"),
          coalesce(col("op"), lit("=")).as("op"),
          lit(Snapshots.versions(s, dir).size).as("n_versions"),
          lit(zeroFiles).as("restore_zero_files"))
        .orderBy(col("o_custkey"))
    }),

    // x62 — PER-FILE BLOOM DATA-SKIPPING INDEX (Delta's bloom filter
    // index / Parquet column-bloom shape): the skipping case zone
    // maps CANNOT serve. The fact table is laid out by time
    // (month-partitioned orders — the universal 100 TB fact layout),
    // and the lookup column o_custkey is SCATTERED: every file's
    // [min,max] spans the whole key domain, so x19/x52-style zone
    // maps prune nothing. The index: ONE aggregate pass groups by
    // file and folds each file's keys into a Bloom filter — a
    // TypedImperativeAggregate, so map tasks emit bloom-sized
    // partial states, never keys; the landed index is n_files ×
    // filter bytes = MANIFEST-sized at any corpus size (at 100 TB it
    // rides in the write's manifest, the x21 pattern). A point
    // lookup probes the collected index on the DRIVER (zero jobs
    // over data), lists the surviving months, and reads ONLY those
    // partitions — partition pruning skips unlisted dirs, the exact
    // key filter is pushed to the surviving scans. False positives
    // cost extra files, never wrong rows (no false negatives), so
    // the aggregate is exact and the oracle is the plain filtered
    // SQL; n_true_files (months genuinely holding the key) rides in
    // the output to show per-key locality, and the hash match IS the
    // no-false-negative proof. Filter sizing follows the x38 rule:
    // capacity = the committed catalog's exact NDV of o_custkey (an
    // upper bound on any one file's key set; over-capacity only
    // lowers fpp), 16 bits/key ≈ 0.5% fpp — zero plan-time jobs.
    "x62_bloom_skip" -> ((s, d) => {
      import graft.sources.Snapshots
      import graft.functions.BloomContains
      BloomContains.registerAgg(s)
      val dir = s"target/x62_bloom_${math.abs(d.hashCode)}"
      Snapshots.drop(s, dir) // deterministic version numbers per run
      val orders = Tables.load(s, d, "orders")
        .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      Snapshots.commit(orders.repartition(col("o_month")), dir,
        partitionBy = Seq("o_month"))
      val cap = math.max(1000L,
        graft.ops.StatsCatalog.stats(s, d, "orders")("o_custkey").nDistinct)
      val idx = Snapshots.read(s, dir, Some(1))
        .groupBy(col("o_month"))
        .agg(BloomContains.bloomAgg(
          col("o_custkey").cast("long"), cap, cap * 16).as("bloom"))
        .collect() // manifest-sized: n_files × filter bytes
        .map(r => (r.getString(0), BloomContains.deserialize(r.getAs[Array[Byte]](1))))
      val nFiles = idx.length
      val keys = Seq(7L, 88L, 133L) // present at every fixture SF
      keys.map { k =>
        val hit = idx.collect { case (m, bf) if bf.mightContainLong(k) => m }.toIndexedSeq
        Snapshots.read(s, dir, Some(1))
          .filter(col("o_month").isin(hit: _*)) // partition pruning: skipped files never listed
          .filter(col("o_custkey") === k) // exact residual, pushed to the surviving scans
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast("decimal(28,2)")).cast("double").as("spend"),
            countDistinct(col("o_month")).as("n_true_files"))
          .withColumn("n_files", lit(nFiles.toLong))
          .withColumn("files_pruned", lit(hit.length < nFiles))
      }.reduce(_ unionByName _).orderBy(col("o_custkey"))
    }),

    // x63 — TIMESTAMP AS OF time travel (Delta's second time-travel
    // axis, next to x54's VERSION AS OF): commits carry an EXPLICIT
    // caller-supplied commit timestamp in the log entry (commitAt —
    // strictly increasing, loud otherwise), and an AS OF read
    // resolves to the latest published version at-or-before the
    // query instant. Three probes pin the resolution semantics into
    // ONE hashed frame: at exactly T1 (boundary inclusive → v1),
    // midway between the commits (still v1 — the log, not the
    // clock, defines visibility), and after T2 (→ v2); each row
    // carries the version the instant resolved to. Caller-supplied
    // ts is what makes this REPRODUCIBLE — Delta resolves from file
    // mtimes and needs adjustment machinery; a log-carried ts is
    // exact at any scale and costs one JSON field. Resolution reads
    // the manifest-sized log on the driver: zero jobs over data,
    // like every Snapshots metadata verb. SnapshotsSpec pins the
    // monotonic guard, the timed-throughout contract, and the
    // predates-first-commit failure.
    "x63_time_as_of" -> ((s, d) => {
      import graft.sources.Snapshots
      val dir = s"target/x63_snap_${math.abs(d.hashCode)}"
      val (t1, t2) = (1704067200000L, 1706745600000L) // 2024-01-01, 2024-02-01 UTC
      commitBalanceVersions(s, d, dir, ts = Some((t1, t2)))
      Seq(("at_v1", t1), ("between", (t1 + t2) / 2), ("after_v2", t2 + 3600000L))
        .map { case (label, at) =>
          val v = Snapshots.versionAsOf(s, dir, at)
          Snapshots.read(s, dir, Some(v)).select(
            lit(label).as("as_of"), col("o_custkey"), col("balance"),
            col("n_orders"), lit(v).as("resolved_version"))
        }.reduce(_ unionByName _).orderBy(col("as_of"), col("o_custkey"))
    }),

    // x64 — SKETCH SET ALGEBRA (theta sketches: the distinct-count
    // algebra HLL cannot do): year-over-year customer retention /
    // churn as |1996|, |1997|, |∪|, |∩|, |1996∖1997|, |1997∖1996|
    // and an exact-integer Jaccard, all from ONE scan of orders.
    // Two sketches build side by side in a single aggregate (the
    // conditional-input trick — null rows are skipped by the agg),
    // each a TypedImperativeAggregate: map tasks fold locally and
    // only sketch-sized states cross the exchange, never keys. The
    // set operations are then SCALAR expressions over the two
    // binary columns — no second scan, no distinct shuffle, no
    // self-join; at 100 TB the same query is one pass + bytes,
    // where six exact COUNT(DISTINCT)s would be six shuffles of the
    // key stream (or one giant pivoted one). EXACT-MODE CONTRACT
    // (what makes the exact-SQL oracle sound): a theta sketch
    // retains every hash until its nominal-entry capacity, so below
    // 2^lgk distinct keys estimates — and their unions/intersections/
    // differences — are exact integers; lgk=20 (1M entries) keeps
    // every fixture SF in exact mode, and the production dial is
    // lowering lgk (12 → ±1.6% at 16 KB/sketch) once corpora dwarf
    // memory. The ppm Jaccard is integer math off two exact counts —
    // no float drift in the hash.
    "x64_sketch_set_algebra" -> ((s, d) => {
      val yr = year(col("o_orderdate"))
      val orders = Tables.load(s, d, "orders")
        .filter(yr.isin(1996, 1997))
        .select(col("o_custkey"), yr.as("y"))
      val lg = lit(20)
      orders.agg(
        call_function("theta_sketch_agg",
          when(col("y") === 1996, col("o_custkey")), lg).as("a"),
        call_function("theta_sketch_agg",
          when(col("y") === 1997, col("o_custkey")), lg).as("b"))
        .select(
          call_function("theta_sketch_estimate", col("a")).as("n_1996"),
          call_function("theta_sketch_estimate", col("b")).as("n_1997"),
          // the UNION carries its own nominal-entries cap (defaults
          // to lgk=12 = 4096): two exact inputs fold through an
          // under-sized union into ESTIMATION mode — pass the same
          // lgk so the exact-mode contract survives the operator,
          // not just the inputs (caught by the sf0.1 oracle sweep:
          // 14,300 distinct keys → 14,198 "exact" union)
          call_function("theta_sketch_estimate",
            call_function("theta_union", col("a"), col("b"), lg)).as("n_union"),
          call_function("theta_sketch_estimate",
            call_function("theta_intersection", col("a"), col("b"))).as("n_retained"),
          call_function("theta_sketch_estimate",
            call_function("theta_difference", col("a"), col("b"))).as("n_churned"),
          call_function("theta_sketch_estimate",
            call_function("theta_difference", col("b"), col("a"))).as("n_new"))
        .withColumn("jaccard_ppm",
          floor(lit(1000000L) * col("n_retained") / col("n_union")))
    }),

    // x65 — TIMESTAMP AS OF on the SQL SURFACE (x63's twin through
    // the S8 script runner, completing the x54/x56 symmetry: every
    // time-travel verb reachable from pure SQL text): the script
    // reads the timed table at the SAME three instants through
    // `snapshot_at_time('<dir>', <millis>)`, which binds each
    // reference to the version the instant resolves to at BIND time
    // (versionAsOf — so the timed-throughout and predates-first-
    // commit guards fire before any SQL runs). The resolved_version
    // labels are script literals; the PROOF of correct resolution is
    // the state columns — a misbound instant would surface v2
    // balances under 'between' and break the shared x63 oracle hash.
    "x65_sql_time_as_of" -> ((s, d) => {
      val dir = s"target/x65_snap_${math.abs(d.hashCode)}"
      val (t1, t2) = (1704067200000L, 1706745600000L)
      commitBalanceVersions(s, d, dir, ts = Some((t1, t2)))
      val mid = (t1 + t2) / 2
      val script =
        s"""-- S8 surface + snapshot_at_time(dir, millis) time travel
           |SELECT 'at_v1' AS as_of, o_custkey, balance, n_orders,
           |  CAST(1 AS INT) AS resolved_version
           |FROM snapshot_at_time('$dir', $t1)
           |UNION ALL
           |SELECT 'between', o_custkey, balance, n_orders, CAST(1 AS INT)
           |FROM snapshot_at_time('$dir', $mid)
           |UNION ALL
           |SELECT 'after_v2', o_custkey, balance, n_orders, CAST(2 AS INT)
           |FROM snapshot_at_time('$dir', ${t2 + 3600000L})
           |ORDER BY as_of, o_custkey""".stripMargin
      graft.util.SqlRunner.runScriptWithSnapshots(s, script).last
    }),

    // x66 — AUTOMATIC MV QUERY REWRITE (the read half x12/x35/x41's
    // maintenance story was missing): a registered materialized view
    // answers plain SQL that only names the FACT table. MatView
    // commits the per-(status,priority) partials of the snapshot-
    // committed fact, MvRewrite (an injected optimizer rule) matches
    // the Aggregate-over-fact shape and re-aggregates the MV instead
    // — exact containment only (grouping ⊆ keys, every aggregate
    // derivable from the stored partials, freshness gate), refusal
    // otherwise. The `used_mv` flag is read off the OPTIMIZED plan
    // (MV scanned, fact not) and hashed, so the oracle pins both the
    // values AND the plan decision: a silently-declined rewrite
    // flips the flag; a semantically wrong one breaks the aggregate
    // columns. At 100 TB the fact-sized scan+shuffle becomes an
    // MV-sized one; the decision is a driver-side registry probe
    // plus one manifest-sized log read.
    "x66_mv_rewrite" -> ((s, d) => {
      val (factDir, mvDir) = x66Setup(s, d, "a")
      x66Consume(s, graft.sources.Snapshots.read(s, factDir), "orders_x66",
        """SELECT o_orderstatus, o_orderpriority,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
          |  COUNT(*) AS n_orders,
          |  MIN(o_totalprice) AS min_price,
          |  MAX(o_totalprice) AS max_price
          |FROM orders_x66
          |GROUP BY o_orderstatus, o_orderpriority""".stripMargin,
        mvDir, factDir, "o_orderstatus", "o_orderpriority")
    }),

    // x67 — MV GROUP ROLLUP (algebraic containment, not equality):
    // the SAME (status,priority) view serves a status-only rollup —
    // SUM/COUNT re-sum, MIN re-mins, and AVG arrives as the repo-
    // standard SUM/COUNT division so each AggregateExpression maps
    // independently and the Divide stays put (no decimal-average
    // scale drift to reconcile). Same plan-decision pin as x66.
    "x67_mv_rollup" -> ((s, d) => {
      val (factDir, mvDir) = x66Setup(s, d, "b")
      x66Consume(s, graft.sources.Snapshots.read(s, factDir), "orders_x67",
        """SELECT o_orderstatus,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
          |  COUNT(*) AS n_orders,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
          |  MIN(o_totalprice) AS min_price
          |FROM orders_x67
          |GROUP BY o_orderstatus""".stripMargin,
        mvDir, factDir, "o_orderstatus")
    }),

    // x68 — MV STALENESS FALLBACK (the gate that makes x66 safe to
    // trust): after the MV is built on v1, the fact advances to v2;
    // the SAME SQL text must now REFUSE the rewrite and answer from
    // the live fact scan. The hashed output pins both halves — the
    // aggregates carry v2's numbers (a stale-served MV would still
    // show v1's) and `used_mv` pins the declined plan. This is the
    // x46 result-cache discipline applied to the rewrite path:
    // version-fingerprinted reads, never trust-by-recency.
    "x68_mv_staleness" -> ((s, d) => {
      import graft.sources.Snapshots
      val (factDir, mvDir) = x66Setup(s, d, "c")
      // the input commit that outdates the view: v2 = ALL orders
      Snapshots.commit(x66Fact(s, d, allRows = true), factDir)
      x66Consume(s, Snapshots.read(s, factDir), "orders_x68",
        """SELECT o_orderstatus, o_orderpriority,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
          |  COUNT(*) AS n_orders
          |FROM orders_x68
          |GROUP BY o_orderstatus, o_orderpriority""".stripMargin,
        mvDir, factDir, "o_orderstatus", "o_orderpriority")
    }),

    // x70 — INCREMENTAL MV REFRESH (closing the x66/x68 loop): the
    // nightly append lands as a delta-only fact commit (v2 = v1 ∪ Δ,
    // base files untouched), MatView.refresh folds ONLY the delta's
    // partials into the stored view (full-outer monoid merge on the
    // group keys — O(|Δ|) + O(|MV|), the fact's history never
    // re-read) and commits MV v2, re-registering freshness. The SAME
    // SQL text that x68 showed declining now rewrites again — onto a
    // view no full rebuild ever touched. The oracle restates the
    // aggregate over v1 ∪ Δ from orders, so the hash proves the IVM
    // identity merge(MV(v1), partials(Δ)) == MV(v1 ∪ Δ) group for
    // group, AND used_mv pins that the refreshed view actually
    // serves.
    "x70_mv_refresh" -> ((s, d) => {
      import graft.sources.Snapshots
      val (factDir, mvDir) = x66Setup(s, d, "r")
      // the nightly batch: H1-1997 orders, appended delta-only
      val delta = Tables.load(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_orderpriority"), col("o_totalprice"), col("o_orderdate"))
      Snapshots.commitAppend(delta, factDir, base = 1)
      val v2 = Snapshots.versions(s, factDir)
      graft.plans.MatView.refresh(s, "x66_r",
        Snapshots.read(s, factDir, Some(2)), // the append's OWN rows
        isFresh = () => Snapshots.versions(s, factDir) == v2)
      x66Consume(s, Snapshots.readResolved(s, factDir), "orders_x70",
        """SELECT o_orderstatus, o_orderpriority,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
          |  COUNT(*) AS n_orders,
          |  MIN(o_totalprice) AS min_price,
          |  MAX(o_totalprice) AS max_price
          |FROM orders_x70
          |GROUP BY o_orderstatus, o_orderpriority""".stripMargin,
        mvDir, factDir, "o_orderstatus", "o_orderpriority")
    }),

    // x75 — COST-BASED VIEW CHOICE (the planner step that makes an
    // MV CATALOG, not just an MV, useful): two views over the same
    // fact both contain a priority-only rollup — the wide
    // (status,priority) view and the narrow (priority) view. The
    // matcher cost-orders candidates by the commit log's stored
    // bytes (driver-side manifest read, the x37–x43 catalog
    // discipline) and the NARROW view must serve. `served_by` reads
    // which MV directory the optimized plan actually scans and rides
    // the hash — values alone couldn't tell the two apart (both are
    // correct), which is exactly why the choice needs its own pin.
    "x75_mv_choice" -> ((s, d) => {
      import graft.sources.Snapshots
      val factDir = s"target/x66_fact_w_${math.abs(d.hashCode)}"
      val mvWide = s"target/x75_mv_wide_${math.abs(d.hashCode)}"
      val mvNarrow = s"target/x75_mv_narrow_${math.abs(d.hashCode)}"
      Snapshots.drop(s, factDir)
      Snapshots.commit(x66Fact(s, d, allRows = false), factDir)
      val fact = Snapshots.read(s, factDir)
      val v0 = Snapshots.versions(s, factDir)
      val fresh = () => Snapshots.versions(s, factDir) == v0
      graft.plans.MatView.create(s, "x75_wide", fact, mvWide,
        groupCols = Seq("o_orderstatus", "o_orderpriority"),
        sumCols = Seq("price" -> col("o_totalprice").cast("decimal(18,2)")),
        isFresh = fresh)
      graft.plans.MatView.create(s, "x75_narrow", fact, mvNarrow,
        groupCols = Seq("o_orderpriority"),
        sumCols = Seq("price" -> col("o_totalprice").cast("decimal(18,2)")),
        isFresh = fresh)
      Snapshots.read(s, factDir).createOrReplaceTempView("orders_x75")
      val q = s.sql(
        """SELECT o_orderpriority,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
          |  COUNT(*) AS n_orders
          |FROM orders_x75
          |GROUP BY o_orderpriority""".stripMargin)
      val paths = scanRoots(q)
      val servedBy =
        if (paths.exists(_.contains(mvNarrow))) "narrow"
        else if (paths.exists(_.contains(mvWide))) "wide"
        else "fact"
      q.withColumn("served_by", lit(servedBy))
        .orderBy(col("o_orderpriority"))
    }),

    // x74 — DESCRIBE HISTORY on the SQL surface: the commit log
    // itself as a queryable frame (version, kind, x63's explicit
    // instant, the base a logical commit chains to, publication
    // state) through `table_history('<dir>')` — the audit surface
    // every other time-travel verb (x54/x56/x63/x65) presumes a
    // human already has. The fixture history is two TIMED data
    // commits plus a RESTORE re-point, so the hash pins kind
    // classification, ts propagation, base chaining, and that the
    // restore's sentinel carries no instant. Driver-side and
    // manifest-sized: the log IS the table — zero data files read at
    // any corpus size.
    "x74_table_history" -> ((s, d) => {
      import graft.sources.Snapshots
      val dir = s"target/x74_hist_${math.abs(d.hashCode)}"
      val (t1, t2) = (1704067200000L, 1706745600000L)
      commitBalanceVersions(s, d, dir, ts = Some((t1, t2)))
      Snapshots.commitRestore(s, dir, 1)
      graft.util.SqlRunner.runScriptWithSnapshots(s,
        s"""-- S8 surface + table_history(dir) commit-log audit
           |SELECT version, kind, ts, base, published
           |FROM table_history('$dir')
           |ORDER BY version""".stripMargin).last
    }),

    // x73 — FILTERED-MV CONTAINMENT (the predicate half of x66's
    // algebra): the view is DEFINED over a filtered fact (pre-1997
    // orders of the RAW parquet table — no lakehouse required), and
    // the matcher now demands the query's filter BE the defining
    // filter, conjunct for conjunct (optimizer-inferred IsNotNulls
    // stripped when implied; structural compare, so the SQL text's
    // TIMESTAMP literal meets the DF-API's folded cast). Two probes,
    // one hashed output: the defining filter rewrites (MV-sized
    // read), a WIDER cut must refuse — serving it the filtered view
    // would silently drop 1997's orders, the classic filtered-MV
    // wrong-answer. Both decisions ride the hash.
    "x73_filtered_mv" -> ((s, d) => {
      val mvDir = s"target/x73_mv_${math.abs(d.hashCode)}"
      val factFile = s"$d/orders.parquet"
      def fp(): String = {
        val p = java.nio.file.Paths.get(factFile)
        s"${java.nio.file.Files.size(p)}_${java.nio.file.Files.getLastModifiedTime(p).toMillis}"
      }
      val orders = Tables.load(s, d, "orders")
      val defining = orders.filter(
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val f0 = fp()
      graft.plans.MatView.create(s, "x73", defining, mvDir,
        groupCols = Seq("o_orderpriority"),
        sumCols = Seq("price" -> col("o_totalprice").cast("decimal(18,2)")),
        isFresh = () => fp() == f0)
      orders.createOrReplaceTempView("orders_x73")
      def probe(label: String, cut: String) = {
        val q = s.sql(
          s"""SELECT o_orderpriority,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             |  COUNT(*) AS n_orders
             |FROM orders_x73
             |WHERE o_orderdate < TIMESTAMP '$cut'
             |GROUP BY o_orderpriority""".stripMargin)
        q.withColumn("probe", lit(label))
          .withColumn("used_mv", lit(x66UsedMv(q, mvDir, factFile)))
      }
      probe("defining", "1997-01-01")
        .unionByName(probe("wider", "1998-01-01"))
        .orderBy(col("probe"), col("o_orderpriority"))
    }),

    // x77 — MV FILTER CONTAINMENT (serving the STRICTER query —
    // x73's complement): x73 pinned that a WIDER filter refuses;
    // here the query carries the view's defining filter (none) PLUS
    // an extra conjunct. When that conjunct references GROUPING KEYS
    // alone (o_orderstatus — a key the query doesn't even group by),
    // the rewrite serves the MV with the conjunct applied as a
    // residual above the MV scan: each fact row maps to exactly one
    // group carrying its own key values, so filtering the
    // group-cardinality partials is identical to filtering the fact
    // — an MV-sized read where the old multiset-equality matcher
    // paid a fact scan. When the extra conjunct touches a VALUE
    // column (o_totalprice — already aggregated into the partials),
    // no residual can unmix it and the rewrite refuses. Both
    // decisions ride the hash next to values replayed from exact
    // SQL.
    "x77_mv_containment" -> ((s, d) => {
      val mvDir = s"target/x77_mv_${math.abs(d.hashCode)}"
      val factFile = s"$d/orders.parquet"
      def fp(): String = {
        val p = java.nio.file.Paths.get(factFile)
        s"${java.nio.file.Files.size(p)}_${java.nio.file.Files.getLastModifiedTime(p).toMillis}"
      }
      val orders = Tables.load(s, d, "orders")
      val f0 = fp()
      graft.plans.MatView.create(s, "x77", orders, mvDir,
        groupCols = Seq("o_orderpriority", "o_orderstatus"),
        sumCols = Seq("price" -> col("o_totalprice").cast("decimal(18,2)")),
        isFresh = () => fp() == f0)
      orders.createOrReplaceTempView("orders_x77")
      def probe(label: String, where: String) = {
        val q = s.sql(
          s"""SELECT o_orderpriority,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             |  COUNT(*) AS n_orders
             |FROM orders_x77
             |WHERE $where
             |GROUP BY o_orderpriority""".stripMargin)
        q.withColumn("probe", lit(label))
          .withColumn("used_mv", lit(x66UsedMv(q, mvDir, factFile)))
      }
      val out = probe("group_key", "o_orderstatus = 'F'")
        .unionByName(probe("value_col", "o_totalprice > 50000"))
        .orderBy(col("probe"), col("o_orderpriority"))
      graft.plans.MvCatalog.remove("x77")
      out
    }),

    // x78 — MV DDL ON THE SQL SURFACE (the x54/x56/x65/x71/x74
    // symmetry rule applied to x66/x70: every engine verb reachable
    // from pure SQL text): `CREATE MATERIALIZED VIEW <name> AT
    // '<dir>' AS <select>` analyzes the defining statement and
    // decomposes its Aggregate into the frame-based MatView.create
    // (group keys, SUM/COUNT/MIN/MAX partials, default source-
    // fingerprint freshness), `REFRESH MATERIALIZED VIEW <name> AS
    // <delta select>` folds the delta through the x70 monoid merge —
    // so a script declares the view, a LATER script's plain GROUP BY
    // gets rewritten, and after the nightly append a pure-SQL
    // refresh re-arms it, Scala never in sight. Both consumers'
    // used_mv decisions ride the hash next to x66/x70's aggregate
    // values replayed from orders.
    "x78_sql_mv_ddl" -> ((s, d) => {
      import graft.sources.Snapshots
      val factDir = s"target/x78_fact_${math.abs(d.hashCode)}"
      val mvDir = s"target/x78_mv_${math.abs(d.hashCode)}"
      Snapshots.drop(s, factDir); Snapshots.drop(s, mvDir)
      graft.plans.MvCatalog.remove("x78_mv")
      Snapshots.commit(x66Fact(s, d, allRows = false), factDir)
      val consumer =
        """SELECT o_orderstatus, o_orderpriority,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
          |  COUNT(*) AS n_orders,
          |  MIN(o_totalprice) AS min_price,
          |  MAX(o_totalprice) AS max_price""".stripMargin
      val scriptA =
        s"""-- pure-SQL MV DDL: declare the view, then consume it via
           |-- the rewrite — the consumer only ever names the fact
           |CREATE MATERIALIZED VIEW x78_mv AT '$mvDir' AS
           |SELECT o_orderstatus, o_orderpriority,
           |  SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS price,
           |  MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
           |FROM snapshot_at('$factDir', 1)
           |GROUP BY o_orderstatus, o_orderpriority;
           |$consumer
           |FROM snapshot_at('$factDir', 1)
           |GROUP BY o_orderstatus, o_orderpriority""".stripMargin
      val q1 = graft.util.SqlRunner.runScriptWithSnapshots(s, scriptA).last
      val served1 = x66UsedMv(q1, mvDir, factDir)
      // the nightly append (x70's H1-1997 batch), delta-only commit
      val delta = Tables.load(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_orderpriority"), col("o_totalprice"), col("o_orderdate"))
      Snapshots.commitAppend(delta, factDir, base = 1)
      val scriptB =
        s"""-- pure-SQL refresh folds the append's own rows, then the
           |-- resolved read (base UNION ALL delta) is served again
           |REFRESH MATERIALIZED VIEW x78_mv AS
           |SELECT * FROM snapshot_at('$factDir', 2);
           |$consumer
           |FROM (SELECT * FROM snapshot_at('$factDir', 1)
           |      UNION ALL SELECT * FROM snapshot_at('$factDir', 2)) u
           |GROUP BY o_orderstatus, o_orderpriority""".stripMargin
      val q2 = graft.util.SqlRunner.runScriptWithSnapshots(s, scriptB).last
      val served2 = x66UsedMv(q2, mvDir, factDir)
      // DDL lifecycle's third verb: DROP de-registers and removes the
      // stored partials, so the SAME consumer re-runs against the fact
      // (used_mv must flip FALSE, values identical — refusal is merely
      // slower, never wrong)
      val scriptC =
        s"""DROP MATERIALIZED VIEW x78_mv;
           |$consumer
           |FROM (SELECT * FROM snapshot_at('$factDir', 1)
           |      UNION ALL SELECT * FROM snapshot_at('$factDir', 2)) u
           |GROUP BY o_orderstatus, o_orderpriority""".stripMargin
      val q3 = graft.util.SqlRunner.runScriptWithSnapshots(s, scriptC).last
      val served3 = x66UsedMv(q3, mvDir, factDir)
      val out = q1
        .withColumn("probe", lit("created")).withColumn("used_mv", lit(served1))
        .unionByName(q2
          .withColumn("probe", lit("refreshed")).withColumn("used_mv", lit(served2)))
        .unionByName(q3
          .withColumn("probe", lit("dropped")).withColumn("used_mv", lit(served3)))
        .orderBy(col("probe"), col("o_orderstatus"), col("o_orderpriority"))
      graft.plans.MvCatalog.remove("x78_mv")
      out
    }),

    // x72 — REFERENTIAL-INTEGRITY AUDIT (the FK half of x47's CHECK
    // constraints — a training-data pipeline's join keys are only as
    // good as this report): per relationship, orphans = ONE left-anti
    // join — BROADCAST against bounded dims (customer: map-side, the
    // fact never shuffles) and a key shuffle only for fact↔fact
    // (lineitem→orders). Three legs: two clean fixtures (0 orphans,
    // hash-pinned — "no violations" is a claim, not an absence) and
    // a staging batch whose every-97th custkey was corrupted
    // upstream, so both arms of the report carry real numbers. ppm
    // in integer math; min/max offender keys bound the blast radius
    // without shipping row samples.
    "x72_fk_audit" -> ((s, d) => {
      val cust = Tables.load(s, d, "customer").select(col("c_custkey"))
      val orders = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val lineitem = Tables.load(s, d, "lineitem").select(col("l_orderkey"))
      val staging = orders.select(col("o_orderkey"),
        when(col("o_orderkey") % 97 === 0, col("o_custkey") + 10000000L)
          .otherwise(col("o_custkey")).as("o_custkey"))
      def leg(rel: String, fact: DataFrame, fkey: String,
              dim: DataFrame, dkey: String, bcast: Boolean): DataFrame = {
        val dimSide = if (bcast) broadcast(dim) else dim
        fact.join(dimSide, fact(fkey) === dimSide(dkey), "left_anti")
          .agg(count(lit(1)).as("n_orphans"),
            min(col(fkey)).as("min_bad"), max(col(fkey)).as("max_bad"))
          .crossJoin(fact.agg(count(lit(1)).as("n_rows")))
          .select(lit(rel).as("rel"), col("n_rows"), col("n_orphans"),
            expr("n_orphans * 1000000 div n_rows").as("orphan_ppm"),
            col("min_bad"), col("max_bad"),
            (col("n_orphans") === 0).as("ok"))
      }
      leg("lineitem->orders", lineitem, "l_orderkey",
          orders.select(col("o_orderkey")), "o_orderkey", bcast = false)
        .unionByName(leg("orders->customer", orders, "o_custkey",
          cust, "c_custkey", bcast = true))
        .unionByName(leg("staging->customer", staging, "o_custkey",
          cust, "c_custkey", bcast = true))
        .orderBy(col("rel"))
    }),

    // x69 — HIDDEN PARTITIONING (partition TRANSFORMS as table
    // metadata): orders land month(o_orderdate) × bucket8(o_custkey)
    // hive-partitioned, but readers never see — or name — the derived
    // columns. HiddenPartitionRule (MvRewrite's injected sibling)
    // translates the RAW-column predicates into the implied partition
    // predicates (date range → closed month-index bounds; custkey
    // IN-list → foldable pmod(hash(lit),8) bucket list), so directory
    // pruning fires for a query written with zero layout knowledge —
    // the trap this kills at 100 TB is the derived-column layout only
    // its author can prune. Soundness: only implications are
    // injected and the raw predicate stays as the residual (pushed
    // into the surviving files' scans), so a missed translation
    // widens the scan, never the answer. `pruned` pins the listing
    // witness: ≤ months×|IN| of the ~80×8 directories actually
    // scanned.
    "x69_hidden_partitioning" -> ((s, d) => {
      import graft.plans.HiddenPartitioning
      val dir = x69Layout(s, d, "a")
      val t = HiddenPartitioning.table(s, dir)
      val q = t.filter(
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") <= lit("1996-06-30 23:59:59").cast("timestamp") &&
          col("o_custkey").isin(0L, 2L, 3L, 4L, 5L, 6L))
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").cast("decimal(18,2)").cast("double").as("price"))
      val scanned = HiddenPartitioning.partitionsScanned(q)
      val total = HiddenPartitioning.partitionsScanned(t)
      q.withColumn("pruned", lit(scanned < total && scanned <= 36))
        .orderBy(col("o_orderkey"))
    }),

    // x71 — HIDDEN PARTITIONING ON THE SQL SURFACE (x69's twin
    // through the S8 script runner, the x54/x56/x65 symmetry rule:
    // every engine verb reachable from pure SQL text):
    // `hidden_table('<dir>')` binds the layout-hiding view — spec
    // recovered from the table's own sidecar, rule installed at bind
    // time — so a script's raw-column WHERE prunes directories
    // without its author ever seeing a partition column. Shares
    // x69's oracle: same rows, and the SAME listing witness hashed
    // (a binding that lost the translation would flip `pruned`).
    "x71_sql_hidden_partitioning" -> ((s, d) => {
      import graft.plans.HiddenPartitioning
      // 4 buckets (48 dirs): the binding under test is the SQL
      // surface, not the layout — x69 already pays the richer
      // 96-dir witness; halving the directory count halves the
      // committer-bound setup without weakening the prune pin
      val dir = x69Layout(s, d, "b", buckets = 4)
      val script =
        s"""-- S8 surface + hidden_table(dir) layout-transparent read
           |SELECT o_orderkey, o_custkey,
           |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
           |FROM hidden_table('$dir')
           |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           |  AND o_orderdate <= TIMESTAMP '1996-06-30 23:59:59'
           |  AND o_custkey IN (0, 2, 3, 4, 5, 6)
           |ORDER BY o_orderkey""".stripMargin
      val q = graft.util.SqlRunner.runScriptWithSnapshots(s, script).last
      val scanned = HiddenPartitioning.partitionsScanned(q)
      val total = HiddenPartitioning.partitionsScanned(
        HiddenPartitioning.table(s, dir))
      q.withColumn("pruned", lit(scanned < total && scanned <= 36))
    }),

    // x57 — CATALOG-DRIVEN DETERMINISTIC RANGE PARTITIONER (the
    // histogram's SECOND consumer — x53 planned a join with it; x57
    // WRITES with it): Spark's repartitionByRange samples the data,
    // so its boundaries are neither bit-stable across runs nor free
    // (a sampling pass per write — writeShards documents the
    // consumers-must-reread-the-manifest consequence). The committed
    // 16-bucket equi-depth histogram IS a range partitioner: its
    // boundaries are exact order statistics, so shard = #boundaries
    // ≤ value is a zero-job, sample-free, run-stable assignment
    // (a codegen'd 15-element HOF probe per row — no range exchange,
    // no global sort, embarrassingly parallel) with balance
    // GUARANTEED by the equi-depth construction instead of hoped-for
    // from a sample. The layout commits one file per shard
    // (listing-checked) and the per-shard counts/bounds/keysums are
    // hash-pinned — the oracle recomputes the same boundaries from
    // ROW_NUMBER ranks, so a catalog drift breaks the hash. At
    // 100 TB this turns every delivery write into a deterministic,
    // repeatable layout whose balance came from ANALYZE, written
    // once, not re-sampled per job.
    "x57_hist_range_partition" -> ((s, d) => {
      import graft.sources.Snapshots
      val dir = s"target/x57_snap_${math.abs(d.hashCode)}"
      Snapshots.drop(s, dir) // deterministic version numbers per run
      val bounds = graft.ops.StatsCatalog.stats(s, d, "orders")("o_totalprice")
        .histogram.get
      val laid = Tables.load(s, d, "orders")
        .filter(col("o_totalprice").isNotNull)
        .select(col("o_orderkey"), col("o_totalprice"))
        .withColumn("shard", size(filter(array(bounds.map(lit): _*),
          b => col("o_totalprice") >= b)).cast("int"))
      Snapshots.commit(laid.repartition(col("shard")), dir,
        partitionBy = Seq("shard"))
      val oneFile = Snapshots.filesPerDir(s, dir, 1).values.forall(_ == 1)
      Snapshots.read(s, dir, Some(1))
        .groupBy(col("shard").cast("int").as("shard"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("o_totalprice")).as("min_v"),
          max(col("o_totalprice")).as("max_v"),
          sum(col("o_orderkey")).as("keysum"))
        .withColumn("one_file_per_shard", lit(oneFile))
        .orderBy(col("shard"))
    }),

    // x56 — CHANGE FEED ON THE SQL SURFACE (x33's log-native feed ×
    // x54's binding pattern): the same three-kind history (data / DV
    // / partition replace), but every per-version feed is read from
    // PURE SQL via table_changes('<dir>', v, 'doc_id') — Delta's CDC
    // TVF for the Snapshots log, so downstream CDC consumers are
    // plain SQL scripts. Output and oracle are x33's BY DESIGN: the
    // hash equality proves the SQL surface serves the identical O(Δ)
    // feed (the DV step still reads only the DV, the replace step
    // still prunes to one partition — the binding is metadata, the
    // plan is stepChanges').
    "x56_sql_change_feed" -> ((s, d) => {
      val dir = s"target/x56_snap_${math.abs(d.hashCode)}"
      x33CommitHistory(s, d, dir)
      val script =
        s"""-- CDC consumption in pure SQL over the per-version feeds
           |CREATE OR REPLACE TEMPORARY VIEW x56_feed AS
           |SELECT 1 AS to_version, op, doc_id
           |FROM table_changes('$dir', 1, 'doc_id')
           |UNION ALL SELECT 2, op, doc_id
           |FROM table_changes('$dir', 2, 'doc_id')
           |UNION ALL SELECT 3, op, doc_id
           |FROM table_changes('$dir', 3, 'doc_id');
           |SELECT to_version, op, count(*) AS n, sum(doc_id) AS keysum
           |FROM x56_feed GROUP BY to_version, op
           |ORDER BY to_version, op""".stripMargin
      graft.util.SqlRunner.runScriptWithSnapshots(s, script).last
    }),

    // x54 — TIME TRAVEL ON THE SQL SURFACE (q29's S8 script runner ×
    // x24's warehouse contract): the same two-version balance table,
    // but the pinned reads are issued from PURE SQL TEXT via the
    // snapshot_at('<dir>', v) table binding (util.SqlRunner) —
    // `VERSION AS OF` for the Snapshots log, previously reachable
    // only through the Scala API. The script holds v2 and v1 of ONE
    // table side by side in one join; the compared output and the
    // oracle are x24's BY DESIGN — hash equality with the same
    // oracle IS the claim: the SQL surface's pinned reads reproduce
    // the Scala API's byte for byte. Costs nothing extra at scale:
    // the binding is a per-reference metadata rewrite; the data-sized
    // work is the same two pinned scans x24 plans.
    "x54_sql_time_travel" -> ((s, d) => {
      val dir = s"target/x54_snap_${math.abs(d.hashCode)}"
      commitBalanceVersions(s, d, dir)
      val script =
        s"""-- S8 surface + snapshot_at(dir, version) time travel
           |CREATE OR REPLACE TEMPORARY VIEW x54_hist AS
           |SELECT l.o_custkey,
           |  v.balance AS bal_v1, v.n_orders AS n_orders_v1,
           |  l.balance AS bal_latest, l.n_orders AS n_orders_latest
           |FROM snapshot_at('$dir', 2) l
           |LEFT JOIN snapshot_at('$dir', 1) v USING (o_custkey);
           |SELECT o_custkey, bal_v1, n_orders_v1, bal_latest,
           |  n_orders_latest, CAST(2 AS INT) AS n_versions
           |FROM x54_hist ORDER BY o_custkey""".stripMargin
      graft.util.SqlRunner.runScriptWithSnapshots(s, script).last
    }),

    // x42 — CATALOG-PRUNED SCAN (segment elimination at table
    // granularity): before planning a range probe, consult the
    // shared stats catalog's committed [min, max] for the column —
    // a probe DISJOINT with the domain compiles to a literal empty
    // result with NO scan in the plan (PlanShapeSpec pins exactly
    // one FileScan for the two probes together), the x21 zone-map
    // move lifted from shard manifests to the catalog, decided with
    // zero plan-time jobs. The pruned verdict is hash-pinned AND
    // cross-checked: the engine derives it from the CATALOG, the
    // oracle recomputes it from SOURCE min/max — a catalog serving
    // stale bounds flips the column. At 100 TB this is the
    // difference between touching a corpus to learn a predicate is
    // vacuous and answering from metadata.
    "x42_catalog_prune" -> ((s, d) => {
      val st = graft.ops.StatsCatalog.stats(s, d, "orders")("o_totalprice")
      val probes = Seq(("disjoint", X42OutLo, X42OutHi),
        ("in_range", X42InLo, X42InHi))
      probes.map { case (label, lo, hi) =>
        val overlaps = st.minNum.exists(_ <= hi) && st.maxNum.exists(_ >= lo)
        if (!overlaps)
          s.range(1).select(lit(label).as("probe"), lit(true).as("pruned"),
            lit(0L).as("n_rows"), lit(null).cast("double").as("sum_price"))
        else
          Tables.load(s, d, "orders")
            .filter(col("o_totalprice").between(lo, hi))
            .agg(count(lit(1)).as("n_rows"),
              dsum2(col("o_totalprice")).as("sum_price"))
            .select(lit(label).as("probe"), lit(false).as("pruned"),
              col("n_rows"), col("sum_price"))
      }.reduce(_ unionByName _).orderBy(col("probe"))
    }),

    // x44 — ZERO-COPY CLONE (shallow clone / table branching): the
    // dev-branch primitive of a lakehouse. Source table commits v1
    // (even docs), a CLONE lands in a second table as a PURE
    // METADATA entry — no data file written, read, or copied; the
    // zero_copy flag is the LISTING-checked empty file signature of
    // the clone version (x27's witness pattern) — then the source
    // advances to v2. The clone must keep serving the v1 state it
    // pinned (branch isolation: the whole point of branching), while
    // the source's latest serves v2; both states are hash-checked
    // from source rows. At 100 TB an experiment branch costs one
    // small JSON entry instead of a corpus copy, and the retention
    // caveat (vacuuming the source below a clone breaks it loudly)
    // is SnapshotsSpec-pinned.
    "x44_zero_copy_clone" -> ((s, d) => {
      import graft.sources.Snapshots
      val src = s"target/x44_src_${math.abs(d.hashCode)}"
      val dst = s"target/x44_clone_${math.abs(d.hashCode)}"
      Snapshots.drop(s, src); Snapshots.drop(s, dst)
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      Snapshots.commit(docs.filter(col("doc_id") % 2 === 0), src)
      Snapshots.commitClone(s, dst, src, 1)
      Snapshots.commit(docs, src) // the source refresh AFTER the clone
      val zeroCopy = Snapshots.fileSignature(s, dst, 1).isEmpty
      val cloned = Snapshots.readResolved(s, dst)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_clone"),
          sum(col("doc_id")).cast("long").as("idsum_clone"))
      val latest = Snapshots.read(s, src)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_src_latest"),
          sum(col("doc_id")).cast("long").as("idsum_src_latest"))
      cloned.join(latest, Seq("source"))
        .select(col("source"), col("n_clone"), col("idsum_clone"),
          col("n_src_latest"), col("idsum_src_latest"),
          lit(zeroCopy).as("zero_copy"))
        .orderBy(col("source"))
    }),

    // x50 — RIGHT-TO-BE-FORGOTTEN PURGE (physical history rewrite):
    // x27's logical delete hides rows from the LATEST resolution
    // while time travel still serves them — true GDPR erasure must
    // rewrite history. purgeKeys rewrites every version (data
    // versions AND the deletes-version's key set, which would
    // otherwise still NAME the purged users) crash-safely
    // (filtered rewrite → atomic entry re-point → old dir delete).
    // The query builds a 3-version history with a DV delete in the
    // middle, purges a deterministic user set, and hash-pins: the
    // purged users are gone from EVERY version including the
    // resolved DV state (gone_everywhere), every version was
    // physically rewritten (purged_all_versions), and the surviving
    // rows of each version are intact (per-source counts replayed
    // from source). Cost is history-sized — the honest price, run
    // per retention cycle with a batched purge set at 100 TB.
    "x50_purge_history" -> ((s, d) => {
      import graft.sources.Snapshots
      val dir = s"target/x50_${math.abs(d.hashCode)}"
      Snapshots.drop(s, dir)
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      Snapshots.commit(docs, dir) // v1
      Snapshots.commitDeletes(
        docs.filter(col("doc_id") === 1L).select(col("doc_id")), dir, base = 1)
      Snapshots.commit(docs, dir) // v3: the refresh
      val targets = docs.filter(col("doc_id") % 97 === 0).select(col("doc_id"))
      val purged = Snapshots.purgeKeys(s, dir, targets)
      val leftovers =
        Snapshots.read(s, dir, Some(1)).filter(col("doc_id") % 97 === 0).count() +
          Snapshots.read(s, dir, Some(3)).filter(col("doc_id") % 97 === 0).count() +
          Snapshots.readResolved(s, dir, Some(2))
            .filter(col("doc_id") % 97 === 0).count()
      def by(df: DataFrame, alias: String) =
        df.groupBy(col("source")).agg(count(lit(1)).as(alias))
      by(Snapshots.read(s, dir, Some(1)), "n_v1")
        .join(by(Snapshots.readResolved(s, dir, Some(2)), "n_v2_resolved"),
          Seq("source"))
        .join(by(Snapshots.read(s, dir, Some(3)), "n_v3"), Seq("source"))
        .select(col("source"), col("n_v1"), col("n_v2_resolved"), col("n_v3"),
          lit(leftovers == 0L).as("gone_everywhere"),
          lit(purged == Seq(1, 2, 3)).as("purged_all_versions"))
        .orderBy(col("source"))
    }),

    // x76 — LINEAGE-WIDE RTBF PURGE PROPAGATION (x50's missing half):
    // purgeKeys rewrites ONE table's history, but the purged key
    // survives in everything derived from it — MV partials whose
    // group key is the purged column, result-cache entries computed
    // from pre-purge versions, a persisted assignment table keyed by
    // the purged id, and committed stats whose min/max were order
    // statistics of the purged rows. ops.Purge registers each
    // artifact by CLASS and propagates: partials purged history-wide
    // + definition de-registered, matching cache versions physically
    // dropped (dropKeyedVersions), the keyed table rewritten under
    // its renamed column, stats re-landed from the purged source and
    // prior versions vacuumed. The proof is a value-level scan of
    // EVERY registered dir's FULL version history over the
    // identifier-bearing columns: exposure > 0 before (positive
    // control — the scan can see the key), exposure = 0 after; the
    // re-created MV and refilled cache entry are clean too. All
    // hash-pinned next to per-source counts replayed from source.
    "x76_purge_propagation" -> ((s, d) => {
      import graft.sources.Snapshots
      import graft.ops.{Analyze, Purge, ResultCache}
      val tag = math.abs(d.hashCode)
      val srcDir = s"target/x76_src_$tag"
      val mvDir = s"target/x76_mv_$tag"
      val cacheDir = s"target/x76_cache_$tag"
      val asgDir = s"target/x76_asg_$tag"
      val statsDir = s"target/x76_stats_$tag"
      val mvName = s"x76_mv_$tag"
      Seq(srcDir, mvDir, cacheDir, asgDir, statsDir).foreach(Snapshots.drop(s, _))
      Purge.deregister(srcDir); graft.plans.MvCatalog.remove(mvName)
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      Snapshots.commit(docs.filter(col("doc_id") % 2 === 0), srcDir) // v1
      Snapshots.commit(docs, srcDir) // v2: the refresh
      val src = Snapshots.read(s, srcDir)
      // the four derived-artifact classes, all naming doc_id values
      graft.plans.MatView.create(s, mvName, src, mvDir,
        groupCols = Seq("doc_id"), sumCols = Seq("n_chars" -> col("n_chars")))
      ResultCache.getOrComputeLatest(s, cacheDir, "x76_q", Seq(srcDir))(fs =>
        fs.head.select(col("doc_id"), col("n_chars")))
      Snapshots.commit(src.select(col("doc_id").as("id"),
        pmod(hash(col("doc_id")), lit(8)).as("bucket")), asgDir)
      def profile(sp: SparkSession): Unit = {
        val cur = Snapshots.read(sp, srcDir)
        Snapshots.commit(Analyze.numLeg(cur, "doc_id", col("doc_id"))
          .unionByName(Analyze.numLeg(cur, "n_chars", col("n_chars"))), statsDir)
        ()
      }
      profile(s)
      Purge.register(srcDir, Purge.MvPartials(mvName))
      Purge.register(srcDir, Purge.CacheEntries(cacheDir))
      Purge.register(srcDir, Purge.KeyedTable(asgDir, Map("doc_id" -> "id")))
      Purge.register(srcDir, Purge.Reland(statsDir, profile))
      val targets = docs.filter(col("doc_id") % 97 === 0).select(col("doc_id"))
      // identifier-bearing columns per artifact (a row count equal to
      // a key NUMBER is not the identifier; min/max of doc_id are)
      def exposure(): Seq[Long] = Seq(
        Purge.exposureCount(s, srcDir, targets, Seq("doc_id")),
        Purge.exposureCount(s, mvDir, targets, Seq("doc_id")),
        Purge.exposureCount(s, cacheDir, targets, Seq("doc_id")),
        Purge.exposureCount(s, asgDir, targets, Seq("id")),
        Purge.exposureCount(s, statsDir, targets, Seq("min_num", "max_num")))
      val preExposed = exposure().forall(_ > 0L) // positive control
      val actions = Purge.purge(s, srcDir, targets)
      def act(artifact: String) = actions.find(_.artifact == artifact).get
      // post-purge lifecycle: the cache MISSES and refills clean; the
      // re-created MV serves the purged fact
      val (refilled, refillHit, _) =
        ResultCache.getOrComputeLatest(s, cacheDir, "x76_q", Seq(srcDir))(fs =>
          fs.head.select(col("doc_id"), col("n_chars")))
      val purged = Snapshots.read(s, srcDir)
      val mv2 = graft.plans.MatView.create(s, mvName, purged, mvDir,
        groupCols = Seq("doc_id"), sumCols = Seq("n_chars" -> col("n_chars")))
      val mvRebuilt = mv2.count() == purged.count() // one group per kept doc
      val goneEverywhere = exposure().forall(_ == 0L) &&
        refilled.filter(col("doc_id") % 97 === 0).count() == 0L
      val mvProp = act("mv").action == "partials_purged" &&
        graft.plans.MvCatalog.get(mvName).isDefined // re-armed by the rebuild
      val cacheProp = act("result_cache").action == "entries_dropped" &&
        act("result_cache").detail.nonEmpty && !refillHit
      val idxProp = act("keyed_table").action == "history_rewritten"
      val statsProp = act("stats").action == "relanded" &&
        Snapshots.allVersions(s, statsDir) == Seq(2) // prior version vacuumed
      graft.plans.MvCatalog.remove(mvName); Purge.deregister(srcDir)
      purged.groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_chars")).cast("long").as("chars_kept"))
        .select(col("source"), col("n_kept"), col("chars_kept"),
          lit(preExposed).as("pre_exposed"),
          lit(goneEverywhere && mvRebuilt).as("gone_everywhere"),
          lit(mvProp).as("mv_propagated"),
          lit(cacheProp).as("cache_propagated"),
          lit(idxProp).as("index_propagated"),
          lit(statsProp).as("stats_propagated"))
        .orderBy(col("source"))
    }),

    // x49 — LOG CHECKPOINTING (Delta's `_last_checkpoint` contract):
    // the version log's OWN scale story. A long-lived table's log is
    // one entry file per commit — O(history) listing+reads per log
    // resolution, the real pain of a version-per-epoch streaming
    // sink. checkpointLog rolls every entry into ONE file;
    // pruneLogEntries deletes the files it covers verbatim (a
    // republished entry differs and survives to overlay the stale
    // copy); readers then pay one checkpoint read + the tail. The
    // query drives the full life cycle and hash-pins it: three
    // commits, checkpoint at 3, ALL three entry files pruned, a
    // post-prune commit that must claim version 4 against the
    // checkpointed log, and per-source aggregates of three versions
    // read THROUGH the checkpoint (pinned v1 + pre-prune latest v3 +
    // post-prune latest v4). LogCheckpointSpec adds the adversarial
    // cases: publish-after-checkpoint overlay, vacuum rewriting the
    // checkpoint so dropped versions cannot resurrect.
    "x49_log_checkpoint" -> ((s, d) => {
      import graft.sources.Snapshots
      val dir = s"target/x49_${math.abs(d.hashCode)}"
      Snapshots.drop(s, dir)
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      Snapshots.commit(docs.filter(col("doc_id") % 3 === 0), dir)
      Snapshots.commit(docs.filter(col("doc_id") % 3 <= 1), dir)
      Snapshots.commit(docs, dir)
      val ckptAt = Snapshots.checkpointLog(s, dir)
      val pruned = Snapshots.pruneLogEntries(s, dir)
      val v4 = Snapshots.commit(docs.filter(col("doc_id") % 2 === 0), dir)
      def by(v: Int, alias: String) =
        Snapshots.read(s, dir, Some(v)).groupBy(col("source"))
          .agg(count(lit(1)).as(alias))
      by(1, "n_v1")
        .join(by(3, "n_v3"), Seq("source"))
        .join(by(4, "n_v4"), Seq("source"))
        .select(col("source"), col("n_v1"), col("n_v3"), col("n_v4"),
          lit(ckptAt == 3).as("ckpt_at_head"),
          lit(pruned == 3).as("log_pruned"),
          lit(v4 == 4).as("post_ckpt_commit"))
        .orderBy(col("source"))
    }),

    // x48 — PARTITION EVOLUTION (Iceberg's flagship): the table's
    // physical layout changes BETWEEN versions (v1 hive-partitioned
    // by source, v2 by lang) with no migration rewrite of history —
    // each version's log entry records its own layout + schema, so
    // readers are layout-independent: the SAME per-lang aggregate
    // must come back identical whether lang is a data column (v1) or
    // a partition column restored from directory names (v2) — the
    // hive type-reinference trap x31 documents, here hash-checked
    // across layouts. The listing-derived layout flag pins that the
    // two versions really do carry different partitionings, and
    // PlanShapeSpec pins that a lang filter on v2 prunes at the
    // PartitionFilters level (scans one lang's directories only).
    // At 100 TB this is how a table re-partitions as its query mix
    // shifts: new data gets the new layout, old versions stay valid,
    // nobody rewrites a corpus.
    "x48_partition_evolution" -> ((s, d) => {
      import graft.sources.Snapshots
      val dir = s"target/x48_${math.abs(d.hashCode)}"
      Snapshots.drop(s, dir)
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
      Snapshots.commit(docs, dir, partitionBy = Seq("source"))
      Snapshots.commit(docs, dir, partitionBy = Seq("lang"))
      val evolved =
        Snapshots.filesPerDir(s, dir, 1).keys.forall(_.contains("source=")) &&
          Snapshots.filesPerDir(s, dir, 2).keys.forall(_.contains("lang="))
      def byLang(v: Int, nc: String, cc: String) =
        Snapshots.read(s, dir, Some(v)).groupBy(col("lang"))
          .agg(count(lit(1)).as(nc),
            sum(col("n_chars")).cast("long").as(cc))
      byLang(1, "n_v1", "chars_v1").join(byLang(2, "n_v2", "chars_v2"),
          Seq("lang"))
        .select(col("lang"), col("n_v1"), col("chars_v1"),
          col("n_v2"), col("chars_v2"),
          (col("n_v1") === col("n_v2") &&
            col("chars_v1") === col("chars_v2")).as("layout_independent"),
          lit(evolved).as("layout_evolved"))
        .orderBy(col("lang"))
    }),

    // x47 — CONSTRAINED COMMIT (CHECK constraints + quarantine, the
    // DLT-expectations ingest gate): the batch splits in ONE narrow
    // pass into rows satisfying every named constraint and rows
    // carrying the comma-joined names of each failed one; clean and
    // quarantine land as two tables in ONE x45 transaction — the
    // gate's invariant (the corpus holds only constraint-satisfying
    // rows AND nothing was silently dropped) cannot be torn by a
    // crash. Disjointness + completeness are recomputed from the
    // committed tables and hash-pinned next to the atomicity probe;
    // the oracle replays the split per source with the same
    // predicates. At 100 TB the split is predicate work on the
    // ingest scan, quarantine cost follows the violation count, and
    // no post-hoc audit scan is ever needed.
    "x47_constrained_commit" -> ((s, d) => {
      import graft.ops.Expectations
      import graft.sources.Snapshots
      val cleanDir = s"target/x47_clean_${math.abs(d.hashCode)}"
      val quarDir = s"target/x47_quar_${math.abs(d.hashCode)}"
      val txnDir = s"target/x47_txn_${math.abs(d.hashCode)}"
      Seq(cleanDir, quarDir, txnDir).foreach(Snapshots.drop(s, _))
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
      val (clean, quar) = Expectations.split(docs, Seq(
        "min_length" -> (col("n_chars") >= X47MinChars),
        "lang_known" -> col("lang").isin(X47Langs.map(lit): _*),
        "id_present" -> col("doc_id").isNotNull))
      val t = java.util.UUID.randomUUID().toString
      Snapshots.txnStage(clean, cleanDir, txnDir, t)
      Snapshots.txnStage(quar, quarDir, txnDir, t)
      val invisibleStaged = Snapshots.versions(s, cleanDir).isEmpty &&
        Snapshots.versions(s, quarDir).isEmpty
      Snapshots.txnCommit(s, txnDir, t, Seq(cleanDir, quarDir))
      val landedC = Snapshots.read(s, cleanDir)
      val landedQ = Snapshots.read(s, quarDir)
      val nIn = docs.count(); val nC = landedC.count(); val nQ = landedQ.count()
      val complete = nC + nQ == nIn && nQ > 0
      val byC = landedC.groupBy(col("source"))
        .agg(count(lit(1)).as("n_clean"),
          min(col("n_chars")).cast("long").as("min_clean_chars"))
      val byQ = landedQ.groupBy(col("source"))
        .agg(count(lit(1)).as("n_quar"),
          sum(when(col("violations").contains("min_length"), 1)
            .otherwise(0)).cast("long").as("n_short"))
      byC.join(byQ, Seq("source"), "full_outer")
        .select(col("source"),
          coalesce(col("n_clean"), lit(0L)).as("n_clean"),
          coalesce(col("min_clean_chars"), lit(0L)).as("min_clean_chars"),
          coalesce(col("n_quar"), lit(0L)).as("n_quar"),
          coalesce(col("n_short"), lit(0L)).as("n_short"),
          lit(invisibleStaged).as("atomic_gate"),
          lit(complete).as("split_complete"))
        .orderBy(col("source"))
    }),

    // x46 — VERSION-KEYED RESULT CACHE (Snowflake result reuse on the
    // snapshot log): a repeated aggregate over a slow-changing corpus
    // is served from a committed result iff (query id, exact input
    // versions) match — hit/miss is ONE metadata listing, a hit scans
    // only the result-sized cached version, and invalidation is free
    // (a refreshed input has a new version number, so old
    // fingerprints stop matching; no purge protocol). The query
    // drives the cache's whole life cycle and hash-pins it: first run
    // misses and stores (first_miss), the replay hits without
    // recomputing (replay_hit — ResultCacheSpec proves the input is
    // not even readable then), the corpus refresh changes the version
    // and misses again (fresh_miss), and the served values are the
    // exact aggregates of the version they were cached from (v1
    // column vs final column, both oracle-stated). At 100 TB this is
    // dashboard economics: metadata listing vs corpus scan.
    "x46_result_cache" -> ((s, d) => {
      import graft.ops.ResultCache
      import graft.sources.Snapshots
      val srcDir = s"target/x46_src_${math.abs(d.hashCode)}"
      val cacheDir = s"target/x46_cache_${math.abs(d.hashCode)}"
      Seq(srcDir, cacheDir).foreach(Snapshots.drop(s, _))
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      def bySource(df: DataFrame) = df.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("chars"))
      Snapshots.commit(docs.filter(col("doc_id") % 2 === 0), srcDir) // v1
      // the pin is taken INSIDE getOrComputeLatest, once — fingerprint
      // and computed frames can never disagree on the version, even
      // against a racing input commit (ResultCacheSpec interleaves one)
      val (r1, hit1, _) = ResultCache.getOrComputeLatest(
        s, cacheDir, "by_source", Seq(srcDir))(f => bySource(f.head))
      val (_, hit2, _) = ResultCache.getOrComputeLatest(
        s, cacheDir, "by_source", Seq(srcDir))(f => bySource(f.head))
      Snapshots.commit(docs, srcDir) // v2: the corpus refresh
      val (r3, hit3, _) = ResultCache.getOrComputeLatest(
        s, cacheDir, "by_source", Seq(srcDir))(f => bySource(f.head))
      r3.join(r1.select(col("source"), col("n_docs").as("n_docs_v1")),
          Seq("source"))
        .select(col("source"), col("n_docs"), col("chars"),
          col("n_docs_v1"),
          lit(!hit1).as("first_miss"), lit(hit2).as("replay_hit"),
          lit(!hit3).as("fresh_miss"))
        .orderBy(col("source"))
    }),

    // x45 — MULTI-TABLE ATOMIC TRANSACTION (Percolator/Nessie's
    // primary-record commit on the Snapshots log): a corpus table and
    // its stats table must refresh TOGETHER or not at all — the
    // invariant every catalog-backed planner (x37/x38/x40/x43) relies
    // on. Each participant stages a txn-tagged version (durable,
    // reader-invisible); ONE create-exclusive decision-marker create
    // is the atomic commit point across both tables. The query drives
    // the three crash windows and hash-pins what each must show:
    // (1) a writer dies mid-transaction → nothing visible
    // (atomic_pending), the dead txn is fenced by abort; (2) a writer
    // dies AFTER the marker but BEFORE log repair → everything
    // visible already (atomic_commit); (3) after lazy repair the
    // visible pair is consistent — stats stored by the transaction
    // equal the aggregate recomputed from the docs it committed
    // (pair_consistent per row). At 100 TB the marker create maps to
    // the catalog store's conditional put; repair cost follows table
    // count, never data size. Txn ids are UUIDs by contract (unique
    // per attempt), so replays of this query are independent
    // transactions.
    "x45_multi_table_txn" -> ((s, d) => {
      import graft.sources.Snapshots
      val docsDir = s"target/x45_docs_${math.abs(d.hashCode)}"
      val statsDir = s"target/x45_stats_${math.abs(d.hashCode)}"
      val txnDir = s"target/x45_txn_${math.abs(d.hashCode)}"
      Seq(docsDir, statsDir, txnDir).foreach(Snapshots.drop(s, _))
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      val half = docs.filter(col("doc_id") % 2 === 0)
      def statsOf(df: DataFrame) = df.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs_stats"),
          sum(col("n_chars")).cast("long").as("chars_stats"))
      def id() = java.util.UUID.randomUUID().toString
      // transaction 1: the half corpus + its stats land together
      val t1 = id()
      Snapshots.txnStage(half, docsDir, txnDir, t1)
      Snapshots.txnStage(statsOf(half), statsDir, txnDir, t1)
      Snapshots.txnCommit(s, txnDir, t1, Seq(docsDir, statsDir))
      // crash window 1: the full-corpus refresh stages its docs side,
      // then the writer dies — no marker, so NOTHING may be visible
      val tDead = id()
      Snapshots.txnStage(docs, docsDir, txnDir, tDead)
      val atomicPending = Snapshots.versions(s, docsDir) == Seq(1) &&
        Snapshots.versions(s, statsDir) == Seq(1)
      Snapshots.txnAbort(s, txnDir, tDead) // fence the dead writer
      // transaction 2: the refresh, crashing AFTER the atomic point
      // but BEFORE any log repair — everything must already be visible
      val t2 = id()
      val dv = Snapshots.txnStage(docs, docsDir, txnDir, t2)
      val sv = Snapshots.txnStage(statsOf(docs), statsDir, txnDir, t2)
      Snapshots.txnCommit(s, txnDir, t2, repair = false)
      val atomicCommit = Snapshots.versions(s, docsDir).lastOption.contains(dv) &&
        Snapshots.versions(s, statsDir).lastOption.contains(sv)
      Snapshots.txnRepair(s, txnDir, t2, Seq(docsDir, statsDir))
      val liveDocs = Snapshots.read(s, docsDir).groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("chars"))
      liveDocs.join(Snapshots.read(s, statsDir), Seq("source"))
        .select(col("source"), col("n_docs"), col("chars"),
          (col("n_docs") === col("n_docs_stats") &&
            col("chars") === col("chars_stats")).as("pair_consistent"),
          lit(atomicPending).as("atomic_pending"),
          lit(atomicCommit).as("atomic_commit"))
        .orderBy(col("source"))
    }),

    // x43 — STATS-ORDERED STAR JOIN: the catalog's third planning
    // decision (x37 chose a broadcast side, x40 a skew strategy —
    // this one chooses JOIN ORDER). The lineitem fact joins its two
    // dimensions smallest-estimated-first (supplier before part, per
    // the catalog's row counts — the greedy CBO heuristic: the most
    // selective dim shrinks the intermediate before wider rows ride
    // through it), each dim broadcast under the x37 byte rule, with
    // ZERO plan-time jobs. The chosen order is hash-pinned in the
    // output and the oracle replays it from source counts; the plan
    // nesting itself (supplier innermost) is pinned by
    // PlanShapeSpec, and AnalyzeSpec proves the nesting follows the
    // STATS by feeding statsOrderedJoin lying stats.
    "x43_stats_join_order" -> ((s, d) => {
      import graft.ops.{Analyze, StatsCatalog}
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
      val part = Tables.load(s, d, "part")
        .select(col("p_partkey"), col("p_brand"))
      val supp = Tables.load(s, d, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      val (joined, order) = Analyze.statsOrderedJoin(li, Seq(
        ("part", part, StatsCatalog.stats(s, d, "part"),
          col("l_partkey") === col("p_partkey")),
        ("supplier", supp, StatsCatalog.stats(s, d, "supplier"),
          col("l_suppkey") === col("s_suppkey"))))
      joined.groupBy(col("p_brand"), col("s_nationkey"))
        .agg(count(lit(1)).as("n_items"),
          dsum2(col("l_extendedprice")).as("sum_price"))
        .select(col("p_brand"), col("s_nationkey"), col("n_items"),
          col("sum_price"), lit(order).as("join_order"))
        .orderBy(col("p_brand"), col("s_nationkey"))
    }),

    // x37 — the ANALYZE→PLANNER loop closed: the first planning
    // decision the engine makes FROM its own committed statistics.
    // Both join inputs' stats come from the SHARED catalog
    // (ops.StatsCatalog: ANALYZE profiles each fixture table ONCE,
    // commits the rows as a Snapshots version under one canonical
    // dir, and serves planners from the driver-side summary — write
    // once, read many; x38's sketch sizing and x40's skew verdict
    // read the same catalog, so no consumer re-profiles per query).
    // The broadcast side of the declared customer⋈nation join is
    // chosen from the catalog row counts + widths
    // (ops.Analyze.statsChosenJoin), not Spark's static file-size
    // threshold — PlanShapeSpec pins that the hint alone produces
    // the BroadcastHashJoin even with the static threshold disabled.
    // The chosen side is PART OF THE OUTPUT, and the oracle replays
    // the row-count comparison from source, so the planning decision
    // itself is hash-checked. At 100 TB file size routinely
    // mis-sizes a narrow projection of a wide table; stats size the
    // join input.
    "x37_stats_planned_join" -> ((s, d) => {
      import graft.ops.{Analyze, StatsCatalog}
      val cust = Tables.load(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_name"),
          col("c_acctbal"))
      val nat = Tables.load(s, d, "nation")
        .select(col("n_nationkey"), col("n_name"))
      val (joined, chosen) = Analyze.statsChosenJoin(
        cust, StatsCatalog.stats(s, d, "customer"),
        nat, StatsCatalog.stats(s, d, "nation"),
        col("c_nationkey") === col("n_nationkey"),
        maxBroadcastBytes = 10L << 20)
      joined.groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("c_acctbal").cast("decimal(28,2)")).cast("double")
            .as("sum_bal"))
        .select(col("n_name"), col("n_cust"), col("sum_bal"),
          lit(chosen).as("broadcast_side"))
        .orderBy(col("n_name"))
    }),

    // x35 — INCREMENTAL VIEW MAINTENANCE of a JOIN view (delta-join):
    // the materialized view V = orders ⋈ lineitem aggregated per
    // customer, maintained under simultaneous inserts to BOTH fact
    // tables with the classic three delta terms
    // ΔV = ΔO⋈L ∪ O⋈ΔL ∪ ΔO⋈ΔL — the stored state's O⋈L join is
    // never re-run. Each delta term is Δ-sized on one side, so at
    // 100 TB the nightly cost is O(|Δ| · join fanout) probes plus a
    // key-cardinality merge (IncrementalAgg.merge — x12's monoid
    // state, sums in decimal so merge order can't matter), not a
    // history×history join. The fixture's quadrants are all
    // non-empty (old orders receive new lineitems and vice versa —
    // lineitem splits on l_shipdate, orders on o_orderdate), so every
    // delta term carries rows. The oracle is the one-shot
    // join-aggregate over everything: the hash proves
    // merge(state(O⋈L), state(ΔV)) == state((O∪ΔO)⋈(L∪ΔL)), the IVM
    // correctness identity, extended from x12's single-table case to
    // a two-sided join view.
    "x35_ivm_join" -> ((s, d) => {
      import graft.ops.IncrementalAgg
      val cut = lit("1997-01-01").cast("timestamp")
      val o = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val l = Tables.load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_shipdate"))
      val oOld = o.filter(col("o_orderdate") < cut)
      val oNew = o.filter(col("o_orderdate") >= cut)
      val lOld = l.filter(col("l_shipdate") < cut)
      val lNew = l.filter(col("l_shipdate") >= cut)
      def joined(a: DataFrame, b: DataFrame) =
        a.join(b, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey"), col("l_extendedprice"))
      val state = IncrementalAgg.state(
        joined(oOld, lOld), "o_custkey", "l_extendedprice")
      val delta = IncrementalAgg.state(
        joined(oNew, lOld).unionByName(joined(oOld, lNew))
          .unionByName(joined(oNew, lNew)),
        "o_custkey", "l_extendedprice")
      IncrementalAgg.merge(state, delta, "o_custkey")
        .select(col("o_custkey"), col("n").as("n_items"),
          col("sum_v").cast("double").as("revenue"),
          col("min_v").as("min_price"), col("max_v").as("max_price"))
        .orderBy(col("o_custkey"))
    }),

    // x31 — SCHEMA EVOLUTION (additive column, aligned reads):
    // version 1 commits the document table WITHOUT the lang column;
    // version 2 commits it widened. Snapshots.readAligned serves the
    // OLD version through the LATEST schema — the missing column
    // comes back as typed nulls in the new column order, which is the
    // read contract that lets a reader written against today's schema
    // scan every historic version with no migration rewrite (type
    // changes and drops fail loudly — SnapshotsSpec). The output puts
    // both versions' per-source counts and null-lang counts side by
    // side; the oracle states them from source (v1's lang is null for
    // every row BECAUSE the column didn't exist), so the hash pins
    // the null-fill semantics exactly. At 100 TB: evolution is a log
    // metadata change — zero data files rewritten, zero backfill.
    "x31_schema_evolution" -> ((s, d) => {
      import graft.sources.Snapshots
      val dir = s"target/x31_snap_${math.abs(d.hashCode)}"
      Snapshots.drop(s, dir) // deterministic version numbers per run
      val docs = Tables.load(s, d, "documents")
      Snapshots.commit(docs.select(col("doc_id"), col("source")), dir)
      Snapshots.commit(docs.select(col("doc_id"), col("source"), col("lang")), dir)
      def summary(df: DataFrame, v: Int) = df
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("lang").isNull, 1L).otherwise(0L)).as("n_lang_null"),
          sum(col("doc_id")).as("idsum"))
        .select(lit(v).as("version"), col("source"), col("n"),
          col("n_lang_null"), col("idsum"))
      summary(Snapshots.readAligned(s, dir, Some(1)), 1)
        .unionByName(summary(Snapshots.readAligned(s, dir, Some(2)), 2))
        .orderBy(col("version"), col("source"))
    }),

    // q33 — CORRELATED EXISTS / NOT EXISTS: customers with at least
    // one urgent order but no blockbuster order — the classic
    // correlated-subquery pair, declared in SQL so Catalyst's
    // RewritePredicateSubquery turns it into one LeftSemi + one
    // LeftAnti join (never a per-row subquery execution — the only
    // shape that scales; the oracle runs the identical SQL text).
    "q33_correlated_exists" -> ((s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql(
        s"""SELECT c_custkey, c_mktsegment FROM customer c
           |WHERE EXISTS (SELECT 1 FROM orders o
           |              WHERE o.o_custkey = c.c_custkey
           |                AND o.o_orderpriority = '1-URGENT')
           |  AND NOT EXISTS (SELECT 1 FROM orders o
           |                  WHERE o.o_custkey = c.c_custkey
           |                    AND o.o_totalprice > $Q33PriceCut)
           |ORDER BY c_custkey""".stripMargin)
    }),

    // x30 — CDC APPLY (x18's inverse, closing the change-data loop):
    // the change feed x18 emits is only useful if a downstream
    // replica can REPLAY it — so this query diffs the two snapshot
    // states (ops.Diff, x18's exact construction), then reconstructs
    // the new state from the OLD state + the feed alone: anti-join
    // out D/U keys, union in I/U new images. The reconstruction
    // never touches the new snapshot; equality with it is CHECKED
    // (two exceptAll counts must be zero) and stated as
    // `roundtrip_exact`, which the oracle pins to literal true while
    // replaying the new state from source for the per-bucket
    // checksums — a failed replay breaks the hash twice over. At
    // 100 TB this is the replica-maintenance shape: the feed is
    // churn-sized, the apply is one anti-join + union on the key
    // partitioning, and nothing rescans the source table.
    "x30_cdc_apply" -> ((s, d) => {
      val old = Tables.load(s, d, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      val maxKey = 1000000L
      val neu = old.filter(col("c_custkey") % 97 =!= 0)
        .withColumn("c_acctbal",
          when(col("c_custkey") % 13 === 0, round(col("c_acctbal") + 100.0, 2))
            .otherwise(col("c_acctbal")))
        .unionAll(old.filter(col("c_custkey") % 31 === 0)
          .select((col("c_custkey") + maxKey).as("c_custkey"),
            col("c_name"), col("c_acctbal")))
      // the feed is computed once and reused twice (delete keys, new
      // images) — cut it eagerly so the diff join runs once
      val cdc = graft.ops.Diff.snapshot(old, neu, Seq("c_custkey"))
        .cutLineage(true)
      val delKeys = cdc.filter(col("op").isin("D", "U"))
        .select(col("c_custkey"))
      val newImgs = cdc.filter(col("op").isin("I", "U"))
        .select(col("c_custkey"), col("new_c_name").as("c_name"),
          col("new_c_acctbal").as("c_acctbal"))
      val applied = old.join(delKeys, Seq("c_custkey"), "left_anti")
        .unionByName(newImgs)
      val mismatches = applied.exceptAll(neu).count() +
        neu.exceptAll(applied).count()
      applied
        .groupBy((col("c_custkey") % 10).cast("int").as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          dsum2(col("c_acctbal")).as("balsum"),
          sum(col("c_custkey")).as("keysum"))
        .withColumn("roundtrip_exact", lit(mismatches == 0L))
        .orderBy(col("bucket"))
    }),

    // x19 — Z-ORDER LAYOUT + ZONE-MAP PRUNING REPORT: the lakehouse
    // multi-dimensional clustering trick (Delta/Iceberg OPTIMIZE
    // ZORDER BY). Interleave the bits of two query dimensions (user
    // bucket × time-of-day bucket) into a z-value, range-partition
    // files by z, and report each file's per-dimension zone map plus
    // whether a fixed 2-D query box would scan it. Because the box
    // [4,7]×[4,7] is bit-aligned, z-order packs it into ONE file of
    // 16 — the report shows n_match concentrated in scanned files,
    // the data-skipping win a 1-D sort can't give both dims. The
    // layout math is pure integer bit arithmetic (div/mod — no
    // bitwise builtins, so the oracle replays it verbatim); at
    // 100 TB the same z-key is the writeShards sort column and the
    // zone maps land in the shard manifest (sources/Sources.scala) —
    // this query IS the planner's pruning decision, made inspectable.
    "x19_zorder_layout" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
        .withColumn("ub", (col("user_id") % 16).cast("int"))
        .withColumn("tb",
          expr("cast((hour(ts) * 60 + minute(ts)) div 90 as int)"))
        .withColumn("z", expr(zInterleave("div")).cast("int"))
        .withColumn("file", expr(s"z div $ZFileSpan").cast("int"))
      ev.groupBy(col("file"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("ub")).as("min_ub"), max(col("ub")).as("max_ub"),
          min(col("tb")).as("min_tb"), max(col("tb")).as("max_tb"),
          sum(when(col("ub").between(ZBoxLo, ZBoxHi)
            && col("tb").between(ZBoxLo, ZBoxHi), 1L).otherwise(0L)).as("n_match"))
        .withColumn("scanned",
          (col("min_ub") <= ZBoxHi && col("max_ub") >= ZBoxLo &&
            col("min_tb") <= ZBoxHi && col("max_tb") >= ZBoxLo).cast("int"))
        .select(col("file"), col("n_rows"), col("min_ub"), col("max_ub"),
          col("min_tb"), col("max_tb"), col("n_match"), col("scanned"))
        .orderBy(col("file"))
    }),

    // x20 — COMPACTION PLAN (the OPTIMIZE/bin-packing pass every
    // lakehouse table needs): assign small files to merge bins of
    // ~[[CompactTarget]] bytes, largest-first fill, one plan per
    // partition directory. Files are simulated as per-(source,
    // doc-group) stats rows (char sums stand in for bytes); the bin
    // assignment is a cumulative sum over the FILE-STATS table
    // partitioned by source — manifest-sized metadata (≤ dir file
    // count per group, bounded in any sane layout), never the
    // corpus. All math is exact integers, so the plan — and its
    // oracle — is deterministic down to the bin boundaries.
    "x20_compaction_plan" -> ((s, d) => {
      val (gw, tgt) = compactKnobs(s, d)
      val files = Tables.load(s, d, "documents")
        .groupBy(col("source"), expr(s"doc_id div $gw").as("g"))
        .agg(sum(col("n_chars")).cast("long").as("size_bytes"))
        .select(col("source"),
          concat(col("source"), lit("_"), col("g").cast("string")).as("file_id"),
          col("size_bytes"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("size_bytes").desc, col("file_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      files
        .withColumn("cum_before",
          coalesce(sum(col("size_bytes")).over(w), lit(0L)))
        .withColumn("bin", expr(s"cum_before div $tgt").cast("int"))
        .select(col("source"), col("file_id"), col("size_bytes"),
          col("cum_before"), col("bin"))
        .orderBy(col("source"), col("bin"), col("size_bytes").desc, col("file_id"))
    }),

    // x21 — MANIFEST-PRUNED SHARD RANGE READ, end to end: write the
    // documents table as range-partitioned shards + manifest
    // (Sources.writeShards), then answer a key-range predicate by
    // opening ONLY the overlapping files (Sources.readShardRange).
    // The result must equal a plain BETWEEN filter — pruning is a
    // superset selection, never a correctness dependency — and the
    // `pruned` flag pins that file skipping actually happened (the
    // oracle emits literal true; PlanShapeSpec asserts the ratio).
    // Shard write happens at DataFrame-construction time (like x5's
    // training jobs); text is dropped so shards carry only the
    // queried columns.
    "x21_shard_range_read" -> ((s, d) => {
      val dir = s"target/x21_shards_${math.abs(d.hashCode)}"
      graft.sources.Sources.writeShards(
        Tables.load(s, d, "documents")
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars")),
        dir, "doc_id", numShards = 8)
      val (df, filesRead, filesTotal) =
        graft.sources.Sources.readShardRange(s, dir, ShardRangeLo, ShardRangeHi)
      df.select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          lit(filesRead < filesTotal).as("pruned"))
        .orderBy(col("doc_id"))
    }),

    // x22 — BUCKETED CO-LOCATED JOIN (Sources.writeBucketed end to
    // end): both fact tables written bucketed+sorted on the join key
    // into the catalog, then joined — the pre-partitioning pattern
    // that makes a REPEATED big-big join shuffle-free: each side's
    // bucket layout satisfies the join's distribution requirement,
    // so no Exchange on either side (pinned by SourcesSpec with
    // broadcast off; at fixture scale AQE may still elect a
    // broadcast — either way, no hash exchange of the fact tables).
    // At 100 TB this converts the every-query shuffle of the hottest
    // join into a one-time bucketed write. Bucketed writes happen at
    // DataFrame-construction time (like x5/x21's eager stages).
    "x22_bucketed_join" -> ((s, d) => {
      graft.sources.Sources.writeBucketed(
        Tables.load(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice")),
        "graft_x22_orders", "o_orderkey", 8)
      graft.sources.Sources.writeBucketed(
        Tables.load(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_extendedprice")),
        "graft_x22_lineitem", "l_orderkey", 8)
      s.table("graft_x22_lineitem")
        .join(s.table("graft_x22_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(count(lit(1)).as("n_items"),
          dsum2(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("o_year"))
    }),

    // x38 — RUNTIME-FILTER JOIN (Bloom-pruned fact⋈dim): the general-
    // join form of d9's membership-prune pattern. The filtered dim
    // (one customer segment) collapses its join keys into a
    // model-sized Bloom sketch built once on the driver; the orders
    // FACT is pruned by a codegen'd graft_bloom_contains probe
    // NARROWLY — inside the scan's WholeStageCodegen, BEFORE the join
    // exchange (PlanShapeSpec pins the probe under the shuffle) — so
    // only ~selectivity × |fact| rows are ever hashed/shuffled. Bloom
    // false positives survive the prune but not the exact equi join
    // that follows, so the result is exact and the oracle is the
    // plain join-aggregate. At 100 TB this is the difference between
    // shuffling the full fact table and shuffling the dimension's
    // actual match set: the sketch is bounded by the DIM cardinality
    // (model-sized, fpp a build knob), rides to every task as a plan
    // constant, and the prune costs one hash probe per row in codegen
    // — the DPP/runtime-row-filter pattern declared as an operator.
    // Sketch SIZING comes from the committed stats catalog (the
    // second consumer of x37's ANALYZE loop): capacity = the
    // catalog's exact NDV of c_custkey — an upper bound on the keys
    // any filtered dim slice can hold, read from the driver-side
    // summary with ZERO pre-jobs. The round-8 form ran dim.count()
    // per plan construction (a second full dim scan) just to size
    // the sketch; over-capacity only LOWERS the false-positive rate,
    // and FPs never reach the output (the exact join removes them),
    // so the hash is unchanged by construction.
    "x38_bloom_join" -> ((s, d) => {
      graft.functions.BloomContains.register(s)
      val dim = Tables.load(s, d, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_name"))
      val nDim = graft.ops.StatsCatalog.stats(s, d, "customer")("c_custkey").nDistinct
      val bf = dim.stat.bloomFilter("c_custkey", math.max(1000L, nDim), 0.01)
      val fact = Tables.load(s, d, "orders")
        .select(col("o_custkey"), col("o_totalprice"))
        .filter(graft.functions.BloomContains.contains(col("o_custkey"), bf))
      fact.join(dim, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(28,2)")).cast("double")
            .as("spend"))
        .orderBy(col("c_custkey"))
    }),

    // x40 — SKEW-PLANNED JOIN: the stats→planner loop's SECOND (and
    // harder) decision. x37 chose a broadcast side from catalog row
    // counts; here the planner reads the catalog's HEAVY-HITTER
    // share of the probe-side join key (Misra–Gries candidates +
    // exact recount, landed by ANALYZE — x10/x15's machinery in the
    // stats table) and chooses between the plain shuffle join and
    // x23's salted rewrite (Analyze.skewChosenJoin) with ZERO
    // data-scanning jobs at plan time. l_returnflag is the engine's
    // maximal-skew key (top value ≈ half the fact — a plain shuffle
    // join funnels it through one reducer) → "salted";  the same
    // verdict for l_orderkey (top share ~1e-4) → "shuffle" rides in
    // the output, so ONE hashed result shows the strategy flipping
    // on the stats. The oracle replays both verdicts from exact SQL
    // — sound because the decision threshold exceeds MG's 1/(k+1)
    // guarantee line (see Analyze.SkewShareThreshold's contract).
    // SkewSpec/AnalyzeSpec pin the two plan shapes; at 100 TB this
    // is the call AQE cannot make for non-SMJ shapes and static
    // Spark cannot make at all.
    "x40_skew_planned_join" -> ((s, d) => {
      import graft.ops.{Analyze, StatsCatalog}
      val liStats = StatsCatalog.stats(s, d, "lineitem")
      def share(c: String) = liStats(c).top1Share.getOrElse(0.0)
      val li = Tables.load(s, d, "lineitem")
      val dim = li.groupBy(col("l_returnflag"))
        .agg(dsum2(col("l_extendedprice")).as("flag_total"))
      val (joined, flagChoice) = Analyze.skewChosenJoin(
        li.select(col("l_orderkey"), col("l_returnflag")), dim,
        "l_returnflag", share("l_returnflag"),
        shards = 8, tieBreak = "l_orderkey")
      val orderkeyChoice =
        if (share("l_orderkey") >= Analyze.SkewShareThreshold) "salted"
        else "shuffle"
      joined.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"), max(col("flag_total")).as("flag_total"))
        .select(col("l_returnflag"), col("n_rows"), col("flag_total"),
          lit(flagChoice).as("flag_choice"),
          lit(orderkeyChoice).as("orderkey_choice"))
        .orderBy(col("l_returnflag"))
    }),

    // x39 — K-ANONYMITY AUDIT (privacy governance for training
    // data): generalize the quasi-identifiers (nation, market
    // segment, account-balance band — the binning step every
    // k-anonymity pipeline applies before judging), then report each
    // equivalence class's size, whether it clears k = KAnonK, and
    // the corpus-level re-identification exposure (rows in
    // sub-threshold classes). A record in a class smaller than k is
    // re-identifiable by its quasi-identifiers alone — the audit
    // that must pass before a tabular corpus ships to training. One
    // keyed aggregate + a 1-row totals scalar broadcast back onto
    // the report; risk_rate is a raw double quotient of exact
    // integers (engine-identical). At 100 TB: class cardinality is
    // the generalized-key space (bounded by design — that is what
    // generalization is FOR), and the totals row is aggregate-sized.
    "x39_k_anonymity" -> ((s, d) => {
      val classes = Tables.load(s, d, "customer")
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000).cast("long").as("bal_band"))
        .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_band"))
        .agg(count(lit(1)).as("class_size"))
      val totals = classes.agg(
        sum(col("class_size")).as("n_total"),
        sum(when(col("class_size") < KAnonK, col("class_size"))
          .otherwise(lit(0L))).as("n_at_risk"))
      classes.crossJoin(broadcast(totals)) // 1-row totals scalar
        .select(col("c_nationkey"), col("c_mktsegment"), col("bal_band"),
          col("class_size"),
          (col("class_size") >= KAnonK).as("anonymous"),
          col("n_at_risk"),
          (col("n_at_risk").cast("double") / col("n_total")).as("risk_rate"))
        .orderBy(col("c_nationkey"), col("c_mktsegment"), col("bal_band"))
    }),

    // x23 — SALTED SHUFFLE JOIN (ops.Skew.saltedJoin): the skew
    // remedy for a probe side hot on few key values when the build
    // side can't broadcast. l_returnflag is the engine's maximal-skew
    // key (3 values across the whole fact table — a plain shuffle
    // join funnels a third of the corpus per reducer); the salted
    // rewrite joins on (key, salt) so each hot key spreads over 8
    // reducers, build side replicated 8× (3 rows → 24). The final
    // per-flag aggregate proves multiplicity is unchanged: n_rows
    // must equal the plain group count the oracle states. SkewSpec
    // pins the (key, salt) exchange in the plan.
    "x23_salted_join" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem")
      val dim = li.groupBy(col("l_returnflag"))
        .agg(dsum2(col("l_extendedprice")).as("flag_total"))
      graft.ops.Skew.saltedJoin(
          li.select(col("l_orderkey"), col("l_returnflag")),
          dim, "l_returnflag", shards = 8, tieBreak = "l_orderkey")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          max(col("flag_total")).as("flag_total"))
        .orderBy(col("l_returnflag"))
    }),

    // s6 — stream-static ENRICHMENT as a declared batch query: the
    // events fact left-joined to a bounded dimension (customer
    // segments) through EventStream.enrichWithDim — the exact
    // function the streaming path runs per micro-batch (broadcast
    // the dimension, no stream shuffle, no state store; parity with
    // the streaming side is pinned by StreamingSpec).
    // x24 — TIME TRAVEL over the copy-on-write snapshot log
    // (sources.Snapshots): commit customer balances as of 1996
    // (version 1), commit the post-1997 refresh (version 2), then
    // read version 1 AGAIN — after v2 exists — next to latest. The
    // oracle states both table states straight from orders, so the
    // hash match proves snapshot ISOLATION: the v1 read is
    // bit-identical to the pre-refresh aggregate even though a later
    // commit rewrote the table (old version files are immutable; the
    // log, not the directory tree, defines visibility). Like
    // x21/x22, the writes run at query construction and their cost
    // is honestly inside this query's bench time. At 100 TB the
    // version unit becomes file-level deltas + an atomic log store;
    // the reader contract exercised here is identical.
    "x24_time_travel" -> ((s, d) => {
      import graft.sources.Snapshots
      val dir = s"target/x24_snap_${math.abs(d.hashCode)}"
      commitBalanceVersions(s, d, dir)
      val v1 = Snapshots.read(s, dir, Some(1))
        .select(col("o_custkey"), col("balance").as("bal_v1"),
          col("n_orders").as("n_orders_v1"))
      val latest = Snapshots.read(s, dir)
      latest.join(v1, Seq("o_custkey"), "left")
        .select(col("o_custkey"), col("bal_v1"), col("n_orders_v1"),
          col("balance").as("bal_latest"), col("n_orders").as("n_orders_latest"),
          lit(Snapshots.versions(s, dir).size).as("n_versions"))
        .orderBy(col("o_custkey"))
    }),

    "s6_enrich_events" -> ((s, d) => {
      val dim = Tables.load(s, d, "customer")
        .select(col("c_custkey").as("user_id"),
          col("c_mktsegment").as("segment"))
      graft.streaming.EventStream.enrichWithDim(
          Tables.load(s, d, "events"), dim)
        .select(col("event_id"), col("user_id"), col("segment"))
        .orderBy(col("event_id"))
    }),

    // s7 — AT-LEAST-ONCE DELIVERY DEDUP: the ingest-side twin of the
    // d1 batch operator. Real feeds re-deliver (producer retries,
    // consumer-group rebalances), so the query synthesizes the
    // at-least-once shape — a hash-chosen ~10% of events arrives
    // TWICE — and pushes the feed through EventStream.dedupedEvents,
    // the SAME function the streaming path runs per micro-batch
    // (dropDuplicatesWithinWatermark there, dropDuplicates here —
    // StreamingSpec pins the parity across micro-batch splits). The
    // summary proves exactly-once state from at-least-once input:
    // n_delivered counts the duplicated feed, n_unique/sum_value the
    // deduped survivors — re-deliveries are row-identical, so the
    // dedup pick is deterministic set semantics, no arbitrary-row
    // hazard. At 100 TB/day: state is bounded by the watermark
    // horizon (ids are forgotten once the watermark passes), which is
    // the only dedup shape that runs forever on an unbounded feed.
    "s7_at_least_once_dedup" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
      val redelivered = ev.filter(
        graft.ops.TextFns.hash60(concat(lit("redeliver|"),
          col("event_id").cast("string"))) % 10 === 0)
      val feed = ev.unionByName(redelivered)
      val deduped = graft.streaming.EventStream.dedupedEvents(feed)
      val delivered = feed.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_delivered"))
      val unique = deduped.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_unique"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      delivered.join(unique, Seq("event_type"))
        .select(col("event_type"), col("n_delivered"), col("n_unique"),
          col("sum_value"))
        .orderBy(col("event_type"))
    }),

    // x25 — THE COMPOSED LAKEHOUSE PIPELINE: the three incremental
    // operators run TOGETHER the way a nightly ingest actually runs
    // them — x14 admits tonight's document batch against the stored
    // corpus (band-index probe, no corpus rescan), v20 appends the
    // batch vectors to the stored IVF index (fixed centroids, no
    // retrain, no stored-side rescan), and x24's snapshot log commits
    // the combined store state as version 2 next to the pre-batch
    // version 1. The output reads the PINNED v1 AFTER v2 exists,
    // side by side with latest — and the oracle states BOTH versions
    // straight from source (x14's verdict chain + v20's fixed-
    // centroid assignment chain), so the hash match proves at once:
    // admission semantics, append ≡ rebuild, and snapshot isolation
    // of the composed commit. State rows are (store, bucket, id):
    // the doc corpus keyed by doc_id and the vector store keyed by
    // (cluster_id, vec_id); the compared output is per-bucket counts
    // + id-sum checksums — integer-exact on both engines. At 100 TB:
    // each stage is the already-proven incremental shape, the commit
    // is file-listing metadata (Snapshots), and the summary is one
    // shuffle per version over store-state rows.
    "x25_pipeline_snapshot" -> ((s, d) => {
      import graft.sources.Snapshots
      val dir = s"target/x25_snap_${math.abs(d.hashCode)}"
      Snapshots.drop(s, dir) // deterministic version numbers per run
      Snapshots.commit(x25State(s, d, postBatch = false), dir)
      Snapshots.commit(x25State(s, d, postBatch = true), dir)
      val v1 = Snapshots.read(s, dir, Some(1))
        .groupBy(col("store"), col("bucket"))
        .agg(count(lit(1)).as("n_v1"), sum(col("id")).as("idsum_v1"))
      val latest = Snapshots.read(s, dir)
        .groupBy(col("store"), col("bucket"))
        .agg(count(lit(1)).as("n_latest"), sum(col("id")).as("idsum_latest"))
      latest.join(v1, Seq("store", "bucket"), "full_outer")
        .select(col("store"), col("bucket"),
          coalesce(col("n_v1"), lit(0L)).as("n_v1"),
          coalesce(col("idsum_v1"), lit(0L)).as("idsum_v1"),
          coalesce(col("n_latest"), lit(0L)).as("n_latest"),
          coalesce(col("idsum_latest"), lit(0L)).as("idsum_latest"),
          lit(Snapshots.versions(s, dir).size).as("n_versions"))
        .orderBy(col("store"), col("bucket"))
    }),

    // x26 — COMPACTION EXECUTION (x20's plan materialized through
    // x24's snapshot machinery — the OPTIMIZE command, not just its
    // planner): version 1 commits the table in the fragmented layout
    // x20 models (one hive partition per micro-file), then every row
    // of the STORED v1 — not the source table — is routed to its
    // planned bin and committed as version 2, partitioned by
    // (source, bin) with each bin's rows repartition-colocated into
    // exactly ONE data file. The `one_file_per_bin` flag is computed
    // from the commit's FILE LISTING (Snapshots.filesPerDir,
    // metadata-sized — the x21 `pruned` pattern: the oracle states
    // literal true, so a layout that failed to compact breaks the
    // hash). Everything else replays in SQL: the bin routing is
    // x20's exact integer plan, and the per-bin (n_files_in,
    // size_bytes, n_docs, docsum) aggregates prove the rewrite moved
    // every row exactly once — compaction changes layout, never
    // content. At 100 TB: routing is one manifest-sized plan join;
    // the rewrite shuffles each bin's rows once to their single
    // writer (the point of the exercise); the old layout stays
    // readable at v1 (time travel) until vacuumed.
    "x26_compaction_exec" -> ((s, d) => {
      import graft.sources.Snapshots
      val dir = s"target/x26_snap_${math.abs(d.hashCode)}"
      Snapshots.drop(s, dir) // deterministic version numbers per run
      val (gw, _) = compactKnobs(s, d)
      val frag = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("n_chars"), col("source"),
          expr(s"doc_id div $gw").as("g"))
      // colocate each micro-file's rows before the write: without
      // this every task emits a file into every partition dir it
      // touches (tasks × dirs files — measured 135 s at sf0.1 before
      // the knobs were scale-aware), with it the fragmented layout
      // is exactly one data file per micro-file dir
      Snapshots.commit(frag.repartition(col("source"), col("g")),
        dir, partitionBy = Seq("source", "g"))
      val plan = defs("x20_compaction_plan")(s, d)
        .select(col("source"), col("file_id"), col("bin"))
      val routed = Snapshots.read(s, dir, Some(1))
        .withColumn("file_id",
          concat(col("source"), lit("_"), col("g").cast("string")))
        .join(plan, Seq("source", "file_id"))
        .select(col("doc_id"), col("n_chars"), col("file_id"),
          col("source"), col("bin"))
      Snapshots.commit(routed.repartition(col("source"), col("bin")),
        dir, partitionBy = Seq("source", "bin"))
      val oneFilePerBin =
        Snapshots.filesPerDir(s, dir, 2).values.forall(_ == 1)
      Snapshots.read(s, dir, Some(2))
        .groupBy(col("source"), col("bin").cast("int").as("bin"))
        .agg(countDistinct(col("file_id")).as("n_files_in"),
          sum(col("n_chars")).as("size_bytes"),
          count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("docsum"))
        .withColumn("one_file_per_bin", lit(oneFilePerBin))
        .orderBy(col("source"), col("bin"))
    }),

    // x29 — VACUUM (snapshot retention): three committed states of
    // the x24 balance table, then Snapshots.vacuum(keepLast = 2)
    // physically removes v1 — the log is pruned FIRST (rename-atomic,
    // so a crash mid-vacuum leaves invisible garbage, never a log
    // entry pointing at deleted data), and a kept logical version's
    // base chain is reference-protected (SnapshotsSpec). The output
    // reads BOTH surviving versions after the vacuum next to the
    // listing-checked `v1_dir_gone` flag; the oracle states the two
    // surviving states from source plus literal true, so the hash
    // proves retention removed exactly the expired version and
    // nothing the survivors need. At 100 TB vacuum is what caps
    // storage at (retention × churn) instead of all history — and
    // the log-first ordering is what makes it safe to crash.
    "x29_vacuum" -> ((s, d) => {
      import graft.sources.Snapshots
      val dir = s"target/x29_snap_${math.abs(d.hashCode)}"
      Snapshots.drop(s, dir) // deterministic version numbers per run
      val orders = Tables.load(s, d, "orders")
      def balances(cut: Option[String]) = cut.fold(orders)(c =>
          orders.filter(col("o_orderdate") < lit(c).cast("timestamp")))
        .groupBy(col("o_custkey"))
        .agg(dsum2(col("o_totalprice")).as("balance"),
          count(lit(1)).as("n_orders"))
      Snapshots.commit(balances(Some("1996-01-01")), dir)
      Snapshots.commit(balances(Some("1997-01-01")), dir)
      Snapshots.commit(balances(None), dir)
      val dropped = Snapshots.vacuum(s, dir, keepLast = 2)
      val v1Gone = dropped == Seq(1) && !Snapshots.versionDirExists(s, dir, 1)
      val v2 = Snapshots.read(s, dir, Some(2))
        .select(col("o_custkey"), col("balance").as("bal_v2"),
          col("n_orders").as("n_orders_v2"))
      val v3 = Snapshots.read(s, dir, Some(3))
      v3.join(v2, Seq("o_custkey"), "left")
        .select(col("o_custkey"), col("bal_v2"), col("n_orders_v2"),
          col("balance").as("bal_v3"), col("n_orders").as("n_orders_v3"),
          lit(Snapshots.versions(s, dir).size).as("n_versions_after"),
          lit(v1Gone).as("v1_dir_gone"))
        .orderBy(col("o_custkey"))
    }),

    // x27 — DELETION VECTORS (merge-on-read row deletes): version 1
    // commits the document corpus; version 2 commits ONLY the keys of
    // a GDPR-style takedown set (hash-derived, ~5% of doc_ids) as a
    // deletion vector referencing v1 — the base's data files are
    // never rewritten, and `base_files_untouched` states it from the
    // FILE LISTING captured before and after the delete commit
    // (Snapshots.fileSignature — the x21/x26 metadata-check pattern:
    // the oracle pins literal true, so a delete that rewrote or
    // touched the base breaks the hash). Reads resolve the version as
    // base ANTI-JOIN keys (Snapshots.readResolved). The oracle states
    // both versions from source — v1 the full corpus, v2 the corpus
    // minus the replayed hash predicate — so one hash match proves
    // the DV read-path semantics AND base immutability. At 100 TB:
    // deleting a few million rows costs a key-sized write + a
    // broadcast-able anti-join at read, not a corpus rewrite; the
    // anti-join keys ship with the manifest exactly like Delta DVs /
    // Iceberg equality deletes.
    "x27_deletion_vectors" -> ((s, d) => {
      import graft.sources.Snapshots
      val dir = s"target/x27_snap_${math.abs(d.hashCode)}"
      Snapshots.drop(s, dir) // deterministic version numbers per run
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      Snapshots.commit(docs, dir)
      val sigBefore = Snapshots.fileSignature(s, dir, 1)
      val takedown = docs.filter(
          graft.ops.TextFns.hash60(concat(lit("gdpr|"),
            col("doc_id").cast("string"))) % 20 === 0)
        .select(col("doc_id"))
      Snapshots.commitDeletes(takedown, dir, base = 1)
      val untouched = Snapshots.fileSignature(s, dir, 1) == sigBefore
      val v1 = Snapshots.readResolved(s, dir, Some(1))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_v1"), sum(col("doc_id")).as("idsum_v1"))
      val v2 = Snapshots.readResolved(s, dir, Some(2))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_v2"), sum(col("doc_id")).as("idsum_v2"))
      v1.join(v2, Seq("source"))
        .select(col("source"), col("n_v1"), col("idsum_v1"),
          col("n_v2"), col("idsum_v2"),
          lit(untouched).as("base_files_untouched"))
        .orderBy(col("source"))
    }),

    // x28 — DYNAMIC PARTITION OVERWRITE (INSERT OVERWRITE …
    // PARTITION / replaceWhere): version 1 commits per-doc scores for
    // the whole corpus; version 2 commits ONLY the re-scored rows of
    // partition source = X28Pval, referencing v1 for every other
    // partition (Snapshots.commitReplace). Two listing-checked flags
    // ride in the output: `base_files_untouched` (v1's files are
    // byte-identical after the overwrite — x27's witness) and
    // `only_replaced_partition` (v2's directory holds exactly the one
    // hive partition it claims to replace). Reads resolve as
    // base-minus-partition ∪ replacement; the oracle states both
    // versions from source with the re-score replayed, so the hash
    // match proves the overwrite touched exactly one partition's
    // content and nothing else. At 100 TB this is the nightly
    // re-score shape: one partition's write, never a table rewrite,
    // with old versions still pinned-readable (x24's time travel).
    "x28_partition_overwrite" -> ((s, d) => {
      import graft.sources.Snapshots
      val dir = s"target/x28_snap_${math.abs(d.hashCode)}"
      Snapshots.drop(s, dir) // deterministic version numbers per run
      val scores = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("source"), col("n_chars").as("score"))
      Snapshots.commit(scores, dir)
      val sigBefore = Snapshots.fileSignature(s, dir, 1)
      val rescored = scores.filter(col("source") === X28Pval)
        .withColumn("score", col("score") * 2)
      Snapshots.commitReplace(rescored, dir, base = 1,
        pcol = "source", pval = X28Pval)
      val untouched = Snapshots.fileSignature(s, dir, 1) == sigBefore
      val onlyReplaced = Snapshots.filesPerDir(s, dir, 2)
        .keys.forall(_.contains(s"source=$X28Pval"))
      val v1 = Snapshots.readResolved(s, dir, Some(1))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_v1"), sum(col("score")).as("scoresum_v1"))
      val v2 = Snapshots.readResolved(s, dir, Some(2))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_v2"), sum(col("score")).as("scoresum_v2"))
      v1.join(v2, Seq("source"))
        .select(col("source"), col("n_v1"), col("scoresum_v1"),
          col("n_v2"), col("scoresum_v2"),
          lit(untouched).as("base_files_untouched"),
          lit(onlyReplaced).as("only_replaced_partition"))
        .orderBy(col("source"))
    })
  )

  /** x28: the overwritten partition (a mid-range source so the query
    * exercises base partitions on both sides of it). */
  val X28Pval = "src3"

  /** q33: the blockbuster-order threshold (sits inside every SF's
    * o_totalprice range, so both EXISTS legs filter non-trivially). */
  val Q33PriceCut = 300000

  /** x32: the audit's minimum-length gate (roughly a quarter of every
    * fixture's docs fall below it, so the staged refresh differs
    * non-trivially from v1). */
  val X32MinChars = 200

  /** x25's store state at one point in time, as (store, bucket, id)
    * rows: the document corpus (bucket −1, id = doc_id) and the
    * vector store (bucket = cluster_id, id = vec_id). Pre-batch =
    * the x14 "existing" doc split + the stored history index
    * assignment; post-batch adds the x14-admitted unique batch docs
    * and swaps in the v20-appended index — whose stored side comes
    * from the SAME persisted relations, so the composed plan admits
    * the batch without rescanning either stored corpus
    * (PlanShapeSpec pins it). */
  private[graft] def x25State(s: SparkSession, d: String,
                              postBatch: Boolean): DataFrame = {
    val isNew = (graft.ops.TextFns.hash60(concat(lit("inc|"),
      col("doc_id").cast("string"))) % 10).cast("int") >= 8
    val existing = Tables.load(s, d, "documents")
      .filter(!isNew)
      .select(lit("docs").as("store"), lit(-1).cast("int").as("bucket"),
        col("doc_id").cast("long").as("id"))
    val docsState =
      if (!postBatch) existing
      else existing.unionByName(
        DedupQ.defs("x14_incremental_dedup")(s, d)
          .filter(col("verdict") === "unique")
          .select(lit("docs").as("store"), lit(-1).cast("int").as("bucket"),
            col("doc_id").cast("long").as("id")))
    val index =
      if (!postBatch) VectorQ.x25HistoryIndex(s, d)
      else VectorQ.x25AppendedIndex(s, d)
    val vecsState = index.assigned
      .select(lit("vecs").as("store"), col("cluster_id").cast("int").as("bucket"),
        col("vec_id").cast("long").as("id"))
    docsState.unionByName(vecsState)
  }

  /** x21: the queried key range. Constant across SFs (doc_id starts
    * at 0 in every fixture), sized so 8 shards always leave some
    * non-overlapping — the `pruned` flag must be true at every SF. */
  val ShardRangeLo = 100L
  val ShardRangeHi = 249L

  /** x19: bit-interleaved z-value of the 4-bit buckets `ub`/`tb`,
    * written with integer div/mod only so the identical expression
    * (modulo the division operator) runs on Spark (`div`) and DuckDB
    * (`//`). ub bits land on odd positions, tb on even. */
  def zInterleave(intDiv: String): String =
    (0 until 4).map { i =>
      s"((ub $intDiv ${1 << i}) % 2) * ${1 << (2 * i + 1)}" +
        s" + ((tb $intDiv ${1 << i}) % 2) * ${1 << (2 * i)}"
    }.mkString(" + ")

  /** x19 layout constants: z-values per file (16 files × span 16
    * covers the 8-bit z space) and the query box [lo, hi] on both
    * dimensions. */
  val ZFileSpan = 16
  val ZBoxLo = 4
  val ZBoxHi = 7

  /** x52: the executed layout's file count (matches x19's 16-file
    * report granularity — but files here are equal-ROW rank slices
    * of the z order, the shape an OPTIMIZE job actually writes, not
    * x19's equal-z-span simulation). */
  val ZExecFiles = 16

  /** x52: [[zInterleave]]'s bit math in plain Scala, for turning the
    * bit-aligned query box into its ONE contiguous z interval on the
    * driver. A box aligned to a power-of-two grid maps to a single z
    * range ([zOf(lo,lo), zOf(hi,hi)]); a general box decomposes into
    * a short list of such aligned sub-boxes (the BIGMIN/LITMAX
    * range-splitting of the z-order-curve literature) probed the
    * same way — the interval count is a planner constant either way,
    * never data-sized. */
  def zOf(ub: Int, tb: Int): Int =
    (0 until 4).map(i => ((ub >> i) & 1) * (1 << (2 * i + 1)) +
      ((tb >> i) & 1) * (1 << (2 * i))).sum

  /** x24/x54 shared oracle: both versions of the balance table stated
    * straight from orders. x54 shares the STRING deliberately — the
    * SQL-surface run must hash-match the Scala API's pinned reads. */
  val X63OracleSql: String =
    """WITH v1 AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS balance,
      |    COUNT(*) AS n_orders
      |  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
      |  GROUP BY 1),
      |v2 AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS balance,
      |    COUNT(*) AS n_orders
      |  FROM orders GROUP BY 1)
      |SELECT 'at_v1' AS as_of, o_custkey, balance, n_orders,
      |  CAST(1 AS INT) AS resolved_version FROM v1
      |UNION ALL
      |SELECT 'between', o_custkey, balance, n_orders, CAST(1 AS INT) FROM v1
      |UNION ALL
      |SELECT 'after_v2', o_custkey, balance, n_orders, CAST(2 AS INT) FROM v2
      |ORDER BY as_of, o_custkey""".stripMargin

  /** x69/x71 shared oracle: rows restated straight from orders (the
    * layout must be invisible to the answer); pruned = TRUE is the
    * listing witness — a translation that dropped a matching
    * partition would drop rows, one that failed to fire would flip
    * the flag. */
  val X69OracleSql: String =
    """SELECT o_orderkey, o_custkey,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
      |  TRUE AS pruned
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate <= TIMESTAMP '1996-06-30 23:59:59'
      |  AND o_custkey IN (0, 2, 3, 4, 5, 6)
      |ORDER BY o_orderkey""".stripMargin

  val X24OracleSql: String =
    """WITH v1 AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bal_v1,
      |    COUNT(*) AS n_orders_v1
      |  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
      |  GROUP BY 1),
      |latest AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bal_latest,
      |    COUNT(*) AS n_orders_latest
      |  FROM orders GROUP BY 1)
      |SELECT l.o_custkey, v.bal_v1, v.n_orders_v1,
      |  l.bal_latest, l.n_orders_latest, CAST(2 AS INT) AS n_versions
      |FROM latest l LEFT JOIN v1 v USING (o_custkey)
      |ORDER BY o_custkey""".stripMargin

  /** x51/x58/x60 shared oracle CTE: the four merge arms stated as
    * three UNION legs over the replayed changeset — matched rows
    * surviving the closure line take the source payload, unmatched
    * targets keep unless negative, unmatched source keys insert
    * above the line. x58 shares the STRING deliberately
    * (merge-on-read must reproduce copy-on-write row for row); x60
    * narrows the changeset with its constraint via `srcCond` —
    * `src0` is the raw changeset, `src` what the merge admits. */
  def x51MergedCte(srcCond: String): String =
    s"""latest AS (
       |  SELECT o_custkey, o_totalprice,
       |    row_number() OVER (PARTITION BY o_custkey
       |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
       |  FROM orders
       |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'),
       |restated AS (
       |  SELECT c.c_custkey, c.c_name, l.o_totalprice AS c_acctbal
       |  FROM latest l JOIN customer c ON l.o_custkey = c.c_custkey
       |  WHERE l.rn = 1),
       |src0 AS (
       |  SELECT c_custkey, c_name, c_acctbal FROM restated
       |  UNION ALL
       |  SELECT c_custkey + $X51KeyShift, 'branch of ' || c_name, c_acctbal
       |  FROM restated WHERE c_custkey % 31 = 0),
       |src AS (SELECT * FROM src0 WHERE $srcCond),
       |merged AS (
       |  SELECT s.c_custkey, s.c_name, s.c_acctbal
       |  FROM src s JOIN customer t ON s.c_custkey = t.c_custkey
       |  WHERE s.c_acctbal >= $X51CloseBelow
       |  UNION ALL
       |  SELECT t.c_custkey, t.c_name, t.c_acctbal
       |  FROM customer t LEFT JOIN src s ON s.c_custkey = t.c_custkey
       |  WHERE s.c_custkey IS NULL AND t.c_acctbal >= 0
       |  UNION ALL
       |  SELECT s.c_custkey, s.c_name, s.c_acctbal
       |  FROM src s LEFT JOIN customer t ON s.c_custkey = t.c_custkey
       |  WHERE t.c_custkey IS NULL AND s.c_acctbal >= $X51CloseBelow)""".stripMargin

  /** x51/x58 shared target: the customer balance table. */
  private def x51Target(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))

  /** x51/x58 shared changeset: each customer's latest 1997+ order
    * restates their balance (one row per key — mergeInto's
    * contract), and key % 31 customers also open a branch account
    * under a shifted, provably-unmatched key. */
  private def x51Changeset(s: SparkSession, d: String,
                           target: DataFrame): DataFrame = {
    val wl = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val restated = Tables.load(s, d, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
      .withColumn("rn", row_number().over(wl))
      .filter(col("rn") === 1)
      .join(target.select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"),
        col("o_totalprice").as("c_acctbal"))
    restated.unionByName(
      restated.filter(col("c_custkey") % 31 === 0)
        .select((col("c_custkey") + X51KeyShift).as("c_custkey"),
          concat(lit("branch of "), col("c_name")).as("c_name"),
          col("c_acctbal")))
  }

  /** x53/x57 shared oracle CTE: the 15 equi-depth boundaries of
    * o_totalprice recomputed from exact ROW_NUMBER ranks — the same
    * ceil(i·n/16) order statistics StatsCatalog.equiDepth commits, so
    * a consumer's replay can never drift from the catalog. */
  val HistBoundsCte: String =
    """n AS (SELECT COUNT(o_totalprice) AS c FROM orders),
      |ranked AS (SELECT CAST(o_totalprice AS DOUBLE) AS v,
      |    ROW_NUMBER() OVER (ORDER BY o_totalprice) AS r
      |  FROM orders WHERE o_totalprice IS NOT NULL),
      |bounds AS (SELECT i,
      |    (SELECT v FROM ranked, n WHERE r = (i * c + 15) // 16) AS b
      |  FROM range(1, 16) t(i))""".stripMargin

  /** x33/x56 shared oracle: all three per-version feeds stated from
    * source (insert flood, DV keys, replace-partition diff). x56
    * shares the STRING deliberately — the SQL-surface feed must
    * hash-match the Scala API's. */
  val X33OracleSql: String =
    s"""WITH del AS (
       |  SELECT doc_id FROM documents
       |  WHERE CAST(('0x' || substr(md5('gdpr|' || doc_id::VARCHAR), 1, 15))
       |    AS BIGINT) % 20 = 0),
       |s3 AS (
       |  SELECT doc_id, n_chars FROM documents d
       |  WHERE source = '$X28Pval'
       |    AND NOT EXISTS (SELECT 1 FROM del WHERE del.doc_id = d.doc_id)),
       |allc AS (
       |  SELECT CAST(1 AS INT) AS to_version, 'I' AS op, doc_id
       |  FROM documents
       |  UNION ALL
       |  SELECT CAST(2 AS INT), 'D', doc_id FROM del
       |  UNION ALL
       |  SELECT CAST(3 AS INT),
       |    CASE WHEN n_chars < $X32MinChars THEN 'D' ELSE 'U' END, doc_id
       |  FROM s3)
       |SELECT to_version, op, COUNT(*) AS n,
       |  CAST(SUM(doc_id) AS BIGINT) AS keysum
       |FROM allc GROUP BY to_version, op
       |ORDER BY to_version, op""".stripMargin

  /** x33/x56 shared frame: (re)commit the three-kind change history —
    * v1 data (full corpus), v2 deletion vector (GDPR takedown keys),
    * v3 partition replace (one source rescored) — under `dir`. */
  private def x33CommitHistory(s: SparkSession, d: String, dir: String): Unit = {
    import graft.sources.Snapshots
    Snapshots.drop(s, dir) // deterministic version numbers per run
    val docs = Tables.load(s, d, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    Snapshots.commit(docs, dir)
    val takedown = docs.filter(
        graft.ops.TextFns.hash60(concat(lit("gdpr|"),
          col("doc_id").cast("string"))) % 20 === 0)
      .select(col("doc_id"))
    Snapshots.commitDeletes(takedown, dir, base = 1)
    val rescored = Snapshots.readResolved(s, dir, Some(2))
      .filter(col("source") === X28Pval && col("n_chars") >= X32MinChars)
      .withColumn("n_chars", col("n_chars") * 2)
    Snapshots.commitReplace(rescored, dir, base = 2,
      pcol = "source", pval = X28Pval)
  }

  /** x24/x54 shared frame: (re)commit the customer balance table as
    * exactly two versions under `dir` — v1 over pre-1997 orders, v2
    * over all — so both queries pin reads against a known log. */
  /** x66/x67/x68 fact frame: the governed orders table the MV is
    * declared over — v1 is the pre-1997 slice, v2 (x68's outdating
    * commit) everything. */
  private def x66Fact(s: SparkSession, d: String, allRows: Boolean): DataFrame = {
    val o = Tables.load(s, d, "orders").select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_orderpriority"), col("o_totalprice"), col("o_orderdate"))
    if (allRows) o
    else o.filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
  }

  /** x66/x67/x68 shared setup: commit the fact (v1), build + commit
    * the (status, priority) MV over it, register it for MvRewrite
    * with freshness = "the fact's published log is still exactly
    * what the view was built from". Per-query dirs (`tag`) keep the
    * three declared queries order-independent. */
  private def x66Setup(s: SparkSession, d: String, tag: String): (String, String) = {
    import graft.sources.Snapshots
    val factDir = s"target/x66_fact_${tag}_${math.abs(d.hashCode)}"
    val mvDir = s"target/x66_mv_${tag}_${math.abs(d.hashCode)}"
    Snapshots.drop(s, factDir)
    Snapshots.commit(x66Fact(s, d, allRows = false), factDir)
    val fact = Snapshots.read(s, factDir)
    val v0 = Snapshots.versions(s, factDir)
    graft.plans.MatView.create(s, s"x66_$tag", fact, mvDir,
      groupCols = Seq("o_orderstatus", "o_orderpriority"),
      sumCols = Seq("price" -> col("o_totalprice").cast("decimal(18,2)")),
      minMaxCols = Seq("price" -> col("o_totalprice")),
      isFresh = () => Snapshots.versions(s, factDir) == v0)
    (factDir, mvDir)
  }

  /** Root paths of every file scan in the optimized plan — the one
    * collector behind every MV plan-decision pin (x66UsedMv, x75's
    * served_by); one definition so the pins can't drift. */
  private def scanRoots(q: DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    q.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
        case _ => Nil
      }
    }.flatten
  }

  /** The hashed plan-decision flag: true iff the optimized plan
    * scans the MV and NOT the fact — a declined (or half-applied)
    * rewrite can't fake it. */
  /** The MV family's shared consumer mechanics: bind the fact read
    * as a view, run the aggregate text, pin the plan decision
    * (used_mv) and the total order. */
  private def x66Consume(s: SparkSession, fact: DataFrame, view: String,
                         sql: String, mvDir: String, factDir: String,
                         order: String*): DataFrame = {
    fact.createOrReplaceTempView(view)
    val q = s.sql(sql)
    q.withColumn("used_mv", lit(x66UsedMv(q, mvDir, factDir)))
      .orderBy(order.map(col): _*)
  }

  private def x66UsedMv(q: DataFrame, mvDir: String, factDir: String): Boolean = {
    val paths = scanRoots(q)
    paths.exists(_.contains(mvDir)) && !paths.exists(_.contains(factDir))
  }

  /** x69/x71 shared layout: one retention year of orders landed
    * month(o_orderdate) × bucket8(o_custkey) — 12 × 8 = 96
    * directories, enough layout to make the prune witness real
    * without x26-class per-directory committer overhead drowning the
    * measurement (the commit is one co-located shuffle + one file
    * per directory either way; dirs, not rows, set its cost).
    * Per-query dirs (`tag`) keep the declared queries
    * order-independent. */
  private def x69Layout(s: SparkSession, d: String, tag: String,
                        buckets: Int = 8): String = {
    import graft.plans.HiddenPartitioning
    val dir = s"target/x69_hidden_${tag}_${math.abs(d.hashCode)}"
    graft.sources.Snapshots.drop(s, dir)
    HiddenPartitioning.write(s,
      Tables.load(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_orderkey"),
          col("o_custkey"), col("o_orderdate"), col("o_totalprice")),
      dir,
      Seq(HiddenPartitioning.Month("o_orderdate"),
        HiddenPartitioning.Bucket("o_custkey", buckets)))
    dir
  }

  private def commitBalanceVersions(s: SparkSession, d: String, dir: String,
                                    ts: Option[(Long, Long)] = None): Unit = {
    import graft.sources.Snapshots
    Snapshots.drop(s, dir) // deterministic version numbers per run
    val orders = Tables.load(s, d, "orders")
    val cut = lit("1997-01-01").cast("timestamp")
    def balances(o: DataFrame) = o.groupBy(col("o_custkey"))
      .agg(dsum2(col("o_totalprice")).as("balance"),
        count(lit(1)).as("n_orders"))
    val v1 = balances(orders.filter(col("o_orderdate") < cut))
    val v2 = balances(orders)
    ts match {
      case Some((t1, t2)) =>
        Snapshots.commitAt(v1, dir, t1); Snapshots.commitAt(v2, dir, t2)
      case None =>
        Snapshots.commit(v1, dir); Snapshots.commit(v2, dir)
    }
  }

  /** x52/x55: the events with their 4-bit query buckets and z-value
    * (x19's exact integer interleave). */
  private def zEvents(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "events")
      .withColumn("ub", (col("user_id") % 16).cast("int"))
      .withColumn("tb",
        expr("cast((hour(ts) * 60 + minute(ts)) div 90 as int)"))
      .withColumn("z", expr(zInterleave("div")).cast("int"))
      .select(col("event_id"), col("ub"), col("tb"), col("z"))

  /** x52/x55: dense global rank in z order (GlobalIndexExec — range
    * shuffle + local sorts, no single reducer) cut into
    * [[ZExecFiles]] equal-row slices numbered from `firstFile`.
    * `nEst` may be an estimate (catalog-derived): the `least` cap
    * keeps slice ids in range; a slightly uneven last slice costs
    * nothing — zone maps, not slice equality, drive the pruning. */
  private def zRankSlices(df: DataFrame, nEst: Long, firstFile: Int): DataFrame =
    graft.ops.GlobalIndex.withGlobalIndex(
        df, Seq(col("z"), col("event_id")), "_zrank")
      .withColumn("zfile",
        least(lit(firstFile) + expr(s"(_zrank * $ZExecFiles) div $nEst"),
          lit(firstFile + ZExecFiles - 1)).cast("int"))
      .drop("_zrank")

  /** x52 shared frame (declared query + PlanShapeSpec): execute the
    * z-order layout end to end — z-rank the events through
    * GlobalIndexExec, commit the 16-file layout as a snapshot
    * version, zone-map it, and answer the 2-D box query scanning
    * only the overlapping files. Returns (result, files scanned,
    * files total, one-file-per-dir) so the spec can pin the skip
    * ratio the query's `pruned` flag summarizes. */
  def x52Frame(s: SparkSession, d: String): (DataFrame, Int, Int, Boolean) = {
    import graft.sources.Snapshots
    val dir = s"target/x52_snap_${math.abs(d.hashCode)}"
    Snapshots.drop(s, dir) // deterministic version numbers per run
    // file sizing reads the committed stats catalog — no plan-time
    // count job (the x38 rule)
    val n = graft.ops.StatsCatalog.nRows(
      graft.ops.StatsCatalog.stats(s, d, "events"))
    val laid = zRankSlices(zEvents(s, d), n, firstFile = 0)
    Snapshots.commit(laid.repartition(col("zfile")), dir,
      partitionBy = Seq("zfile"))
    val oneFile = Snapshots.filesPerDir(s, dir, 1).values.forall(_ == 1)
    // the OPTIMIZE job's stats pass: per-file zone maps on z —
    // manifest-sized (ZExecFiles rows), computed once off the
    // committed layout (at 100 TB they land in the write's manifest,
    // the x21 pattern)
    val zones = Snapshots.read(s, dir, Some(1))
      .groupBy(col("zfile"))
      .agg(min(col("z")).as("zmin"), max(col("z")).as("zmax"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    val (zLo, zHi) = (zOf(ZBoxLo, ZBoxLo), zOf(ZBoxHi, ZBoxHi))
    val scan = zones.collect {
      case (f, zmin, zmax) if zmax >= zLo && zmin <= zHi => f
    }.toIndexedSeq
    val res = Snapshots.read(s, dir, Some(1))
      .filter(col("zfile").isin(scan: _*)) // partition pruning: unscanned dirs never listed
      .filter(col("ub").between(ZBoxLo, ZBoxHi)
        && col("tb").between(ZBoxLo, ZBoxHi)) // residual → pushed to the parquet scan
      .select(col("event_id"), col("ub"), col("tb"), col("z"),
        lit(scan.length < zones.length).as("pruned"),
        lit(oneFile).as("one_file_per_dir"))
      .orderBy(col("event_id"))
    (res, scan.length, zones.length, oneFile)
  }

  /** x55 shared frame (declared query + PlanShapeSpec): the
    * incremental-OPTIMIZE life cycle. Returns (result, pre-optimize
    * scan set size, post-optimize scan set size, total files) so the
    * spec can pin that optimizing the delta shrank the box query's
    * scan set without touching the base. */
  def x55Frame(s: SparkSession, d: String): (DataFrame, Int, Int, Int) = {
    import graft.sources.Snapshots
    val dir = s"target/x55_snap_${math.abs(d.hashCode)}"
    Snapshots.drop(s, dir) // deterministic version numbers per run
    val n = graft.ops.StatsCatalog.nRows(
      graft.ops.StatsCatalog.stats(s, d, "events"))
    val ev = zEvents(s, d)
    val base = ev.filter(col("event_id") % 8 =!= 0)
    val delta = ev.filter(col("event_id") % 8 === 0)
    // slice sizing from the catalog row count — estimates are fine
    // (zRankSlices caps), no plan-time count jobs
    val nDeltaEst = math.max(1L, (n + 7L) / 8L)
    val nBaseEst = math.max(1L, n - nDeltaEst)
    // v1: the z-ordered table (x52's layout, files 0..15)
    Snapshots.commit(
      zRankSlices(base, nBaseEst, firstFile = 0).repartition(col("zfile")),
      dir, partitionBy = Seq("zfile"))
    val sig1 = Snapshots.fileSignature(s, dir, 1)
    // v2: tonight's batch lands as an APPEND — one unsorted bucket
    // (zfile = -1), no base file touched, read, or rewritten
    Snapshots.commitAppend(
      delta.withColumn("zfile", lit(-1)).repartition(col("zfile")),
      dir, base = 1, partitionBy = Seq("zfile"))
    def zones(v: Int) = Snapshots.readResolved(s, dir, Some(v))
      .groupBy(col("zfile"))
      .agg(min(col("z")).as("zmin"), max(col("z")).as("zmax"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    val (zLo, zHi) = (zOf(ZBoxLo, ZBoxLo), zOf(ZBoxHi, ZBoxHi))
    def scanSet(zs: Array[(Int, Int, Int)]) =
      zs.collect { case (f, lo, hi) if hi >= zLo && lo <= zHi => f }.toIndexedSeq
    // pre-optimize: the unsorted bucket's zone map spans ~the whole z
    // domain, so EVERY box query rescans the entire delta
    val preScan = scanSet(zones(2))
    val deltaRescanBefore = preScan.contains(-1)
    // v3: incremental OPTIMIZE — re-land ONLY the delta z-ranked
    // (files 16..31) as a dataChange=false append against the SAME
    // base; state is v2's, the change feed skips it, the base rides
    // by reference
    Snapshots.commitAppend(
      zRankSlices(delta, nDeltaEst, firstFile = ZExecFiles)
        .repartition(col("zfile")),
      dir, base = 1, partitionBy = Seq("zfile"), dataChange = false)
    val baseUntouched = Snapshots.fileSignature(s, dir, 1) == sig1
    val zs3 = zones(3)
    val scan3 = scanSet(zs3)
    val deltaPrunedAfter = scan3.count(_ >= ZExecFiles) < ZExecFiles
    val res = Snapshots.readResolved(s, dir, Some(3))
      .filter(col("zfile").isin(scan3: _*))
      .filter(col("ub").between(ZBoxLo, ZBoxHi)
        && col("tb").between(ZBoxLo, ZBoxHi))
      .select(col("event_id"), col("ub"), col("tb"), col("z"),
        lit(scan3.length < zs3.length).as("pruned"),
        lit(baseUntouched).as("base_files_untouched"),
        lit(deltaRescanBefore).as("delta_rescanned_before"),
        lit(deltaPrunedAfter).as("delta_pruned_after"))
      .orderBy(col("event_id"))
    (res, preScan.length, scan3.length, zs3.length)
  }

  /** x20: compaction target size (chars stand in for bytes at
    * fixture scale) and the micro-file granularity — BASE values for
    * the smallest fixtures; [[compactKnobs]] scales both with the
    * corpus. */
  val CompactTarget = 2000L
  val CompactGroup = 20

  /** SCALE-AWARE compaction knobs (the d14 band-width lesson applied
    * to layout simulation): the micro-file width grows with the
    * corpus so the SIMULATED file count stays manifest-sized
    * (~25/source), and the bin target scales in the same ratio so
    * each bin still packs ~3 files. Without this, x26's fragmented
    * v1 commit wrote one hive directory PER DOC-GROUP — 5,000
    * one-row directories at sf0.1 (135 s of pure file creation,
    * caught by the r7 bench sweep) and unboundedly more beyond. Both
    * knobs are integer functions of max(doc_id), replayed by the
    * oracle in a scalar CTE, so plan and oracle can never disagree.
    * At the base fixtures (max id < 500·[[CompactGroup]]÷20) the
    * knobs equal the base constants — sf0.001/0.01 outputs are
    * unchanged. */
  private[graft] def compactKnobs(s: SparkSession, d: String): (Long, Long) = {
    val maxId = Tables.load(s, d, "documents")
      .agg(max(col("doc_id"))).head.getLong(0)
    val gw = math.max(CompactGroup.toLong, (maxId + 1) / 25)
    (gw, CompactTarget * gw / CompactGroup)
  }

  /** The oracle twin of [[compactKnobs]] as a one-row CTE. */
  private def compactKnobsCte: String =
    s"""knobs AS (SELECT greatest($CompactGroup, (max(doc_id) + 1) // 25) AS gw,
       |  ($CompactTarget * greatest($CompactGroup, (max(doc_id) + 1) // 25))
       |    // $CompactGroup AS tgt
       |  FROM documents)""".stripMargin

  /** The x11 oracle: KmPasses assignment passes unrolled as a CTE
    * chain (k11's pattern — standard SQL cannot iterate with
    * aggregates in the recursive term). Seeding, tie-breaks, the
    * squared-distance expression (self + cent − 2·cross, left-to-
    * right double folds), and the decimal-explode centroid mean all
    * mirror KMeans.fitExact term for term, so the comparison is a
    * bit-exact hash match, not an approximation. */
  private def kmeansExactOracle: String =
    s"""$kmeansCteChain
       |SELECT vec_id, cluster_id, round(sq, 4) AS sq_dist
       |FROM asg$KmPasses
       |ORDER BY vec_id""".stripMargin

  /** The shared WITH-chain: seeds → dims → cent0 → (asg_i, cent_i)*
    * → asg[[KmPasses]], reused by x11's assignment dump and v14's
    * within-cluster pair search. Fixed k = [[KmK]]; v21 instead
    * passes its corpus-derived cluster count through
    * [[kmeansCteChainFor]]. */
  private def kmeansCteChain: String = kmeansCteChainFor(KmK.toString)

  /** [[kmeansCteChain]] with the seed count `kSql` as an arbitrary
    * SQL expression (a literal, or v21's count-derived scalar
    * subquery — replaying the engine's scale-aware k from the same
    * corpus count, so the blocking stays part of the verified
    * semantics). */
  private def kmeansCteChainFor(kSql: String): String = {
    val sb = new StringBuilder
    sb.append(
      s"""WITH seeds AS (
         |  SELECT CAST(rn - 1 AS INT) AS cluster_id,
         |         embedding::DOUBLE[] AS cvec
         |  FROM (SELECT vec_id, embedding,
         |          row_number() OVER (ORDER BY vec_id) AS rn
         |        FROM embeddings) s
         |  WHERE rn <= $kSql),
         |dims AS (
         |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
         |         unnest(embedding)::DOUBLE AS x
         |  FROM embeddings),
         |cent0 AS (SELECT cluster_id, cvec FROM seeds)""".stripMargin)
    def asgSql(i: Int): String =
      s""",
         |asg$i AS (
         |  SELECT vec_id, cluster_id, sq FROM (
         |    SELECT e.vec_id, c.cluster_id,
         |      list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])
         |        + list_dot_product(c.cvec, c.cvec)
         |        - 2 * list_dot_product(e.embedding::DOUBLE[], c.cvec) AS sq,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |        list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])
         |          + list_dot_product(c.cvec, c.cvec)
         |          - 2 * list_dot_product(e.embedding::DOUBLE[], c.cvec),
         |        c.cluster_id) AS rn
         |    FROM embeddings e CROSS JOIN cent${i - 1} c) t
         |  WHERE rn = 1)""".stripMargin
    for (i <- 1 to KmPasses) {
      sb.append(asgSql(i))
      if (i < KmPasses) sb.append(
        s""",
           |cent$i AS (
           |  SELECT cluster_id, array_agg(cv ORDER BY dim) AS cvec FROM (
           |    SELECT a.cluster_id, d.dim,
           |      CAST(SUM(CAST(d.x AS DECIMAL(25,10))) AS DOUBLE) / COUNT(*) AS cv
           |    FROM asg$i a JOIN dims d USING (vec_id)
           |    GROUP BY a.cluster_id, d.dim) u
           |  GROUP BY cluster_id)""".stripMargin)
    }
    sb.toString
  }

  /** The v14 oracle: the same exact-k-means chain, then the d5-style
    * pair join blocked by cluster_id. */
  private def semdedupOracle: String =
    s"""$kmeansCteChain,
       |ev AS (
       |  SELECT e.vec_id, a.cluster_id, e.embedding
       |  FROM embeddings e JOIN asg$KmPasses a USING (vec_id))
       |SELECT a.cluster_id, a.vec_id AS keep_id, b.vec_id AS drop_id,
       |  round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
       |    (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
       |     sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4)
       |    AS cosine
       |FROM ev a JOIN ev b
       |  ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
       |WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
       |    (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
       |     sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= $SemTau
       |ORDER BY keep_id, drop_id""".stripMargin

  /** The MV family's shared consumer aggregate restated from orders:
    * (status, priority) group, revenue/n_orders (+ min/max), an
    * optional WHERE cut, and pinned extras (probe/used_mv flags). */
  private def mvConsumerSql(where: String, extras: String,
                            minMax: Boolean = true): String = {
    val mm =
      if (minMax) ",\n  MIN(o_totalprice) AS min_price,\n  MAX(o_totalprice) AS max_price"
      else ""
    s"""SELECT o_orderstatus, o_orderpriority,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_orders$mm$extras
FROM orders $where
GROUP BY 1, 2"""
  }

  val oracles: Map[String, String] = Map(
    "x11_kmeans_exact" -> kmeansExactOracle,

    // v6's envelope: the compared rows are v5's decimal-exact result
    // (that oracle replays centroid training in SQL); agrees_exact is
    // the literal-true verdict the Spark side computed against the
    // float-agg fast path. A fast-path divergence flips it → red.
    "v6_knn_ivf_fast" -> {
      val v5 = graft.queries.VectorQ.oracles("v5_knn_ivf")
      s"""SELECT qid, probe_label, nb_id, nb_rank, score,
         |  true AS agrees_exact
         |FROM ($v5) t
         |ORDER BY qid, nb_rank""".stripMargin
    },

    // x5's envelope: exact objective from the unrolled x11 CTE chain
    // (decimal sum of rounded per-point squared distances — engine-
    // exact), plus the literal-true inertia verdict.
    "x5_kmeans" ->
      s"""$kmeansCteChain
         |SELECT CAST($KmK AS INT) AS k, COUNT(*) AS n_points,
         |  CAST(SUM(CAST(round(sq, 4) AS DECIMAL(28,4))) AS DOUBLE)
         |    AS exact_inertia,
         |  true AS inertia_ok
         |FROM asg$KmPasses""".stripMargin,
    "v14_semdedup" -> semdedupOracle,

    // v21: the same exact-k-means chain + cluster-blocked pair join as
    // v14 — but trained at the engine's SCALE-AWARE cluster count,
    // replayed here as a scalar subquery over the same corpus count
    // (greatest(KmK, n // KnnBlockRows) — DuckDB // matches the
    // engine's Long division) — then a row_number window with the
    // engine's (raw desc, nb_id) total order keeps K per vector
    "v21_knn_join" ->
      s"""${kmeansCteChainFor(
           s"(SELECT greatest($KmK, count(*) // $KnnBlockRows) FROM embeddings)")},
         |ev AS (
         |  SELECT e.vec_id, a.cluster_id, e.embedding
         |  FROM embeddings e JOIN asg$KmPasses a USING (vec_id)),
         |pairs AS (
         |  SELECT a.vec_id, a.cluster_id, b.vec_id AS nb_id,
         |    list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
         |      (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
         |       sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS raw
         |  FROM ev a JOIN ev b
         |    ON a.cluster_id = b.cluster_id AND a.vec_id <> b.vec_id),
         |ranked AS (
         |  SELECT vec_id, cluster_id, nb_id, raw,
         |    CAST(row_number() OVER (PARTITION BY vec_id
         |      ORDER BY raw DESC, nb_id) AS INT) AS nb_rank
         |  FROM pairs)
         |SELECT vec_id, cluster_id, nb_id, nb_rank, round(raw, 4) AS cosine
         |FROM ranked WHERE nb_rank <= $KnnJoinK
         |ORDER BY vec_id, nb_rank""".stripMargin,

    // the two-phase salted plan must reproduce the plain count
    "x13_salted_count" ->
      """SELECT l_returnflag, COUNT(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // merge(state(A), state(B)) == state(A ∪ B): the oracle is the
    // one-shot aggregate the incremental plan must reproduce exactly.
    "x12_incremental_agg" ->
      """SELECT o_custkey, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_spend,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*)
        |    AS avg_spend,
        |  min(o_totalprice) AS min_spend, max(o_totalprice) AS max_spend
        |FROM orders
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,
    "j5_zip_arrays" ->
      """SELECT doc_id,
        |  CAST(generate_subscripts(w, 1) AS INT) AS ord,
        |  unnest(w) AS word,
        |  unnest(list_transform(w, x -> CAST(length(x) AS INT))) AS wlen
        |FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |      FROM documents) t
        |ORDER BY doc_id, ord""".stripMargin,

    "p6_error_skip" ->
      """SELECT
        |  CAST(SUM(CASE WHEN json_valid(j) THEN 0 ELSE 1 END) AS BIGINT) AS n_bad,
        |  CAST(SUM(CASE WHEN json_valid(j) THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
        |  CAST(SUM(CASE WHEN json_valid(j)
        |       THEN CAST(json_extract_string(j, '$.k') AS INT) END) AS BIGINT) AS sum_k
        |FROM (SELECT CASE WHEN event_id % 7 = 0 THEN substr(props, 2, 1000)
        |                  ELSE props END AS j
        |      FROM events) t""".stripMargin,

    "s2_sessionize" ->
      """WITH marked AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 900000000
        |         THEN 1 ELSE 0 END AS is_start
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |numbered AS (
        |  SELECT *, SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM marked)
        |SELECT user_id,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM numbered
        |GROUP BY user_id, session_seq
        |ORDER BY user_id, session_start""".stripMargin,

    "x3_topk_per_key" ->
      """SELECT event_id, user_id, value FROM (
        |  SELECT event_id, user_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY value DESC, event_id) AS rn
        |  FROM events) t
        |WHERE rn <= 3
        |ORDER BY user_id, value DESC, event_id""".stripMargin,

    "x2_asof_attrib" ->
      """WITH purchases AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |views AS (
        |  SELECT user_id AS v_user, ts AS v_ts, max(event_id) AS v_event_id,
        |    arg_max(value, event_id) AS v_value
        |  FROM events WHERE event_type = 'view'
        |  GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, p.ts,
        |  v.v_event_id AS view_event_id, v.v_ts AS view_ts,
        |  v.v_value AS view_value,
        |  epoch_us(p.ts) - epoch_us(v.v_ts) AS lag_us
        |FROM purchases p ASOF LEFT JOIN views v
        |  ON p.user_id = v.v_user AND v.v_ts <= p.ts
        |ORDER BY p.event_id""".stripMargin,

    "q24_order_priority_check" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // `true AS exact` pins that the bounded-memory switchover chose
    // the exact path at this SF (the sketch branch would hash-differ).
    "q21_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS median_qty,
        |  quantile_cont(l_quantity, 0.9) AS p90_qty,
        |  COUNT(*) AS n_rows,
        |  true AS exact
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q22_rollup" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year, o_orderpriority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY ROLLUP (CAST(year(o_orderdate) AS INT), o_orderpriority)
        |ORDER BY coalesce(o_year, 9999), coalesce(o_orderpriority, '~')""".stripMargin,

    "q25_cube" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year, o_orderpriority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(GROUPING(CAST(year(o_orderdate) AS INT)) * 2
        |     + GROUPING(o_orderpriority) AS INT) AS gid
        |FROM orders
        |GROUP BY CUBE (CAST(year(o_orderdate) AS INT), o_orderpriority)
        |ORDER BY gid, coalesce(o_year, 9999), coalesce(o_orderpriority, '~')""".stripMargin,

    "q23_scalar_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_totalprice > 1.5 * (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |  FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "x6_clean_pipeline" ->
      """WITH toks AS (
        |  SELECT doc_id, text, lang, source,
        |    len(string_split_regex(trim(text), '\s+')) AS n_words,
        |    list_max(list_transform(string_split_regex(trim(text), '\s+'),
        |      t -> CAST(length(t) AS INT))) AS max_wlen
        |  FROM documents),
        |filtered AS (
        |  SELECT * FROM toks
        |  WHERE n_words BETWEEN 30 AND 5000 AND max_wlen <= 50),
        |deduped AS (
        |  SELECT * FROM filtered f
        |  WHERE doc_id = (SELECT min(doc_id) FROM filtered g
        |                  WHERE md5(g.text) = md5(f.text))),
        |labeled AS (
        |  SELECT *,
        |    CAST(('0x' || substr(md5('split|' || doc_id::VARCHAR), 1, 15)) AS BIGINT)
        |      % 100 AS b
        |  FROM deduped)
        |SELECT CASE WHEN b < 80 THEN 'train'
        |            WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
        |  lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_words) AS BIGINT) AS total_tokens,
        |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
        |FROM labeled
        |GROUP BY 1, 2
        |ORDER BY split, lang""".stripMargin,

    "x7_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
        |    CAST(CAST(('0x' || substr(md5('pack|' || doc_id::VARCHAR), 1, 15)) AS BIGINT)
        |      % 8 AS INT) AS shard
        |  FROM documents),
        |c AS (
        |  SELECT *, SUM(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT lang, shard,
        |  CAST(floor((cum - n_tokens) / 2048) AS INT) AS pack_id,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c
        |GROUP BY 1, 2, 3
        |ORDER BY lang, shard, pack_id""".stripMargin,

    "s3_interval_join" ->
      """SELECT p.event_id AS p_id, p.user_id, p.ts,
        |  v.event_id AS v_id, v.ts AS v_ts
        |FROM events p JOIN events v
        |  ON v.user_id = p.user_id AND v.event_type = 'view'
        | AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts
        |WHERE p.event_type = 'purchase'
        |ORDER BY p_id, v_id""".stripMargin,

    // s8: the same interval condition as a LEFT JOIN — the view-side
    // type predicate must live in the ON clause (in the WHERE it
    // would silently turn the join back into an inner one)
    "s8_outer_interval_join" ->
      """SELECT p.event_id AS p_id, p.user_id, p.ts,
        |  v.event_id AS v_id, v.ts AS v_ts
        |FROM events p LEFT JOIN events v
        |  ON v.user_id = p.user_id AND v.event_type = 'view'
        | AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts
        |WHERE p.event_type = 'purchase'
        |ORDER BY p_id, v_id""".stripMargin,

    // The HLL estimate itself can't be replayed by DuckDB; the oracle
    // states the exact side (distinct count, row count) and literal
    // true for the envelope check the Spark side computed — a hash
    // mismatch therefore means either an exact-stat divergence or the
    // sketch breaking its pinned 3×rsd error bound.
    "x1_approx_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS exact_parts,
        |  COUNT(*) AS n_rows,
        |  true AS approx_ok
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // Same pattern for the GK quantile sketch: the envelope bounds are
    // exact interpolated percentiles (quantile_cont parity proven by
    // q21), and the _ok booleans pin the sketch inside its rank-error
    // guarantee. Probe points p ± QuantEps are interpolated from the
    // SAME constant the Spark side uses, so a one-sided eps change
    // can't silently break hash parity.
    "x4_approx_quantiles" ->
      s"""SELECT l_returnflag,
         |  quantile_cont(l_quantity, ${0.5 - QuantEps}) AS median_lo,
         |  quantile_cont(l_quantity, ${0.5 + QuantEps}) AS median_hi,
         |  true AS median_ok,
         |  quantile_cont(l_quantity, ${0.9 - QuantEps}) AS p90_lo,
         |  quantile_cont(l_quantity, ${0.9 + QuantEps}) AS p90_hi,
         |  true AS p90_ok,
         |  COUNT(*) AS n_rows
         |FROM lineitem
         |GROUP BY l_returnflag
         |ORDER BY l_returnflag""".stripMargin,

    // The sketch pass is an admissible candidate generator (no false
    // negatives above the threshold), so the oracle states the exact
    // semantics: plain GROUP BY + HAVING on integer math.
    "x10_heavy_hitters" ->
      s"""WITH toks AS (
         |  SELECT lower(unnest(string_split_regex(trim(text), '\\s+'))) AS term
         |  FROM documents),
         |tot AS (SELECT COUNT(*) AS n_toks FROM toks)
         |SELECT term, COUNT(*) AS cnt
         |FROM toks GROUP BY term
         |HAVING COUNT(*) * $HhDen > (SELECT n_toks FROM tot)
         |ORDER BY cnt DESC, term""".stripMargin,

    // the grouped two-pass plan must reproduce the exact per-language
    // frequent-terms answer
    "x15_heavy_hitters_grouped" ->
      s"""WITH toks AS (
         |  SELECT lang, lower(unnest(string_split_regex(trim(text), '\\s+'))) AS term
         |  FROM documents),
         |tot AS (SELECT lang, COUNT(*) AS n_toks FROM toks GROUP BY lang)
         |SELECT t.lang, t.term, COUNT(*) AS cnt
         |FROM toks t
         |GROUP BY t.lang, t.term
         |HAVING COUNT(*) * $HhDen > (SELECT n_toks FROM tot WHERE tot.lang = t.lang)
         |ORDER BY lang, cnt DESC, term""".stripMargin,

    // the GlobalIndexExec rank must equal the plain window rank over
    // the reconstructed md5 permutation
    "x16_global_shuffle" ->
      s"""WITH h AS (SELECT doc_id,
         |  CAST(('0x' || substr(md5('shuf|' || doc_id::VARCHAR), 1, 15)) AS BIGINT)
         |    AS shuffle_key
         |  FROM documents),
         |r AS (SELECT doc_id, shuffle_key,
         |  row_number() OVER (ORDER BY shuffle_key, doc_id) - 1 AS pos FROM h)
         |SELECT doc_id, shuffle_key,
         |  CAST(pos % $ShufShards AS INT) AS shard,
         |  pos // $ShufShards AS pos_in_shard
         |FROM r ORDER BY shard, pos_in_shard""".stripMargin,

    // The time-bucket expansion is an admissible candidate generator
    // (co-bucketing is implied by containment), so the oracle states
    // the plain BETWEEN-join semantics.
    "x9_range_join" ->
      s"""WITH iv AS (
         |  SELECT event_id AS window_id, ts AS w_start,
         |    ts + INTERVAL $RangeWindowSec SECOND AS w_end
         |  FROM events
         |  WHERE event_type = 'purchase' AND value >= $RangeValueMin),
         |c AS (
         |  SELECT event_id, user_id, ts FROM events
         |  WHERE event_type = 'click')
         |SELECT iv.window_id, c.event_id, c.user_id
         |FROM iv JOIN c ON c.ts >= iv.w_start AND c.ts <= iv.w_end
         |ORDER BY window_id, event_id""".stripMargin,

    "x8_merge_upsert" ->
      """WITH latest AS (
        |  SELECT o_custkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'),
        |chg AS (
        |  SELECT o_custkey AS c_custkey, o_totalprice,
        |    CASE WHEN o_totalprice < 30000 THEN 'D' ELSE 'U' END AS op
        |  FROM latest WHERE rn = 1)
        |SELECT c.c_custkey, c.c_name,
        |  round(COALESCE(g.o_totalprice, c.c_acctbal), 2) AS c_acctbal
        |FROM customer c LEFT JOIN chg g USING (c_custkey)
        |WHERE g.op IS NULL OR g.op <> 'D'
        |ORDER BY c_custkey""".stripMargin,

    // same union + one per-key window; lead() replays identically
    "x17_scd2_history" ->
      """WITH chg AS (
        |  SELECT c_custkey, c_acctbal AS balance,
        |    TIMESTAMP '1996-12-31' AS valid_from,
        |    CAST(-1 AS BIGINT) AS chg_seq
        |  FROM customer
        |  UNION ALL
        |  SELECT o_custkey AS c_custkey, o_totalprice AS balance,
        |    o_orderdate AS valid_from, CAST(o_orderkey AS BIGINT) AS chg_seq
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'),
        |v AS (
        |  SELECT c_custkey,
        |    CAST(row_number() OVER pk AS INT) AS version,
        |    round(balance, 2) AS balance, valid_from,
        |    lead(valid_from, 1) OVER pk AS valid_to
        |  FROM chg
        |  WINDOW pk AS (PARTITION BY c_custkey ORDER BY valid_from, chg_seq))
        |SELECT c_custkey, version, balance, valid_from, valid_to,
        |  CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current
        |FROM v ORDER BY c_custkey, version""".stripMargin,

    "q29_sql_script" ->
      """SELECT label, COUNT(*) AS n_vectors,
        |  CAST(SUM(CAST(round(list_dot_product(embedding::DOUBLE[], list_reverse(embedding)::DOUBLE[]), 4)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS energy
        |FROM embeddings
        |GROUP BY label
        |ORDER BY label""".stripMargin,

    // same step-gated earliest-timestamp chain; DuckDB replays the
    // strictly-after semantics with correlated min-filters
    "s4_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, MIN(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
        |  WHERE e.event_type = 'click' GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
        |  WHERE e.event_type = 'purchase' GROUP BY e.user_id),
        |c AS (
        |  SELECT '1_view' AS step, COUNT(*) AS n_users FROM s1
        |  UNION ALL SELECT '2_click', COUNT(*) FROM s2
        |  UNION ALL SELECT '3_purchase', COUNT(*) FROM s3)
        |SELECT step, n_users,
        |  round(n_users * 1.0 / (SELECT n_users FROM c WHERE step = '1_view'), 4)
        |    AS pct_of_first
        |FROM c ORDER BY step""".stripMargin,

    // same day-grain math; INT cast mirrors Spark's int datediff
    "s5_retention" ->
      """WITH wk AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |coh AS (
        |  SELECT user_id, MIN(day) AS cohort_day FROM wk GROUP BY user_id),
        |act AS (
        |  SELECT c.cohort_day,
        |    CAST(datediff('day', c.cohort_day, w.day) AS INT) AS day_offset,
        |    w.user_id
        |  FROM wk w JOIN coh c USING (user_id)),
        |m AS (
        |  SELECT cohort_day, day_offset, COUNT(DISTINCT user_id) AS n_users
        |  FROM act GROUP BY 1, 2),
        |b AS (SELECT cohort_day, n_users AS n_cohort FROM m
        |      WHERE day_offset = 0)
        |SELECT m.cohort_day, m.day_offset, m.n_users,
        |  round(m.n_users * 1.0 / b.n_cohort, 4) AS retention
        |FROM m JOIN b USING (cohort_day)
        |ORDER BY cohort_day, day_offset""".stripMargin,

    // full-outer diff with IS DISTINCT FROM = Spark's null-safe <=>
    "x18_snapshot_diff" ->
      """WITH old AS (
        |  SELECT c_custkey, c_name, c_acctbal FROM customer),
        |new AS (
        |  SELECT c_custkey, c_name,
        |    CASE WHEN c_custkey % 13 = 0 THEN round(c_acctbal + 100.0, 2)
        |         ELSE c_acctbal END AS c_acctbal
        |  FROM old WHERE c_custkey % 97 <> 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_name, c_acctbal
        |  FROM old WHERE c_custkey % 31 = 0)
        |SELECT CASE WHEN o.c_custkey IS NULL THEN 'I'
        |            WHEN n.c_custkey IS NULL THEN 'D'
        |            ELSE 'U' END AS op,
        |  COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
        |  round(o.c_acctbal, 2) AS old_bal,
        |  round(n.c_acctbal, 2) AS new_bal
        |FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
        |WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
        |   OR o.c_name IS DISTINCT FROM n.c_name
        |   OR o.c_acctbal IS DISTINCT FROM n.c_acctbal
        |ORDER BY c_custkey, op""".stripMargin,

    // x33: every step's change set replayed from source — v1 is
    // all-inserts, v2's D set is the takedown hash, v3 splits the
    // surviving replaced partition into D (fails the length gate)
    // and U (kept and rescored; n_chars > 0 so the doubled value
    // always differs)
    "x33_log_changes" -> X33OracleSql,

    // x56: x33's oracle VERBATIM (the x54 pattern) — the SQL-surface
    // feed must aggregate identically to the Scala API's.
    "x56_sql_change_feed" -> X33OracleSql,

    // Each column's stats stated directly, one SELECT per column —
    // the same union-of-legs shape as the Spark plan, so the hash
    // pins exact NDV, null accounting, and the length division.
    "x34_table_stats" ->
      """SELECT * FROM (
        |  SELECT 'l_orderkey' AS col_name, COUNT(*) AS n_rows,
        |    COUNT(*) - COUNT(l_orderkey) AS n_nulls,
        |    COUNT(DISTINCT l_orderkey) AS n_distinct,
        |    CAST(MIN(l_orderkey) AS DOUBLE) AS min_num,
        |    CAST(MAX(l_orderkey) AS DOUBLE) AS max_num,
        |    CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str,
        |    CAST(NULL AS DOUBLE) AS avg_len
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_quantity', COUNT(*), COUNT(*) - COUNT(l_quantity),
        |    COUNT(DISTINCT l_quantity),
        |    MIN(l_quantity), MAX(l_quantity), NULL, NULL, NULL
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_returnflag', COUNT(*), COUNT(*) - COUNT(l_returnflag),
        |    COUNT(DISTINCT l_returnflag), NULL, NULL,
        |    MIN(l_returnflag), MAX(l_returnflag),
        |    CAST(SUM(length(l_returnflag)) AS DOUBLE) / COUNT(l_returnflag)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_shipdate', COUNT(*), COUNT(*) - COUNT(l_shipdate),
        |    COUNT(DISTINCT l_shipdate),
        |    CAST(epoch_us(MIN(l_shipdate)) AS DOUBLE),
        |    CAST(epoch_us(MAX(l_shipdate)) AS DOUBLE), NULL, NULL, NULL
        |  FROM lineitem)
        |ORDER BY col_name""".stripMargin,

    // x36: exact counts/NDV stated from source; the sketch never
    // reaches the compared output — its 3σ bound verdict does, as a
    // literal-true column (x1's envelope pattern)
    "x36_table_stats_hll" ->
      """SELECT * FROM (
        |  SELECT 'l_orderkey' AS col_name, COUNT(*) AS n_rows,
        |    COUNT(*) - COUNT(l_orderkey) AS n_nulls,
        |    COUNT(DISTINCT l_orderkey) AS n_distinct, true AS ndv_ok
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_quantity', COUNT(*), COUNT(*) - COUNT(l_quantity),
        |    COUNT(DISTINCT l_quantity), true
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_returnflag', COUNT(*), COUNT(*) - COUNT(l_returnflag),
        |    COUNT(DISTINCT l_returnflag), true
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_shipdate', COUNT(*), COUNT(*) - COUNT(l_shipdate),
        |    COUNT(DISTINCT l_shipdate), true
        |  FROM lineitem)
        |ORDER BY col_name""".stripMargin,

    // x37: the join-aggregate stated plainly, PLUS the planning
    // decision replayed from source — the fewer-rows side is the
    // broadcast side ("right" = nation), so a planner that stopped
    // consulting the stats (or a stats pipeline feeding it garbage)
    // flips a hash-pinned column
    "x37_stats_planned_join" ->
      """SELECT n_name, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS sum_bal,
        |  CASE WHEN (SELECT COUNT(*) FROM nation) <=
        |            (SELECT COUNT(*) FROM customer)
        |       THEN 'right' ELSE 'left' END AS broadcast_side
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    // x44: both branch states stated from source — the clone must
    // serve the pinned v1 (even docs) even though the source
    // advanced; zero_copy is the listing-checked literal (a clone
    // that silently copied or re-wrote data flips it)
    "x44_zero_copy_clone" ->
      """WITH v1 AS (
        |  SELECT source, COUNT(*) AS n_clone,
        |    CAST(SUM(doc_id) AS BIGINT) AS idsum_clone
        |  FROM documents WHERE doc_id % 2 = 0 GROUP BY source),
        |v2 AS (
        |  SELECT source, COUNT(*) AS n_src_latest,
        |    CAST(SUM(doc_id) AS BIGINT) AS idsum_src_latest
        |  FROM documents GROUP BY source)
        |SELECT source, n_clone, idsum_clone, n_src_latest, idsum_src_latest,
        |  true AS zero_copy
        |FROM v1 JOIN v2 USING (source)
        |ORDER BY source""".stripMargin,

    // x50: every post-purge version state replayed from source (docs
    // minus the deterministic target set; the DV-resolved middle
    // state additionally minus the deleted doc); the erasure and
    // rewrite probes are literal-true
    "x50_purge_history" ->
      """WITH kept AS (
        |  SELECT doc_id, source FROM documents WHERE doc_id % 97 <> 0),
        |v1 AS (SELECT source, COUNT(*) AS n_v1 FROM kept GROUP BY source),
        |v2 AS (SELECT source, COUNT(*) AS n_v2_resolved FROM kept
        |       WHERE doc_id <> 1 GROUP BY source),
        |v3 AS (SELECT source, COUNT(*) AS n_v3 FROM kept GROUP BY source)
        |SELECT source, n_v1, n_v2_resolved, n_v3,
        |  true AS gone_everywhere, true AS purged_all_versions
        |FROM v1 JOIN v2 USING (source) JOIN v3 USING (source)
        |ORDER BY source""".stripMargin,

    // x76: the post-purge survivors replayed from source (docs minus
    // the deterministic target set); all six propagation probes are
    // literal-true — a purged key surviving in ANY registered derived
    // dir's history (value-level scan of the identifier columns), a
    // cache hit served across the purge, an un-relanded stats
    // version, or a scan that could not see the key pre-purge
    // (positive control) flips one
    "x76_purge_propagation" ->
      """WITH kept AS (
        |  SELECT source, n_chars FROM documents WHERE doc_id % 97 <> 0)
        |SELECT source, COUNT(*) AS n_kept,
        |  CAST(SUM(n_chars) AS BIGINT) AS chars_kept,
        |  true AS pre_exposed, true AS gone_everywhere,
        |  true AS mv_propagated, true AS cache_propagated,
        |  true AS index_propagated, true AS stats_propagated
        |FROM kept GROUP BY source
        |ORDER BY source""".stripMargin,

    // x49: the three version states replayed from source; the
    // life-cycle flags are literal-true (a checkpoint misplacing the
    // head, a prune leaving files, or a post-prune commit claiming
    // the wrong version flips one; versions read through the
    // checkpoint hash-check against source)
    "x49_log_checkpoint" ->
      """WITH v1 AS (
        |  SELECT source, COUNT(*) AS n_v1 FROM documents
        |  WHERE doc_id % 3 = 0 GROUP BY source),
        |v3 AS (
        |  SELECT source, COUNT(*) AS n_v3 FROM documents GROUP BY source),
        |v4 AS (
        |  SELECT source, COUNT(*) AS n_v4 FROM documents
        |  WHERE doc_id % 2 = 0 GROUP BY source)
        |SELECT source, n_v1, n_v3, n_v4,
        |  true AS ckpt_at_head, true AS log_pruned, true AS post_ckpt_commit
        |FROM v1 JOIN v3 USING (source) JOIN v4 USING (source)
        |ORDER BY source""".stripMargin,

    // x48: one per-lang aggregate stated twice from source — the two
    // layouts must serve identical numbers (a partition column coming
    // back re-typed or mis-parsed flips the equality bit); layout
    // flags are listing-derived literals
    "x48_partition_evolution" ->
      """WITH a AS (
        |  SELECT lang, COUNT(*) AS n_v1,
        |    CAST(SUM(n_chars) AS BIGINT) AS chars_v1
        |  FROM documents GROUP BY lang)
        |SELECT lang, n_v1, chars_v1,
        |  n_v1 AS n_v2, chars_v1 AS chars_v2,
        |  true AS layout_independent, true AS layout_evolved
        |FROM a
        |ORDER BY lang""".stripMargin,

    // x47: the split replayed per source with the same predicates and
    // the same null-is-violation reading (concat_ws skips the NULL
    // arms exactly as array_join(filter(...)) does); the atomicity +
    // completeness probes are literal-true
    "x47_constrained_commit" ->
      s"""WITH tagged AS (
         |  SELECT source, n_chars,
         |    concat_ws(',',
         |      CASE WHEN NOT COALESCE(n_chars >= $X47MinChars, FALSE)
         |           THEN 'min_length' END,
         |      CASE WHEN NOT COALESCE(lang IN (${X47Langs.map(l => s"'$l'").mkString(", ")}), FALSE)
         |           THEN 'lang_known' END,
         |      CASE WHEN NOT COALESCE(doc_id IS NOT NULL, FALSE)
         |           THEN 'id_present' END) AS violations
         |  FROM documents),
         |c AS (SELECT source, COUNT(*) AS n_clean,
         |        CAST(MIN(n_chars) AS BIGINT) AS min_clean_chars
         |      FROM tagged WHERE violations = '' GROUP BY source),
         |q AS (SELECT source, COUNT(*) AS n_quar,
         |        CAST(SUM(CASE WHEN violations LIKE '%min_length%'
         |                      THEN 1 ELSE 0 END) AS BIGINT) AS n_short
         |      FROM tagged WHERE violations <> '' GROUP BY source)
         |SELECT source,
         |  COALESCE(n_clean, 0) AS n_clean,
         |  COALESCE(min_clean_chars, 0) AS min_clean_chars,
         |  COALESCE(n_quar, 0) AS n_quar,
         |  COALESCE(n_short, 0) AS n_short,
         |  true AS atomic_gate, true AS split_complete
         |FROM c FULL OUTER JOIN q USING (source)
         |ORDER BY source""".stripMargin,

    // x46: both served aggregates stated from source (final = full
    // corpus, v1 column = the half corpus the first result was cached
    // from); the life-cycle flags are literal-true — a cache that
    // recomputes on replay, serves stale results across a version
    // bump, or fails to store flips one
    "x46_result_cache" ->
      """WITH v2 AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS chars
        |  FROM documents GROUP BY source),
        |v1 AS (
        |  SELECT source, COUNT(*) AS n_docs_v1
        |  FROM documents WHERE doc_id % 2 = 0 GROUP BY source)
        |SELECT source, n_docs, chars, n_docs_v1,
        |  true AS first_miss, true AS replay_hit, true AS fresh_miss
        |FROM v2 JOIN v1 USING (source)
        |ORDER BY source""".stripMargin,

    // x45: the final visible pair stated from source (the full-corpus
    // refresh won); the three atomicity probes are literal-true — a
    // torn multi-table commit (one table refreshed without the other,
    // a pending txn leaking, a marker that fails to make both sides
    // visible) flips a hashed flag or the per-source consistency bit
    "x45_multi_table_txn" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS chars,
        |  true AS pair_consistent, true AS atomic_pending,
        |  true AS atomic_commit
        |FROM documents
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    // x43: the star-join aggregate stated plainly; the join order
    // replayed from source row counts (smallest dim first) — a
    // planner that stops consulting the catalog, or a catalog
    // mis-counting a dimension, flips a hash-pinned column
    "x43_stats_join_order" ->
      """SELECT p_brand, s_nationkey, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price,
        |  CASE WHEN (SELECT COUNT(*) FROM supplier) <=
        |            (SELECT COUNT(*) FROM part)
        |       THEN 'supplier,part' ELSE 'part,supplier' END AS join_order
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY p_brand, s_nationkey
        |ORDER BY p_brand, s_nationkey""".stripMargin,

    // x41: the merged stats' exact fields stated as the one-shot
    // recompute over the full table (the stats-merge identity); the
    // sketch estimate stays behind its literal-true envelope verdict
    "x41_incremental_analyze" ->
      """SELECT * FROM (
        |  SELECT 'l_orderkey' AS col_name, COUNT(*) AS n_rows,
        |    COUNT(*) - COUNT(l_orderkey) AS n_nulls,
        |    CAST(MIN(l_orderkey) AS DOUBLE) AS min_num,
        |    CAST(MAX(l_orderkey) AS DOUBLE) AS max_num,
        |    COUNT(DISTINCT l_orderkey) AS n_distinct, true AS ndv_ok
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_returnflag', COUNT(*), COUNT(*) - COUNT(l_returnflag),
        |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |    COUNT(DISTINCT l_returnflag), true
        |  FROM lineitem)
        |ORDER BY col_name""".stripMargin,

    // x79: the auto-maintained stats' exact fields restated as a
    // one-shot recompute over the fact's resolved rows (base ∪ Δ =
    // < 1997-07-01) — the stats-merge identity BY VALUE; ndv_ok /
    // fresh / strategy / stale_detected are the contract verdicts
    // (an unfired hook, a wrong fold, a mis-sized broadcast, or a
    // silently-served post-delete state each flips one).
    "x79_auto_analyze" -> {
      val arms = Seq("o_custkey" -> true, "o_orderkey" -> true,
          "o_orderpriority" -> false, "o_totalprice" -> true)
        .map { case (c, numeric) =>
          val mn = if (numeric) s"CAST(MIN($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
          val mx = if (numeric) s"CAST(MAX($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
          val al = if (numeric) "CAST(NULL AS DOUBLE)"
            else s"CAST(SUM(strlen($c)) AS DOUBLE) / COUNT($c)"
          s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
    COUNT(*) - COUNT($c) AS n_nulls, $mn AS min_num, $mx AS max_num,
    $al AS avg_len, TRUE AS ndv_ok, TRUE AS fresh,
    'right' AS strategy, TRUE AS stale_detected
  FROM f""" }
        .mkString("\n  UNION ALL\n  ")
      s"""WITH f AS (SELECT * FROM orders
           WHERE o_orderdate < TIMESTAMP '1997-07-01')
SELECT * FROM (
  $arms)
ORDER BY col_name"""
    },

    // x81: v1's balances restated from orders; n_versions = 2 pins
    // that VACUUM dropped exactly the unprotected v2 (chain closure
    // kept v1 under the restored head), latest_kind pins the verb.
    "x81_sql_maintenance" ->
      """SELECT o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS balance,
        |  COUNT(*) AS n_orders,
        |  CAST(2 AS INT) AS n_versions,
        |  'restore' AS latest_kind
        |FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY o_custkey""".stripMargin,

    // x80: x79's exact-field replay, read back through the pure-SQL
    // auto_stats binding — a binding serving stale or wrong fields
    // breaks the values; an un-re-stamped fold flips fresh.
    "x80_sql_auto_stats" -> {
      val arms = Seq("o_custkey", "o_orderkey", "o_totalprice").map { c =>
        s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
    COUNT(*) - COUNT($c) AS n_nulls,
    CAST(MIN($c) AS DOUBLE) AS min_num, CAST(MAX($c) AS DOUBLE) AS max_num,
    TRUE AS fresh
  FROM f""" }.mkString("\n  UNION ALL\n  ")
      s"""WITH f AS (SELECT * FROM orders
           WHERE o_orderdate < TIMESTAMP '1997-07-01')
SELECT * FROM (
  $arms)
ORDER BY col_name"""
    },

    // x42: the surviving probe's aggregate stated plainly; BOTH
    // pruned verdicts recomputed from source min/max (the engine
    // derives them from the catalog — the hash cross-checks the
    // catalog's bounds against the data)
    "x42_catalog_prune" ->
      s"""WITH pr AS (SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx
         |            FROM orders)
         |SELECT 'disjoint' AS probe,
         |  NOT (mn <= $X42OutHi AND mx >= $X42OutLo) AS pruned,
         |  CAST(0 AS BIGINT) AS n_rows, CAST(NULL AS DOUBLE) AS sum_price
         |FROM pr
         |UNION ALL
         |SELECT 'in_range',
         |  NOT (mn <= $X42InHi AND mx >= $X42InLo),
         |  (SELECT COUNT(*) FROM orders
         |   WHERE o_totalprice BETWEEN $X42InLo AND $X42InHi),
         |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |   FROM orders WHERE o_totalprice BETWEEN $X42InLo AND $X42InHi)
         |FROM pr
         |ORDER BY probe""".stripMargin,

    // x53: the filter-join aggregates stated plainly, PLUS the
    // equi-depth boundaries / selectivity estimates / strategy
    // verdicts recomputed from exact SQL — boundary i is the value
    // at ROW_NUMBER rank ceil(i·n/16) in o_totalprice order, the
    // identical order statistic the catalog's GlobalIndex pass
    // takes, and the estimate is the same integer boundary count.
    // A catalog serving a stale or wrong histogram flips the
    // hash-pinned est/strategy columns.
    "x53_hist_planned_join" ->
      s"""WITH $HistBoundsCte,
         |probes(probe, lo, hi) AS (VALUES
         |  ('narrow', $X53NarrowLo, $X53NarrowHi),
         |  ('wide', $X53WideLo, $X53WideHi)),
         |est AS (SELECT p.probe, p.lo, p.hi,
         |    CAST((SELECT COUNT(*) FROM bounds WHERE b <= p.hi) -
         |         (SELECT COUNT(*) FROM bounds WHERE b < p.lo) AS INT)
         |      AS est_sixteenths
         |  FROM probes p),
         |agg AS (SELECT e.probe, COUNT(*) AS n_items,
         |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         |      AS sum_price
         |  FROM est e
         |  JOIN orders o ON o.o_totalprice BETWEEN e.lo AND e.hi
         |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |  GROUP BY e.probe)
         |SELECT e.probe, e.est_sixteenths,
         |  CASE WHEN e.est_sixteenths <= $X53MaxSixteenths
         |       THEN 'broadcast' ELSE 'shuffle' END AS strategy,
         |  a.n_items, a.sum_price
         |FROM est e JOIN agg a USING (probe)
         |ORDER BY probe""".stripMargin,

    // x51: the four merge arms stated as three UNION legs (matched
    // rows surviving the closure line take the source payload;
    // unmatched targets keep unless negative; unmatched source keys
    // insert above the line); CAST(2 AS INT) pins the commit count.
    "x51_merge_into" ->
      s"""WITH ${x51MergedCte("TRUE")}
         |SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal,
         |  CAST(2 AS INT) AS n_versions
         |FROM merged ORDER BY c_custkey""".stripMargin,

    // x58: the SAME merged CTE (merge-on-read must equal
    // copy-on-write row for row); literal true pins the
    // base-immutability listing check.
    "x58_merge_on_read" ->
      s"""WITH ${x51MergedCte("TRUE")}
         |SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal,
         |  CAST(2 AS INT) AS n_versions,
         |  true AS base_files_untouched
         |FROM merged ORDER BY c_custkey""".stripMargin,

    // x52: the box query stated plainly over the same z math; the
    // literal-true flags pin that pruning happened and the layout
    // landed one file per slice (both listing-checked on the Spark
    // side — a layout or zone-map bug flips a column).
    "x52_zorder_exec" ->
      s"""WITH e AS (SELECT event_id,
         |  CAST(user_id % 16 AS INT) AS ub,
         |  CAST((hour(ts) * 60 + minute(ts)) // 90 AS INT) AS tb
         |  FROM events),
         |z AS (SELECT event_id, ub, tb,
         |  CAST(${zInterleave("//")} AS INT) AS z FROM e)
         |SELECT event_id, ub, tb, z, true AS pruned,
         |  true AS one_file_per_dir
         |FROM z
         |WHERE ub BETWEEN $ZBoxLo AND $ZBoxHi
         |  AND tb BETWEEN $ZBoxLo AND $ZBoxHi
         |ORDER BY event_id""".stripMargin,

    // x60: the merged CTE with the constraint folded into the
    // changeset; the quarantine count is the complement's scalar;
    // literal true pins the marker-gated visibility probe.
    "x60_gated_merge" ->
      s"""WITH ${x51MergedCte(s"c_acctbal <= $X60MaxBal")}
         |SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal,
         |  (SELECT COUNT(*) FROM src0 WHERE NOT (c_acctbal <= $X60MaxBal))
         |    AS n_quarantined,
         |  true AS atomic_gate,
         |  CAST(2 AS INT) AS n_versions
         |FROM merged ORDER BY c_custkey""".stripMargin,

    // x59: rows/width/est/parts restated from the data with the same
    // integer arithmetic (FLOOR over the identical IEEE division for
    // avg_len; 1 MiB ceil-div; LEAST/GREATEST clamp); literal true
    // pins the plan-property check.
    "x59_stats_shuffle_plan" ->
      s"""WITH li AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    CAST(72 + 4 + FLOOR(SUM(LENGTH(l_returnflag)) * 1.0
         |                        / COUNT(l_returnflag))
         |            + 4 + FLOOR(SUM(LENGTH(l_linestatus)) * 1.0
         |                        / COUNT(l_linestatus)) AS BIGINT)
         |      AS width_bytes
         |  FROM lineitem),
         |ord AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    CAST(32 + 4 + FLOOR(SUM(LENGTH(o_orderstatus)) * 1.0
         |                        / COUNT(o_orderstatus))
         |            + 4 + FLOOR(SUM(LENGTH(o_orderpriority)) * 1.0
         |                        / COUNT(o_orderpriority)) AS BIGINT)
         |      AS width_bytes
         |  FROM orders),
         |t AS (SELECT 'lineitem' AS table_name, n_rows, width_bytes FROM li
         |      UNION ALL SELECT 'orders', n_rows, width_bytes FROM ord)
         |SELECT table_name, n_rows, width_bytes,
         |  n_rows * width_bytes AS est_bytes,
         |  CAST(LEAST($X59MaxParts, GREATEST(1,
         |    (n_rows * width_bytes + ${X59TargetBytes - 1}) // $X59TargetBytes))
         |    AS INT) AS n_parts,
         |  true AS parts_applied
         |FROM t ORDER BY table_name""".stripMargin,

    // x61: both table states restated from orders; the op column is
    // the v2→v1 diff (restore direction: new = v1), '=' for rows the
    // bad batch never touched; literal 3/true pin the version count
    // and the zero-data-file restore the Spark side listing-checks.
    "x61_restore" ->
      """WITH v1 AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bal,
        |    COUNT(*) AS n
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
        |  GROUP BY 1),
        |v2 AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bal,
        |    COUNT(*) AS n
        |  FROM orders GROUP BY 1)
        |SELECT COALESCE(v1.o_custkey, v2.o_custkey) AS o_custkey,
        |  v1.bal AS bal_restored,
        |  v1.n AS n_orders_restored,
        |  CASE WHEN v1.o_custkey IS NULL THEN 'D'
        |       WHEN v2.o_custkey IS NULL THEN 'I'
        |       WHEN v1.bal <> v2.bal OR v1.n <> v2.n THEN 'U'
        |       ELSE '=' END AS op,
        |  CAST(3 AS INT) AS n_versions,
        |  TRUE AS restore_zero_files
        |FROM v1 FULL OUTER JOIN v2 ON v1.o_custkey = v2.o_custkey
        |ORDER BY o_custkey""".stripMargin,

    // x62: the plain filtered aggregate — a Bloom false NEGATIVE
    // would drop orders and break this hash, so the match is the
    // index-soundness proof; n_true_files restates per-key month
    // locality, n_files the total file count, and the TRUE literal
    // pins that the index skipped at least one file per key.
    "x62_bloom_skip" ->
      """WITH f AS (
        |  SELECT COUNT(DISTINCT strftime(o_orderdate, '%Y-%m')) AS n_files
        |  FROM orders)
        |SELECT o_custkey,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS spend,
        |  COUNT(DISTINCT strftime(o_orderdate, '%Y-%m')) AS n_true_files,
        |  (SELECT n_files FROM f) AS n_files,
        |  TRUE AS files_pruned
        |FROM orders WHERE o_custkey IN (7, 88, 133)
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    // x63: both table states restated from orders; the boundary and
    // midway instants resolve to v1 (commit ts <= query ts, log-
    // defined visibility), the post-T2 instant to v2 — the literal
    // resolved_version per label pins the resolution rule. Shared
    // with x65 (the SQL-surface twin reading the SAME instants
    // through snapshot_at_time — a wrong bind breaks the state
    // columns' hash).
    "x63_time_as_of" -> X63OracleSql,
    "x65_sql_time_as_of" -> X63OracleSql,

    // x66/x67: the aggregate restated straight from orders (the MV's
    // defining query composed with the user query — containment made
    // executable); used_mv = TRUE is the plan decision the flag pins.
    // x68: v2's numbers (ALL orders) with used_mv = FALSE — a stale-
    // served MV would hash v1's rows instead.
    "x66_mv_rewrite" ->
      (mvConsumerSql("WHERE o_orderdate < TIMESTAMP '1997-01-01'",
        ",\n  TRUE AS used_mv") + "\nORDER BY 1, 2"),

    "x67_mv_rollup" ->
      """SELECT o_orderstatus,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  MIN(o_totalprice) AS min_price,
        |  TRUE AS used_mv
        |FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "x68_mv_staleness" ->
      (mvConsumerSql("", ",\n  FALSE AS used_mv", minMax = false) +
        "\nORDER BY 1, 2"),

    // x70: the aggregate over v1 ∪ Δ restated from orders — the hash
    // proves merge(MV(v1), partials(Δ)) == MV(v1 ∪ Δ) group for
    // group, and used_mv=TRUE pins that the refreshed view serves.
    "x70_mv_refresh" ->
      (mvConsumerSql("WHERE o_orderdate < TIMESTAMP '1997-07-01'",
        ",\n  TRUE AS used_mv") + "\nORDER BY 1, 2"),

    // x69: rows restated straight from orders (the layout must be
    // invisible to the answer); pruned = TRUE is the listing witness
    // — a translation that dropped a matching partition would drop
    // rows, one that failed to fire would flip the flag.
    "x69_hidden_partitioning" -> X69OracleSql,
    // x71: x69's oracle verbatim — the SQL-surface binding must
    // produce the same rows AND the same listing witness.
    "x71_sql_hidden_partitioning" -> X69OracleSql,

    // x75: the rollup restated from orders; served_by='narrow' pins
    // the cost-ordered choice (both views would hash identical
    // values — only the plan decision separates them).
    "x75_mv_choice" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders,
        |  'narrow' AS served_by
        |FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // x74: the literal history — two timed data commits, one
    // instant-less restore chained to v1, all published.
    "x74_table_history" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS INT), 'data', CAST(1704067200000 AS BIGINT),
        |   CAST(NULL AS INT), TRUE),
        |  (CAST(2 AS INT), 'data', CAST(1706745600000 AS BIGINT),
        |   CAST(NULL AS INT), TRUE),
        |  (CAST(3 AS INT), 'restore', CAST(NULL AS BIGINT),
        |   CAST(1 AS INT), TRUE)
        |) t(version, kind, ts, base, published)
        |ORDER BY version""".stripMargin,

    // x73: both probes restated straight from orders; used_mv TRUE
    // only for the defining cut — a matcher that served the wider
    // probe would also break its aggregate columns (1997 missing).
    "x73_filtered_mv" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders,
        |  'defining' AS probe, TRUE AS used_mv
        |FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1
        |UNION ALL
        |SELECT o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
        |  COUNT(*), 'wider', FALSE
        |FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1
        |ORDER BY probe, o_orderpriority""".stripMargin,

    // x78: x66's aggregate for the created probe (<1997) and x70's
    // for the refreshed one (v1 ∪ Δ = <1997-07-01), both used_mv
    // TRUE — a DDL binding that failed to register, a consumer the
    // rewrite declined, or a refresh that didn't re-arm flips a
    // flag; wrong partials break the values. The 'dropped' probe
    // repeats the refreshed aggregate AFTER DROP MATERIALIZED VIEW:
    // same values straight from the fact, used_mv FALSE.
    "x78_sql_mv_ddl" ->
      (Seq(("created", "1997-01-01", "TRUE"),
          ("refreshed", "1997-07-01", "TRUE"),
          ("dropped", "1997-07-01", "FALSE"))
        .map { case (probe, cut, used) =>
          mvConsumerSql(s"WHERE o_orderdate < TIMESTAMP '$cut'",
            s",\n  '$probe' AS probe, $used AS used_mv") }
        .mkString("", "\nUNION ALL\n",
          "\nORDER BY probe, o_orderstatus, o_orderpriority")),

    // x77: both probes restated straight from orders; used_mv TRUE
    // only for the grouping-key conjunct — a matcher that served the
    // value-column probe could not produce its numbers (the partials
    // cannot be re-filtered by o_totalprice), and one that refused
    // the group-key probe flips its flag.
    "x77_mv_containment" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders,
        |  'group_key' AS probe, TRUE AS used_mv
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY 1
        |UNION ALL
        |SELECT o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
        |  COUNT(*), 'value_col', FALSE
        |FROM orders WHERE o_totalprice > 50000
        |GROUP BY 1
        |ORDER BY probe, o_orderpriority""".stripMargin,

    // x72: each leg restated as NOT EXISTS; clean legs hash their
    // zeros, the staging leg its exact corruption arithmetic.
    "x72_fk_audit" ->
      """WITH staging AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 97 = 0 THEN o_custkey + 10000000
        |         ELSE o_custkey END AS o_custkey
        |  FROM orders),
        |leg1 AS (
        |  SELECT 'lineitem->orders' AS rel,
        |    (SELECT COUNT(*) FROM lineitem) AS n_rows,
        |    COUNT(*) AS n_orphans,
        |    MIN(l_orderkey) AS min_bad, MAX(l_orderkey) AS max_bad
        |  FROM lineitem l
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                    WHERE o.o_orderkey = l.l_orderkey)),
        |leg2 AS (
        |  SELECT 'orders->customer' AS rel,
        |    (SELECT COUNT(*) FROM orders) AS n_rows,
        |    COUNT(*) AS n_orphans,
        |    MIN(o_custkey) AS min_bad, MAX(o_custkey) AS max_bad
        |  FROM orders o
        |  WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                    WHERE c.c_custkey = o.o_custkey)),
        |leg3 AS (
        |  SELECT 'staging->customer' AS rel,
        |    (SELECT COUNT(*) FROM staging) AS n_rows,
        |    COUNT(*) AS n_orphans,
        |    MIN(o_custkey) AS min_bad, MAX(o_custkey) AS max_bad
        |  FROM staging st
        |  WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                    WHERE c.c_custkey = st.o_custkey))
        |SELECT rel, n_rows, n_orphans,
        |  n_orphans * 1000000 // n_rows AS orphan_ppm,
        |  min_bad, max_bad, n_orphans = 0 AS ok
        |FROM (SELECT * FROM leg1 UNION ALL SELECT * FROM leg2
        |      UNION ALL SELECT * FROM leg3)
        |ORDER BY rel""".stripMargin,

    // x64: every count replayed EXACTLY (the sketches are in exact
    // mode below 2^20 distinct keys — see the query's contract note);
    // the ppm Jaccard is integer math off two of those counts.
    "x64_sketch_set_algebra" ->
      """WITH a AS (SELECT DISTINCT o_custkey FROM orders
        |           WHERE EXTRACT(year FROM o_orderdate) = 1996),
        |b AS (SELECT DISTINCT o_custkey FROM orders
        |      WHERE EXTRACT(year FROM o_orderdate) = 1997),
        |c AS (SELECT
        |  (SELECT COUNT(*) FROM a) AS n_1996,
        |  (SELECT COUNT(*) FROM b) AS n_1997,
        |  (SELECT COUNT(*) FROM (SELECT * FROM a UNION SELECT * FROM b)) AS n_union,
        |  (SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)) AS n_retained,
        |  (SELECT COUNT(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b)) AS n_churned,
        |  (SELECT COUNT(*) FROM (SELECT * FROM b EXCEPT SELECT * FROM a)) AS n_new)
        |SELECT *, CAST(FLOOR(1000000 * n_retained / n_union) AS BIGINT) AS jaccard_ppm
        |FROM c""".stripMargin,

    // x57: the shard assignment replayed from the recomputed exact
    // boundaries (count of b <= value); literal true pins the
    // one-file-per-shard layout the Spark side listing-checks.
    "x57_hist_range_partition" ->
      s"""WITH $HistBoundsCte,
         |sh AS (SELECT o_orderkey, o_totalprice,
         |    CAST((SELECT COUNT(*) FROM bounds
         |          WHERE b <= o.o_totalprice) AS INT) AS shard
         |  FROM orders o WHERE o_totalprice IS NOT NULL)
         |SELECT shard, COUNT(*) AS n_rows,
         |  MIN(o_totalprice) AS min_v, MAX(o_totalprice) AS max_v,
         |  CAST(SUM(o_orderkey) AS BIGINT) AS keysum,
         |  true AS one_file_per_shard
         |FROM sh GROUP BY shard ORDER BY shard""".stripMargin,

    // x55: the box answer stated plainly (x52's frame); the four
    // literal-true flags pin the append/OPTIMIZE protocol facts the
    // Spark side derives from file listings and zone maps.
    "x55_incremental_zorder" ->
      s"""WITH e AS (SELECT event_id,
         |  CAST(user_id % 16 AS INT) AS ub,
         |  CAST((hour(ts) * 60 + minute(ts)) // 90 AS INT) AS tb
         |  FROM events),
         |z AS (SELECT event_id, ub, tb,
         |  CAST(${zInterleave("//")} AS INT) AS z FROM e)
         |SELECT event_id, ub, tb, z, true AS pruned,
         |  true AS base_files_untouched,
         |  true AS delta_rescanned_before,
         |  true AS delta_pruned_after
         |FROM z
         |WHERE ub BETWEEN $ZBoxLo AND $ZBoxHi
         |  AND tb BETWEEN $ZBoxLo AND $ZBoxHi
         |ORDER BY event_id""".stripMargin,

    // x40: the join-aggregate stated plainly, PLUS both skew
    // verdicts replayed from EXACT top-1 shares — sound because the
    // threshold sits above MG's 1/(k+1) line, so the catalog's
    // sketch-then-recount share makes the same call exact SQL does
    // (above threshold: MG provably holds the true top value; below:
    // an under-report cannot cross the line). A planner that stops
    // consulting the stats, or a stats pipeline feeding it garbage,
    // flips a hash-pinned column.
    "x40_skew_planned_join" ->
      s"""WITH flag AS (
         |  SELECT l_returnflag, COUNT(*) AS n_rows,
         |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         |      AS flag_total
         |  FROM lineitem GROUP BY l_returnflag),
         |s1 AS (SELECT CAST(MAX(n_rows) AS DOUBLE) / SUM(n_rows) AS share
         |       FROM flag),
         |s2 AS (SELECT CAST(MAX(c) AS DOUBLE) / SUM(c) AS share
         |       FROM (SELECT COUNT(*) AS c FROM lineitem GROUP BY l_orderkey)),
         |thr AS (SELECT ${graft.ops.Analyze.SkewShareThreshold} AS t)
         |SELECT f.l_returnflag, f.n_rows, f.flag_total,
         |  CASE WHEN s1.share >= thr.t THEN 'salted' ELSE 'shuffle' END
         |    AS flag_choice,
         |  CASE WHEN s2.share >= thr.t THEN 'salted' ELSE 'shuffle' END
         |    AS orderkey_choice
         |FROM flag f, s1, s2, thr
         |ORDER BY f.l_returnflag""".stripMargin,

    // The IVM identity: the incremental plan must reproduce the
    // one-shot join-aggregate over everything, exactly.
    "x35_ivm_join" ->
      """SELECT o_custkey, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue,
        |  MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,

    // x32: v1 and the gated refresh stated from source; the two
    // protocol verdicts (staged-invisible, audit-pass) are literal
    // true — a staging leak or a failed gate breaks the hash
    "x32_write_audit_publish" ->
      s"""WITH v1 AS (
         |  SELECT source, COUNT(*) AS n_v1,
         |    CAST(SUM(doc_id) AS BIGINT) AS idsum_v1
         |  FROM documents GROUP BY source),
         |pub AS (
         |  SELECT source, COUNT(*) AS n_published,
         |    CAST(SUM(doc_id) AS BIGINT) AS idsum_published
         |  FROM documents WHERE n_chars >= $X32MinChars GROUP BY source)
         |SELECT source, n_v1, idsum_v1, n_published, idsum_published,
         |  true AS staged_invisible, true AS audit_pass
         |FROM v1 JOIN pub USING (source)
         |ORDER BY source""".stripMargin,

    // x31: v1's lang is null for EVERY row because the column did not
    // exist pre-evolution — the oracle states exactly that; v2 reads
    // the real column
    "x31_schema_evolution" ->
      """WITH v1 AS (
        |  SELECT CAST(1 AS INT) AS version, source, COUNT(*) AS n,
        |    COUNT(*) AS n_lang_null,
        |    CAST(SUM(doc_id) AS BIGINT) AS idsum
        |  FROM documents GROUP BY source),
        |v2 AS (
        |  SELECT CAST(2 AS INT) AS version, source, COUNT(*) AS n,
        |    CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_lang_null,
        |    CAST(SUM(doc_id) AS BIGINT) AS idsum
        |  FROM documents GROUP BY source)
        |SELECT * FROM v1 UNION ALL SELECT * FROM v2
        |ORDER BY version, source""".stripMargin,

    // q33: the identical correlated-subquery SQL text
    "q33_correlated_exists" ->
      s"""SELECT c_custkey, c_mktsegment FROM customer c
         |WHERE EXISTS (SELECT 1 FROM orders o
         |              WHERE o.o_custkey = c.c_custkey
         |                AND o.o_orderpriority = '1-URGENT')
         |  AND NOT EXISTS (SELECT 1 FROM orders o
         |                  WHERE o.o_custkey = c.c_custkey
         |                    AND o.o_totalprice > $Q33PriceCut)
         |ORDER BY c_custkey""".stripMargin,

    // x30: the applied replica must equal the new snapshot, so the
    // oracle just states the new state from source (x18's replay) and
    // aggregates it; literal true states the checked exceptAll proof
    "x30_cdc_apply" ->
      """WITH neu AS (
        |  SELECT c_custkey, c_name,
        |    CASE WHEN c_custkey % 13 = 0 THEN round(c_acctbal + 100.0, 2)
        |         ELSE c_acctbal END AS c_acctbal
        |  FROM customer WHERE c_custkey % 97 <> 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_name, c_acctbal
        |  FROM customer WHERE c_custkey % 31 = 0)
        |SELECT CAST(c_custkey % 10 AS INT) AS bucket, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS balsum,
        |  CAST(SUM(c_custkey) AS BIGINT) AS keysum,
        |  true AS roundtrip_exact
        |FROM neu GROUP BY 1
        |ORDER BY bucket""".stripMargin,

    // the z computation is the same div/mod string the Spark side
    // compiles (zInterleave), only the integer-division operator
    // differs; all math is integer so the twin is exact
    "x19_zorder_layout" ->
      s"""WITH e AS (SELECT
         |  CAST(user_id % 16 AS INT) AS ub,
         |  CAST((hour(ts) * 60 + minute(ts)) // 90 AS INT) AS tb
         |  FROM events),
         |z AS (SELECT ub, tb,
         |  CAST(${zInterleave("//")} AS INT) AS z FROM e),
         |f AS (SELECT ub, tb, CAST(z // $ZFileSpan AS INT) AS file FROM z)
         |SELECT file, COUNT(*) AS n_rows,
         |  MIN(ub) AS min_ub, MAX(ub) AS max_ub,
         |  MIN(tb) AS min_tb, MAX(tb) AS max_tb,
         |  CAST(SUM(CASE WHEN ub BETWEEN $ZBoxLo AND $ZBoxHi
         |                 AND tb BETWEEN $ZBoxLo AND $ZBoxHi
         |                THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
         |  CAST(CASE WHEN MIN(ub) <= $ZBoxHi AND MAX(ub) >= $ZBoxLo
         |             AND MIN(tb) <= $ZBoxHi AND MAX(tb) >= $ZBoxLo
         |            THEN 1 ELSE 0 END AS INT) AS scanned
         |FROM f GROUP BY file ORDER BY file""".stripMargin,

    // pure integer cumulative math; the window frame (UNBOUNDED
    // PRECEDING .. 1 PRECEDING) is the Spark rowsBetween twin
    "x20_compaction_plan" ->
      s"""WITH $compactKnobsCte,
         |f AS (SELECT source,
         |    source || '_' || (doc_id // gw)::VARCHAR AS file_id,
         |    CAST(SUM(n_chars) AS BIGINT) AS size_bytes
         |  FROM documents CROSS JOIN knobs
         |  GROUP BY source, doc_id // gw),
         |w AS (SELECT source, file_id, size_bytes,
         |  CAST(COALESCE(SUM(size_bytes) OVER (PARTITION BY source
         |    ORDER BY size_bytes DESC, file_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |    AS cum_before
         |  FROM f)
         |SELECT source, file_id, size_bytes, cum_before,
         |  CAST(cum_before // tgt AS INT) AS bin
         |FROM w CROSS JOIN knobs
         |ORDER BY source, bin, size_bytes DESC, file_id""".stripMargin,

    // the manifest-pruned read must equal a plain BETWEEN filter;
    // `true AS pruned` pins that files were actually skipped
    "x21_shard_range_read" ->
      s"""SELECT doc_id, lang, source, n_chars, true AS pruned
         |FROM documents
         |WHERE doc_id BETWEEN $ShardRangeLo AND $ShardRangeHi
         |ORDER BY doc_id""".stripMargin,

    // the salted rewrite must reproduce the plain join exactly —
    // per-flag row counts unchanged (multiplicity preserved)
    // x39: the classes, the k verdict, and the exposure totals all
    // stated from source; risk_rate an unrounded integer quotient
    "x39_k_anonymity" ->
      s"""WITH classes AS (
         |  SELECT c_nationkey, c_mktsegment,
         |    CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
         |    COUNT(*) AS class_size
         |  FROM customer
         |  GROUP BY 1, 2, 3),
         |totals AS (
         |  SELECT CAST(SUM(class_size) AS BIGINT) AS n_total,
         |    CAST(SUM(CASE WHEN class_size < $KAnonK THEN class_size ELSE 0 END)
         |      AS BIGINT) AS n_at_risk
         |  FROM classes)
         |SELECT c_nationkey, c_mktsegment, bal_band, class_size,
         |  class_size >= $KAnonK AS anonymous, n_at_risk,
         |  CAST(n_at_risk AS DOUBLE) / n_total AS risk_rate
         |FROM classes CROSS JOIN totals
         |ORDER BY c_nationkey, c_mktsegment, bal_band""".stripMargin,

    // the Bloom prune is exact after the equi join: plain aggregate
    "x38_bloom_join" ->
      """SELECT c_custkey, c_name, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS spend
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY c_custkey, c_name
        |ORDER BY c_custkey""".stripMargin,

    "x23_salted_join" ->
      """WITH dim AS (SELECT l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS flag_total
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag, COUNT(*) AS n_rows, MAX(d.flag_total) AS flag_total
        |FROM lineitem l JOIN dim d USING (l_returnflag)
        |GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    // the bucketed-layout join must reproduce the plain join+agg
    "x22_bucketed_join" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |  COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY o_year""".stripMargin,

    // x24: both snapshot states stated straight from orders — the
    // pinned-v1 read must equal the pre-refresh aggregate even
    // though v2 was committed in between (snapshot isolation as a
    // hash check); customers first active in 1997+ carry null v1
    // columns through the left join on both engines.
    "x24_time_travel" -> X24OracleSql,

    // x54: x24's oracle VERBATIM — the SQL-surface run must reproduce
    // the Scala API's pinned reads byte for byte; sharing the oracle
    // string is the claim, not a shortcut.
    "x54_sql_time_travel" -> X24OracleSql,

    // broadcast left join to a unique-keyed dimension — no row
    // multiplication, absent users keep null segments
    "s6_enrich_events" ->
      """SELECT e.event_id, e.user_id, c.c_mktsegment AS segment
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |ORDER BY e.event_id""".stripMargin,

    // s7: the duplicated feed replayed with the same redelivery hash;
    // the deduped side is the original table (re-deliveries are
    // row-identical copies, so dedup = distinct event_id = source)
    "s7_at_least_once_dedup" ->
      """WITH re AS (
        |  SELECT * FROM events
        |  WHERE CAST(('0x' || substr(md5('redeliver|' || event_id::VARCHAR), 1, 15))
        |    AS BIGINT) % 10 = 0),
        |feed AS (SELECT * FROM events UNION ALL SELECT * FROM re),
        |a AS (SELECT event_type, COUNT(*) AS n_delivered
        |      FROM feed GROUP BY event_type),
        |b AS (SELECT event_type, COUNT(*) AS n_unique,
        |        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |      FROM events GROUP BY event_type)
        |SELECT event_type, n_delivered, n_unique, sum_value
        |FROM a JOIN b USING (event_type)
        |ORDER BY event_type""".stripMargin,

    // x25: BOTH snapshot versions stated straight from source — the
    // doc corpus via x14's verdict chain (DedupQ.x14VerdictCtes) and
    // the vector store via v20's fixed-centroid assignment chain
    // (VectorQ.appendAssignCtes). History rows of allasg are v1, the
    // whole of allasg is v2 (append ≡ rebuild, v20's proven
    // contract), so the per-bucket counts + id-sum checksums replay
    // integer-exactly and the hash match proves the pinned v1 read
    // is byte-identical to the pre-batch state.
    "x25_pipeline_snapshot" ->
      s"""WITH ${DedupQ.x14VerdictCtes},
         |${VectorQ.appendAssignCtes},
         |v1state AS (
         |  SELECT 'docs' AS store, -1 AS bucket, doc_id AS id
         |  FROM lab WHERE NOT is_new
         |  UNION ALL
         |  SELECT 'vecs', cluster_id, vec_id FROM allasg
         |  WHERE vec_id % ${VectorQ.AppendSplitMod} < ${VectorQ.AppendHistMax}),
         |v2state AS (
         |  SELECT 'docs' AS store, -1 AS bucket, doc_id AS id
         |  FROM lab WHERE NOT is_new
         |  UNION ALL
         |  SELECT 'docs', -1, doc_id FROM x14verdicts WHERE verdict = 'unique'
         |  UNION ALL
         |  SELECT 'vecs', cluster_id, vec_id FROM allasg),
         |a1 AS (SELECT store, bucket, COUNT(*) AS n_v1,
         |         CAST(SUM(id) AS BIGINT) AS idsum_v1
         |       FROM v1state GROUP BY store, bucket),
         |a2 AS (SELECT store, bucket, COUNT(*) AS n_latest,
         |         CAST(SUM(id) AS BIGINT) AS idsum_latest
         |       FROM v2state GROUP BY store, bucket)
         |SELECT store, CAST(bucket AS INT) AS bucket,
         |  COALESCE(n_v1, 0) AS n_v1,
         |  COALESCE(idsum_v1, 0) AS idsum_v1,
         |  COALESCE(n_latest, 0) AS n_latest,
         |  COALESCE(idsum_latest, 0) AS idsum_latest,
         |  CAST(2 AS INT) AS n_versions
         |FROM a2 FULL JOIN a1 USING (store, bucket)
         |ORDER BY store, bucket""".stripMargin,

    // x26: the bin routing is x20's integer plan replayed; per-bin
    // counts + id/byte sums prove the rewrite is content-preserving;
    // literal `true` states the one-file-per-bin layout the Spark
    // side computes from the commit's file listing.
    "x26_compaction_exec" ->
      s"""WITH $compactKnobsCte,
         |f AS (SELECT source,
         |    source || '_' || (doc_id // gw)::VARCHAR AS file_id,
         |    CAST(SUM(n_chars) AS BIGINT) AS size_bytes
         |  FROM documents CROSS JOIN knobs
         |  GROUP BY source, doc_id // gw),
         |w AS (SELECT source, file_id, size_bytes,
         |  CAST(COALESCE(SUM(size_bytes) OVER (PARTITION BY source
         |    ORDER BY size_bytes DESC, file_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |    AS cum_before
         |  FROM f),
         |plan AS (SELECT source, file_id,
         |    CAST(cum_before // tgt AS INT) AS bin FROM w CROSS JOIN knobs),
         |rws AS (SELECT source, doc_id, n_chars,
         |    source || '_' || (doc_id // gw)::VARCHAR AS file_id
         |  FROM documents CROSS JOIN knobs),
         |routed AS (SELECT r.source, r.doc_id, r.n_chars, r.file_id, p.bin
         |  FROM rws r JOIN plan p ON p.source = r.source AND p.file_id = r.file_id)
         |SELECT source, bin, COUNT(DISTINCT file_id) AS n_files_in,
         |  CAST(SUM(n_chars) AS BIGINT) AS size_bytes,
         |  COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS docsum,
         |  true AS one_file_per_bin
         |FROM routed GROUP BY source, bin
         |ORDER BY source, bin""".stripMargin,

    // x29: the two SURVIVING states stated from source (the x24
    // pattern at cuts 1997-01-01 and none); literal true states the
    // listing-checked "v1's directory is physically gone" flag.
    "x29_vacuum" ->
      """WITH v2 AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bal_v2,
        |    COUNT(*) AS n_orders_v2
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
        |  GROUP BY 1),
        |v3 AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bal_v3,
        |    COUNT(*) AS n_orders_v3
        |  FROM orders GROUP BY 1)
        |SELECT l.o_custkey, v.bal_v2, v.n_orders_v2,
        |  l.bal_v3, l.n_orders_v3,
        |  CAST(2 AS INT) AS n_versions_after, true AS v1_dir_gone
        |FROM v3 l LEFT JOIN v2 v USING (o_custkey)
        |ORDER BY o_custkey""".stripMargin,

    // x27: both versions stated from source — v1 the full corpus, v2
    // the corpus minus the replayed takedown hash predicate; literal
    // `true` states the listing-checked base-immutability flag.
    "x27_deletion_vectors" ->
      """WITH del AS (
        |  SELECT doc_id FROM documents
        |  WHERE CAST(('0x' || substr(md5('gdpr|' || doc_id::VARCHAR), 1, 15))
        |    AS BIGINT) % 20 = 0),
        |v1 AS (SELECT source, COUNT(*) AS n_v1,
        |         CAST(SUM(doc_id) AS BIGINT) AS idsum_v1
        |       FROM documents GROUP BY source),
        |v2 AS (SELECT source, COUNT(*) AS n_v2,
        |         CAST(SUM(doc_id) AS BIGINT) AS idsum_v2
        |       FROM documents d
        |       WHERE NOT EXISTS (SELECT 1 FROM del WHERE del.doc_id = d.doc_id)
        |       GROUP BY source)
        |SELECT source, n_v1, idsum_v1, n_v2, idsum_v2,
        |  true AS base_files_untouched
        |FROM v1 JOIN v2 USING (source)
        |ORDER BY source""".stripMargin,

    // x28: v1 scores from source, v2 with the re-score replayed on
    // the replaced partition only; literal `true` states both
    // listing-checked flags (base untouched, v2 dir holds exactly
    // the replaced partition).
    "x28_partition_overwrite" ->
      s"""WITH v1 AS (
         |  SELECT source, COUNT(*) AS n_v1,
         |    CAST(SUM(n_chars) AS BIGINT) AS scoresum_v1
         |  FROM documents GROUP BY source),
         |v2 AS (
         |  SELECT source, COUNT(*) AS n_v2,
         |    CAST(SUM(CASE WHEN source = '$X28Pval' THEN n_chars * 2
         |                  ELSE n_chars END) AS BIGINT) AS scoresum_v2
         |  FROM documents GROUP BY source)
         |SELECT source, n_v1, scoresum_v1, n_v2, scoresum_v2,
         |  true AS base_files_untouched, true AS only_replaced_partition
         |FROM v1 JOIN v2 USING (source)
         |ORDER BY source""".stripMargin
  )
}
