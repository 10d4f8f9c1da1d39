package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ANALYZE machinery: per-column table statistics (x34/x36's legs)
  * and the first consumer that closes the stats→planner loop (x37's
  * stats-chosen broadcast side).
  *
  * The reference has no optimizer of its own — it leans on its
  * warehouse's (SURVEY §2: every query ships as declarative SQL to
  * Snowflake, e.g. tools.py's search path). Re-expressed Spark-first,
  * the engine needs the warehouse half too: ANALYZE produces the
  * row-count/NDV/width facts, a committed Snapshots table carries
  * them, and the planner consults them where Spark's static
  * heuristics would guess — at 100 TB the difference between
  * broadcasting the true dimension and shuffling two facts.
  */
object Analyze {

  /** One numeric-profiled stats leg: COUNT/NULLs/exact NDV/min/max
    * over a single column, pruned to exactly that column's bytes on a
    * columnar scan (PlanShapeSpec pins the one-field ReadSchema). */
  def numLeg(df: DataFrame, c: String, asNum: Column): DataFrame = {
    val nullNum = lit(null).cast("double")
    val nullStr = lit(null).cast("string")
    df.agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col(c))).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        min(asNum).cast("double").as("min_num"),
        max(asNum).cast("double").as("max_num"))
      .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_num"), col("max_num"),
        nullStr.as("min_str"), nullStr.as("max_str"),
        nullNum.as("avg_len"))
  }

  /** One string-profiled stats leg: min/max lexicographic bounds plus
    * the average byte length a width estimator needs. */
  def strLeg(df: DataFrame, c: String): DataFrame = {
    val nullNum = lit(null).cast("double")
    df.agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col(c))).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).as("min_str"), max(col(c)).as("max_str"),
        (sum(length(col(c))).cast("double") / count(col(c))).as("avg_len"))
      .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), nullNum.as("min_num"), nullNum.as("max_num"),
        col("min_str"), col("max_str"), col("avg_len"))
  }

  /** Estimated in-memory bytes of a table from its committed ANALYZE
    * output (one row per profiled column): row count × (8 bytes per
    * numeric column + avg_len + 4 per string column). Model-sized
    * input — stats rows number in the columns, never the rows. */
  def estBytes(stats: Array[org.apache.spark.sql.Row]): Long = {
    require(stats.nonEmpty, "estBytes needs at least one stats row")
    val n = stats.head.getAs[Long]("n_rows")
    val width = stats.map { r =>
      val i = r.fieldIndex("avg_len")
      if (r.isNullAt(i)) 8.0 else r.getDouble(i) + 4.0
    }.sum
    (n * width).toLong
  }

  /** The stats→planner loop's first decision: join `left` and `right`
    * with the BROADCAST side chosen from their committed ANALYZE
    * outputs instead of Spark's static size threshold — the
    * fewer-estimated-rows side is hinted, provided its estimated
    * bytes fit `maxBroadcastBytes`; if neither side is
    * broadcast-sized the join is left to the shuffle planner. Spark's
    * own threshold reads FILE sizes, which at 100 TB routinely
    * mis-sizes a narrow projection of a wide table (or a post-filter
    * slice); ANALYZE row counts + widths size the join INPUT.
    * Returns (joined, chosen-side label: "left" | "right" | "none").
    */
  def statsChosenJoin(left: DataFrame, leftStats: Array[org.apache.spark.sql.Row],
                      right: DataFrame, rightStats: Array[org.apache.spark.sql.Row],
                      cond: Column,
                      maxBroadcastBytes: Long = 10L << 20): (DataFrame, String) =
    chooseBroadcast(left, leftStats.head.getAs[Long]("n_rows"), estBytes(leftStats),
      right, rightStats.head.getAs[Long]("n_rows"), estBytes(rightStats),
      cond, maxBroadcastBytes)

  /** [[statsChosenJoin]] reading the SHARED stats catalog's served
    * shape ([[StatsCatalog.ColStats]]) instead of freshly collected
    * ANALYZE rows — the planner path with zero profiling jobs. */
  def statsChosenJoin(left: DataFrame, leftStats: Map[String, StatsCatalog.ColStats],
                      right: DataFrame, rightStats: Map[String, StatsCatalog.ColStats],
                      cond: Column,
                      maxBroadcastBytes: Long): (DataFrame, String) =
    chooseBroadcast(left, StatsCatalog.nRows(leftStats), StatsCatalog.estBytes(leftStats),
      right, StatsCatalog.nRows(rightStats), StatsCatalog.estBytes(rightStats),
      cond, maxBroadcastBytes)

  private def chooseBroadcast(left: DataFrame, lRows: Long, lBytes: Long,
                              right: DataFrame, rRows: Long, rBytes: Long,
                              cond: Column, maxBroadcastBytes: Long): (DataFrame, String) = {
    val rightSmall = rRows <= lRows
    val (smallBytes, label) =
      if (rightSmall) (rBytes, "right") else (lBytes, "left")
    if (smallBytes > maxBroadcastBytes) (left.join(right, cond), "none")
    else if (rightSmall) (left.join(broadcast(right), cond), label)
    else (broadcast(left).join(right, cond), label)
  }

  /** Decision threshold for [[skewChosenJoin]]: a key whose top value
    * carries at least this share of the rows gets the salted rewrite.
    * MUST exceed 1/(k+1) of the catalog's Misra–Gries candidate
    * budget (k = 8 → 1/9 ≈ 0.111): above that line MG guarantees the
    * true top value is among the recounted candidates, so the stored
    * `top1_share` makes EXACTLY the decision exact counts would —
    * below it the sketch may under-report, but then the true share is
    * under the threshold too and the decision is still "shuffle".
    * That inequality is what lets an oracle replay the verdict from
    * exact SQL. */
  val SkewShareThreshold = 0.2

  /** The stats→planner loop's SECOND decision (x40): choose between
    * the plain shuffle join and [[Skew.saltedJoin]]'s rewrite from
    * the catalog's heavy-hitter share of the probe-side join key —
    * no data is scanned to decide. A hot key (one value carrying ≥
    * threshold of the fact) funnels that share of the corpus through
    * ONE reducer in the plain plan; the salted rewrite spreads it
    * over `shards` reducers at the cost of replicating the build side
    * `shards`×. Spark's static planner cannot see value skew at all
    * (AQE's skew-join covers only sort-merge shapes at runtime) —
    * this is the catalog making the call declaratively.
    * Returns (joined, "salted" | "shuffle"). */
  def skewChosenJoin(probe: DataFrame, build: DataFrame, key: String,
                     top1Share: Double, shards: Int, tieBreak: String,
                     threshold: Double = SkewShareThreshold): (DataFrame, String) =
    if (top1Share >= threshold)
      (Skew.saltedJoin(probe, build, key, shards, tieBreak), "salted")
    else (probe.join(build, Seq(key)), "shuffle")

  /** x114's decision line in parts-per-256 (≈ [[SkewShareThreshold]]
    * stated as the v25-style integer — no float threshold can flip
    * engines): a reduce partition carrying ≥ 51/256 of the shuffle's
    * rows marks the plan skewed. Far above hash-collision noise: a
    * uniform key over 32 partitions sits at ~8/256. */
  val RuntimeSkewThreshold256 = 51

  /** RUNTIME SKEW PROBE (x114 — the AQE half x40's catalog path
    * lacks): the per-reduce-partition weights of the PLANNED shuffle,
    * measured from the probe side's key column alone — one
    * column-pruned pass folding to `numPartitions` rows, then max
    * share in parts-per-256. This is the information AQE reads for
    * free from mapOutputStatistics after a map stage; stated as an
    * explicit pre-join probe it also exists for aggregations,
    * generators, and co-partitioned shapes AQE cannot re-plan, and
    * for plans whose catalog stats are stale or absent. The
    * partitioner model is the engine's REPRODUCIBLE hash
    * ([[TextFns.hash60]] mod partitions) so the verdict replays in
    * oracle SQL; at deployment the same decision reads the shuffle's
    * own map-output sizes instead. */
  def shuffleSkewProbe256(probe: DataFrame, key: String,
                          numPartitions: Int = 32): Int = {
    val r = probe
      .select(pmod(graft.ops.TextFns.hash60(
          concat(lit("skw|"), col(key).cast("string"))),
        lit(numPartitions)).as("_p"))
      .groupBy(col("_p")).agg(count(lit(1)).as("_n"))
      .agg(max(col("_n")).as("_mx"), sum(col("_n")).as("_tot")).head
    if (r.isNullAt(0) || r.isNullAt(1) || r.getLong(1) == 0L) 0
    else ((r.getLong(0) * 256L) / r.getLong(1)).toInt
  }

  /** The runtime-stats twin of [[skewChosenJoin]] (x114): choose
    * salted-vs-plain from the MEASURED shuffle distribution instead
    * of the catalog's heavy-hitter share — the path that stays
    * correct when the catalog is stale, lying, or absent. Returns
    * (joined, "salted" | "shuffle", maxShare256). */
  def runtimeSkewJoin(probe: DataFrame, build: DataFrame, key: String,
                      shards: Int, tieBreak: String,
                      numPartitions: Int = 32,
                      threshold256: Int = RuntimeSkewThreshold256)
      : (DataFrame, String, Int) = {
    val share = shuffleSkewProbe256(probe, key, numPartitions)
    if (share >= threshold256)
      (Skew.saltedJoin(probe, build, key, shards, tieBreak), "salted", share)
    else (probe.join(build, Seq(key)), "shuffle", share)
  }

  /** BETWEEN selectivity estimated from a committed EQUI-DEPTH
    * histogram, in SIXTEENTHS — a pure integer both engines compute
    * identically (no float ratio ever reaches a decision):
    * #boundaries ≤ hi minus #boundaries < lo. Equi-depth boundaries
    * are exact order statistics, so the true fraction inside
    * [lo, hi] differs from est/16 by at most one bucket at each end
    * — any decision threshold with a > 2-bucket margin on its probes
    * therefore decides exactly as exact counts would (x40's
    * Misra–Gries soundness argument, histogram edition), which is
    * what keeps x53's planner verdict oracle-replayable. */
  def histSelectivity16(hist: Seq[Double], lo: Double, hi: Double): Int =
    hist.count(_ <= hi) - hist.count(_ < lo)

  /** The stats→planner loop's FOURTH decision (x53): is a
    * range-FILTERED fact side broadcast-joinable? Spark's static
    * threshold sizes the FILE — it cannot see that a predicate keeps
    * 2% of a huge table, so at 100 TB it shuffles both facts where a
    * selective filter left a broadcast-sized slice. The histogram
    * estimate (in sixteenths, [[histSelectivity16]]) makes the call
    * from committed metadata with zero plan-time jobs: est ≤
    * `maxSixteenths` broadcasts the filtered side, anything wider
    * stays a shuffle join (replicating an unselective slice to every
    * task would be worse than the exchange). Returns
    * (joined, "broadcast" | "shuffle"). */
  def histChosenJoin(probe: DataFrame, filtered: DataFrame, cond: Column,
                     est16: Int, maxSixteenths: Int): (DataFrame, String) =
    if (est16 <= maxSixteenths) (probe.join(broadcast(filtered), cond), "broadcast")
    else (probe.join(filtered, cond), "shuffle")

  /** The stats→planner loop's THIRD decision (x43): JOIN ORDERING
    * for a star fact. Dimensions join smallest-estimated-first —
    * the greedy heuristic every CBO starts from: the most selective
    * dimension shrinks the intermediate before the wider ones touch
    * it, and at 100 TB the difference between probing the narrow dim
    * first and last is the width of every row the later joins carry.
    * Each dimension independently gets the x37 broadcast rule under
    * `maxBroadcastBytes`. Requires a true star (every condition
    * references only the fact and its own dim — reordering is then
    * semantics-free). Returns (joined, comma-joined order label). */
  def statsOrderedJoin(fact: DataFrame,
                       dims: Seq[(String, DataFrame, Map[String, StatsCatalog.ColStats], Column)],
                       maxBroadcastBytes: Long = 10L << 20): (DataFrame, String) = {
    val ordered = dims.sortBy { case (_, _, st, _) => StatsCatalog.nRows(st) }
    val joined = ordered.foldLeft(fact) { case (acc, (_, df, st, cond)) =>
      if (StatsCatalog.estBytes(st) <= maxBroadcastBytes) acc.join(broadcast(df), cond)
      else acc.join(df, cond)
    }
    (joined, ordered.map(_._1).mkString(","))
  }
}
