package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** SHARED TABLE-STATISTICS CATALOG — the warehouse contract behind
  * x37/x38/x40: ANALYZE profiles a fixture table ONCE and commits the
  * result as a [[graft.sources.Snapshots]] version under one
  * canonical catalog directory; every planner that needs statistics
  * READS the committed catalog instead of re-profiling its inputs per
  * query (the x37-round-8 shape, where each consumer ran its own
  * ANALYZE inline).
  *
  * Two read paths, by consumer need:
  *  - the committed Snapshots table (versioned, time-travelable —
  *    the audit trail of what the planner believed when);
  *  - a driver-side `_stats_summary.json` written from the SAME
  *    collected rows at ANALYZE time. Planner reads go through the
  *    summary: ZERO Spark jobs at plan construction (the d14/x38
  *    acceptance rule — building a DataFrame must not run jobs), the
  *    way real catalogs serve stats from the metadata service rather
  *    than a table scan.
  *
  * Staleness: the summary records a fingerprint of the profiled
  * table's parquet files (count/bytes/max-mtime) and a format tag; a
  * mismatch re-ANALYZEs, so regenerated fixture data or a stats-shape
  * change can never serve stale numbers. Per-JVM memoization makes
  * repeated reads free.
  *
  * Heavy-hitter share (the x40 skew signal) lands in the catalog via
  * x10/x15's machinery: a Misra–Gries candidate sketch (bounded
  * state, map-side mergeable — never a full-key shuffle at 100 TB)
  * followed by an exact recount of the ≤ k candidates. MG guarantees
  * every term with share > 1/(k+1) survives, so for any decision
  * threshold above 1/(k+1) the stored `top1_share` yields EXACTLY the
  * decision exact counts would (see [[Analyze.skewChosenJoin]]) —
  * which is what keeps x40's planner verdict oracle-replayable.
  */
object StatsCatalog {

  /** One profiled column, as served to planners. `nRows`/`nNulls`/
    * `nDistinct` are exact; `top1Share` is present only for columns
    * profiled as heavy-hitter candidates. */
  final case class ColStats(nRows: Long, nNulls: Long, nDistinct: Long,
                            minNum: Option[Double], maxNum: Option[Double],
                            avgLen: Option[Double], top1Share: Option[Double])

  /** Canonical catalog root for one fixture directory; each table's
    * stats are one Snapshots table under it. */
  def dirFor(sfDir: String): String =
    s"target/stats_catalog_${math.abs(sfDir.hashCode)}"

  private val Fmt = 1
  private val HhK = 8 // MG candidate budget; decisions need threshold > 1/(k+1)

  /** What ANALYZE profiles per fixture table:
    * (numeric columns, string columns, heavy-hitter columns). */
  private val profiles: Map[String, (Seq[String], Seq[String], Seq[String])] = Map(
    "customer" -> ((Seq("c_custkey", "c_nationkey", "c_acctbal"),
      Seq("c_name", "c_mktsegment"), Seq("c_mktsegment"))),
    "nation" -> ((Seq("n_nationkey"), Seq("n_name"), Nil)),
    "orders" -> ((Seq("o_orderkey", "o_custkey", "o_totalprice"), Nil, Nil)),
    "lineitem" -> ((Seq("l_orderkey", "l_quantity", "l_extendedprice"),
      Seq("l_returnflag"), Seq("l_returnflag", "l_orderkey"))),
    "part" -> ((Seq("p_partkey", "p_size", "p_retailprice"), Seq("p_brand"), Nil)),
    "supplier" -> ((Seq("s_suppkey", "s_nationkey", "s_acctbal"), Seq("s_name"), Nil)))

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, ColStats]]()

  /** Tests only: forget memoized summaries (files stay). */
  def invalidate(): Unit = cache.clear()

  /** Catalog read — summary file, zero Spark jobs; ANALYZEs once if
    * the table was never profiled (or its data/format changed). */
  def stats(spark: SparkSession, sfDir: String, table: String): Map[String, ColStats] = {
    val key = s"$sfDir/$table"
    val hit = cache.get(key)
    if (hit != null) hit
    else {
      val loaded = readSummary(spark, sfDir, table)
        .getOrElse(analyze(spark, sfDir, table))
      cache.put(key, loaded)
      loaded
    }
  }

  /** Estimated in-memory bytes of the profiled table: rows × (8 per
    * numeric column + avg_len + 4 per string column). */
  def estBytes(stats: Map[String, ColStats]): Long = {
    require(stats.nonEmpty, "estBytes needs at least one profiled column")
    val n = stats.head._2.nRows
    val width = stats.values.map(s => s.avgLen.map(_ + 4.0).getOrElse(8.0)).sum
    (n * width).toLong
  }

  def nRows(stats: Map[String, ColStats]): Long = {
    require(stats.nonEmpty, "nRows needs at least one profiled column")
    stats.head._2.nRows
  }

  /** Fingerprint of the profiled table's parquet files — regenerated
    * fixture data invalidates the stored summary. */
  private def fingerprint(sfDir: String, table: String): String = {
    val root = java.nio.file.Paths.get(sfDir, s"$table.parquet")
    if (!java.nio.file.Files.exists(root)) s"missing"
    else {
      // fixture tables are single parquet files; tolerate a directory
      // of part files too
      val files =
        if (java.nio.file.Files.isDirectory(root))
          java.nio.file.Files.list(root).toArray.toSeq
            .map(_.asInstanceOf[java.nio.file.Path])
            .filter(p => p.getFileName.toString.endsWith(".parquet"))
        else Seq(root)
      val bytes = files.map(java.nio.file.Files.size).sum
      val mtime = files.map(p =>
        java.nio.file.Files.getLastModifiedTime(p).toMillis).maxOption.getOrElse(0L)
      s"n${files.size}_b${bytes}_m$mtime"
    }
  }

  private def summaryPath(sfDir: String, table: String): java.nio.file.Path =
    java.nio.file.Paths.get(dirFor(sfDir), table, "_stats_summary.json")

  private def readSummary(spark: SparkSession, sfDir: String,
                          table: String): Option[Map[String, ColStats]] = {
    val path = summaryPath(sfDir, table)
    if (!java.nio.file.Files.exists(path)) None
    else {
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readString(path))
      val fresh = root.get("fmt").asInt() == Fmt &&
        root.get("fingerprint").asText() == fingerprint(sfDir, table)
      if (!fresh) None
      else {
        def optD(n: com.fasterxml.jackson.databind.JsonNode, f: String) =
          Option(n.get(f)).filterNot(_.isNull).map(_.asDouble())
        val cols = root.get("cols")
        val out = Map.newBuilder[String, ColStats]
        val names = cols.fieldNames()
        while (names.hasNext) {
          val c = names.next(); val n = cols.get(c)
          out += c -> ColStats(n.get("n_rows").asLong(), n.get("n_nulls").asLong(),
            n.get("n_distinct").asLong(), optD(n, "min_num"), optD(n, "max_num"),
            optD(n, "avg_len"), optD(n, "top1_share"))
        }
        Some(out.result())
      }
    }
  }

  /** ANALYZE: profile `table` (Analyze legs + MG-candidate top-1
    * share), commit the stats rows as a Snapshots version under the
    * canonical catalog dir, and write the planner-serving summary.
    * One write, many reads — consumers never re-profile. */
  def analyze(spark: SparkSession, sfDir: String, table: String): Map[String, ColStats] = {
    val (numCols, strCols, hhCols) = profiles.getOrElse(table,
      sys.error(s"no ANALYZE profile for table '$table'"))
    val df = graft.Tables.load(spark, sfDir, table)
    val legs = (numCols.map(c => Analyze.numLeg(df, c, col(c))) ++
      strCols.map(c => Analyze.strLeg(df, c))).reduce(_ unionByName _)
    val rows = legs.collect()
    val nTotal = rows.head.getAs[Long]("n_rows")
    // Heavy-hitter share, two-pass exact-on-candidates (x10's shape):
    // MG candidates from one bounded-state pass, exact recount of the
    // <= k survivors only. At 100 TB: k-sized shuffle rows, never a
    // full-key groupBy of an unskewed column.
    graft.functions.HeavyHittersAgg.register(spark)
    val shares: Map[String, Double] = hhCols.map { c =>
      val cand = df.select(graft.functions.HeavyHittersAgg
          .heavyHitters(col(c).cast("string"), HhK).as("cand"))
        .collect().head.getSeq[String](0)
      val share =
        if (cand.isEmpty || nTotal == 0L) 0.0
        else {
          val m = df.filter(col(c).cast("string").isin(cand: _*))
            .groupBy(col(c).cast("string")).agg(count(lit(1)).as("n"))
            .agg(max(col("n")).as("m")).collect().head
          if (m.isNullAt(0)) 0.0 else m.getLong(0).toDouble / nTotal
        }
      c -> share
    }.toMap
    // committed catalog table: the legs' schema + top1_share
    val statsDf = legs.withColumn("top1_share",
      coalesce(hhCols.map(c =>
        when(col("col_name") === c, lit(shares(c)))) :+ lit(null).cast("double"): _*))
    val tableDir = s"${dirFor(sfDir)}/$table"
    graft.sources.Snapshots.commit(statsDf, tableDir)
    // summary (planner read path, zero jobs) from the SAME rows
    def jd(o: Option[Double]) = o.map(_.toString).getOrElse("null")
    val colsJson = rows.map { r =>
      val c = r.getString(r.fieldIndex("col_name"))
      def d(f: String) =
        if (r.isNullAt(r.fieldIndex(f))) None else Some(r.getDouble(r.fieldIndex(f)))
      graft.util.Jsons.quote(c) + ":" +
        s"""{"n_rows":${r.getAs[Long]("n_rows")},"n_nulls":${r.getAs[Long]("n_nulls")},""" +
        s""""n_distinct":${r.getAs[Long]("n_distinct")},"min_num":${jd(d("min_num"))},""" +
        s""""max_num":${jd(d("max_num"))},"avg_len":${jd(d("avg_len"))},""" +
        s""""top1_share":${jd(shares.get(c))}}"""
    }.mkString(",")
    val json = s"""{"fmt":$Fmt,"table":${graft.util.Jsons.quote(table)},""" +
      s""""fingerprint":${graft.util.Jsons.quote(fingerprint(sfDir, table))},""" +
      s""""cols":{$colsJson}}"""
    val path = summaryPath(sfDir, table)
    java.nio.file.Files.createDirectories(path.getParent)
    java.nio.file.Files.writeString(path, json)
    rows.map { r =>
      val c = r.getString(r.fieldIndex("col_name"))
      def d(f: String) =
        if (r.isNullAt(r.fieldIndex(f))) None else Some(r.getDouble(r.fieldIndex(f)))
      c -> ColStats(r.getAs[Long]("n_rows"), r.getAs[Long]("n_nulls"),
        r.getAs[Long]("n_distinct"), d("min_num"), d("max_num"), d("avg_len"),
        shares.get(c))
    }.toMap
  }
}
