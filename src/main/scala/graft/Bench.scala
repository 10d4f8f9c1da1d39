package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: times full materialization of every declared query.
  *
  * Output contract (driver-parsed):
  *  - stdout gets ONE SHORT headline line `{"metric":"total","value":N,
  *    "unit":"sec","sf":…}` — short so tail-capture can never truncate it
  *    mid-line (the per-query map for 70 queries is ~2 KB and was cut twice).
  *  - The full per-query detail (times, errors, re-timed outliers) goes to
  *    the SPARK_GRAFT_BENCH_OUT file (default bench_out.json), one line,
  *    same headline fields plus "queries" and "errors".
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Materialize EVERY column, not just a count: under count() Catalyst
    // prunes projections (e.g. k1's array_join text assembly) and the
    // timing understates real cost. The `noop` datasource fully
    // evaluates each row and discards it — the write-shaped measurement
    // without disk noise.
    def materialize(fn: (SparkSession, String) => DataFrame): Unit =
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    // A failing query must not bench as ~0s (a regression would read as a
    // speedup): record the error and exclude it from the total.
    def timeOne(name: String, fn: (SparkSession, String) => DataFrame): (Double, Option[String]) = {
      val t0 = System.nanoTime()
      try { materialize(fn); ((System.nanoTime() - t0) / 1e9, None) }
      catch { case e: Throwable => ((System.nanoTime() - t0) / 1e9, Some(e.toString.take(200))) }
    }
    // Untimed warmup: absorb scheduler/codegen/JIT startup so the
    // first timed query isn't charged for session bring-up.
    SparkEntry.queries.get("q1_pricing_summary")
      .foreach(fn => try materialize(fn) catch { case _: Throwable => })
    spark.catalog.clearCache()
    // Contention calibration probe: a fixed CPU-bound job (no IO, no
    // shuffle skew, constant work) timed before and after the sweep.
    // Its cost can only drift if the HOST drifted — so a >2× spread
    // marks the whole run `contended` and the JSON carries its own
    // credibility signal (r4's driver run was a flat ~+2 s/query vs
    // the same-code clean run; this field makes that detectable
    // without a second run to compare against).
    def probe(): Double = {
      import org.apache.spark.sql.functions.{sum => fsum, col => fcol}
      val t0 = System.nanoTime()
      spark.range(20L * 1000 * 1000).select(fsum(fcol("id")))
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    probe() // untimed: absorb the probe plan's own codegen
    val probeBefore = math.min(probe(), probe())
    // Mid-sweep probe log: the endpoint-only probe missed r5's
    // mid-run host drift (k14 read 27.7 s driver vs 7.4 s clean while
    // both endpoints were quiet). Probing every ProbeEvery queries
    // makes per-SEGMENT drift visible, and `contended` now marks a
    // run where ANY segment drifted >2× from the best probe — the
    // JSON carries which segment, so an inflated query can be matched
    // to the contention window that inflated it.
    val ProbeEvery = 20
    val probeLog = scala.collection.mutable.ArrayBuffer[Double](probeBefore)
    // Debug/repro knob: SPARK_GRAFT_ONLY=q3_...,q6_... times just that
    // subset (fresh-JVM single-query repro of bench anomalies).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val firstPass = selected.zipWithIndex.map { case ((name, fn), i) =>
      // min-of-two per checkpoint (the endpoints' rule): a single
      // probe inherits the GC debt of whatever heavy query just
      // finished and reads as fake host drift; the min of two
      // back-to-back probes is the steady-state cost
      if (i > 0 && i % ProbeEvery == 0) probeLog += math.min(probe(), probe())
      val (sec, err) = timeOne(name, fn)
      (name, sec, err)
      // Shared derived tables (queries.Derived) stay cached across
      // queries — the production shape: the KG/dedup derivations are
      // materialized once and every query reads them, exactly like
      // the reference's ingested warehouse tables.
    }
    // This VM's single-run timings are heavy-tailed (same binary measured
    // 95s and 484s): re-time the slowest queries once more in the same
    // JVM and report the min, so one host-level stall can't masquerade
    // as a query regression.
    // Retime set = the slowest N (their absolute seconds dominate the
    // total) UNION every query whose first-pass time exceeds
    // RETIME_FACTOR × the per-query median (heavy-tailed stalls hit
    // cheap queries too — r3 measured q6 at 7× its steady-state time
    // and the top-8 cut missed it; a median-relative cut is
    // self-calibrating, no history file needed).
    val retimeN = sys.env.getOrElse("SPARK_GRAFT_RETIME_N", "8").toInt
    val retimeFactor = sys.env.getOrElse("SPARK_GRAFT_RETIME_FACTOR", "4").toDouble
    val ok = firstPass.filter(_._3.isEmpty)
    val median = if (ok.isEmpty) 0.0
      else ok.map(_._2).sorted.apply(ok.size / 2)
    val slowest = (ok.sortBy(-_._2).take(retimeN).map(_._1) ++
      ok.filter(_._2 > retimeFactor * median).map(_._1)).toSet
    // Drop every shared derived table before re-timing: otherwise the
    // retime runs fully warm, min() replaces the one timing that
    // charged the derivation, and a derivation-cost regression would
    // vanish from the reported total. After the reset the retime pass
    // rebuilds (and re-shares) the derivations exactly like the first
    // pass did.
    graft.queries.Derived.invalidate(spark)
    spark.catalog.clearCache()
    val results = firstPass.map {
      case (name, sec, None) if slowest(name) =>
        val (sec2, err2) = timeOne(name, SparkEntry.queries(name))
        if (err2.isEmpty) (name, math.min(sec, sec2), None) else (name, sec, None)
      case r => r
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) =>
      s"\"" + k + "\":" + graft.util.Jsons.quote(e)
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    val nErr = results.count(_._3.isDefined)
    // v6's declared query carries its agrees-exact envelope (the
    // decimal-exact twin runs INSIDE it), so its sweep time measures
    // the twin, not the showcased single-pass-centroid fast path.
    // Time the fast path alone as a supplemental field so the bench
    // narrative is a measurement, not prose. Full-sweep runs only —
    // a SPARK_GRAFT_ONLY debug subset skips it.
    val v6FastOnly = if (only.isEmpty)
      Some(timeOne("v6_fast_only", (s, d) => graft.queries.ExtQ.v6FastPath(s, d))._1)
    else None
    val probeAfter = math.min(probe(), probe())
    probeLog += probeAfter
    // Two comparisons, never mixed: endpoints against each other, and
    // each mid-sweep probe against the mid-sweep MEDIAN. Mid-sweep
    // probes run inside a JVM carrying cached derived tables + GC
    // pressure, so they sit at a uniformly higher baseline than the
    // clean-heap endpoints (measured ~3×) — comparing them to the
    // endpoint min would flag every healthy run. Host drift shows as
    // a SEGMENT jumping away from its peers (r5's k14 window), which
    // the median test catches; a whole-run slowdown shows in the
    // endpoint spread.
    // Asymmetric on purpose: the probe is CPU-bound, so 158 queries of
    // JIT tier-up can only make the after-probe FASTER than the cold
    // before-probe (r7 measured 0.154 -> 0.076 s on an idle host, and
    // the old symmetric [0.5, 2.0] band read that healthy warm-up as
    // `contended` — the exact driver/builder disagreement the rule
    // exists to prevent). Host contention can only SLOW the probe, so
    // only the >2x direction is evidence of drift.
    val endSpread = probeAfter / math.max(probeBefore, 1e-9)
    // the median test needs a population: with < 3 mid probes the
    // median IS one of the two samples and any jitter reads as a 2×
    // spread (the r6 driver/builder disagreement) — below that the
    // mid test abstains and only the endpoint spread decides
    val mids = probeLog.slice(1, probeLog.length - 1)
    val midSpread = if (mids.size < 3) 1.0 else {
      val med = mids.sorted.apply(mids.size / 2)
      mids.max / math.max(med, 1e-9)
    }
    val contended = endSpread > 2.0 || midSpread > 2.0
    val probeSegs = probeLog.map(p => f"$p%.3f").mkString("[", ",", "]")
    // the decision rule rides IN the JSON so a driver run and a
    // builder run can never disagree about what `contended` means on
    // identical probe data
    val contendedRule = "endpoints are min-of-2 cold probes, mids are " +
      "min-of-2 mid-sweep probes; contended iff after/before > 2.0 " +
      "(slowdown only: the probe is CPU-bound, so JIT warm-up makes the " +
      "after probe faster on a healthy host and only a slowdown is " +
      "drift) OR (>=3 mids AND max(mid)/median(mid) > 2.0); mids sit " +
      "~3x above endpoints by design (warm JVM) and are never compared " +
      "against them"
    val v6Json = v6FastOnly.map(t => f""","v6_fast_only_sec":$t%.3f""").getOrElse("")
    val probeJson =
      f""""probe_before_sec":$probeBefore%.3f,"probe_after_sec":$probeAfter%.3f,"probe_segments_sec":$probeSegs,"contended":$contended,"contended_rule":${graft.util.Jsons.quote(contendedRule)}$v6Json"""
    val headline =
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","n_queries":${results.size},"n_err":$nErr,$probeJson}"""
    val detail =
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","n_queries":${results.size},"n_err":$nErr,$probeJson,"queries":$qs,"errors":$errs}"""
    // Clean line on the REAL stdout (build.sbt: run/outputStrategy =
    // StdoutOutput, so no sbt "[info] " prefix) + a file copy so the
    // driver can recover the metrics even if its stdout parse fails.
    println(headline)
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), detail + "\n")
    catch { case _: Throwable => }
    // Durable copy for bench_history. latest.json is git-ignored
    // scratch (round evidence gets COPIED to a named r{NN}_final.json
    // at round end — r5's committed latest.json was a 1-query debug
    // run that misrepresented the sweep); SPARK_GRAFT_ONLY subset
    // runs skip it entirely so a debug run can never clobber the
    // round's full-sweep record.
    if (only.isEmpty) try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("bench_history"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("bench_history/latest.json"), detail + "\n")
    } catch { case _: Throwable => }
    spark.stop()
  }
}
