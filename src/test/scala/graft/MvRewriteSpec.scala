package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import graft.plans.{MatView, MvCatalog, MvRewrite}
import graft.sources.Snapshots

/** The MV rewrite's contract: serve only when containment AND
  * freshness hold, refuse otherwise, and never change a result
  * either way. */
class MvRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
        case _ => Nil
      }
    }.flatten

  private def fixture(tag: String): (String, String, DataFrame) = {
    val root = java.nio.file.Files.createTempDirectory(s"mv$tag").toString
    val factDir = s"$root/fact"
    val mvDir = s"$root/mv"
    Snapshots.commit(
      Seq(("a", "x", 10L, 1.5), ("a", "y", 20L, 2.5), ("b", "x", 30L, 3.5),
        ("b", "x", 40L, 4.5), ("b", "y", 50L, 5.5))
        .toDF("g1", "g2", "qty", "price"),
      factDir)
    val fact = Snapshots.read(spark, factDir)
    val v0 = Snapshots.versions(spark, factDir)
    MatView.create(spark, s"spec_$tag", fact, mvDir,
      groupCols = Seq("g1", "g2"),
      sumCols = Seq("qty" -> col("qty")),
      countCols = Seq("price" -> col("price")),
      minMaxCols = Seq("price" -> col("price")),
      isFresh = () => Snapshots.versions(spark, factDir) == v0)
    (factDir, mvDir, fact)
  }

  test("exact-group aggregate rewrites onto the MV, values unchanged") {
    val (factDir, mvDir, fact) = fixture("a")
    val q = fact.groupBy($"g1", $"g2").agg(
      sum($"qty").as("s"), count(lit(1)).as("n"),
      min($"price").as("lo"), max($"price").as("hi"))
    val paths = scanPaths(q)
    assert(paths.exists(_.contains(mvDir)), "rewritten plan must scan the MV")
    assert(!paths.exists(_.contains(factDir)), "rewritten plan must not scan the fact")
    val got = q.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSet
    MvCatalog.remove("spec_a")
    val want = q.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSet
    assert(got == want, "rewrite must not change the result")
  }

  test("coarser grouping rolls up the MV; COUNT(col) uses the stored cnt") {
    val (factDir, mvDir, fact) = fixture("b")
    val q = fact.groupBy($"g1").agg(
      sum($"qty").as("s"), count($"price").as("n"), min($"price").as("lo"))
    val paths = scanPaths(q)
    assert(paths.exists(_.contains(mvDir)) && !paths.exists(_.contains(factDir)))
    assert(q.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))).toSet ==
      Set(("a", 30L, 2L, 1.5), ("b", 120L, 3L, 3.5)))
    MvCatalog.remove("spec_b")
  }

  test("a fact commit after the MV build makes the rewrite refuse (stale gate)") {
    val (factDir, mvDir, _) = fixture("c")
    Snapshots.commit(Seq(("c", "z", 100L, 9.0)).toDF("g1", "g2", "qty", "price"),
      factDir)
    val fact2 = Snapshots.read(spark, factDir)
    val q = fact2.groupBy($"g1", $"g2").agg(sum($"qty").as("s"))
    val paths = scanPaths(q)
    assert(!paths.exists(_.contains(mvDir)), "a stale MV must never serve")
    assert(paths.exists(_.contains(factDir)))
    assert(q.collect().map(r => (r.getString(0), r.getLong(2))).toSet
      .contains(("c", 100L)), "the live scan must see v2's rows")
    MvCatalog.remove("spec_c")
  }

  test("containment violations refuse: unregistered agg, filter, non-key group, distinct") {
    val (factDir, mvDir, fact) = fixture("d")
    def refused(df: DataFrame): Boolean = {
      val p = scanPaths(df)
      p.exists(_.contains(factDir)) && !p.exists(_.contains(mvDir))
    }
    assert(refused(fact.groupBy($"g1").agg(sum($"price").as("s"))),
      "sum over an unregistered column must scan the fact")
    assert(refused(fact.filter($"qty" > 15).groupBy($"g1").agg(sum($"qty").as("s"))),
      "a filter between aggregate and scan changes the input — refuse")
    assert(refused(fact.groupBy($"qty").agg(count(lit(1)).as("n"))),
      "grouping outside the MV key set must scan the fact")
    assert(refused(fact.groupBy($"g1").agg(countDistinct($"qty").as("n"))),
      "DISTINCT is not derivable from the stored partials — refuse")
    MvCatalog.remove("spec_d")
  }

  test("aggregates inside expression trees map independently (SUM/COUNT divide)") {
    val (factDir, mvDir, fact) = fixture("e")
    fact.createOrReplaceTempView("mv_spec_fact_e")
    val q = spark.sql(
      """SELECT g1, CAST(SUM(qty) AS DOUBLE) / COUNT(*) AS avg_qty
        |FROM mv_spec_fact_e GROUP BY g1""".stripMargin)
    val paths = scanPaths(q)
    assert(paths.exists(_.contains(mvDir)) && !paths.exists(_.contains(factDir)))
    assert(q.collect().map(r => (r.getString(0), r.getDouble(1))).toSet ==
      Set(("a", 15.0), ("b", 40.0)))
    MvCatalog.remove("spec_e")
  }

  test("refresh folds the delta in; union read serves, partial read refuses") {
    val (factDir, mvDir, _) = fixture("g")
    val delta = Seq(("b", "y", 7L, 0.5), ("c", "z", 100L, 9.0))
      .toDF("g1", "g2", "qty", "price")
    Snapshots.commitAppend(delta, factDir, base = 1)
    MatView.refresh(spark, "spec_g",
      Snapshots.read(spark, factDir, Some(2)), isFresh = () => true)
    // the resolved read (base ∪ delta) is exactly what the view covers
    val full = Snapshots.readResolved(spark, factDir)
      .groupBy($"g1").agg(sum($"qty").as("s"), count(lit(1)).as("n"))
    val paths = scanPaths(full)
    assert(paths.exists(_.contains(mvDir)) && !paths.exists(_.contains(factDir)),
      "the refreshed view must serve the resolved read")
    assert(full.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet ==
      Set(("a", 30L, 2L), ("b", 127L, 4L), ("c", 100L, 1L)),
      "merge(MV(v1), partials(delta)) must equal MV(v1 union delta)")
    // a v1-only read no longer matches the coverage — serving it the
    // refreshed view would fold delta rows into a v1 answer
    val v1only = Snapshots.read(spark, factDir, Some(1))
      .groupBy($"g1").agg(sum($"qty").as("s"))
    assert(!scanPaths(v1only).exists(_.contains(mvDir)),
      "a partial (v1-only) read must not be served the refreshed view")
    MvCatalog.remove("spec_g")
  }

  test("a self-union of the fact fails the coverage bijection (would double-count)") {
    val (factDir, mvDir, fact) = fixture("h")
    val doubled = fact.unionAll(Snapshots.read(spark, factDir))
      .groupBy($"g1").agg(sum($"qty").as("s"))
    assert(!scanPaths(doubled).exists(_.contains(mvDir)),
      "two reads of the same files are not the view's aggregate")
    assert(doubled.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("a", 60L), ("b", 240L)))
    MvCatalog.remove("spec_h")
  }

  test("a filtered view serves exactly its defining filter — wider, narrower, none refuse") {
    val root = java.nio.file.Files.createTempDirectory("mvfilt").toString
    val factDir = s"$root/fact"
    val mvDir = s"$root/mv"
    Snapshots.commit(
      (1 to 40).map(i => (i.toLong, if (i % 2 == 0) "e" else "o", i.toLong))
        .toDF("id", "par", "qty"),
      factDir)
    val fact = Snapshots.read(spark, factDir)
    MatView.create(spark, "spec_filt", fact.filter($"id" <= 20), mvDir,
      groupCols = Seq("par"), sumCols = Seq("qty" -> col("qty")))
    def q(df: DataFrame) = df.groupBy($"par").agg(sum($"qty").as("s"))
    val hit = q(Snapshots.read(spark, factDir).filter($"id" <= 20))
    assert(scanPaths(hit).exists(_.contains(mvDir)),
      "the defining filter must rewrite")
    assert(hit.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("e", 110L), ("o", 100L)))
    for ((label, miss) <- Seq(
      "wider" -> q(Snapshots.read(spark, factDir).filter($"id" <= 30)),
      "none" -> q(Snapshots.read(spark, factDir)),
      "extra" -> q(Snapshots.read(spark, factDir)
        .filter($"id" <= 20 && $"qty" > 5)))) {
      assert(!scanPaths(miss).exists(_.contains(mvDir)),
        s"the $label filter must refuse — it is not the defining filter")
    }
    MvCatalog.remove("spec_filt")
  }

  test("multi-candidate choice is cost-ordered; a lying size hint flips it") {
    val root = java.nio.file.Files.createTempDirectory("mvchoice").toString
    val factDir = s"$root/fact"
    Snapshots.commit(
      Seq(("a", "x", 10L), ("a", "y", 20L), ("b", "x", 30L), ("b", "y", 40L))
        .toDF("g1", "g2", "qty"),
      factDir)
    val fact = Snapshots.read(spark, factDir)
    MatView.create(spark, "spec_ch_wide", fact, s"$root/wide",
      groupCols = Seq("g1", "g2"), sumCols = Seq("qty" -> col("qty")))
    MatView.create(spark, "spec_ch_narrow", fact, s"$root/narrow",
      groupCols = Seq("g1"), sumCols = Seq("qty" -> col("qty")))
    def served(): String = {
      val p = scanPaths(Snapshots.read(spark, factDir)
        .groupBy($"g1").agg(sum($"qty").as("s")))
      if (p.exists(_.contains(s"$root/narrow"))) "narrow"
      else if (p.exists(_.contains(s"$root/wide"))) "wide" else "fact"
    }
    assert(served() == "narrow", "the smaller sufficient view must serve")
    // the decision follows the COST SIGNAL, not registration order:
    // lie about the narrow view's size and the wide one takes over
    MvCatalog.register(
      MvCatalog.get("spec_ch_narrow").get.copy(sizeHint = () => Long.MaxValue))
    assert(served() == "wide", "the choice must follow the size hint")
    MvCatalog.remove("spec_ch_wide"); MvCatalog.remove("spec_ch_narrow")
  }

  test("the rewrite decision is driver-only: optimizing a matching query runs zero jobs") {
    val (factDir, mvDir, _) = fixture("z") // build jobs land here, before the window
    // jobs are attributed by JOB GROUP (AQE submits stages from a
    // pool, erasing call sites, but local properties ride along) so
    // parallel suites' jobs can't pollute the count
    val planJobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val sawCanary = new java.util.concurrent.atomic.AtomicBoolean(false)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val g = Option(j.properties)
          .map(_.getProperty("spark.jobGroup.id", "")).getOrElse("")
        if (g == "mv_zero_plan") { planJobs.incrementAndGet(); () }
        else if (g == "mv_zero_canary") sawCanary.set(true)
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      spark.sparkContext.setJobGroup("mv_zero_plan", "rewrite decision", false)
      val q = Snapshots.read(spark, factDir)
        .groupBy($"g1").agg(sum($"qty").as("s"))
      // force the full optimization: coverage match, freshness log
      // read, mvRead — all must stay driver-side metadata
      assert(scanPaths(q).exists(_.contains(mvDir)))
      spark.sparkContext.setJobGroup("mv_zero_canary", "canary", false)
      spark.range(1).count() // canary: FIFO listener delivery
      val deadline = System.currentTimeMillis + 30000
      while (!sawCanary.get() && System.currentTimeMillis < deadline)
        Thread.sleep(50)
      assert(sawCanary.get(), "canary job never arrived")
      assert(planJobs.get() == 0,
        s"the rewrite decision must launch no Spark jobs, saw ${planJobs.get()}")
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(l)
    }
    MvCatalog.remove("spec_z")
  }

  test("x77: an extra grouping-key conjunct serves with a residual; a value-column one refuses") {
    val (factDir, mvDir, fact) = fixture("ct") // view groups (g1,g2), unfiltered
    // the extra conjunct is on g2 — a grouping key the query does not
    // even group by; the residual must still apply on the MV scan
    val hit = fact.filter($"g2" === "x").groupBy($"g1").agg(sum($"qty").as("s"))
    val p = scanPaths(hit)
    assert(p.exists(_.contains(mvDir)) && !p.exists(_.contains(factDir)),
      "a group-key-only extra conjunct must serve from the MV")
    assert(hit.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("a", 10L), ("b", 70L)),
      "the residual must filter the MV's groups exactly like the fact rows")
    // the same shape over a VALUE column refuses — those rows are
    // already aggregated into the partials, no residual can unmix them
    val miss = fact.filter($"price" > 3.0).groupBy($"g1").agg(sum($"qty").as("s"))
    val p2 = scanPaths(miss)
    assert(!p2.exists(_.contains(mvDir)) && p2.exists(_.contains(factDir)),
      "a value-column extra conjunct must refuse")
    assert(miss.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("b", 120L)))
    MvCatalog.remove("spec_ct")
  }

  test("an MV created with NO explicit gate declines after a fact commit (default gate)") {
    val root = java.nio.file.Files.createTempDirectory("mvdef").toString
    val factDir = s"$root/fact"
    val mvDir = s"$root/mv"
    Snapshots.commit(Seq(("a", 10L), ("b", 20L)).toDF("g1", "qty"), factDir)
    val fact = Snapshots.read(spark, factDir)
    // no isFresh argument — the default must be a version-pinned
    // gate, not serve-forever
    MatView.create(spark, "spec_defgate", fact, mvDir,
      groupCols = Seq("g1"), sumCols = Seq("qty" -> col("qty")))
    def q() = Snapshots.read(spark, factDir).groupBy($"g1").agg(sum($"qty").as("s"))
    assert(scanPaths(q()).exists(_.contains(mvDir)),
      "fresh by default: the rewrite must serve before any commit")
    Snapshots.commit(Seq(("c", 99L)).toDF("g1", "qty"), factDir)
    val after = q()
    assert(!scanPaths(after).exists(_.contains(mvDir)),
      "a fact commit must flip the DEFAULT gate stale — never serve-forever")
    assert(after.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      .contains(("c", 99L)))
    MvCatalog.remove("spec_defgate")
  }

  test("COUNT(NULL) is not served as the row count (always 0, not n_rows)") {
    // NullPropagation normally folds COUNT(NULL) to 0 before the MV
    // rule ever sees it (and a no-aggregate rollup IS servable);
    // exclude it in a cloned session so the unfolded Count(null)
    // reaches mapFn — the guard must refuse, never map it to n_rows
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.NullPropagation")
    val root = java.nio.file.Files.createTempDirectory("mvcn").toString
    val factDir = s"$root/fact"
    val mvDir = s"$root/mv"
    Snapshots.commit(
      s2.createDataFrame(Seq(("a", 10L), ("a", 20L), ("b", 30L)))
        .toDF("g1", "qty"),
      factDir)
    val fact = Snapshots.read(s2, factDir)
    MatView.create(s2, "spec_cn", fact, mvDir,
      groupCols = Seq("g1"), sumCols = Seq("qty" -> col("qty")))
    fact.createOrReplaceTempView("mv_spec_fact_cn")
    val q = s2.sql(
      "SELECT g1, COUNT(NULL) AS n FROM mv_spec_fact_cn GROUP BY g1")
    assert(!scanPaths(q).exists(_.contains(mvDir)),
      "COUNT(NULL) is not derivable from n_rows — refuse")
    assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("a", 0L), ("b", 0L)), "COUNT(NULL) is always 0")
    MvCatalog.remove("spec_cn")
  }

  test("IsNotNull next to <=> is semantic — not dropped, so the filters differ") {
    val root = java.nio.file.Files.createTempDirectory("mvens").toString
    val factDir = s"$root/fact"
    Snapshots.commit(
      Seq((Some("a"), 10L), (None, 20L), (None, 30L))
        .toDF("g1", "qty"),
      factDir)
    val fact = Snapshots.read(spark, factDir)
    // view defined over `g1 <=> NULL` — passes ONLY null rows
    MatView.create(spark, "spec_ens", fact.filter($"g1" <=> lit(null)),
      s"$root/mv", groupCols = Seq("g1"), sumCols = Seq("qty" -> col("qty")))
    // query adds IS NOT NULL, which <=> NULL does NOT imply — the
    // combined filter passes nothing. Pre-fix the IsNotNull was
    // DROPPED as optimizer-inferred, the filters compared equal, and
    // the view served the null group's 50. Now the IsNotNull is kept
    // as semantic: either the rewrite refuses, or (x77) it serves
    // WITH the IsNotNull applied as a group-key residual — both
    // produce the correct empty result, never the null group's rows
    val q = Snapshots.read(spark, factDir)
      .filter(($"g1" <=> lit(null)) && $"g1".isNotNull)
      .groupBy($"g1").agg(sum($"qty").as("s"))
    assert(q.collect().isEmpty,
      "the contradictory filter passes no rows — the null group's 50 " +
        "appearing means the semantic IsNotNull was dropped")
    MvCatalog.remove("spec_ens")
  }

  test("non-file relations have no coverage signature — never registered, never served") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("g1", StringType), StructField("qty", LongType)))
    def rel(rows: Seq[Row]) =
      spark.baseRelationToDataFrame(
        new org.apache.spark.sql.sources.BaseRelation
          with org.apache.spark.sql.sources.TableScan {
          override def sqlContext = spark.sqlContext
          override def schema: StructType =
            StructType(Seq(StructField("g1", StringType),
              StructField("qty", LongType)))
          override def buildScan() =
            spark.sparkContext.parallelize(rows)
        })
    val relA = rel(Seq(Row("a", 10L)))
    val relB = rel(Seq(Row("b", 999L)))
    val mvDir = java.nio.file.Files.createTempDirectory("mvnf").toString + "/mv"
    // registering over a signature-less relation must leave coverage
    // empty — two distinct non-file relations are indistinguishable,
    // so serving ANY of them would be a cross-serve
    MatView.create(spark, "spec_nf", relA, mvDir,
      groupCols = Seq("g1"), sumCols = Seq("qty" -> col("qty")))
    assert(MvCatalog.get("spec_nf").get.coverage.isEmpty,
      "an unrecognized relation kind must register with empty coverage")
    val got = relB.groupBy($"g1").agg(sum($"qty").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("b", 999L)),
      "relB's aggregate must come from relB, never relA's MV")
    MvCatalog.remove("spec_nf")
  }

  test("the rewritten plan preserves output names, types AND ExprIds") {
    val (factDir, mvDir, fact) = fixture("f")
    val q = fact.groupBy($"g1").agg(sum($"qty").as("s"), count(lit(1)).as("n"))
    val paths = scanPaths(q)
    assert(paths.exists(_.contains(mvDir)) && !paths.exists(_.contains(factDir)))
    // the invisibility contract that lets parent operators re-bind
    // with zero plan surgery: the optimized (rewritten) output is
    // attribute-for-attribute the analyzed one
    val orig = q.queryExecution.analyzed.output.map(a => (a.name, a.exprId, a.dataType))
    val opt = q.queryExecution.optimizedPlan.output.map(a => (a.name, a.exprId, a.dataType))
    assert(opt == orig, "rewrite must preserve the aggregate's output attributes")
    MvCatalog.remove("spec_f")
  }

  test("x78: SQL DDL lifecycle — createFromSql binds, refreshFromSql re-resolves " +
    "across a DIFFERENT snapshot view, drop de-registers") {
    // the qualifier round-trip that broke r11: CREATE's defining SQL
    // resolves against the snapshot_at(dir,1) temp view, REFRESH's
    // delta against the DIFFERENT snapshot_at(dir,2) view — the
    // stored spec columns must survive the view-name change
    val root = java.nio.file.Files.createTempDirectory("mvddl").toString
    val factDir = s"$root/fact"
    val mvDir = s"$root/mv"
    Snapshots.commit(
      Seq(("a", 10L, 1.5), ("b", 30L, 3.5)).toDF("g1", "qty", "price"), factDir)
    graft.util.SqlRunner.runScriptWithSnapshots(spark,
      s"""CREATE MATERIALIZED VIEW spec_ddl AT '$mvDir' AS
         |SELECT g1, SUM(qty) AS s, COUNT(price) AS c,
         |  MIN(price) AS lo, MAX(price) AS hi
         |FROM snapshot_at('$factDir', 1) GROUP BY g1""".stripMargin)
    assert(MvCatalog.get("spec_ddl").nonEmpty, "CREATE must register")
    Snapshots.commitAppend(
      Seq(("a", 5L, 0.5)).toDF("g1", "qty", "price"), factDir, base = 1)
    // the refresh delta binds to snapshot_…_v2 — with qualified spec
    // columns this raised UNRESOLVED_COLUMN on the _v1 name
    graft.util.SqlRunner.runScriptWithSnapshots(spark,
      s"""REFRESH MATERIALIZED VIEW spec_ddl AS
         |SELECT * FROM snapshot_at('$factDir', 2)""".stripMargin)
    def consumer() = graft.util.SqlRunner.runScriptWithSnapshots(spark,
      s"""SELECT g1, SUM(qty) AS s, COUNT(price) AS c,
         |  MIN(price) AS lo, MAX(price) AS hi
         |FROM (SELECT * FROM snapshot_at('$factDir', 1)
         |      UNION ALL SELECT * FROM snapshot_at('$factDir', 2)) u
         |GROUP BY g1""".stripMargin).last
    val served = consumer()
    assert(scanPaths(served).exists(_.contains(mvDir)),
      "post-refresh consumer must serve from the MV")
    assert(served.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toSet == Set(("a", 15L, 2L, 0.5, 1.5), ("b", 30L, 1L, 3.5, 3.5)),
      "refreshed partials must fold the delta exactly")
    val status = graft.util.SqlRunner.runScriptWithSnapshots(spark,
      "DROP MATERIALIZED VIEW spec_ddl").last
    assert(status.collect().head.getBoolean(0), "DROP must report the view existed")
    assert(MvCatalog.get("spec_ddl").isEmpty, "DROP must de-register")
    val after = consumer()
    assert(!scanPaths(after).exists(_.contains(mvDir)),
      "post-drop consumer must scan the fact again")
    assert(after.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toSet == Set(("a", 15L, 2L, 0.5, 1.5), ("b", 30L, 1L, 3.5, 3.5)),
      "values must be identical either way — refusal is slower, never wrong")
  }

  test("x78: createFromSql refuses underivable definitions loudly") {
    val root = java.nio.file.Files.createTempDirectory("mvddlr").toString
    val factDir = s"$root/fact"
    Snapshots.commit(Seq(("a", 10L)).toDF("g1", "qty"), factDir)
    def attempt(sql: String) = intercept[IllegalArgumentException] {
      MatView.createFromSql(spark, "spec_ddl_bad", s"$root/mv", sql)
    }
    Snapshots.read(spark, factDir).createOrReplaceTempView("spec_ddl_fact")
    attempt("SELECT g1, AVG(qty) AS a FROM spec_ddl_fact GROUP BY g1")
    attempt("SELECT g1, COUNT(DISTINCT qty) AS d FROM spec_ddl_fact GROUP BY g1")
    attempt("SELECT upper(g1) AS u, SUM(qty) AS s FROM spec_ddl_fact GROUP BY 1")
    attempt("SELECT g1, qty FROM spec_ddl_fact")
    assert(MvCatalog.get("spec_ddl_bad").isEmpty,
      "a refused definition must never register")
    spark.catalog.dropTempView("spec_ddl_fact")
  }

  test("x97: maintainFromLog folds appends +, deletes −, removes empty groups, skips layout") {
    val root = java.nio.file.Files.createTempDirectory("mvlog").toString
    val factDir = s"$root/fact"
    val mvDir = s"$root/mv"
    // v1: two groups
    Snapshots.commit(Seq(("a", 1L, 10L), ("a", 2L, 20L), ("b", 3L, 5L))
      .toDF("g1", "id", "qty"), factDir)
    MatView.create(spark, "spec_log", Snapshots.read(spark, factDir), mvDir,
      groupCols = Seq("g1"), sumCols = Seq("qty" -> col("qty")),
      isFresh = () => false)
    // v2: append a third group + more of 'a'
    Snapshots.commitAppend(Seq(("a", 4L, 30L), ("c", 5L, 7L))
      .toDF("g1", "id", "qty"), factDir, base = 1)
    // v3: a layout re-land (dataChange=false) must fold NOTHING
    Snapshots.commitAppend(spark.emptyDataset[(String, Long, Long)]
      .toDF("g1", "id", "qty"), factDir, base = 2, dataChange = false)
    // v4: delete ALL of group 'b' and one 'a' row
    Snapshots.commitDeletes(Seq(3L, 2L).toDF("id"), factDir, base = 3)
    val (mvv, synced) =
      MatView.maintainFromLog(spark, "spec_log", factDir, sinceVersion = 1,
        isFresh = () => true)
    assert(synced == 4 && mvv == 2)
    val rows = Snapshots.read(spark, mvDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set(("a", 40L, 2L), ("c", 7L, 1L)),
      "a: 10+20+30−20 over 2 rows; b retracted to empty must VANISH; c appended")
  }

  test("x97: a min/max view refuses delete retraction loudly") {
    val root = java.nio.file.Files.createTempDirectory("mvlogmm").toString
    val factDir = s"$root/fact"
    Snapshots.commit(Seq(("a", 1L, 10L)).toDF("g1", "id", "qty"), factDir)
    MatView.create(spark, "spec_log_mm", Snapshots.read(spark, factDir),
      s"$root/mv", groupCols = Seq("g1"),
      minMaxCols = Seq("qty" -> col("qty")), isFresh = () => false)
    Snapshots.commitDeletes(Seq(1L).toDF("id"), factDir, base = 1)
    intercept[IllegalArgumentException] {
      MatView.maintainFromLog(spark, "spec_log_mm", factDir,
        sinceVersion = 1, isFresh = () => true)
    }
  }

  test("x97: a non-foldable version kind refuses maintenance") {
    val root = java.nio.file.Files.createTempDirectory("mvlogrw").toString
    val factDir = s"$root/fact"
    Snapshots.commit(Seq(("a", 1L, 10L)).toDF("g1", "id", "qty"), factDir)
    MatView.create(spark, "spec_log_rw", Snapshots.read(spark, factDir),
      s"$root/mv", groupCols = Seq("g1"),
      sumCols = Seq("qty" -> col("qty")), isFresh = () => false)
    Snapshots.commit(Seq(("a", 9L, 99L)).toDF("g1", "id", "qty"), factDir)
    intercept[RuntimeException] {
      MatView.maintainFromLog(spark, "spec_log_rw", factDir,
        sinceVersion = 1, isFresh = () => true)
    }
  }
}
