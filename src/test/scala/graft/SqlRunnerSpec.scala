package graft

import graft.util.SqlRunner

class SqlRunnerSpec extends SparkSpec {

  test("splits on semicolons, strips comment lines and blanks") {
    val script =
      """-- header comment
        |SELECT 1 AS a;
        |
        |SELECT 2 AS b;
        |""".stripMargin
    val stmts = SqlRunner.splitStatements(script)
    assert(stmts == Seq("SELECT 1 AS a", "SELECT 2 AS b"))
  }

  test("runs statements sequentially against the session") {
    Tables.registerAll(spark, Sf0001)
    val out = SqlRunner.runScript(spark,
      "SELECT count(*) AS n FROM region; SELECT count(DISTINCT r_name) AS m FROM region")
    assert(out.map(_.head.getLong(0)).toSeq == Seq(5L, 5L))
  }

  test("snapshot_at binds pinned versions into pure SQL text") {
    import spark.implicits._
    import graft.sources.Snapshots
    val dir = java.nio.file.Files.createTempDirectory("sqlsnap").toString + "/t"
    Snapshots.commit(Seq((1L, 10L), (2L, 20L)).toDF("id", "n"), dir)
    Snapshots.commit(Seq((1L, 11L), (2L, 20L), (3L, 30L)).toDF("id", "n"), dir)
    val out = SqlRunner.runScriptWithSnapshots(spark,
      s"""-- two versions of ONE table, side by side, from SQL text
         |SELECT b.id, a.n AS n_v1, b.n AS n_v2
         |FROM snapshot_at('$dir', 2) b
         |LEFT JOIN snapshot_at('$dir', 1) a USING (id)
         |ORDER BY b.id""".stripMargin).last
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2))).toSeq
    assert(out == Seq((1L, Some(10L), 11L), (2L, Some(20L), 20L), (3L, None, 30L)))
  }

  test("repeated snapshot_at references collapse to one deterministic view") {
    import spark.implicits._
    import graft.sources.Snapshots
    val dir = java.nio.file.Files.createTempDirectory("sqlsnap").toString + "/t"
    Snapshots.commit(Seq((1L, 5L)).toDF("id", "n"), dir)
    val out = SqlRunner.runScriptWithSnapshots(spark,
      s"""SELECT a.n + b.n AS s
         |FROM snapshot_at('$dir', 1) a CROSS JOIN snapshot_at('$dir', 1) b""".stripMargin)
      .last.head.getLong(0)
    assert(out == 10L)
  }

  test("table_changes binds the per-version feed into pure SQL text") {
    import spark.implicits._
    import graft.sources.Snapshots
    val dir = java.nio.file.Files.createTempDirectory("sqlsnap").toString + "/t"
    Snapshots.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    Snapshots.commitDeletes(Seq(2L).toDF("id"), dir, base = 1)
    val out = SqlRunner.runScriptWithSnapshots(spark,
      s"""SELECT op, id FROM table_changes('$dir', 1, 'id')
         |UNION ALL SELECT op, id FROM table_changes('$dir', 2, 'id')
         |ORDER BY id, op""".stripMargin).last
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("I", 1L), ("D", 2L), ("I", 2L)))
  }

  test("snapshot_at_time binds the instant's resolved version; guards fire at bind time") {
    import spark.implicits._
    import graft.sources.Snapshots
    val dir = java.nio.file.Files.createTempDirectory("sqlsnap").toString + "/t"
    Snapshots.commitAt(Seq((1L, "v1")).toDF("id", "v"), dir, 1000L)
    Snapshots.commitAt(Seq((1L, "v2")).toDF("id", "v"), dir, 2000L)
    val out = SqlRunner.runScriptWithSnapshots(spark,
      s"""SELECT a.v, b.v FROM snapshot_at_time('$dir', 1500) a
         |CROSS JOIN snapshot_at_time('$dir', 2500) b""".stripMargin)
      .last.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(out == Seq(("v1", "v2")))
    // an instant before the first commit fails at BIND time
    intercept[IllegalArgumentException] {
      SqlRunner.runScriptWithSnapshots(spark,
        s"SELECT * FROM snapshot_at_time('$dir', 500)")
    }
  }

  test("hidden_table binds the layout-hiding view; raw-column WHERE prunes") {
    import spark.implicits._
    import graft.plans.{HiddenPartitioning => HP}
    val dir = java.nio.file.Files.createTempDirectory("sqlhp").toString + "/t"
    val rows = (0 until 120).map(i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"1996-${1 + i % 12}%02d-10 00:00:00")))
    HP.write(spark, rows.toDF("id", "ts"), dir, Seq(HP.Month("ts")))
    HP.remove(dir) // the script must recover the spec from the sidecar
    val q = SqlRunner.runScriptWithSnapshots(spark,
      s"""SELECT id FROM hidden_table('$dir')
         |WHERE ts = TIMESTAMP '1996-04-10 00:00:00' ORDER BY id""".stripMargin).last
    assert(HP.partitionsScanned(q) <= 1, "month equality must prune to one dir")
    assert(q.as[Long].collect().toSeq == (0 until 120).filter(_ % 12 == 3).map(_.toLong))
    HP.remove(dir)
  }

  test("an unknown version fails at bind time, before any SQL runs") {
    import spark.implicits._
    import graft.sources.Snapshots
    val dir = java.nio.file.Files.createTempDirectory("sqlsnap").toString + "/t"
    Snapshots.commit(Seq((1L, 5L)).toDF("id", "n"), dir)
    intercept[IllegalArgumentException] {
      SqlRunner.runScriptWithSnapshots(spark,
        s"SELECT * FROM snapshot_at('$dir', 9)")
    }
  }

  test("x81: RESTORE/VACUUM statements — rollback is metadata-only, retention honors the chain") {
    import spark.implicits._
    import graft.sources.Snapshots
    val dir = java.nio.file.Files.createTempDirectory("sqlmx").toString + "/t"
    Snapshots.commit(Seq((1L, "a")).toDF("k", "v"), dir)
    Snapshots.commit(Seq((2L, "b")).toDF("k", "v"), dir)
    val restored = SqlRunner.runScriptWithSnapshots(spark,
      s"RESTORE TABLE '$dir' TO VERSION 1").last.collect().head.getInt(0)
    assert(restored == 3)
    assert(Snapshots.fileSignature(spark, dir, 3).isEmpty,
      "a restore lands zero data files")
    val n = SqlRunner.runScriptWithSnapshots(spark,
      s"VACUUM '$dir' KEEP 1").last.collect().head.getInt(0)
    assert(n == 1, "v2 is outside the restored head's chain — dropped")
    assert(Snapshots.read(spark, dir).collect().map(_.getLong(0)).toSeq == Seq(1L),
      "latest must still serve v1's content through the restore chain")
  }

  test("x80: auto_stats binds the hook's summary; staleness rides the view") {
    import spark.implicits._
    import graft.sources.Snapshots
    import graft.ops.AutoAnalyze
    val dir = java.nio.file.Files.createTempDirectory("sqlas").toString + "/t"
    // unprofiled dir: the binding fails loudly at bind time
    intercept[IllegalArgumentException] {
      SqlRunner.runScriptWithSnapshots(spark,
        s"SELECT * FROM auto_stats('$dir')")
    }
    AutoAnalyze.enable(dir)
    Snapshots.commit(Seq((1L, 2.0), (2L, 4.0)).toDF("k", "v"), dir)
    val rows = SqlRunner.runScriptWithSnapshots(spark,
      s"""SELECT col_name, n_rows, min_num, max_num, fresh
         |FROM auto_stats('$dir') ORDER BY col_name""".stripMargin)
      .last.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("k", "v"))
    assert(rows.forall(r => r.getLong(1) == 2L && r.getBoolean(4)))
    assert(rows.find(_.getString(0) == "v").get.getDouble(3) == 4.0)
    // an unfoldable delete flips the served verdict
    Snapshots.commitDeletes(Seq(Tuple1(1L)).toDF("k"), dir, base = 1)
    val stale = SqlRunner.runScriptWithSnapshots(spark,
      s"SELECT fresh FROM auto_stats('$dir') LIMIT 1").last.collect()
    assert(!stale.head.getBoolean(0), "the view must serve the stale verdict")
    AutoAnalyze.dropState(spark, dir)
  }
}
