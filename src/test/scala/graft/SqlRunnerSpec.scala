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
}
