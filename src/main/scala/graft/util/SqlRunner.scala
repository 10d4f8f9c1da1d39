package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S8 — SQL script runner (reference scripts/run_sql_file.py:19-54):
  * split a script on `;`, execute statements sequentially, return the
  * last result per statement. Comment lines (`--`) are stripped the
  * same way the reference strips them.
  */
object SqlRunner {

  def splitStatements(script: String): Seq[String] =
    script.linesIterator
      .map(l => if (l.trim.startsWith("--")) "" else l)
      .mkString("\n")
      .split(";")
      .map(_.trim)
      .filter(_.nonEmpty)
      .toSeq

  def runScript(spark: SparkSession, script: String): Seq[DataFrame] =
    splitStatements(script).map(spark.sql)
}
