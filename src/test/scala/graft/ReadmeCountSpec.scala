package graft

import org.scalatest.funsuite.AnyFunSuite

/** README's query counts are DERIVED claims: every "N queries" /
  * "N/N hash-match" in README.md must equal `SparkEntry.queries.size`
  * exactly. Three rounds running the count drifted silently because
  * README sat outside the gate path — this pins it inside. */
class ReadmeCountSpec extends AnyFunSuite {

  test("README query counts match SparkEntry.queries.size") {
    val n = SparkEntry.queries.size
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val counts = """\((\d+) queries\)""".r
      .findAllMatchIn(readme).map(_.group(1).toInt).toList
    assert(counts.nonEmpty, "README must state the query count")
    assert(counts.forall(_ == n),
      s"README says '(${counts.mkString(",")} queries)' but the suite declares $n")
    val ratios = """(\d+)/(\d+) hash-match""".r
      .findAllMatchIn(readme).map(m => (m.group(1).toInt, m.group(2).toInt)).toList
    assert(ratios.nonEmpty, "README must state the hash-match ratio")
    assert(ratios.forall(r => r._1 == n && r._2 == n),
      s"README hash-match ratio ${ratios.mkString(",")} != $n/$n")
  }

  test("every declared query has an oracle twin or a documented rows-only check") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty,
      s"queries without an oracleSql twin: ${missing.toSeq.sorted.mkString(", ")}")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"oracleSql entries without a query: ${orphans.toSeq.sorted.mkString(", ")}")
  }
}
