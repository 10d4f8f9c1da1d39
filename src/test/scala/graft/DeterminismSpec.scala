package graft

/** Meta-guard for the oracle gate: every declared query must be
  * fully deterministic — same session, same input, identical rows in
  * identical order on repeated execution. Catches regressions like
  * float group-sums without decimal casts, LIMIT without a unique
  * tiebreak, or partitioning-dependent "first" semantics before they
  * reach the driver's hash compare.
  */
class DeterminismSpec extends SparkSpec {

  test("all queries produce identical ordered results on repeated runs") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val a = fn(spark, Sf0001).collect()
      val b = fn(spark, Sf0001).collect()
      if (a.length != b.length)
        Some(s"$name: ${a.length} vs ${b.length} rows")
      else {
        val idx = a.indices.find(i => a(i) != b(i))
        idx.map(i => s"$name: row $i differs: ${a(i)} vs ${b(i)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
