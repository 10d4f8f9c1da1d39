package graft

import org.apache.spark.sql.functions._

/** k20 co-occurrence lift and x39 k-anonymity: internal-consistency
  * invariants on the fixture (the oracle pins cross-engine values;
  * these pin the SEMANTICS the values claim to have). */
class LiftAnonymitySpec extends SparkSpec {

  test("k20: lift is the exact integer quotient and marginals bound the pair count") {
    val rows = SparkEntry.queries("k20_edge_lift")(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    // recover N from any row: lift = n_co·N/(df_a·df_b)
    val r0 = rows.head
    val n = math.round(r0.getDouble(5) * r0.getLong(3) * r0.getLong(4) /
      r0.getLong(2).toDouble)
    rows.foreach { r =>
      val (co, dfa, dfb, lift) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(co >= graft.queries.KgQ.LiftMinCo)
      assert(dfa >= co && dfb >= co,
        "a pair cannot co-occur more often than either member occurs")
      assert(lift == co.toDouble * n / (dfa * dfb),
        s"lift must be the exact quotient for ($r)")
      assert(r.getString(0) < r.getString(1), "pairs are ordered a < b")
    }
    // at least one associated pair should beat independence
    assert(rows.exists(_.getDouble(5) > 1.0))
  }

  test("x39: the k verdict and exposure totals are self-consistent") {
    // sf0.1: large enough that some classes clear k while the band
    // extremes stay under it (smaller fixtures leave every
    // generalized class at risk — a degenerate audit); the query is
    // one small-dimension aggregate, cheap at any SF
    val rows = SparkEntry.queries("x39_k_anonymity")(spark, "/root/testdata/sf0.1")
      .collect()
    assert(rows.nonEmpty)
    val k = graft.queries.ExtQ.KAnonK
    val atRisk = rows.filter(_.getLong(3) < k).map(_.getLong(3)).sum
    val total = rows.map(_.getLong(3)).sum
    rows.foreach { r =>
      assert(r.getBoolean(4) == (r.getLong(3) >= k),
        "anonymous must be exactly the class-size >= k verdict")
      assert(r.getLong(5) == atRisk, "every row carries the corpus exposure")
      assert(r.getDouble(6) == atRisk.toDouble / total)
    }
    // the audit is non-degenerate on the fixture: both verdicts occur
    assert(rows.exists(_.getBoolean(4)) && rows.exists(!_.getBoolean(4)),
      "fixture should exercise both anonymous and at-risk classes")
  }
}
