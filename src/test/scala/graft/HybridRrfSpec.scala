package graft

import graft.queries.VectorQ

/** v23's correctness backbone: reciprocal-rank fusion is pure integer
  * arithmetic over the two legs' ranks, each leg reuses an already
  * oracle-checked ordering (t10's BM25, v1's cosine), and the fused
  * ordering must be exactly reproducible from the emitted ranks.
  */
class HybridRrfSpec extends SparkSpec {

  private def run() =
    SparkEntry.queries("v23_hybrid_rrf")(spark, Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))

  test("fused score replays exactly from the emitted ranks; order follows it") {
    val rows = run()
    assert(rows.nonEmpty)
    def leg(rank: Int): Long =
      if (rank == 0) 0L
      else math.floor(VectorQ.RrfMicro.toDouble / (VectorQ.RrfK + rank)).toLong
    rows.foreach { case (id, rl, rv, micro) =>
      assert(rl >= 0 && rl <= VectorQ.RrfLegDepth, s"doc $id rank_lex $rl")
      assert(rv >= 0 && rv <= VectorQ.RrfLegDepth, s"doc $id rank_vec $rv")
      assert(rl > 0 || rv > 0, s"doc $id in neither leg")
      assert(micro == leg(rl) + leg(rv), s"doc $id fused score mismatch")
    }
    val resorted = rows.sortBy { case (id, _, _, micro) => (-micro, id) }
    assert(rows.toSeq == resorted.toSeq, "emitted order must be (rrf_micro DESC, doc_id)")
    // ranks are distinct within each leg
    Seq(rows.map(_._2), rows.map(_._3)).foreach { rs =>
      val present = rs.filter(_ > 0)
      assert(present.distinct.length == present.length, "duplicate leg rank")
    }
  }

  test("lexical leg agrees with the declared t10 ordering (shared bm25Frame)") {
    val fused = run()
    val t10 = SparkEntry.queries("t10_bm25")(spark, Sf0001)
      .select("doc_id").collect().map(_.getLong(0)).filter(_ != 0L)
    // the doc t10 ranks first (query doc excluded) must carry rank_lex = 1
    // wherever it appears in the fused output
    fused.find(_._1 == t10.head).foreach { case (_, rl, _, _) =>
      assert(rl == 1, "t10's top doc must be rank_lex 1 in the fused output")
    }
    // and every fused doc with a lexical rank within t10's depth must
    // appear in t10's top-10 at exactly that position
    fused.filter(r => r._2 >= 1 && r._2 <= t10.length).foreach { case (id, rl, _, _) =>
      assert(t10(rl - 1) == id, s"rank_lex $rl disagrees with t10 position")
    }
  }

  test("vector leg agrees with v1's cosine top-k ordering") {
    val fused = run()
    val v1 = SparkEntry.queries("v1_cosine_topk")(spark, Sf0001)
      .select("vec_id").collect().map(_.getLong(0))
    fused.filter(r => r._3 >= 1 && r._3 <= v1.length).foreach { case (id, _, rv, _) =>
      assert(v1(rv - 1) == id, s"rank_vec $rv disagrees with v1 position")
    }
  }
}
