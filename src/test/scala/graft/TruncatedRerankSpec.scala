package graft

import graft.queries.VectorQ

/** v16's correctness backbone: the truncated-dim prefilter is a
  * RECALL knob, not a correctness approximation — with the shortlist
  * as deep as the corpus nothing is pruned and the two-stage plan
  * must reproduce the brute-force scan (v4) row for row. The declared
  * query then differs only by the documented shortlist cut.
  */
class TruncatedRerankSpec extends SparkSpec {

  test("shortlist ≥ corpus degenerates to exact brute force (v16 ≡ v4)") {
    val wide = VectorQ.truncatedRerank(spark, Sf0001,
        prefDims = VectorQ.PrefDims, shortK = 1000000)
      .select("qid", "nb_id", "nb_rank", "score")
      .collect().map(_.toSeq)
    val brute = SparkEntry.queries("v4_knn_bruteforce")(spark, Sf0001)
      .select("qid", "nb_id", "nb_rank", "score")
      .collect().map(_.toSeq)
    assert(wide.nonEmpty)
    assert(wide.toSeq == brute.toSeq,
      "unbounded-shortlist truncated rerank must equal the brute-force top-k")
  }

  test("prefilter on all dims ≡ brute force even at shortlist = k") {
    // with prefDims = full dimensionality the prefilter order IS the
    // exact order, so even the tightest shortlist loses nothing
    val full = VectorQ.truncatedRerank(spark, Sf0001,
        prefDims = 64, shortK = 3)
      .select("qid", "nb_id", "nb_rank", "score")
      .collect().map(_.toSeq)
    val brute = SparkEntry.queries("v4_knn_bruteforce")(spark, Sf0001)
      .select("qid", "nb_id", "nb_rank", "score")
      .collect().map(_.toSeq)
    assert(full.toSeq == brute.toSeq,
      "full-width prefilter must make the shortlist cut lossless")
  }
}
