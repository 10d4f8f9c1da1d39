package graft

/** k21's consistency backbone: per-seed distances aggregate to values
  * that must cohere with k18's min-over-seeds distances on the SAME
  * graph (one shared bfsGraph definition). */
class HarmonicClosenessSpec extends SparkSpec {

  test("k21 coheres with k18: nearest-seed term bounds the harmonic sum") {
    val k18 = SparkEntry.queries("k18_shortest_paths")(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val k21 = SparkEntry.queries("k21_harmonic_closeness")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(k21.nonEmpty)
    k21.foreach { case (node, nSeeds, micro) =>
      assert(nSeeds >= 1 && micro > 0)
      // k18's hops = the node's distance to its NEAREST seed; that
      // seed contributes floor(1e6/hops) (or is the node itself,
      // d=0 excluded, in which case some other seed term is smaller)
      val hops = k18(node)
      val nearestTerm = if (hops == 0) 1000000L else 1000000L / hops
      assert(micro <= nSeeds * 1000000L, s"node $node sum above per-seed max")
      assert(micro >= nearestTerm || hops == 0,
        s"node $node: sum $micro below its nearest-seed term $nearestTerm")
      assert(micro <= nSeeds * nearestTerm || hops == 0,
        s"node $node: some term would exceed the nearest-seed term")
    }
    // every non-seed node k18 reaches is reached per-seed too
    val reached = k21.map(_._1).toSet
    k18.filter(_._2 > 0).keys.foreach(n =>
      assert(reached.contains(n), s"node $n reached by k18 but absent in k21"))
  }
}
