package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate clustering: given candidate pairs (from MinHash
  * bands, shingle Jaccard, or embedding blocking), assign every doc
  * to its connected component and keep min(doc_id) as the cluster
  * representative — the final step of a dedup pipeline (pairs alone
  * don't say which copies to drop when dup groups chain: a~b, b~c).
  *
  * Implemented as iterative min-label propagation (the standard
  * large-graph connected-components pattern): each round joins the
  * current labels across edges and keeps the elementwise min;
  * converges in O(diameter) rounds. Dedup components are
  * near-cliques, so 2–3 rounds close them; `maxIters` bounds
  * pathological chains. Each round is one shuffle on doc_id — no
  * driver-side graph state, works at any component count.
  */
object DedupCluster {

  /** pairs: (a_id, b_id) undirected candidate edges.
    * Returns (doc_id, rep_id) for every doc appearing in a pair;
    * `rep_id` = min doc_id of its connected component.
    *
    * Iterates to FIXPOINT by default (`maxIters <= 0`), so the
    * documented contract always holds: min-label propagation is
    * monotone (labels only decrease, bounded below by the component
    * min), hence guaranteed to converge in O(diameter) rounds. A
    * positive `maxIters` bounds rounds for callers that prefer a
    * budget; the contract is then only guaranteed for components with
    * diameter ≤ maxIters.
    */
  def clusters(pairs: DataFrame, maxIters: Int = 0): DataFrame = {
    val edges = pairs.select(col("a_id").cast("long"), col("b_id").cast("long"))
      .union(pairs.select(col("b_id").cast("long"), col("a_id").cast("long")))
      .toDF("src", "dst")
      .persist()
    var labels = edges.groupBy(col("src").as("doc_id"))
      .agg(min(col("dst")).as("mn"))
      .select(col("doc_id"), least(col("mn"), col("doc_id")).as("rep_id"))
      .persist()
    var converged = false
    var i = 0
    while (!converged && (maxIters <= 0 || i < maxIters)) {
      // propagate: my new label = min(my label, labels of my neighbors)
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("doc_id", "dst").withColumnRenamed("rep_id", "nb_rep"), "dst")
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("nb_rep")).as("nb_min"))
      val next = labels.join(viaNeighbors, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("rep_id"), coalesce(col("nb_min"), col("rep_id"))).as("rep_id"))
        .persist()
      val changed = next.withColumnRenamed("rep_id", "new_rep")
        .join(labels, "doc_id")
        .filter(col("new_rep") =!= col("rep_id"))
        .limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      i += 1
    }
    edges.unpersist()
    labels
  }

  /** Representatives to keep: one row per component. */
  def representatives(clusterAssign: DataFrame): DataFrame =
    clusterAssign.select(col("rep_id")).distinct()
}
