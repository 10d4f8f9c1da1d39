package graft.ops

import org.apache.spark.sql.DataFrame

/** LINEAGE CUTS FOR ITERATIVE OPERATORS — one policy, one switch.
  *
  * Every iterative operator here (label propagation, PageRank
  * variants, k-core peeling, BFS, connected components, k-means, PQ
  * training) must cut each round's lineage: without it, round k's
  * logical plan embeds all k−1 previous rounds and analysis cost
  * grows superlinearly (measured in DedupCluster: 227 s for seconds
  * of data work). HOW the cut happens is a deployment decision, not
  * an operator decision:
  *
  *  - `localCheckpoint` (the default): executor-local blocks, no
  *    distributed-FS round trip per round — the right trade on a
  *    single node or for a bounded refinement where re-running the
  *    job beats paying durable writes. NOT fault-tolerant: the blocks
  *    die with their executor, so at cluster scale an executor loss
  *    after a cut kills the job.
  *  - reliable `checkpoint`: files under
  *    `spark.sparkContext.setCheckpointDir` — an executor loss
  *    mid-iteration recovers from the checkpoint store. The 100 TB
  *    posture for long iterative jobs on preemptible fleets.
  *
  * The switch is the session conf `spark.graft.reliableCheckpoints`
  * (+ a set checkpoint dir), so ONE cluster-level setting flips every
  * iterative operator to the fault-tolerant cut with zero call-site
  * changes — operators express "cut here" (`cutLineage`), deployment
  * picks the physics. The two paths are result-identical by
  * construction (both materialize the same rows and serve them back);
  * LineageSpec pins it end to end on a real iterative query.
  */
object Lineage {

  /** Session conf key: "true" switches every [[cutLineage]] to
    * reliable checkpoint files. Requires a checkpoint dir. */
  val ConfKey = "spark.graft.reliableCheckpoints"

  def reliable(df: DataFrame): Boolean =
    df.sparkSession.conf.get(ConfKey, "false").toBoolean

  /** Cut `df`'s lineage per the session policy. `eager = false`
    * defers materialization to the caller's next action (the
    * one-pass convergence-check idiom). */
  def cut(df: DataFrame, eager: Boolean = true): DataFrame =
    if (reliable(df)) {
      require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        s"$ConfKey=true needs spark.sparkContext.setCheckpointDir(...) set")
      df.checkpoint(eager)
    } else df.localCheckpoint(eager)

  /** `.cutLineage(eager)` as a method, so iterative loops read like
    * the `.localCheckpoint(true)` they replace. */
  implicit final class CutOps(private val df: DataFrame) extends AnyVal {
    def cutLineage(eager: Boolean = true): DataFrame = cut(df, eager)
  }
}
