package graft

import org.apache.spark.sql.functions._
import graft.sources.Snapshots

/** v24's correctness backbone: an IVF index committed to the snapshot
  * log and read back by a cold searcher serves EXACTLY what the
  * in-session index serves — parquet round-trips the model bit-exactly
  * — and the two index tables land atomically or not at all. */
class IndexPersistSpec extends SparkSpec {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("ivfpersist").toString + "/t"

  test("persisted probe == in-session probe, row for row") {
    val persisted = SparkEntry.queries("v24_index_persist")(spark, Sf0001)
      .select("qid", "nb_id", "nb_rank", "score")
      .collect().map(_.toSeq)
    val session = SparkEntry.queries("v8_knn_ivf_probe2")(spark, Sf0001)
      .select("qid", "nb_id", "nb_rank", "score")
      .collect().map(_.toSeq)
    assert(persisted.nonEmpty)
    assert(persisted.toSeq == session.toSeq,
      "the committed index must serve the in-session index's exact results")
  }

  test("index_atomic flag is the staged-invisible + atomic-landing witness") {
    val flags = SparkEntry.queries("v24_index_persist")(spark, Sf0001)
      .select("index_atomic").collect().map(_.getBoolean(0))
    assert(flags.nonEmpty && flags.forall(identity))
  }

  test("a torn index pair is impossible: abort leaves NEITHER table visible") {
    import spark.implicits._
    val (c, a, txnDir) = (freshDir(), freshDir(), freshDir())
    val t = java.util.UUID.randomUUID().toString
    Snapshots.txnStage(Seq((0, Array(1.0, 0.0))).toDF("cluster_id", "cvec"),
      c, txnDir, t)
    Snapshots.txnStage(Seq((0, 1L)).toDF("cluster_id", "vec_id"), a, txnDir, t)
    Snapshots.txnAbort(spark, txnDir, t)
    assert(Snapshots.versions(spark, c).isEmpty)
    assert(Snapshots.versions(spark, a).isEmpty)
  }
}
