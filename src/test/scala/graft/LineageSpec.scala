package graft

import graft.ops.Lineage
import graft.ops.Lineage.CutOps

/** The session-wide reliable-checkpoint policy: one conf flips every
  * iterative operator's per-round lineage cut from executor-local
  * blocks (fast, not fault-tolerant) to reliable checkpoint files —
  * and the two paths are RESULT-IDENTICAL, proven end to end on a
  * real iterative declared query. */
class LineageSpec extends SparkSpec {

  test("the reliable path produces identical results on k14's iterative rounds") {
    // an isolated session: the conf flip must never race parallel
    // suites running on the shared TestSession (same context, own conf)
    val s2 = spark.newSession()
    val ckpt = java.nio.file.Files.createTempDirectory("lineage_ckpt").toString
    s2.sparkContext.setCheckpointDir(ckpt)
    s2.conf.set(Lineage.ConfKey, "true")
    def run(s: org.apache.spark.sql.SparkSession) =
      SparkEntry.queries("k14_label_prop")(s, Sf0001)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val reliable = run(s2)
    val local = run(spark)
    assert(reliable == local,
      "reliable checkpoints must not change any community assignment")
    // the reliable run really wrote durable checkpoint files
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(wrote > 0, "reliable mode must write to the checkpoint store")
  }

  test("cutLineage picks the engine per session policy; default stays local") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("a", "b")
    // default session: local cut, no checkpoint dir needed
    assert(df.cutLineage(true).collect().length == 1)
    assert(!Lineage.reliable(df))
    // reliable policy without a checkpoint dir fails loudly at the cut
    val s2 = spark.newSession()
    s2.conf.set(Lineage.ConfKey, "true")
    val df2 = s2.range(3).toDF("x")
    if (s2.sparkContext.getCheckpointDir.isEmpty) {
      intercept[IllegalArgumentException] { Lineage.cut(df2) }
    } else {
      // a parallel suite already set the context-global dir — the cut
      // must then succeed reliably
      assert(Lineage.cut(df2).collect().length == 3)
    }
  }
}
