package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

class MultimodalSpec extends SparkSpec {

  private lazy val figures =
    Multimodal.figuresFromDocuments(Tables.load(spark, Sf0001, "documents")).cache()

  test("figures table: binary payload with typed metadata, schema stable") {
    assert(figures.schema.fieldNames.toSeq ==
      Multimodal.figureSchema.fieldNames.toSeq)
    assert(figures.filter(col("payload").isNull).count() == 0)
    assert(figures.count() == 500)
  }

  test("decode: deterministic stub yields dims + normalized 8-dim feature") {
    val out = Multimodal.decode(figures).cache()
    assert(out.schema == Multimodal.decodedSchema)
    assert(out.filter(size(col("feature")) =!= 8).count() == 0)
    // feature is a normalized histogram -> sums to ~1
    val sums = out.select(aggregate(col("feature"),
      lit(0.0), (a, x) => a + x).as("s"))
    assert(sums.filter(abs(col("s") - 1.0) > 1e-5).count() == 0)
    // deterministic: same input -> same output
    val again = Multimodal.decode(figures)
    assert(out.exceptAll(again).count() == 0)
  }

  test("decode keeps byte_len consistent with the payload") {
    val joined = Multimodal.decode(figures)
      .join(figures.select(col("figure_id"), octet_length(col("payload")).as("pl")),
        "figure_id")
    assert(joined.filter(col("byte_len") =!= col("pl")).count() == 0)
  }

  test("sampleFrames: generator shape, frames sliced from the payload") {
    val frames = Multimodal.sampleFrames(figures, frameBytes = 16, stride = 2)
    assert(frames.count() >= figures.count()) // at least one frame each
    val bad = frames.filter(octet_length(col("frame")) > 16)
    assert(bad.count() == 0)
  }
}
