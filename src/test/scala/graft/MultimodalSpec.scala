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

  test("aHashBands: identical payloads hash identically; a local edit stays near; structure differs far") {
    import spark.implicits._
    val base = ("x" * 100) + ("Q" * 100) + ("x" * 100) // high-contrast blocks
    val near = ("x" * 100) + ("Q" * 99) + "R" + ("x" * 100) // one byte changed
    val far = ("Qx" * 150) // same bytes, alternating layout
    val figs = Seq(("a", base), ("b", base), ("c", near), ("d", far), ("e", "tiny"))
      .toDF("figure_id", "t")
      .select(col("figure_id"), col("t").cast("binary").as("payload"))
    val out = Multimodal.aHashBands(figs).collect()
      .map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    assert(!out.contains("e"), "payloads under 64 bytes have no 8x8 grid")
    assert(out("a") == out("b"), "identical payloads must hash identically")
    def ham(x: Seq[Int], y: Seq[Int]) =
      x.zip(y).map { case (u, v) => java.lang.Integer.bitCount(u ^ v) }.sum
    assert(ham(out("a"), out("c")) <= 4, "one-byte edit must stay within a few bits")
    assert(ham(out("a"), out("d")) > 16, "different byte layout must land far")
  }
}
