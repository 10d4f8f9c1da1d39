package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) — the training-free embedding-
  * compression leg of the ANN suite, complementing [[Pq]]:
  *
  *  - PQ compresses 128× but needs trained codebooks (a fit pass, a
  *    model to version, drift on distribution change);
  *  - SQ8 compresses 4× (float32 → int8 + one scale per vector) with
  *    NO training: encode is a pure per-row map, so it works on a
  *    streaming corpus from row one and never goes stale.
  *
  * Encoding: `scale = max|x_i| / 127`; `code_i = floor(x_i/scale +
  * 0.5)` ∈ [−127, 127]. The floor form (not `round`) is chosen
  * deliberately: floor has identical semantics in every engine,
  * while round's half-case tie-breaking differs, so scores stay
  * bit-reproducible cross-engine and the query carries a full hash
  * oracle. Scoring is asymmetric like PQ's ADC — the query stays
  * float, a candidate costs one int-dot + one multiply:
  * `score ≈ scale · Σ q_i·code_i`. Reconstruction error is bounded
  * per element by `scale/2` ([[SqSpec]] pins it).
  *
  * At 100 TB: encode is a narrow map (no shuffle); the scored scan
  * reads a quarter of the bytes of the float corpus, which is the
  * entire point — scan cost at this scale is bandwidth, not FLOPs.
  */
object Sq {

  /** (idCol, scale double, codes array<int>) for an
    * `Array[Float]`-typed `vecCol`. */
  def encode(vectors: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val maxAbs = aggregate(v, lit(0.0), (a, x) => greatest(a, abs(x)))
    val scale = maxAbs / lit(127.0)
    // all-zero vector ⇒ scale 0: divide by 1 instead (codes are then
    // all zero anyway and scale·code reconstructs exact zeros)
    val sd = when(col("scale") === 0.0, lit(1.0)).otherwise(col("scale"))
    vectors
      .withColumn("scale", scale)
      .withColumn("codes",
        transform(v, x => floor(x / sd + lit(0.5)).cast("int")))
      .select(col(idCol), col("scale"), col("codes"))
  }

  /** Asymmetric score of a float query column against an encoded
    * candidate: `scale · <q, codes>` (one multiply on top of the
    * int dot product — no decode). */
  def score(qvec: Column, scale: Column, codes: Column): Column =
    scale * VectorOps.dot(qvec.cast("array<double>"), codes.cast("array<double>"))

  /** Decode back to floats — the reconstruction side of the
    * contract: `x̂_i = scale · code_i`, with `|x − x̂| ≤ scale/2`
    * element-wise. */
  def reconstruct(encoded: DataFrame, idCol: String): DataFrame =
    encoded.select(col(idCol),
      transform(col("codes"), c => col("scale") * c).as("vec_hat"))
}
