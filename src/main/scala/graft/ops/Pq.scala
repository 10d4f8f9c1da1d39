package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the embedding-COMPRESSION leg of the
  * ANN suite ([[Ivf]] is the bucketing leg; real systems compose
  * both). The d-dim vector space is split into `m` orthogonal
  * subspaces of d/m dims; each subspace gets its own [[KMeans]]
  * codebook of `k` centroids; a vector is stored as `m` small codes
  * (k=16 ⇒ 4 bits per subspace: a 64-dim float32 vector compresses
  * 256 bytes → 2 bytes, 128×). At 100 TB of embeddings this is the
  * difference between scanning object storage and scanning RAM.
  *
  * Search is ADC (asymmetric distance computation): the query stays
  * exact; per query a (m × k) lookup table of subspace dot products
  * is built against the codebooks (model-sized, broadcast), and each
  * candidate's score is m array lookups + adds over its CODES —
  * codegen'd `zip_with`/`aggregate`, no decompression, no join on
  * the data path, top-k via the bounded-heap [[graft.plans.TopK]].
  *
  * Everything inherits [[KMeans]]' determinism (k-smallest-id
  * seeding, id tie-breaks); like all float-trained models the exact
  * codebooks are shuffle-order dependent in the last ulp, so query
  * results are pinned by spec (recall vs brute force + reconstruction
  * error) rather than a cross-engine hash.
  */
object Pq {

  /** codebooks: (sub_id int, cid int, cvec array<double>) — m·k rows.
    * encoded:   (idCol, code array<int> of length m). */
  case class Index(m: Int, subDim: Int, codebooks: DataFrame,
                   encoded: DataFrame, idCol: String)

  /** Train one codebook per subspace and encode every vector.
    * `dim` must be divisible by `m`.
    *
    * All m codebooks train in ONE shared Lloyd's loop
    * ([[KMeans.fitGrouped]] over exploded (sub_id, sub-vector)
    * rows): `iters` scoring passes total instead of m sequential
    * KMeans runs (m× fewer jobs and driver round-trips), and the
    * encoding comes from the final grouped assignment via one
    * collect_list — no m-way self-join. */
  def build(vectors: DataFrame, idCol: String, vecCol: String,
            dim: Int, m: Int, k: Int, iters: Int = 5): Index = {
    require(m >= 1 && dim % m == 0, s"dim=$dim not divisible by m=$m")
    val subDim = dim / m
    val v = vectors.select(col(idCol), col(vecCol).cast("array<double>").as("_v"))
    val subRows = v.select(col(idCol),
      posexplode(array((0 until m).map(j =>
        slice(col("_v"), j * subDim + 1, subDim)): _*)).as(Seq("sub_id", "_s")))
    val (cents, assign) =
      KMeans.fitGrouped(subRows, "sub_id", idCol, "_s", k, iters)
    val codebooks = cents
      .select(col("sub_id"), col("cluster_id").as("cid"), col("cvec"))
      .localCheckpoint(true)
    val encoded = assign
      .groupBy(col(idCol))
      .agg(transform(
        array_sort(collect_list(struct(col("sub_id"), col("cluster_id")))),
        s => s("cluster_id")).as("code"))
      .localCheckpoint(true)
    Index(m, subDim, codebooks, encoded, idCol)
  }

  /** ADC top-k by dot-product score. Queries: (qid, qvec).
    * Output: (qid, nb_id, nb_rank, score) — score is the QUANTIZED
    * dot product Σ_j q_j · c_{code_j}. */
  def search(index: Index, queries: DataFrame, topK: Int): DataFrame = {
    val spark = queries.sparkSession
    VectorOps.ensureRegistered(spark)
    val q = queries.select(col("qid"), col("qvec").cast("array<double>").as("_q"))
    // (m × k) LUT per query: contrib(sub, cid) = <q_sub, c_{sub,cid}>;
    // nested array_sort(collect_list(struct)) keeps both levels
    // ordered by id, so lut[sub+1][cid+1] is positional.
    val contribs = q.crossJoin(broadcast(index.codebooks))
      .withColumn("contrib",
        VectorOps.dot(slice(col("_q"), col("sub_id") * index.subDim + 1,
          lit(index.subDim)), col("cvec")))
    val lut = contribs
      .groupBy(col("qid"), col("sub_id"))
      .agg(transform(array_sort(collect_list(struct(col("cid"), col("contrib")))),
        s => s("contrib")).as("sub_lut"))
      .groupBy(col("qid"))
      .agg(transform(array_sort(collect_list(struct(col("sub_id"), col("sub_lut")))),
        s => s("sub_lut")).as("lut"))
    // data path: one narrow pass over the codes — m lookups + adds
    val scored = index.encoded.crossJoin(broadcast(lut))
      .filter(col(index.idCol) =!= col("qid"))
      .withColumn("score",
        aggregate(zip_with(col("code"), col("lut"),
            (c, l) => element_at(l, c + 1)),
          lit(0.0), (acc, x) => acc + x))
    val top = graft.plans.TopK.perKey(scored, Seq("qid"),
      Seq(col("score").desc, col(index.idCol)), topK)
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col(index.idCol))
    top.withColumn("nb_rank", row_number().over(w))
      .select(col("qid"), col(index.idCol).as("nb_id"), col("nb_rank"), col("score"))
  }

  /** Decode: reconstruct each vector from its codes (concatenated
    * centroids) — the quantization-error side of the contract. */
  def reconstruct(index: Index): DataFrame = {
    val byCode = index.encoded
      .select(col(index.idCol), posexplode(col("code")).as(Seq("sub_id", "cid")))
      .join(broadcast(index.codebooks), Seq("sub_id", "cid"))
    byCode
      .groupBy(col(index.idCol))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("sub_id"), col("cvec")))),
        s => s("cvec"))).as("vec_hat"))
  }
}
