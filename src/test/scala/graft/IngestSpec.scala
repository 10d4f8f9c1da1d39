package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Ingest

/** End-to-end pipeline shape over the sf0.001 fixtures (S9/A1-style
  * count verification, SURVEY.md §3.3).
  */
class IngestSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, Sf0001, "documents")
  private lazy val papers = Ingest.papers(docs).cache()
  private lazy val chunks = Ingest.chunks(papers, size = 20, overlap = 5, minWords = 5).cache()
  private lazy val emap = Ingest.entityMap(chunks).cache()

  test("papers: short docs dropped, ids formatted") {
    val n = papers.count()
    assert(n > 0 && n <= docs.count())
    assert(papers.filter(!col("paper_id").rlike("^doc_\\d{6}$")).count() == 0)
  }

  test("chunks: word counts within bounds, per-paper index dense from 0") {
    assert(chunks.filter(col("word_count") < 5 || col("word_count") > 20).count() == 0)
    val bad = chunks.groupBy(col("paper_id"))
      .agg(min("chunk_index").as("mn"), max("chunk_index").as("mx"),
        count(lit(1)).as("n"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1)
    assert(bad.count() == 0)
  }

  test("entity map: confidence 1.0, deterministic sha2 map ids") {
    assert(emap.filter(col("confidence") =!= 1.0).count() == 0)
    assert(emap.filter(length(col("map_id")) =!= 64).count() == 0)
  }

  test("nodes: one row per normalized name, positive paper counts") {
    val nodes = Ingest.nodes(emap)
    val n = nodes.count()
    assert(n == nodes.select("name_normalized").distinct().count())
    assert(nodes.filter(col("paper_count") <= 0).count() == 0)
  }

  test("edges: canonical src<tgt ordering, weight >= 1, pair-count math") {
    val edges = Ingest.edges(emap).cache()
    assert(edges.filter(col("source_node_id") >= col("target_node_id")).count() == 0)
    assert(edges.filter(col("weight") < 1.0).count() == 0)
    // Σ weights = Σ over chunks of C(distinct entities, 2)
    val perChunk = emap.groupBy("chunk_id", "paper_id")
      .agg(countDistinct("node_id").as("k"))
      .select(sum(col("k") * (col("k") - 1) / 2)).head.getDouble(0)
    val wsum = edges.select(sum("weight")).head.getDouble(0)
    assert(wsum == perChunk)
  }

  test("maxEntitiesPerChunk caps the quadratic blowup") {
    val capped = Ingest.edges(emap, maxEntitiesPerChunk = 3)
    val maxPairsPerChunkPaper = 3L * 2 / 2
    val over = capped.groupBy("paper_id")
      .agg(sum("weight").as("w"))
      .join(chunks.groupBy("paper_id").agg(count(lit(1)).as("nc")), "paper_id")
      .filter(col("w") > col("nc") * maxPairsPerChunkPaper)
    assert(over.count() == 0)
  }
}
