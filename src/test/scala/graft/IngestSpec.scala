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

  test("stage outputs carry the reference DDL columns (schema parity)") {
    // RAW.PAPERS (sql/01_create_schema.sql:8-17)
    assert(Seq("paper_id", "title", "authors", "publication_year", "source",
      "source_url", "categories", "ingested_at").forall(papers.columns.contains))
    // RAW.CHUNKS (:22-31)
    assert(Seq("chunk_id", "paper_id", "chunk_index", "section_name",
      "text_content", "word_count", "ingested_at").forall(chunks.columns.contains))
    // GRAPH.KNOWLEDGE_NODES (:44-51) — embedding present and always null
    val nodes = Ingest.nodes(emap)
    assert(Seq("node_id", "label", "name", "name_normalized", "paper_count",
      "embedding") == nodes.columns.toSeq)
    assert(nodes.filter(col("embedding").isNotNull).count() == 0)
    // GRAPH.KNOWLEDGE_EDGES (:55-63)
    assert(Seq("edge_id", "source_node_id", "target_node_id", "relation_type",
      "paper_id", "weight", "ingested_at") == Ingest.edges(emap).columns.toSeq)
    // GRAPH.CHUNK_ENTITY_MAP (:68-73)
    assert(Seq("map_id", "chunk_id", "node_id", "confidence")
      .forall(emap.columns.contains))
  }

  test("runAll --resume skips completed stages (checkpoint reuse)") {
    val out = java.nio.file.Files.createTempDirectory("graft_resume").toString
    val first = Ingest.runAll(spark, Sf0001, out)
    assert(first("papers") > 0 && first("knowledge_edges") > 0)
    // Sabotage the papers checkpoint with a 1-row version: if resume
    // really skips stage 1 and reads the checkpoint, the returned
    // papers count must be 1; a recompute would restore the full count.
    val one = spark.read.parquet(s"$out/papers").limit(1)
    one.write.mode("overwrite").parquet(s"$out/papers.tmp")
    spark.read.parquet(s"$out/papers.tmp").write.mode("overwrite").parquet(s"$out/papers")
    val resumed = Ingest.runAll(spark, Sf0001, out, resume = true)
    assert(resumed("papers") == 1)
    // downstream stages were also checkpoint-complete -> reused as-is
    assert(resumed("knowledge_edges") == first("knowledge_edges"))
    // without resume, everything recomputes
    val fresh = Ingest.runAll(spark, Sf0001, out)
    assert(fresh("papers") == first("papers"))
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
