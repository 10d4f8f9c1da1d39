package graft.schema

import org.apache.spark.sql.types._

/** Reference-domain table schemas (SURVEY.md §1.4; FIXTURES.md §A),
  * adapted DDL→Spark: embeddings are native array<float> (the
  * reference stores JSON-in-VARCHAR, sql/01_create_schema.sql:28 —
  * F9 adapters in TextFns/VectorQ prove round-trip parity), ids are
  * deterministic sha2 surrogates where the reference used uuid4.
  */
object Schemas {

  val papers: StructType = StructType(Seq(
    StructField("paper_id", StringType, nullable = false),
    StructField("title", StringType),
    StructField("authors", StringType),
    StructField("abstract", StringType),
    StructField("publication_year", IntegerType),
    StructField("source", StringType),
    StructField("source_url", StringType),
    StructField("categories", StringType),
    StructField("ingested_at", TimestampType)))

  val chunks: StructType = StructType(Seq(
    StructField("chunk_id", StringType, nullable = false),
    StructField("paper_id", StringType, nullable = false),
    StructField("chunk_index", IntegerType),
    StructField("section_name", StringType),
    StructField("text_content", StringType),
    StructField("word_count", IntegerType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("ingested_at", TimestampType)))

  val figures: StructType = graft.ops.Multimodal.figureSchema

  val knowledgeNodes: StructType = StructType(Seq(
    StructField("node_id", StringType, nullable = false),
    StructField("label", StringType),
    StructField("name", StringType),
    StructField("name_normalized", StringType),
    StructField("paper_count", IntegerType),
    StructField("embedding", ArrayType(FloatType)))) // always null (ref: data/ingestion.py:373)

  val knowledgeEdges: StructType = StructType(Seq(
    StructField("edge_id", StringType, nullable = false),
    StructField("source_node_id", StringType, nullable = false),
    StructField("target_node_id", StringType, nullable = false),
    StructField("relation_type", StringType),
    StructField("paper_id", StringType),
    StructField("weight", DoubleType),
    StructField("ingested_at", TimestampType)))

  val chunkEntityMap: StructType = StructType(Seq(
    StructField("map_id", StringType, nullable = false),
    StructField("chunk_id", StringType, nullable = false),
    StructField("node_id", StringType, nullable = false),
    StructField("confidence", DoubleType)))

  val evalMetrics: StructType = StructType(Seq(
    StructField("log_id", StringType, nullable = false),
    StructField("question", StringType),
    StructField("generated_response", StringType),
    StructField("context_used", StringType),
    StructField("retrieval_mode", StringType),
    StructField("faithfulness_score", DoubleType),
    StructField("answer_relevance_score", DoubleType),
    StructField("confidence", DoubleType),
    StructField("latency_ms", LongType),
    StructField("timestamp", TimestampType)))
}
