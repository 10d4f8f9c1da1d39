package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The sliding-window chunker as a native Catalyst `Generator` —
  * SURVEY.md §7.3's v2 form of G1 (one text row → many chunk rows).
  *
  * Same semantics as graft.ops.Chunker (reference
  * data/ingestion.py:173-185): windows of `size` words at stride
  * `size-overlap`; a window at start s>0 exists iff s+overlap < n;
  * the per-section ordinal counts every generated window; windows
  * shorter than `minWords` are dropped after ordinal assignment;
  * sections shorter than `minWords` yield nothing.
  *
  * Output rows: (chunk_ord int, start int, word_count int,
  * text_content string). The explode-based composition (Chunker) is
  * the default — it stays in whole-stage codegen; this Generator is
  * the single-expression form for SQL users
  * (`SELECT chunk_windows(text, 200, 30, 30) FROM docs` after
  * registration) and the template for generators whose logic
  * outgrows higher-order functions. Equivalence is pinned by
  * ChunkGeneratorSpec.
  */
case class ChunkGenerator(child: Expression, size: Int, overlap: Int, minWords: Int)
    extends Expression with CollectionGenerator with CodegenFallback {

  require(overlap < size, "overlap must be < size")
  private val stride = size - overlap

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def collectionType: DataType = ArrayType(elementSchema)
  override val inline: Boolean = false
  override def position: Boolean = false

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_ord", IntegerType, nullable = false),
    StructField("start", IntegerType, nullable = false),
    StructField("word_count", IntegerType, nullable = false),
    StructField("text_content", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val words = v.asInstanceOf[UTF8String].toString.trim match {
      case "" => Array.empty[String]
      case t => t.split("\\s+")
    }
    val n = words.length
    if (n < minWords) return Iterator.empty
    Iterator.from(0)
      .map(_ * stride)
      .takeWhile(s => s == 0 || s + overlap < n)
      .takeWhile(_ < n)
      .zipWithIndex
      .flatMap { case (s, ord) =>
        val wc = math.min(n - s, size)
        if (wc < minWords) None
        else Some(InternalRow(ord, s, wc,
          UTF8String.fromString(words.slice(s, s + size).mkString(" "))))
      }
  }

  override def dataType: DataType = collectionType

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object ChunkGenerator {
  import org.apache.spark.sql.SparkSession

  /** Register `chunk_windows(text, size, overlap, min_words)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "chunk_windows",
      exprs => {
        require(exprs.length == 4, "chunk_windows(text, size, overlap, min_words)")
        def intArg(e: Expression): Int =
          e.eval(null).asInstanceOf[Number].intValue()
        ChunkGenerator(exprs.head, intArg(exprs(1)), intArg(exprs(2)), intArg(exprs(3)))
      },
      "scala_udf")
}
