package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd 60-bit md5 hash of a string column — the fused form of
  *
  *   conv(substring(md5(c), 1, 15), 16, 10)  (cast to long)
  *
  * i.e. the first 15 hex nibbles of the md5 digest as a non-negative
  * long, bit-for-bit identical to the composed form and to the DuckDB
  * oracle twin `CAST(('0x' || substr(md5(x),1,15)) AS BIGINT)`. The
  * composed form materializes a 32-char hex string, substrings it and
  * re-parses base-16 per row; this expression goes digest → long
  * directly (first 8 big-endian bytes >>> 4) with a thread-local
  * MessageDigest. Used on the hottest scalar paths: per-token hashing
  * (d4 SimHash votes, t4 fingerprints) and per-shingle hash bases
  * (d2/d3 MinHash family).
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hash60 requires a string input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(v: Any): Any =
    Hash60.hash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash60.hash($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Hash60 {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(UTF-8 bytes) as a non-negative long:
    * equivalent to parsing the first 15 hex chars of the digest.
    */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val hi =
      (d(0) & 0xffL) << 56 | (d(1) & 0xffL) << 48 |
      (d(2) & 0xffL) << 40 | (d(3) & 0xffL) << 32 |
      (d(4) & 0xffL) << 24 | (d(5) & 0xffL) << 16 |
      (d(6) & 0xffL) << 8  | (d(7) & 0xffL)
    hi >>> 4
  }
}
