package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, Hash60, L2Norm, SimHashAgg, VectorSumAgg}

/** SparkSessionExtensions entry point: makes the engine's custom
  * Catalyst expressions available to ANY session — including pure
  * `spark.sql` users — via
  *
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)   // or
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *
  * The per-session `VectorOps.ensureRegistered` path registers the
  * same functions imperatively; this class is the deployment-grade
  * variant (survives session cloning, applies to every session built
  * from the config).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def arity(name: String, n: Int)(exprs: Seq[Expression]): Seq[Expression] = {
    if (exprs.length != n)
      throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${exprs.length}")
    exprs
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - codegen'd dot product of two numeric arrays"),
      (exprs: Seq[Expression]) => { val e = arity("graft_dot", 2)(exprs); DotProduct(e(0), e(1)) }))
    ext.injectFunction((
      FunctionIdentifier("graft_l2norm"),
      info("graft_l2norm", "graft_l2norm(a) - L2 norm of a numeric array"),
      (exprs: Seq[Expression]) => L2Norm(arity("graft_l2norm", 1)(exprs).head)))
    ext.injectFunction((
      FunctionIdentifier("graft_vector_sum"),
      info("graft_vector_sum", "graft_vector_sum(v) - element-wise vector sum aggregate"),
      (exprs: Seq[Expression]) =>
        VectorSumAgg(arity("graft_vector_sum", 1)(exprs).head).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(token_hash[, bits]) - SimHash aggregate over 64-bit token hashes"),
      (exprs: Seq[Expression]) => {
        require(exprs.nonEmpty && exprs.length <= 2,
          "graft_simhash expects 1 or 2 arguments")
        val bits = if (exprs.length == 2) {
          require(exprs(1).foldable, "graft_simhash: bits must be a literal integer")
          exprs(1).eval(null).asInstanceOf[Number].intValue()
        } else 32
        SimHashAgg(exprs.head, bits).toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_heavy_hitters"),
      info("graft_heavy_hitters",
        "graft_heavy_hitters(term, k) - Misra-Gries heavy-hitter candidate aggregate (array<string>)"),
      graft.functions.HeavyHittersAgg.build _))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      info("graft_bloom_contains",
        "graft_bloom_contains(value, filter_bytes) - Bloom-filter membership probe over a BIGINT hash"),
      graft.functions.BloomContains.build _))
    ext.injectFunction((
      FunctionIdentifier("graft_hash60"),
      info("graft_hash60", "graft_hash60(s) - first 60 bits of md5(s) as a non-negative BIGINT"),
      (exprs: Seq[Expression]) => Hash60(arity("graft_hash60", 1)(exprs).head)))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      info("graft_nfc", "graft_nfc(s) - Unicode NFC canonical-composition normalization"),
      (exprs: Seq[Expression]) =>
        graft.functions.NfcNormalize(arity("graft_nfc", 1)(exprs).head)))
    // Optimizer rule: users writing the portable HOF dot product get
    // the fused codegen'd expression automatically.
    ext.injectOptimizerRule(_ => graft.plans.FuseDotProduct)
    // Optimizer rule: registered materialized views answer matching
    // aggregates over their fact table (containment + freshness
    // gated; no-op while the MV catalog is empty).
    ext.injectOptimizerRule(_ => graft.plans.MvRewrite)
    // Physical strategy for the TopKPerKey logical operator (bounded
    // per-key heaps instead of a per-group sort).
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    // Physical strategy for the GlobalIndexPlan operator (Tungsten-
    // native dense global row numbering).
    ext.injectPlannerStrategy(_ => graft.plans.GlobalIndexStrategy)
  }
}
