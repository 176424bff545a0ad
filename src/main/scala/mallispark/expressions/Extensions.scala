package mallispark.expressions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo,
  Literal, RLike}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** SQL registration for the custom codegen kernels (SURVEY §2.12;
  * builder-contract "custom Expression ... registered via
  * SparkSessionExtensions"): after enabling, `spark.sql` can call
  *
  * {{{
  *   SELECT shingle_minhash(text, 3, 8)   -- portable md5 minima
  *        , shingle_h60set(text, 3)       -- sorted 60-bit shingle set
  *        , simhash_portable(text)        -- [hi32, lo32] vote hashes
  *        , minhash_from_text(text, 3, 8) -- engine-native xxhash ring
  *   FROM documents
  * }}}
  *
  * Enable with `.withExtensions(new MallisparkExtensions)` on the
  * session builder, or `spark.sql.extensions=mallispark.expressions.
  * MallisparkExtensions` in config; `MallisparkExtensions.register`
  * injects into an ALREADY-RUNNING session (tests, notebooks). The
  * integer parameters must be literals — they parameterize generated
  * code, exactly like the Scala `Column` builders. */
class MallisparkExtensions extends (SparkSessionExtensions => Unit) {
  import MallisparkExtensions._
  override def apply(ext: SparkSessionExtensions): Unit = {
    functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => SimpleRegexRule)
  }
}

/** Optimizer rule: any `RLike` against a LITERAL pattern in the
  * anchored prefix+class subset becomes the [[AnchoredScanMatch]]
  * byte-scan kernel — `spark.sql("url RLIKE '^https?://[^\\s]+$'")`
  * plans run the kernel without the caller knowing it exists. Exact
  * rlike semantics by construction (see AnchoredScan); idempotent
  * (rewrites RLike nodes only, introduces none). */
object SimpleRegexRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case RLike(child, Literal(p: UTF8String, _))
          if child.dataType.isInstanceOf[StringType] &&
            AnchoredScan.compile(p.toString).isDefined =>
        AnchoredScanMatch(child, p.toString)
    }
}

object MallisparkExtensions {

  private def litInt(e: Expression, what: String): Int = e match {
    case lit if lit.foldable =>
      lit.eval().asInstanceOf[Number].intValue
    case other => throw new IllegalArgumentException(
      s"$what must be a literal integer, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[MallisparkExtensions].getName,
      null, name, usage, "")

  /** (name, info, builder) triples shared by the extension injector and
    * the live-session registrar. */
  val functions: Seq[(String, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    ("shingle_minhash", info("shingle_minhash",
      "shingle_minhash(text, n, k) — portable md5 minhash minima"),
      (es: Seq[Expression]) =>
        ShingleMinHash(es.head, litInt(es(1), "n"), litInt(es(2), "k"))),
    ("shingle_h60set", info("shingle_h60set",
      "shingle_h60set(text, n) — sorted distinct 60-bit shingle hashes"),
      (es: Seq[Expression]) =>
        ShingleH60Set(es.head, litInt(es(1), "n"))),
    ("simhash_portable", info("simhash_portable",
      "simhash_portable(text) — [hi32, lo32] md5 token-vote simhash"),
      (es: Seq[Expression]) => SimHashPortable(es.head)),
    ("minhash_from_text", info("minhash_from_text",
      "minhash_from_text(text, n, k) — engine-native xxhash minima"),
      (es: Seq[Expression]) =>
        MinHashFromText(es.head, litInt(es(1), "n"), litInt(es(2), "k"))))

  /** Register into a live session (the extension point only applies at
    * session construction): SQL functions plus the RLike→AnchoredScan
    * rewrite through the public `experimental.extraOptimizations` hook. */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), inf, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(SimpleRegexRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SimpleRegexRule
  }
}
