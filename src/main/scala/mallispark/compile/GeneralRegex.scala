package mallispark.compile

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}
import mallispark.ir.SchemaIR
import mallispark.eval.RowEval

/** Tier-3 sequence-regex escape hatch (SURVEY §2.9).
  *
  * Bounded forms compile to pure Columns in SchemaCompiler; GENERAL forms
  * (nested/backtracking, e.g. `[:* [:catn ...]]`,
  * reference perf_test.cljc:345-349) run the RowEval backtracking matcher
  * as a row-local scalar UDF. Non-codegen — use only when the bounded
  * compilation can't express the schema. The UDF captures the IR
  * (Serializable ADT), so executors evaluate without driver round-trips. */
object GeneralRegex {

  /** Validator over an array<string> column. */
  def validStringSeq(ir: SchemaIR): Column => Column = {
    val f = F.udf((xs: Seq[String]) =>
      if (xs == null) false else RowEval.validate(ir, xs))
    col => f(col)
  }

  /** Validator over an array<long> column. Boxed element type: a
    * primitive Seq[Long] would NPE in the UDF deserializer on a null
    * element (containsNull is the Spark default) — a null element must
    * simply fail leaf validation like any other wrong value. */
  def validLongSeq(ir: SchemaIR): Column => Column = {
    val f = F.udf((xs: Seq[java.lang.Long]) =>
      if (xs == null) false
      else RowEval.validate(ir,
        xs.map(x => if (x == null) null else x.longValue())))
    col => f(col)
  }

  /** Violation row produced by the explain UDFs — field names match
    * SchemaCompiler.violStruct. */
  final case class ViolRow(path: String, in: String, error_key: String,
                           value: String)

  private def toRows(errs: Vector[RowEval.Err]): Seq[ViolRow] =
    errs.map(e => ViolRow(e.path.mkString("/"), e.in.mkString("/"), e.key,
      RowEval.errValueString(e.value)))

  private val nullErr = Seq(ViolRow("", "",
    mallispark.ir.SchemaIR.ErrorKeys.InvalidType, null))

  /** Positional explainer over an array<string> column (tier-3 analogue
    * of impl/regex.cljc:585-628): paths/ins are RELATIVE — the compiler
    * prefixes the static schema path and runtime in path. */
  def explainStringSeq(ir: SchemaIR): Column => Column = {
    val f = F.udf((xs: Seq[String]) =>
      if (xs == null) nullErr else toRows(RowEval.reExplain(ir, xs)))
    col => f(col)
  }

  /** Positional explainer over an array<long> column. */
  def explainLongSeq(ir: SchemaIR): Column => Column = {
    // boxed elements — see validLongSeq
    val f = F.udf((xs: Seq[java.lang.Long]) =>
      if (xs == null) nullErr
      else toRows(RowEval.reExplain(ir,
        xs.map(x => if (x == null) null else x.longValue()))))
    col => f(col)
  }

  /** Tier-3 parse → unparse round-trip probe over an array<string>
    * column (reParse/reUnparse, impl/regex.cljc:630-648 semantics):
    * struct(parsed, rt_ok, n_items) — `rt_ok` asserts the unparsed
    * flattening equals the input element-for-element; `n_items` is the
    * top-level parse-tree arity (iteration count for `:*`/`:+`/`:repeat`,
    * 1 for a tagged/plain root), so an oracle can check the tree SHAPE
    * without building the tree. */
  def parseRoundTripStringSeq(ir: SchemaIR): Column => Column = {
    val f = F.udf((xs: Seq[String]) =>
      if (xs == null) (false, false, null.asInstanceOf[java.lang.Integer])
      else RowEval.reParse(ir, xs) match {
        case Some(tree) =>
          val un = RowEval.reUnparse(ir, tree)
          val n: java.lang.Integer = tree match {
            case s: Seq[_] => s.length
            case _ => 1
          }
          (true, un == xs, n)
        case None => (false, false, null.asInstanceOf[java.lang.Integer])
      })
    col => f(col)
  }
}
