package mallispark.ir

import java.time.Instant
import SchemaIR._

/** Schema DSL — the Scala analogue of malli's vector syntax
  * (`[:map [:x int?] ...]`, parsed by m/schema core.cljc:2567-2589).
  *
  * {{{
  * import mallispark.ir.S._
  * val page = map(closed = true)(
  *   "url"     -> re("^https?://[^\\s]+$"),
  *   "warc_ts" -> instant(min = Some(t0), max = Some(t1)),
  *   "html"    -> bytes,
  *   "text"    -> string(min = 1),
  *   "lang"    -> enum_("en", "de", "fr"))
  * }}}
  */
object S {
  val any: SchemaIR = SAny
  val nil: SchemaIR = SNil
  val some: SchemaIR = SSome
  val boolean: SchemaIR = SBoolean
  val bytes: SchemaIR = SBinary
  val uuid: SchemaIR = SUuid

  /** Ident/char predicate leaves (core.cljc:828-831) — validate the
    * canonical string form (see SIdent scaladoc). */
  val keyword: SchemaIR = SIdent("keyword")
  val simpleKeyword: SchemaIR = SIdent("simple-keyword")
  val qualifiedKeyword: SchemaIR = SIdent("qualified-keyword")
  val symbol: SchemaIR = SIdent("symbol")
  val simpleSymbol: SchemaIR = SIdent("simple-symbol")
  val qualifiedSymbol: SchemaIR = SIdent("qualified-symbol")
  val char: SchemaIR = SIdent("char")

  /** `:float` — same value space as `:double` in the engine (a parquet
    * FloatType column widens losslessly; core.cljc:825 float-schema). */
  def float: SchemaIR = SDouble()

  def string: SchemaIR = SString()
  def string(min: Int = -1, max: Int = -1): SchemaIR =
    SString(if (min >= 0) Some(min) else None, if (max >= 0) Some(max) else None)

  def int: SchemaIR = SInt()
  def int(min: Long, max: Long): SchemaIR = SInt(Some(min), Some(max))
  def intMin(min: Long): SchemaIR = SInt(Some(min), None)
  def intMax(max: Long): SchemaIR = SInt(None, Some(max))
  /** pos-int? (core.cljc:2936). */
  def posInt: SchemaIR = SInt(Some(1L), None)
  /** neg-int? */
  def negInt: SchemaIR = SInt(None, Some(-1L))
  /** nat-int? */
  def natInt: SchemaIR = SInt(Some(0L), None)

  def double: SchemaIR = SDouble()
  def double(min: Double, max: Double): SchemaIR = SDouble(Some(min), Some(max))

  def instant(min: Option[Instant] = None, max: Option[Instant] = None): SchemaIR =
    STimestamp(min, max)
  def date(min: Option[String] = None, max: Option[String] = None): SchemaIR =
    SDate(min, max)

  /** :time/... family (experimental/time.cljc:85-100); bounds are ISO-8601
    * strings of the kind. */
  def duration(min: Option[String] = None, max: Option[String] = None): SchemaIR =
    STime("duration", min, max)
  def period(min: Option[String] = None, max: Option[String] = None): SchemaIR =
    STime("period", min, max)
  def localTime(min: Option[String] = None, max: Option[String] = None): SchemaIR =
    STime("local-time", min, max)
  def localDateTime(min: Option[String] = None, max: Option[String] = None): SchemaIR =
    STime("local-date-time", min, max)
  def offsetDateTime(min: Option[String] = None, max: Option[String] = None): SchemaIR =
    STime("offset-date-time", min, max)
  val offsetTime: SchemaIR = STime("offset-time")
  val zonedDateTime: SchemaIR = STime("zoned-date-time")
  val zoneId: SchemaIR = STime("zone-id")
  val zoneOffset: SchemaIR = STime("zone-offset")

  def enum_(values: Any*): SchemaIR = SEnum(values)
  def re(pattern: String): SchemaIR = SRegex(pattern)

  def gt(v: Any): SchemaIR = SCompare(">", v)
  def gte(v: Any): SchemaIR = SCompare(">=", v)
  def lt(v: Any): SchemaIR = SCompare("<", v)
  def lte(v: Any): SchemaIR = SCompare("<=", v)
  def eq_(v: Any): SchemaIR = SCompare("=", v)
  def neq(v: Any): SchemaIR = SCompare("not=", v)

  def fn(name: String)(f: Any => Boolean): SchemaIR = SFn(name, f)

  /** String-sourced `:fn` — compiled by [[MiniEval]] (the sci-subset
    * interpreter), so it serializes to executors and round-trips through
    * EDN forms/AST as a REAL function. */
  def fnS(src: String): SchemaIR = SFn(src, MiniEval.compile(src).pred)
  def validate(name: String)(f: Any => Seq[ValidateErr]): SchemaIR =
    SValidate(name, f)

  def maybe(c: SchemaIR): SchemaIR = SMaybe(c)
  def and(cs: SchemaIR*): SchemaIR = SAnd(cs)
  def or(cs: SchemaIR*): SchemaIR = SOr(cs)
  def orn(branches: (String, SchemaIR)*): SchemaIR = SOrn(branches)
  def custom(name: String,
             colPred: (org.apache.spark.sql.Column,
               org.apache.spark.sql.types.DataType) =>
               org.apache.spark.sql.Column,
             rowPred: Any => Boolean): SchemaIR =
    SCustom(name, colPred, rowPred)
  def andn(branches: (String, SchemaIR)*): SchemaIR = SAndn(branches)
  def not(c: SchemaIR): SchemaIR = SNot(c)

  /** Map entry helpers. */
  def req(key: String, child: SchemaIR): Entry = Entry(key, child)
  def opt(key: String, child: SchemaIR): Entry =
    Entry(key, child, optional = true)
  def withDefault(key: String, child: SchemaIR, default: Any): Entry =
    Entry(key, child, optional = true, default = Some(default))

  def map(entries: (String, SchemaIR)*): SchemaIR =
    SMap(entries.map { case (k, c) => Entry(k, c) })
  def map(closed: Boolean)(entries: (String, SchemaIR)*): SchemaIR =
    SMap(entries.map { case (k, c) => Entry(k, c) }, closed)
  def mapE(closed: Boolean, entries: Entry*): SchemaIR = SMap(entries, closed)

  def mapOf(k: SchemaIR, v: SchemaIR, min: Option[Int] = None,
            max: Option[Int] = None): SchemaIR = SMapOf(k, v, min, max)

  def vector(c: SchemaIR, min: Option[Int] = None,
             max: Option[Int] = None): SchemaIR = SVector(c, min, max)
  def set(c: SchemaIR, min: Option[Int] = None,
          max: Option[Int] = None): SchemaIR = SSet(c, min, max)
  def seqable(c: SchemaIR, min: Option[Int] = None,
              max: Option[Int] = None): SchemaIR = SSeqable(c, min, max)
  def every(c: SchemaIR, min: Option[Int] = None, max: Option[Int] = None,
            limit: Int = 101): SchemaIR = SEvery(c, min, max, limit)
  def tuple(cs: SchemaIR*): SchemaIR = STuple(cs)

  def multi(dispatchKey: String, default: Option[SchemaIR] = None)(
      branches: (String, SchemaIR)*): SchemaIR =
    SMulti(dispatchKey, branches, default)

  /** :multi with an arbitrary dispatch (core.cljc:1876-1890): `dispatch`
    * builds a Column expression (codegen'd), `dispatchRow` is its
    * row-level twin for RowEval duality. */
  def multiExpr(name: String,
                dispatch: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                dispatchRow: Any => String,
                default: Option[SchemaIR] = None)(
      branches: (String, SchemaIR)*): SchemaIR =
    SMultiExpr(name, dispatch, dispatchRow, branches, default)

  /** :map with a ::m/default rest-entry schema (core.cljc:586-587). */
  def mapRest(rest: SchemaIR, entries: Entry*): SchemaIR =
    SMap(entries, closed = false, rest = Some(rest))

  def ref(name: String): SchemaIR = SRef(name)

  /** `:schema` with a local `{:registry {...}}` property — self-contained
    * recursive schemas (core.cljc:2066-2152). */
  def scoped(registry: (String, SchemaIR)*)(child: SchemaIR): SchemaIR =
    SScoped(registry.toMap, child)

  /** Declarative schema-algebra nodes (util.cljc:394-418) — serializable,
    * expanded structurally at compile time. */
  def mergeOf(cs: SchemaIR*): SchemaIR = SMergeOf(cs)
  def unionOf(cs: SchemaIR*): SchemaIR = SUnionOf(cs)
  def selectKeysOf(c: SchemaIR, keys: String*): SchemaIR =
    SSelectKeysOf(c, keys)

  def cat(cs: SchemaIR*): SchemaIR = SCat(cs)
  def catn(es: (String, SchemaIR)*): SchemaIR = SCatn(es)
  def alt(cs: SchemaIR*): SchemaIR = SAlt(cs)
  def altn(entries: (String, SchemaIR)*): SchemaIR = SAltn(entries)
  def star(c: SchemaIR): SchemaIR = SStar(c)
  def plus(c: SchemaIR): SchemaIR = SPlus(c)
  def optional(c: SchemaIR): SchemaIR = SOpt(c)
  def repeat(c: SchemaIR, min: Int, max: Int): SchemaIR = SRepeat(c, min, max)
}
