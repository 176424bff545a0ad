package mallispark.ir

import SchemaIR._

/** clj-kondo linter-config emitter — the last §2.2 emitter surface
  * (reference: clj_kondo.cljc:9-180 `accept` multimethod + `transform`,
  * clj_kondo.cljc:217-236 `from`/`linter-config`).
  *
  * The reference walks a schema bottom-up mapping every node to a
  * clj-kondo TYPE TAG (`:int`, `:string`, `{:op :keys ...}`, ...), then
  * folds registered function schemas into the
  * `{:linters {:type-mismatch {:namespaces ...}}}` config map that
  * clj-kondo imports. Both halves are pure data transforms, so they
  * carry over 1:1; only the Clojure var/namespace *collection* machinery
  * (`m/function-schemas` registry scraping) is host-specific — callers
  * here pass [[FnDef]]s explicitly.
  *
  * EDN is printed Clojure-style (`{:a 1, :b 2}`), single-line — the
  * reference pretty-prints via fipp at width 120; goldens compare the
  * canonical one-line form. */
object CljKondo {

  /** clj-kondo type expression. */
  sealed trait K
  /** A bare tag keyword, e.g. `:int`, `:nilable/string`. */
  final case class KKw(name: String) extends K
  /** `{:op :keys, :opt {...}, :req {...}}` (clj_kondo.cljc:76-79);
    * `:nilable true` is assoc'd LAST by the `:maybe` rule (:98-100). */
  final case class KKeys(opt: Seq[(String, K)], req: Seq[(String, K)],
                         nilable: Boolean = false) extends K
  /** Argument vector from `:cat`/`:catn` (clj_kondo.cljc:136-137). */
  final case class KVec(items: Seq[K]) extends K
  /** `{:op :rest :spec ...}` — varargs tail (clj_kondo.cljc:125-128). */
  final case class KRest(spec: K) extends K

  private val kw = (s: String) => KKw(s)

  /** Schema → clj-kondo type (the `accept` table, clj_kondo.cljc:12-128).
    * `varargs` plays the reference's `{:arity :varargs}` option: a
    * top-level seq-regex repetition becomes `{:op :rest}` instead of
    * `:seqable`. */
  def transform(ir: SchemaIR, varargs: Boolean = false): K = ir match {
    case SAny | SSome => kw("any") // any?/some? (:12-13)
    case SNil => kw("nil")
    case _: SString => kw("string")
    case _: SInt => kw("int")
    case _: SDouble => kw("double")
    case SBoolean => kw("boolean")
    case SBinary => kw("char-sequence") // bytes? (:59)
    case SUuid => kw("any") // uuid? (:37)
    case SIdent(k, _) => k match {
      case "keyword" | "simple-keyword" | "qualified-keyword" => kw("keyword")
      case "char" => kw("char")
      case _ => kw("symbol")
    }
    // inst?/time leaves have no kondo mapping → ::default :any (:39)
    case _: STimestamp | _: SDate | _: STime => kw("any")
    case _: SRegex => kw("string") // :re (:105)
    case SEnum(vs) => // per-value-type narrowing (:84-96)
      // keywords travel as their canonical ":name" string form in this
      // engine (see SIdent scaladoc) — a leading ':' narrows to :keyword
      // like the reference's (keyword? child) branch; bare strings are
      // strings (Clojure symbols have no distinct data-plane encoding,
      // so the reference's :symbol branch is unreachable here)
      val tags = vs.map {
        case s: String if s.startsWith(":") => "keyword"
        case _: String => "string"
        case _: Char => "char"
        case _: Int | _: Long => "int"
        case _: Double | _: Float => "number"
        case _ => "any"
      }.distinct
      if (tags.size == 1) kw(tags.head) else kw("any")
    case SCompare(op, _) =>
      if (op == "=" || op == "not=") kw("any") else kw("number") // :63-68
    case _: SFn | _: SCustom | _: SValidate => kw("any") // :fn (:106)
    case SMaybe(c) => transform(c) match { // :98-100
      case k: KKeys => k.copy(nilable = true)
      case KKw(n) if n != "any" => kw("nilable/" + n)
      case other => other
    }
    case _: SAnd | _: SOr | _: SOrn | _: SAndn | _: SNot => kw("any") // :70-74
    case SMap(entries, _, _) => // :76-79: {:op :keys} + opt + req
      val (opt, req) = entries.partition(_.optional)
      KKeys(opt.map(e => e.key -> transform(e.child)),
        req.map(e => e.key -> transform(e.child)))
    case _: SMapOf => kw("map") // :80
    case _: SVector => kw("vector")
    case _: SSeqable => kw("seqable") // clj_kondo.cljc :seqable accept
    case _: SSet => kw("set")
    case _: SEvery => kw("any") // :every has no accept → ::default
    case _: STuple => kw("seqable") // :103
    case _: SMulti | _: SMultiExpr => kw("any") // :104
    case _: SRef => kw("any") // :107
    case SScoped(reg, c, _) => // :schema derefs then transforms (:108)
      transform(SchemaOps.expand(c, Registry(reg)), varargs)
    case SProps(_, c) => transform(c, varargs)
    // :merge/:union/:select-keys deref to their expansion (:140-142)
    case d @ (_: SMergeOf | _: SUnionOf | _: SSelectKeysOf) =>
      transform(SchemaOps.expand(d))
    case SStar(c) => seqableOrRest(c, varargs) // :125-133
    case SPlus(c) => seqableOrRest(c, varargs)
    case SOpt(c) => seqableOrRest(c, varargs)
    case SRepeat(c, _, _) => seqableOrRest(c, varargs)
    case SCat(cs) => KVec(cs.map(transform(_))) // :136
    case SCatn(es) => KVec(es.map(e => transform(e._2))) // :137
    case _: SAlt | _: SAltn => kw("any") // :138-139
  }

  private def seqableOrRest(c: SchemaIR, varargs: Boolean): K =
    if (varargs) KRest(transform(c)) else kw("seqable")

  /** One registered function arity (the reference's `from` input,
    * clj_kondo.cljc:217-229): `rest` marks a varargs tail schema. */
  final case class FnDef(ns: String, name: String, args: Seq[SchemaIR],
                         ret: SchemaIR, rest: Option[SchemaIR] = None)

  def fromFnSchema(ns: String, name: String,
                   sch: mallispark.gen.FnSchemas.FnSchema): FnDef =
    FnDef(ns, name, sch.input, sch.output)

  /** `{:linters ...}` config (clj_kondo.cljc:246-253 `linter-config`):
    * the `:unresolved-symbol` exclusion first, then every FnDef
    * assoc'd under `:type-mismatch :namespaces ns name :arities arity`
    * (`:varargs` + `:min-arity` when a rest schema is present). */
  def linterConfig(fns: Seq[FnDef]): String = {
    val byNs = groupedInOrder(fns)(_.ns)
    val nsEntries = byNs.map { case (ns, defs) =>
      val byName = groupedInOrder(defs)(_.name)
      val fnEntries = byName.map { case (name, arities) =>
        val as = arities.map { d =>
          val argv = KVec(d.args.map(transform(_)) ++
            d.rest.map(r => KRest(transform(r))))
          val arityKey = if (d.rest.isDefined) ":varargs"
                         else d.args.size.toString
          val minArity =
            if (d.rest.isDefined) s", :min-arity ${d.args.size}" else ""
          s"$arityKey {:args ${edn(argv)}, :ret ${edn(transform(d.ret))}" +
            minArity + "}"
        }.mkString(", ")
        s"$name {:arities {$as}}"
      }.mkString(", ")
      s"$ns {$fnEntries}"
    }.mkString(", ")
    "{:linters {:unresolved-symbol {:exclude [(malli.core/=>)]}, " +
      s":type-mismatch {:namespaces {$nsEntries}}}}"
  }

  private def groupedInOrder[A](xs: Seq[A])(key: A => String): Seq[(String, Seq[A])] =
    xs.map(key).distinct.map(k => k -> xs.filter(a => key(a) == k))

  /** Clojure-style EDN: `{:a 1, :b 2}`, keywords for map keys/tags. */
  def edn(k: K): String = k match {
    case KKw(n) => ":" + n
    case KVec(items) => items.map(edn).mkString("[", " ", "]")
    case KRest(spec) => s"{:op :rest, :spec ${edn(spec)}}"
    case KKeys(opt, req, nilable) =>
      val parts = Seq("op" -> ":keys").map { case (k2, v) => s":$k2 $v" } ++
        (if (opt.nonEmpty)
          Seq(":opt " + opt.map { case (k2, v) => s":$k2 ${edn(v)}" }
            .mkString("{", ", ", "}"))
        else Nil) ++
        (if (req.nonEmpty)
          Seq(":req " + req.map { case (k2, v) => s":$k2 ${edn(v)}" }
            .mkString("{", ", ", "}"))
        else Nil) ++
        (if (nilable) Seq(":nilable true") else Nil)
      parts.mkString("{", ", ", "}")
  }
}
