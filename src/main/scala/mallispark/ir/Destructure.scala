package mallispark.ir

/** Clojure arglist (destructuring-binding) → schema extraction — the
  * `malli.destructure` port (reference src/malli/destructure.cljc).
  *
  * The reference is self-hosting: its `Binding` grammar is ITSELF a malli
  * schema over seq-regex + map-like collections, and `parse` is `m/parse`
  * of that grammar (destructure.cljc:10-57). malli's regex parse is
  * PEG-greedy with ordered alternation (impl/regex.cljc:278-321 — the same
  * semantics as RowEval.reParse), and the Binding grammar is unambiguous
  * under it, so this port implements the grammar as a faithful greedy
  * recursive-descent parser over an EDN value universe, then runs the
  * reference's `-transform`/`-vector`/`-map`/`-keys` folds 1:1
  * (destructure.cljc:59-119).
  *
  * Host-specific residue (documented in COVERAGE.md): `infer` reads
  * Clojure Var metadata — here [[functionSchema]] takes the arglists
  * directly. One deterministic deviation: `-qualified-keys` and the
  * tag-entry fold iterate Clojure maps, whose order is platform-dependent
  * above 8 entries (the reference's own test pins DIFFERENT orders for
  * clj vs cljs, destructure_test.cljc:49-90); this port always uses
  * insertion order.
  *
  * Values: keywords/symbols are [[Kw]]/[[Sym]]; maps are [[VMap]] with
  * insertion-ordered pairs; vectors are scala Vector; ints are Long.
  * Output schemas are EDN forms in the same universe — [[Edn.print]]
  * renders them Clojure-style for the export_forms goldens. */
object Destructure {

  // ---- EDN value universe ---------------------------------------------

  final case class Kw(ns: Option[String], name: String) {
    override def toString: String = ":" + ns.fold("")(_ + "/") + name
  }
  object Kw { def apply(name: String): Kw = Kw(None, name) }

  final case class Sym(ns: Option[String], name: String) {
    override def toString: String = ns.fold("")(_ + "/") + name
  }
  object Sym { def apply(name: String): Sym = Sym(None, name) }

  /** Insertion-ordered map literal. */
  final case class VMap(pairs: Vector[(Any, Any)])

  /** A list form `(...)` — code, not data, in binding position (the
    * grammar rejects it); [[mallispark.ir.MiniEval]] evaluates it. */
  final case class VList(items: Vector[Any])

  /** Minimal EDN reader for binding forms: vectors, maps, keywords,
    * symbols, strings, integer longs, booleans, nil. Quote (') is
    * consumed transparently (fixtures come from quoted Clojure data). */
  object Edn {
    def read(s: String): Any = {
      val (v, rest) = readOne(s, skipWs(s, 0))
      require(skipWs(s, rest) >= s.length, s"trailing EDN input: ${s.drop(rest)}")
      v
    }

    private def skipWs(s: String, i0: Int): Int = {
      var i = i0
      while (i < s.length && (s(i).isWhitespace || s(i) == ',')) i += 1
      i
    }

    /** true while the collection at `j` is still open; a clean error on
      * unterminated input instead of StringIndexOutOfBounds. */
    private def open(s: String, j: Int, close: Char): Boolean = {
      require(j < s.length, s"unterminated EDN input (missing '$close')")
      s(j) != close
    }

    private def readOne(s: String, i0: Int): (Any, Int) = {
      val i = skipWs(s, i0)
      require(i < s.length, "unexpected end of EDN input")
      s(i) match {
        case '\'' => readOne(s, i + 1)
        case '[' =>
          var j = skipWs(s, i + 1)
          val items = Vector.newBuilder[Any]
          while (open(s, j, ']')) {
            val (v, j2) = readOne(s, j); items += v; j = skipWs(s, j2)
          }
          (items.result(), j + 1)
        case '(' =>
          var j = skipWs(s, i + 1)
          val items = Vector.newBuilder[Any]
          while (open(s, j, ')')) {
            val (v, j2) = readOne(s, j); items += v; j = skipWs(s, j2)
          }
          (VList(items.result()), j + 1)
        case '{' =>
          var j = skipWs(s, i + 1)
          val pairs = Vector.newBuilder[(Any, Any)]
          while (open(s, j, '}')) {
            val (k, j2) = readOne(s, j)
            val (v, j3) = readOne(s, skipWs(s, j2))
            pairs += (k -> v); j = skipWs(s, j3)
          }
          (VMap(pairs.result()), j + 1)
        case '"' =>
          val sb = new StringBuilder
          var j = i + 1
          while (open(s, j, '"')) {
            if (s(j) == '\\') {
              j += 1
              // bounds-check: a backslash at end-of-input is an
              // unterminated string, not an index crash
              require(j < s.length, "unterminated EDN input (missing '\"')")
              sb += (s(j) match {
                case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
                case c => c // covers \\ and \" (Edn.print's own output)
              })
            }
            else sb += s(j)
            j += 1
          }
          (sb.toString, j + 1)
        case _ =>
          var j = i
          while (j < s.length && !s(j).isWhitespace &&
                 !"[]{}()\",'".contains(s(j))) j += 1
          (atom(s.substring(i, j)), j)
      }
    }

    private def atom(t: String): Any =
      if (t == "true") java.lang.Boolean.TRUE
      else if (t == "false") java.lang.Boolean.FALSE
      else if (t == "nil") null
      else if (t.matches("-?\\d+")) java.lang.Long.valueOf(t)
      else if (t.matches("-?\\d+\\.\\d+([eE][+-]?\\d+)?"))
        java.lang.Double.valueOf(t)
      else if (t.startsWith(":")) ident(t.drop(1), Kw(_, _))
      else ident(t, Sym(_, _))

    private def ident[A](t: String, mk: (Option[String], String) => A): A = {
      val slash = t.indexOf('/')
      if (slash > 0 && slash < t.length - 1)
        mk(Some(t.substring(0, slash)), t.substring(slash + 1))
      else mk(None, t)
    }

    /** Clojure-style printing: `[:cat :any [:* :any]]`, map pairs
      * separated by `, ` (matching the engine's other EDN emitters). */
    def print(v: Any): String = v match {
      case null => "nil"
      case k: Kw => k.toString
      case s: Sym => s.toString
      case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      case b: java.lang.Boolean => b.toString
      case n: Long => n.toString
      case n: Int => n.toString
      case xs: Vector[_] => xs.map(print).mkString("[", " ", "]")
      case VList(items) => items.map(print).mkString("(", " ", ")")
      case VMap(ps) =>
        ps.map { case (k, x) => print(k) + " " + print(x) }
          .mkString("{", ", ", "}")
      case other => String.valueOf(other)
    }
  }

  // ---- grammar predicates (destructure.cljc:5-8) -----------------------

  private val Amp = Sym("&")
  private val AsKw = Kw("as")
  private val SepKw = Kw("-")

  private def symbol(x: Any): Option[Sym] = x match {
    case s: Sym if s != Amp => Some(s) // "Symbol" = [:and symbol? [:not "Amp"]]
    case _ => None
  }

  private def identV(x: Any): Boolean =
    x.isInstanceOf[Sym] || x.isInstanceOf[Kw]

  /** `-map-like?` — a map, or a seqable of 2-element vectors. */
  private def mapPairs(x: Any): Option[Vector[(Any, Any)]] = x match {
    case VMap(ps) => Some(ps)
    case xs: Vector[_] =>
      val ps = xs.collect { case p: Vector[_] if p.size == 2 => (p(0), p(1)) }
      if (ps.size == xs.size) Some(ps.toVector) else None
    case _ => None
  }

  /** `-qualified-key?` — qualified keyword named keys|syms. */
  private def qualifiedKeyDir(k: Any): Option[(String, Boolean)] = k match {
    case Kw(Some(ns), "keys") => Some((ns, true))
    case Kw(Some(ns), "syms") => Some((ns, false))
    case _ => None
  }

  private def qualifiedKw(x: Any): Boolean = x match {
    case Kw(Some(_), _) => true
    case _ => false
  }

  // ---- parse tree (the Binding grammar's tags) --------------------------

  final case class Options(inlineSchemas: Boolean = true,
                           sequentialMaps: Boolean = true,
                           references: Boolean = true,
                           requiredKeys: Boolean = false,
                           closedMaps: Boolean = false)

  /** One `"Arg"`: an ArgType plus an optional inline `:- schema`. */
  private final case class Arg(tpe: ArgType, schema: Option[Any])
  private sealed trait ArgType
  private final case class ASym(s: Sym) extends ArgType
  private final case class AMap(entries: Vector[MapEntry]) extends ArgType
  private final case class AVec(v: VecBind) extends ArgType

  /** A classified map-destructuring entry (the Map tuple branches,
    * destructure.cljc:18-26, tried in that order). */
  private sealed trait MapEntry
  private final case class EKeys(ids: Vector[Any]) extends MapEntry     // :keys
  private final case class EStrs(ids: Vector[Any]) extends MapEntry     // :strs
  private final case class ESyms(ids: Vector[Any]) extends MapEntry     // :syms
  private final case class EOr(defaults: Vector[(Sym, Any)]) extends MapEntry
  private final case class EAs(s: Sym) extends MapEntry
  private final case class EQual(ns: String, keys: Boolean,
                                 ids: Vector[Any]) extends MapEntry
  private final case class ETag(arg: Arg, value: Any) extends MapEntry

  /** `"Vector"` parse: elems + rest + :as (with optional as-schema). */
  private final case class VecBind(elems: Vector[Arg], rest: Option[Arg],
                                   as: Option[(Sym, Option[Any])])
  /** `"Binding"` parse: elems + rest. */
  private final case class Bind(elems: Vector[Arg], rest: Option[Arg])

  final class InvalidArglist(msg: String)
      extends IllegalArgumentException(msg)

  private def fail(msg: String): Nothing = throw new InvalidArglist(msg)

  // ---- the Binding grammar as greedy recursive descent -------------------
  // Faithful to m/parse of the schema: ordered :alt/:orn alternation with
  // greedy repetition. The grammar is LL here because `:-`, `&` and `:as`
  // can never begin an ArgType, so the only regex "backtrack" (an Arg
  // without vs with a schema tail) is decided by one token of lookahead.

  private def parseArgType(x: Any, opts: Options): ArgType =
    symbol(x).map(ASym) // :orn branch order: sym, map, vec
      .orElse(mapPairs(x).map(ps => AMap(ps.map(classifyEntry(_, opts)))))
      .orElse(x match {
        case xs: Vector[_] => Some(AVec(parseVector(xs.toVector, opts)))
        case _ => None
      })
      .getOrElse(fail(s"not a binding form: ${Edn.print(x)}"))

  private def classifyEntry(p: (Any, Any), opts: Options): MapEntry = {
    val (k, v) = p
    def idVec(x: Any): Option[Vector[Any]] = x match {
      case xs: Vector[_] if xs.forall(identV) => Some(xs.toVector)
      case _ => None
    }
    (k, v) match {
      case (Kw(None, "keys"), _) if idVec(v).isDefined => EKeys(idVec(v).get)
      case (Kw(None, "strs"), _) if idVec(v).isDefined => EStrs(idVec(v).get)
      case (Kw(None, "syms"), _) if idVec(v).isDefined => ESyms(idVec(v).get)
      case (Kw(None, "or"), _) =>
        mapPairs(v).flatMap { ps =>
          val ds = ps.collect { case (s: Sym, d) if s.ns.isEmpty => (s, d) }
          if (ds.size == ps.size) Some(EOr(ds)) else None
        }.getOrElse(fail(s":or defaults must be a map of simple symbols: ${Edn.print(v)}"))
      case (AsKw, _) =>
        symbol(v).map(EAs).getOrElse(fail(s":as needs a symbol: ${Edn.print(v)}"))
      case _ =>
        qualifiedKeyDir(k).flatMap { case (ns, isKeys) =>
          idVec(v).map(EQual(ns, isKeys, _))
        }.getOrElse {
          // [:tuple [:ref "ArgType"] any?] — the key itself must be a
          // binding form; anything else (e.g. ::keysz) is invalid
          ETag(Arg(parseArgType(k, opts), None), v)
        }
    }
  }

  /** Parse one Arg at position i; returns (Arg, next position). */
  private def parseArg(xs: Vector[Any], i: Int, opts: Options): (Arg, Int) = {
    val at = parseArgType(xs(i), opts)
    if (i + 1 < xs.size && xs(i + 1) == SepKw) {
      // "Separator" is Never when inline schemas are off (destructure.cljc:17):
      // the `:-` token then matches nothing and the whole parse fails
      if (!opts.inlineSchemas) fail("inline schemas are disabled (:-)")
      if (i + 2 >= xs.size) fail("dangling :- (missing schema)")
      (Arg(at, Some(xs(i + 2))), i + 3)
    } else (Arg(at, None), i + 1)
  }

  private def parseElemsRest(xs: Vector[Any], opts: Options): (Vector[Arg], Option[Arg], Int) = {
    val elems = Vector.newBuilder[Arg]
    var i = 0
    while (i < xs.size && xs(i) != Amp && xs(i) != AsKw) {
      val (a, i2) = parseArg(xs, i, opts); elems += a; i = i2
    }
    val rest =
      if (i < xs.size && xs(i) == Amp) {
        if (i + 1 >= xs.size) fail("dangling &")
        val (a, i2) = parseArg(xs, i + 1, opts); i = i2; Some(a)
      } else None
    (elems.result(), rest, i)
  }

  private def parseBinding(xs: Vector[Any], opts: Options): Bind = {
    val (elems, rest, i) = parseElemsRest(xs, opts)
    if (i != xs.size) fail(s"unparsed binding tail: ${Edn.print(xs.drop(i))}")
    Bind(elems, rest)
  }

  private def parseVector(xs: Vector[Any], opts: Options): VecBind = {
    val (elems, rest, i0) = parseElemsRest(xs, opts)
    var i = i0
    val as =
      if (i < xs.size && xs(i) == AsKw) {
        if (i + 1 >= xs.size) fail("dangling :as")
        val s = symbol(xs(i + 1)).getOrElse(fail(":as needs a symbol"))
        i += 2
        val sch =
          if (i < xs.size && xs(i) == SepKw) {
            if (!opts.inlineSchemas) fail("inline schemas are disabled (:-)")
            if (i + 1 >= xs.size) fail("dangling :- (missing schema)")
            i += 2; Some(xs(i - 1))
          } else None
        Some((s, sch))
      } else None
    if (i != xs.size) fail(s"unparsed binding tail: ${Edn.print(xs.drop(i))}")
    VecBind(elems, rest, as)
  }

  // ---- the transform folds (destructure.cljc:59-110) ---------------------

  private val AnyKw = Kw("any")

  private def isMaybe(s: Any): Boolean = s match {
    case xs: Vector[_] => xs.headOption.contains(Kw("maybe"))
    case _ => false
  }

  /** `-transform`: inline schema wins outright (the reference's
    * `(and schema rest)` arm recomputes `s` from the :values map, which
    * always lands on :any — destructure.cljc:98-104 — so both schema arms
    * return the schema). */
  private def transform(a: Arg, opts: Options, rest: Boolean): Any =
    a.schema.getOrElse(a.tpe match {
      case AVec(v) => vectorSchema(v, opts)
      case AMap(es) => mapSchema(es, opts, rest)
      case ASym(_) => if (rest) Vector(Kw("*"), AnyKw) else AnyKw
    })

  private def vectorSchema(v: VecBind, opts: Options): Any =
    v.as.flatMap(_._2) match {
      case Some(s) => Vector(Kw("schema"), s) // as-schema override (:65)
      case None =>
        val ess = v.elems.map { e =>
          val s = transform(e, opts, rest = false)
          if (isMaybe(s)) s else Vector(Kw("?"), s)
        }
        val rs = v.rest.map(transform(_, opts, rest = true))
          .getOrElse(Vector(Kw("*"), AnyKw))
        Vector(Kw("maybe"), Vector(Kw("cat")) ++ ess :+ rs)
    }

  /** `-keys` (destructure.cljc:70-81): ordered [key, type] pairs. */
  private def keyPairs(es: Vector[MapEntry], opts: Options): Vector[(Any, Any)] = {
    def toKw(x: Any): Any = x match { // (keyword x) — identity on keywords
      case s: Sym => Kw(s.ns, s.name)
      case k: Kw => k
      case other => other
    }
    def toStr(x: Any): Any = x match { // (str x)
      case s: Sym => s.toString
      case k: Kw => k.toString
      case other => String.valueOf(other)
    }
    val out = Vector.newBuilder[(Any, Any)]
    es.foreach {
      case EKeys(ids) => ids.foreach(x => out += (toKw(x) -> AnyKw))
      case EStrs(ids) => ids.foreach(x => out += (toStr(x) -> AnyKw))
      case ESyms(ids) => ids.foreach(x => out += (x -> AnyKw))
      case _ => ()
    }
    es.foreach { // -qualified-keys, insertion order (see scaladoc)
      case EQual(ns, isKeys, ids) =>
        ids.foreach { v =>
          val k: Any = if (isKeys) Kw(Some(ns), symName(v))
                       else Sym(Some(ns), symName(v))
          val t: Any = if (opts.references && qualifiedKw(k)) k else AnyKw
          out += (k -> t)
        }
      case _ => ()
    }
    es.foreach { // tag entries: [entry-value, transformed key-binding]
      case ETag(arg, value) =>
        out += (value -> transform(arg, opts, rest = false))
      case _ => ()
    }
    out.result().distinct
  }

  private def symName(x: Any): String = x match {
    case s: Sym => s.name
    case k: Kw => k.name
    case other => String.valueOf(other)
  }

  /** `-map` (destructure.cljc:83-96). */
  private def mapSchema(es: Vector[MapEntry], opts: Options, rest: Boolean): Any = {
    val keys = keyPairs(es, opts)
    def entry(k: Any, t: Any): Any = {
      val ref = opts.references && qualifiedKw(k)
      if (ref && opts.requiredKeys) k
      else if (opts.requiredKeys) Vector(k, t)
      else {
        val base = Vector(k, VMap(Vector(Kw("optional") -> true)))
        if (ref) base else base :+ t
      }
    }
    def argAlt(k: Any, t: Any): Any =
      Vector(Kw("cat"), Vector(Kw("="), k),
        if (opts.references && qualifiedKw(k)) k else t)
    val schema: Any =
      (Vector(Kw("map")) ++
        (if (opts.closedMaps) Vector(VMap(Vector(Kw("closed") -> true))) else Vector.empty)) ++
        keys.map { case (k, t) => entry(k, t) }
    if (rest || opts.sequentialMaps) {
      val alts = Vector(Kw("alt")) ++ keys.map { case (k, t) => argAlt(k, t) } ++
        (if (!opts.closedMaps)
          Vector(Vector(Kw("cat"),
            Vector(Kw("not"), Vector(Kw("enum")) ++ keys.map(_._1)),
            AnyKw))
         else Vector.empty)
      val starred = Vector(Kw("*"), alts)
      val args: Any = if (!rest) Vector(Kw("schema"), starred) else starred
      Vector(Kw("orn"), Vector(Kw("map"), schema), Vector(Kw("args"), args))
    } else schema
  }

  /** `-schema` (destructure.cljc:106-110): the whole Binding → [:cat ...],
    * or the bare :cat keyword for an empty binding. */
  private def bindSchema(b: Bind, opts: Options): Any =
    if (b.elems.isEmpty && b.rest.isEmpty) Kw("cat")
    else Vector(Kw("cat")) ++
      b.elems.map(transform(_, opts, rest = false)) ++
      b.rest.map(transform(_, opts, rest = true))

  // ---- arglist reconstruction (`-unschematize` + unparse, :112-113) ------

  private def plainArg(a: Arg): Any = plainArgType(a.tpe)

  private def plainArgType(t: ArgType): Any = t match {
    case ASym(s) => s
    case AVec(v) =>
      (v.elems.map(plainArg) ++
        v.rest.toVector.flatMap(r => Vector(Amp, plainArg(r))) ++
        v.as.toVector.flatMap { case (s, _) => Vector(AsKw: Any, s) }).toVector
    case AMap(es) =>
      VMap(es.map {
        case EKeys(ids) => (Kw("keys"): Any) -> (ids: Any)
        case EStrs(ids) => (Kw("strs"): Any) -> (ids: Any)
        case ESyms(ids) => (Kw("syms"): Any) -> (ids: Any)
        case EOr(ds) => (Kw("or"): Any) ->
          (VMap(ds.map { case (s, d) => (s: Any, d) }): Any)
        case EAs(s) => (AsKw: Any) -> (s: Any)
        case EQual(ns, isKeys, ids) =>
          (Kw(Some(ns), if (isKeys) "keys" else "syms"): Any) -> (ids: Any)
        case ETag(arg, value) => (plainArg(arg): Any) -> value
      })
  }

  private def plainBinding(b: Bind): Vector[Any] =
    (b.elems.map(plainArg) ++
      b.rest.toVector.flatMap(r => Vector(Amp, plainArg(r)))).toVector

  // ---- public api (destructure.cljc:125-167) ------------------------------

  final case class ParseResult(rawArglist: Any, arglist: Any, schema: Any) {
    def schemaForm: String = Edn.print(schema)
    def arglistForm: String = Edn.print(arglist)
  }

  /** `md/parse`: binding vector (EDN value or string) → schema + plain
    * arglist. Throws [[InvalidArglist]] on malformed bindings, like the
    * reference's `-fail!` (destructure.cljc:161). */
  def parse(arglist: Any, options: Options = Options()): ParseResult = {
    val xs = arglist match {
      case s: String => Edn.read(s) match {
        case v: Vector[_] => v.toVector
        case other => fail(s"arglist must be a vector: ${Edn.print(other)}")
      }
      case v: Vector[_] => v.toVector
      case other => fail(s"arglist must be a vector: ${Edn.print(other)}")
    }
    val parsed = parseBinding(xs.asInstanceOf[Vector[Any]], options)
    ParseResult(xs, plainBinding(parsed), bindSchema(parsed, options))
  }

  /** `md/-function-schema`: one `[:=> input :any]` per arglist, wrapped in
    * `[:function ...]` when there are several (destructure.cljc:115-119). */
  def functionSchema(arglists: Seq[Any], options: Options = Options()): Any = {
    val fns = arglists.map(a =>
      Vector(Kw("=>"), parse(a, options).schema, AnyKw): Any)
    if (fns.sizeIs > 1) Vector(Kw("function")) ++ fns else fns.head
  }

  /** `md/infer` minus the Var scraping: the caller passes the arglists
    * (the reference reads them off Var metadata, destructure.cljc:164-167,
    * which has no Scala analogue). */
  def infer(arglists: Seq[Any], options: Options = Options()): Any =
    functionSchema(arglists, options)
}
