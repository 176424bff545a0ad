package mallispark.ir

import SchemaIR._

/** Schema serialization — the reference's export surface (SURVEY §2.2):
  * `m/ast`/`from-ast` (core.cljc:2865-2892) as a JSON round-trip, and
  * JSON-Schema export (src/malli/json_schema.cljc:210-225). The DDL dual
  * lives in SchemaCompiler.toStructType. */
object Export {

  // ---- AST: JSON round-trip (m/ast / m/from-ast) --------------------------

  /** Deserialize an `:fn` name: a MiniEval source compiles into a REAL
    * predicate (the sci round-trip); an opaque name — or a source using
    * symbols outside MiniEval's builtin table (e.g. a full-sci reference
    * form like `(fn [x] (re-find ...))`) — keeps the permissive
    * name-only placeholder rather than failing the whole schema load. */
  private def fnFromName(n: String): SFn =
    if (MiniEval.isFnSource(n))
      try SFn(n, MiniEval.compile(n).pred)
      catch { case _: MiniEval.MiniEvalException => SFn(n, _ => true) }
    else SFn(n, _ => true)

  private def esc(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def obj(kvs: (String, String)*): String =
    kvs.map { case (k, v) => s"${esc(k)}: $v" }.mkString("{", ", ", "}")

  private def arr(xs: Seq[String]): String = xs.mkString("[", ", ", "]")

  private def optNum(name: String, v: Option[_]): Seq[(String, String)] =
    v.map(x => name -> x.toString).toSeq

  /** Serialize to a JSON AST (type + props + children — the map-form of
    * malli's vector syntax). */
  def toJson(ir: SchemaIR): String = ir match {
    case SAny => obj("type" -> esc("any"))
    case SNil => obj("type" -> esc("nil"))
    case SSome => obj("type" -> esc("some"))
    case SBoolean => obj("type" -> esc("boolean"))
    case SBinary => obj("type" -> esc("bytes"))
    case SUuid => obj("type" -> esc("uuid"))
    case SIdent(kind, ns) => obj(Seq("type" -> esc(kind)) ++
      ns.map(n => "namespace" -> esc(n)): _*)
    case SString(mn, mx) =>
      obj(Seq("type" -> esc("string")) ++ optNum("min", mn) ++ optNum("max", mx): _*)
    case SInt(mn, mx) =>
      obj(Seq("type" -> esc("int")) ++ optNum("min", mn) ++ optNum("max", mx): _*)
    case SDouble(mn, mx) =>
      obj(Seq("type" -> esc("double")) ++ optNum("min", mn) ++ optNum("max", mx): _*)
    case STimestamp(mn, mx) =>
      obj(Seq("type" -> esc("instant")) ++
        mn.map(i => "min" -> esc(i.toString)) ++
        mx.map(i => "max" -> esc(i.toString)): _*)
    case SDate(mn, mx) =>
      obj(Seq("type" -> esc("date")) ++
        mn.map(i => "min" -> esc(i)) ++ mx.map(i => "max" -> esc(i)): _*)
    case STime(kind, mn, mx) =>
      obj(Seq("type" -> esc("time"), "kind" -> esc(kind)) ++
        mn.map(i => "min" -> esc(i)) ++ mx.map(i => "max" -> esc(i)): _*)
    case SEnum(vs) =>
      // literal values carry a type tag so round-trips restore Long/Double/
      // Boolean enums, not stringified copies (a reloaded numeric enum
      // would otherwise statically fail every row via typeOk)
      obj("type" -> esc("enum"), "values" -> arr(vs.map(v =>
        obj("t" -> esc(defaultTag(v)), "v" -> esc(v.toString)))))
    case SRegex(p) => obj("type" -> esc("re"), "pattern" -> esc(p))
    case SCompare(op, v) =>
      obj("type" -> esc("compare"), "op" -> esc(op),
        "value" -> obj("t" -> esc(defaultTag(v)), "v" -> esc(v.toString)))
    case SFn(n, _) => obj("type" -> esc("fn"), "name" -> esc(n))
    case SCustom(n, _, _) => obj("type" -> esc("custom"), "name" -> esc(n))
    case SValidate(n, _) => obj("type" -> esc("validate"), "name" -> esc(n))
    case SMaybe(c) => obj("type" -> esc("maybe"), "child" -> toJson(c))
    case SNot(c) => obj("type" -> esc("not"), "child" -> toJson(c))
    case SAnd(cs) => obj("type" -> esc("and"), "children" -> arr(cs.map(toJson)))
    case SOr(cs) => obj("type" -> esc("or"), "children" -> arr(cs.map(toJson)))
    case SOrn(bs) => obj("type" -> esc("orn"), "branches" -> arr(bs.map {
      case (t, c) => obj("tag" -> esc(t), "schema" -> toJson(c)) }))
    case SAndn(bs) => obj("type" -> esc("andn"), "branches" -> arr(bs.map {
      case (t, c) => obj("tag" -> esc(t), "schema" -> toJson(c)) }))
    case SMap(es, closed, rest) =>
      obj(Seq("type" -> esc("map"), "closed" -> closed.toString,
        "entries" -> arr(es.map(e => obj(
          Seq("key" -> esc(e.key), "optional" -> e.optional.toString,
            "schema" -> toJson(e.child)) ++
            // defaults carry a type tag so round-trips restore the
            // original type, not a stringified copy
            e.default.map(d => "default" -> obj(
              "t" -> esc(defaultTag(d)), "v" -> esc(d.toString))): _*)))) ++
        rest.map(r => "rest" -> toJson(r)): _*)
    case SMapOf(k, v, mn, mx) =>
      obj(Seq("type" -> esc("map-of"), "key" -> toJson(k),
        "value" -> toJson(v)) ++ optNum("min", mn) ++ optNum("max", mx): _*)
    case SVector(c, mn, mx) =>
      obj(Seq("type" -> esc("vector"), "child" -> toJson(c)) ++
        optNum("min", mn) ++ optNum("max", mx): _*)
    case SSeqable(c, mn, mx) =>
      obj(Seq("type" -> esc("seqable"), "child" -> toJson(c)) ++
        optNum("min", mn) ++ optNum("max", mx): _*)
    case SSet(c, mn, mx) =>
      obj(Seq("type" -> esc("set"), "child" -> toJson(c)) ++
        optNum("min", mn) ++ optNum("max", mx): _*)
    case SEvery(c, mn, mx, l) =>
      obj(Seq("type" -> esc("every"), "child" -> toJson(c), "limit" -> l.toString) ++
        optNum("min", mn) ++ optNum("max", mx): _*)
    case STuple(cs) => obj("type" -> esc("tuple"), "children" -> arr(cs.map(toJson)))
    case SMulti(d, bs, df) =>
      obj(Seq("type" -> esc("multi"), "dispatch" -> esc(d),
        "branches" -> arr(bs.map { case (t, c) =>
          obj("tag" -> esc(t), "schema" -> toJson(c)) })) ++
        df.map(x => "default" -> toJson(x)): _*)
    case SMultiExpr(n, _, _, bs, df) =>
      // like :fn, the dispatch functions don't serialize — name only
      obj(Seq("type" -> esc("multi-expr"), "name" -> esc(n),
        "branches" -> arr(bs.map { case (t, c) =>
          obj("tag" -> esc(t), "schema" -> toJson(c)) })) ++
        df.map(x => "default" -> toJson(x)): _*)
    case SRef(n) => obj("type" -> esc("ref"), "name" -> esc(n))
    case SScoped(reg, c, boundary) =>
      obj(Seq("type" -> esc("schema"),
        "registry" -> arr(reg.toSeq.sortBy(_._1).map { case (n, s) =>
          obj("name" -> esc(n), "schema" -> toJson(s)) }),
        "child" -> toJson(c)) ++
        // registry-prop scopes (issue-451 syntax) must round-trip as
        // transparent — only explicit [:schema ..] is a boundary
        (if (boundary) Nil else Seq("boundary" -> "false")): _*)
    case SMergeOf(cs) => obj("type" -> esc("merge"), "children" -> arr(cs.map(toJson)))
    case SUnionOf(cs) => obj("type" -> esc("union"), "children" -> arr(cs.map(toJson)))
    case SSelectKeysOf(c, ks) => obj("type" -> esc("select-keys"),
      "child" -> toJson(c), "keys" -> arr(ks.map(esc)))
    case SCat(cs) => obj("type" -> esc("cat"), "children" -> arr(cs.map(toJson)))
    case SCatn(es) => obj("type" -> esc("catn"), "entries" -> arr(es.map {
      case (t, c) => obj("tag" -> esc(t), "schema" -> toJson(c)) }))
    case SAlt(cs) => obj("type" -> esc("alt"), "children" -> arr(cs.map(toJson)))
    case SAltn(es) => obj("type" -> esc("altn"), "entries" -> arr(es.map {
      case (t, c) => obj("tag" -> esc(t), "schema" -> toJson(c)) }))
    case SStar(c) => obj("type" -> esc("star"), "child" -> toJson(c))
    case SPlus(c) => obj("type" -> esc("plus"), "child" -> toJson(c))
    case SOpt(c) => obj("type" -> esc("opt"), "child" -> toJson(c))
    case SRepeat(c, mn, mx) =>
      obj("type" -> esc("repeat"), "child" -> toJson(c),
        "min" -> mn.toString, "max" -> mx.toString)
    // the props slice serializes as ONE EDN prop-map string — the same
    // rendering `form` splices, so ast and form readers share a parser
    // (and :gen/schema round-trips as a real sub-schema inside it)
    case SProps(p, c) => obj(Seq("type" -> esc("props"),
      "props" -> esc(SchemaIR.propsStr(p)), "child" -> toJson(c)) ++
      // entry position isn't expressible in the prop string itself —
      // flag it so an AST round-trip keeps rendering [:k {..} child]
      (if (p.entryLevel) Seq("entry" -> "true") else Nil): _*)
  }

  private def defaultTag(d: Any): String = d match {
    case _: Long | _: Int => "long"
    case _: Double | _: Float => "double"
    case _: Boolean => "boolean"
    case _ => "string"
  }

  private def readDefault(x: Any): Any = x match {
    case m: Map[_, _] =>
      val mm = m.asInstanceOf[Map[String, Any]]
      val v = mm("v").toString
      mm("t").toString match {
        case "long" => v.toLong
        case "double" => v.toDouble
        case "boolean" => v.toBoolean
        case _ => v
      }
    case other => other
  }

  // ---- from-ast: parse the JSON back -------------------------------------

  /** Minimal JSON reader (objects/arrays/strings/numbers/bools) — no
    * external deps (zero-egress build). */
  private final class P(s: String) {
    var i = 0
    def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    def expect(c: Char): Unit = { ws(); require(s(i) == c, s"want $c at $i"); i += 1 }
    def value(): Any = { ws(); s(i) match {
      case '{' => objv()
      case '[' => arrv()
      case '"' => str()
      case 't' => i += 4; true
      case 'f' => i += 5; false
      case 'n' => i += 4; null
      case _ =>
        val st = i
        while (i < s.length && (s(i).isDigit || "+-.eE".contains(s(i)))) i += 1
        val t = s.substring(st, i)
        if (t.contains('.') || t.contains('e') || t.contains('E')) t.toDouble
        else t.toLong
    } }
    def objv(): Map[String, Any] = {
      expect('{'); ws()
      if (s(i) == '}') { i += 1; return Map.empty }
      val b = Map.newBuilder[String, Any]
      var done = false
      while (!done) {
        ws(); val k = str(); expect(':'); b += k -> value(); ws()
        if (s(i) == ',') i += 1 else { expect('}'); done = true }
      }
      b.result()
    }
    def arrv(): Seq[Any] = {
      expect('['); ws()
      if (s(i) == ']') { i += 1; return Seq.empty }
      val b = Seq.newBuilder[Any]
      var done = false
      while (!done) {
        b += value(); ws()
        if (s(i) == ',') i += 1 else { expect(']'); done = true }
      }
      b.result()
    }
    def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s(i) != '"') {
        if (s(i) == '\\') {
          i += 1
          s(i) match {
            case 'n' => sb += '\n'
            case 'u' => sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar; i += 4
            case c => sb += c
          }
        } else sb += s(i)
        i += 1
      }
      i += 1
      sb.toString
    }
  }

  def fromJson(json: String): SchemaIR = fromAst(new P(json).objv())

  private def fromAst(m: Map[String, Any]): SchemaIR = {
    def child = fromAst(m("child").asInstanceOf[Map[String, Any]])
    def children = m("children").asInstanceOf[Seq[Any]]
      .map(x => fromAst(x.asInstanceOf[Map[String, Any]]))
    def tagged(field: String) = m(field).asInstanceOf[Seq[Any]].map { x =>
      val b = x.asInstanceOf[Map[String, Any]]
      b("tag").toString -> fromAst(b("schema").asInstanceOf[Map[String, Any]])
    }
    def num(k: String): Option[Long] = m.get(k).map {
      case l: Long => l; case d: Double => d.toLong; case s => s.toString.toLong
    }
    def dbl(k: String): Option[Double] = m.get(k).map {
      case l: Long => l.toDouble; case d: Double => d; case s => s.toString.toDouble
    }
    m("type").toString match {
      case "any" => SAny
      case "nil" => SNil
      case "some" => SSome
      case "boolean" => SBoolean
      case "bytes" => SBinary
      case "uuid" => SUuid
      case k @ ("keyword" | "simple-keyword" | "qualified-keyword" | "symbol" |
           "simple-symbol" | "qualified-symbol" | "char") =>
        SIdent(k, m.get("namespace").map(_.toString))
      // :float shares :double's value space in the engine (core.cljc:825)
      case "float" => SDouble(dbl("min"), dbl("max"))
      case "string" => SString(num("min").map(_.toInt), num("max").map(_.toInt))
      case "int" => SInt(num("min"), num("max"))
      case "double" => SDouble(dbl("min"), dbl("max"))
      case "instant" => STimestamp(
        m.get("min").map(s => java.time.Instant.parse(s.toString)),
        m.get("max").map(s => java.time.Instant.parse(s.toString)))
      case "date" => SDate(m.get("min").map(_.toString), m.get("max").map(_.toString))
      case "time" => STime(m("kind").toString,
        m.get("min").map(_.toString), m.get("max").map(_.toString))
      case "enum" => SEnum(m("values").asInstanceOf[Seq[Any]].map(readDefault))
      case "re" => SRegex(m("pattern").toString)
      case "compare" => SCompare(m("op").toString, readDefault(m("value")))
      case "fn" =>
        fnFromName(m("name").toString)
      case "custom" =>
        // the validator lambda does not serialize — fail FAST at first
        // compile/eval instead of silently accepting every value (the
        // codegen extension point is load-bearing; a lit(true)
        // reconstruction would validate everything)
        val nm = m("name").toString
        def lost: Nothing = throw new IllegalArgumentException(
          s"custom schema '$nm' was deserialized without its validator — " +
            "re-register the custom type before compiling this schema")
        SCustom(nm, (_, _) => lost, _ => lost)
      case "validate" =>
        // same fail-fast contract as "custom": a `_ => Nil` rebuild would
        // silently validate everything
        val vn = m("name").toString
        def vlost: Nothing = throw new SchemaIR.LostFnException(
          s"validate schema '$vn' was deserialized without its error fn — " +
            "re-register the :validate fn before compiling this schema")
        SValidate(vn, _ => vlost)
      case "maybe" => SMaybe(child)
      case "not" => SNot(child)
      case "and" => SAnd(children)
      case "or" => SOr(children)
      case "orn" => SOrn(tagged("branches"))
      case "andn" => SAndn(tagged("branches"))
      case "map" => SMap(
        m("entries").asInstanceOf[Seq[Any]].map { x =>
          val e = x.asInstanceOf[Map[String, Any]]
          Entry(e("key").toString,
            fromAst(e("schema").asInstanceOf[Map[String, Any]]),
            optional = e.get("optional").exists(_ == true),
            default = e.get("default").map(readDefault))
        },
        closed = m.get("closed").exists(_ == true),
        rest = m.get("rest").map(x => fromAst(x.asInstanceOf[Map[String, Any]])))
      case "map-of" => SMapOf(
        fromAst(m("key").asInstanceOf[Map[String, Any]]),
        fromAst(m("value").asInstanceOf[Map[String, Any]]),
        num("min").map(_.toInt), num("max").map(_.toInt))
      case "vector" => SVector(child, num("min").map(_.toInt), num("max").map(_.toInt))
      case "seqable" => SSeqable(child, num("min").map(_.toInt), num("max").map(_.toInt))
      case "set" => SSet(child, num("min").map(_.toInt), num("max").map(_.toInt))
      case "every" => SEvery(child, num("min").map(_.toInt),
        num("max").map(_.toInt), num("limit").map(_.toInt).getOrElse(101))
      case "tuple" => STuple(children)
      case "multi" => SMulti(m("dispatch").toString, tagged("branches"),
        m.get("default").map(x => fromAst(x.asInstanceOf[Map[String, Any]])))
      case "multi-expr" =>
        // dispatch fns don't round-trip (like :fn) — a reloaded schema
        // routes everything to the default branch / invalid-dispatch
        SMultiExpr(m("name").toString, c => c, _ => null,
          tagged("branches"),
          m.get("default").map(x => fromAst(x.asInstanceOf[Map[String, Any]])))
      case "ref" => SRef(m("name").toString)
      case "schema" => SScoped(
        m("registry").asInstanceOf[Seq[Any]].map { x =>
          val e = x.asInstanceOf[Map[String, Any]]
          e("name").toString ->
            fromAst(e("schema").asInstanceOf[Map[String, Any]])
        }.toMap, child,
        boundary = !m.get("boundary").contains(false))
      case "merge" => SMergeOf(children)
      case "union" => SUnionOf(children)
      case "select-keys" => SSelectKeysOf(child,
        m("keys").asInstanceOf[Seq[Any]].map(_.toString))
      case "cat" => SCat(children)
      case "catn" => SCatn(tagged("entries"))
      case "alt" => SAlt(children)
      case "altn" => SAltn(tagged("entries"))
      case "star" => SStar(child)
      case "plus" => SPlus(child)
      case "opt" => SOpt(child)
      case "repeat" => SRepeat(child, num("min").get.toInt, num("max").get.toInt)
      case "props" =>
        val toks = tokenize("{" + m("props").toString + "}")
        val (node, rest) = parseNode(toks)
        require(rest.isEmpty, s"trailing prop tokens: $rest")
        SProps(parseNodeProps(node.asInstanceOf[Props])
          .copy(entryLevel = m.get("entry").exists(_ == true)), child)
      case t => throw new IllegalArgumentException(s"unknown ast type $t")
    }
  }

  // ---- EDN vector-syntax round-trip (malli.edn analogue) ------------------

  /** Parse the vector-syntax string `SchemaIR.form` emits back into IR —
    * the `malli.edn` read-string dual (reference src/malli/edn.cljc).
    * Functions (`:fn`, expression dispatch) don't round-trip, mirroring
    * the reference's behavior for non-serializable schemas. */
  def fromForm(s: String): SchemaIR = {
    val toks = tokenize(s)
    val (node, rest) = parseNode(toks)
    require(rest.isEmpty, s"trailing tokens: $rest")
    convert(node)
  }

  private sealed trait Node
  private final case class Kw(name: String) extends Node       // :int
  private final case class Sym(name: String) extends Node      // bare name
  private final case class SStr(v: String) extends Node
  private final case class Num(v: Double, isInt: Boolean) extends Node
  private final case class Bool(v: Boolean) extends Node
  private final case class Vec(items: Seq[Node]) extends Node
  private final case class Props(m: Map[String, Node]) extends Node
  private case object NilN extends Node                         // nil

  private def tokenize(s: String): List[String] = {
    val out = List.newBuilder[String]
    var i = 0
    while (i < s.length) {
      s(i) match {
        case c if c.isWhitespace => i += 1
        case c @ ('[' | ']' | '{' | '}') => out += c.toString; i += 1
        case '"' =>
          val sb = new StringBuilder("\"")
          i += 1
          while (s(i) != '"') {
            if (s(i) == '\\') { sb += s(i); i += 1 }
            sb += s(i); i += 1
          }
          sb += '"'; i += 1
          out += sb.toString
        case _ =>
          val st = i
          while (i < s.length && !s(i).isWhitespace &&
                 !"[]{}".contains(s(i))) i += 1
          out += s.substring(st, i)
      }
    }
    out.result()
  }

  private def parseNode(toks: List[String]): (Node, List[String]) =
    toks match {
      case "[" :: rest =>
        var r = rest
        val items = Seq.newBuilder[Node]
        while (r.head != "]") {
          val (n, r2) = parseNode(r); items += n; r = r2
        }
        (Vec(items.result()), r.tail)
      case "{" :: rest =>
        var r = rest
        val m = Map.newBuilder[String, Node]
        while (r.head != "}") {
          val (k, r2) = parseNode(r)
          val (v, r3) = parseNode(r2)
          m += k.asInstanceOf[Kw].name -> v
          r = r3
        }
        (Props(m.result()), r.tail)
      case t :: rest => (atom(t), rest)
      case Nil => throw new IllegalArgumentException("unexpected end of form")
    }

  private def atom(t: String): Node =
    if (t.startsWith("\"")) SStr(unq(t))
    else if (t == "true") Bool(true)
    else if (t == "false") Bool(false)
    else if (t == "nil") NilN
    else if (t.startsWith(":")) Kw(t)
    else if (t.matches("-?\\d+")) Num(t.toDouble, isInt = true)
    else if (t.matches("-?\\d*\\.\\d+([eE][+-]?\\d+)?")) Num(t.toDouble, isInt = false)
    else Sym(t)

  private def unq(t: String): String = {
    val sb = new StringBuilder
    var i = 1
    while (i < t.length - 1) {
      if (t(i) == '\\') {
        i += 1
        t(i) match {
          case 'n' => sb += '\n'
          case c => sb += c
        }
      } else sb += t(i)
      i += 1
    }
    sb.toString
  }

  private def pInt(p: Props, k: String): Option[Int] =
    p.m.get(k).map { case Num(v, _) => v.toInt
                     case other => other.toString.toInt }
  private def pLong(p: Props, k: String): Option[Long] =
    p.m.get(k).map { case Num(v, _) => v.toLong
                     case other => other.toString.toLong }
  private def pDbl(p: Props, k: String): Option[Double] =
    p.m.get(k).map { case Num(v, _) => v
                     case other => other.toString.toDouble }
  private def pStr(p: Props, k: String): Option[String] =
    p.m.get(k).map { case SStr(v) => v; case Kw(n) => n; case Sym(s) => s
                     case Num(v, true) => v.toLong.toString
                     case other => other.toString }

  private val emptyProps = Props(Map.empty)

  /** EDN node → plain value for NON-STRUCTURAL property values
    * (`:gen/return`, `:json-schema/...`, ...): keyword strings keep their
    * colon, prop-maps become String-keyed Maps (keys keep the colon). */
  private def nodeToValue(n: Node): Any = n match {
    case SStr(v) => v
    case Num(v, true) => v.toLong
    case Num(v, false) => v
    case Bool(b) => b
    case NilN => null
    case Kw(k) => k
    case Sym(s) => s
    case Vec(items) => items.map(nodeToValue)
    case Props(m) => m.map { case (k, v) => k -> nodeToValue(v) }
  }

  /** Extract the [[NodeProps]] slice from a parsed prop map (the
    * `:gen/...` / doc / `:json-schema(/...)` / `:swagger(/...)` /
    * `:error/path` keys); structural keys (`:min`, `:closed`, ...) are
    * left for the node constructors, which read only what they own. */
  private def parseNodeProps(props: Props): NodeProps = {
    val m = props.m
    def unlift(prefix: String): Seq[(String, Any)] =
      m.toSeq.filter(_._1.startsWith(prefix)).sortBy(_._1)
        .map { case (k, v) => k.stripPrefix(prefix) -> nodeToValue(v) }
    def dbl(k: String): Option[Double] = m.get(k).map {
      case Num(v, _) => v
      case other => other.toString.toDouble
    }
    NodeProps(
      genReturn = m.get(":gen/return").map(nodeToValue),
      genElements = m.get(":gen/elements").map {
        case Vec(items) => items.map(nodeToValue)
        case other => Seq(nodeToValue(other))
      },
      genFmap = m.get(":gen/fmap").map {
        case SStr(s) => s
        case Sym(s) => s // bare fn symbol, e.g. str
        case other => throw new IllegalArgumentException(
          s"unsupported :gen/fmap value: $other")
      },
      genSchema = m.get(":gen/schema").map(convert),
      genMin = dbl(":gen/min"),
      genMax = dbl(":gen/max"),
      genInfinite = m.get(":gen/infinite?").contains(Bool(true)),
      genNaN = m.get(":gen/NaN?").contains(Bool(true)),
      title = m.get(":title").map { case SStr(s) => s; case o => o.toString },
      description =
        m.get(":description").map { case SStr(s) => s; case o => o.toString },
      default = m.get(":default").map(nodeToValue),
      jsonSchema = unlift(":json-schema/"),
      jsonSchemaFull = m.get(":json-schema").map(nodeToValue),
      swagger = unlift(":swagger/"),
      swaggerFull = m.get(":swagger").map(nodeToValue),
      errorMessage = m.get(":error/message")
        .map { case SStr(s) => s; case o => o.toString },
      errorPath = m.get(":error/path").map {
        case Vec(items) => items.map {
          case Kw(k) => k.drop(1); case SStr(s) => s; case Sym(s) => s
          case o => o.toString
        }
        case other => throw new IllegalArgumentException(
          s":error/path must be a path vector, got $other")
      },
      decodeHints = parseHints(m, "decode"),
      encodeHints = parseHints(m, "encode"),
      parseTransformingChild = m.get(":parse/transforming-child").map {
        case Num(v, true) => v.toLong
        case Kw(":none") => ":none"
        case other => throw new IllegalArgumentException(
          s":parse/transforming-child must be an index or :none, got $other")
      },
      // anything not structural and not owned by a named NodeProps slot
      // is an ARBITRARY user prop — preserved verbatim so forms with
      // custom props (util_test.cljc:1081-1107) round-trip instead of
      // silently dropping them
      extra = m.toSeq.filterNot { case (k, _) =>
        structuralOrKnownProp(k) }.map { case (k, v) => k -> nodeToValue(v) })
  }

  /** Keys parseNodeProps' named slots own, plus STRUCTURAL keys the node
    * constructors read (`:min`, `:closed`, ...) — everything else lands
    * in [[NodeProps]].extra. */
  private def structuralOrKnownProp(k: String): Boolean =
    structuralOrKnownExact(k) ||
      k.startsWith(":gen/") || k.startsWith(":json-schema/") ||
      k.startsWith(":swagger/") || k.startsWith(":decode/") ||
      k.startsWith(":encode/")

  private val structuralOrKnownExact = Set(
    ":min", ":max", ":closed", ":optional", ":dispatch", ":registry",
    ":limit", ":namespace", ":title", ":description", ":default",
    ":error/message", ":error/path", ":parse/transforming-child",
    ":json-schema", ":swagger", ":decode", ":encode")

  /** `:decode/<name> f` compact keys plus the full `:decode {:name ..}`
    * map; a name present in BOTH takes the map form (the reference's
    * "full override masks compact keys", transform_test.cljc:870-877 —
    * `-into-transformer` reads the map entry first). A hint value is a
    * plain fn source (= `:enter`) or an `{:enter .. :leave ..}` map. */
  private def parseHints(m: Map[String, Node], dir: String)
      : Seq[(String, SchemaIR.THint)] = {
    def hintOf(v: Any): SchemaIR.THint = v match {
      case SStr(s) => SchemaIR.THint(enter = Some(s))
      case Sym(s) => SchemaIR.THint(enter = Some(s))
      case Props(hm) =>
        def f(k: String) = hm.get(k).map {
          case SStr(s) => s
          case Sym(s) => s
          case o => throw new IllegalArgumentException(
            s"$dir hint $k must be a fn source, got $o")
        }
        SchemaIR.THint(enter = f(":enter"), leave = f(":leave"))
      case other => throw new IllegalArgumentException(
        s"unsupported $dir hint value: $other")
    }
    val compact = m.toSeq.filter(_._1.startsWith(s":$dir/")).sortBy(_._1)
      .map { case (k, v) => k.stripPrefix(s":$dir/") -> hintOf(v) }
    val full = m.get(s":$dir").toSeq.flatMap {
      case Props(fm) => fm.toSeq.sortBy(_._1)
        .map { case (k, v) => k.stripPrefix(":") -> hintOf(v) }
      case other => throw new IllegalArgumentException(
        s":$dir must be a {:name hint} map, got $other")
    }
    val masked = full.map(_._1).toSet
    full ++ compact.filterNot(h => masked(h._1))
  }

  private def litOf(n: Node): Any = n match {
    case SStr(v) => v
    case Num(v, true) => v.toLong
    case Num(v, false) => v
    case Bool(b) => b
    case Kw(k) => k
    case Sym(s) => s
    case other => throw new IllegalArgumentException(s"not a literal: $other")
  }

  private def convert(n: Node): SchemaIR = n match {
    case Kw(k) => leafKw(k, emptyProps)
    case Vec(Kw(head) +: rest0) =>
      val (props, rest) = rest0 match {
        case (p: Props) +: r => (p, r)
        case r => (emptyProps, r)
      }
      def child = convert(rest.head)
      def children = rest.map(convert)
      def branches = rest.map {
        case Vec(tagNode +: more) =>
          // orn/catn print keyword tags, multi prints bare dispatch values
          val tag = tagNode match {
            case Kw(k) => k.drop(1)
            case Sym(s) => s
            case SStr(s) => s
            // numeric/bool dispatch tags print bare in forms — render
            // them CANONICALLY ("1", not "Num(1.0,true)") so the tag
            // matches the dispatch value after a round-trip
            case Num(v, true) => v.toLong.toString
            case Num(v, false) => v.toString
            case Bool(b) => b.toString
            case o => o.toString
          }
          // branch-ENTRY props ([:tag {..} child], util_test
          // update-entry-properties on :orn) wrap as an entryLevel
          // SProps so the form re-renders them in entry position
          val c = more match {
            case (p: Props) +: r2 =>
              val np = parseNodeProps(p)
              val inner = convert(r2.head)
              if (np.isEmpty) inner
              else SProps(np.copy(entryLevel = true), inner)
            case r2 => convert(r2.head)
          }
          tag -> c
        case other => throw new IllegalArgumentException(s"bad branch $other")
      }
      val base = head match {
        case ":map" =>
          var restSchema: Option[SchemaIR] = None
          val entries = rest.flatMap {
            case Vec(Kw("::default") +: more) =>
              restSchema = Some(convert(more.head)); None
            case Vec(Kw(key) +: more) =>
              val (eProps, es) = more match {
                case (p: Props) +: r2 => (p, r2)
                case r2 => (emptyProps, r2)
              }
              // map-ENTRY-level non-structural props (json_schema_test
              // "map-entry overrides") wrap OUTSIDE the child's own
              // wrapper, so entry keys override child keys and an
              // entry-level :json-schema replaces the child output
              val eNp = parseNodeProps(eProps)
              val eChild0 = convert(es.head)
              val eChild = if (eNp.isEmpty) eChild0
                else SProps(eNp.copy(entryLevel = true), eChild0)
              Some(Entry(key.drop(1), eChild,
                optional = eProps.m.get(":optional").contains(Bool(true))))
            case other =>
              throw new IllegalArgumentException(s"bad map entry $other")
          }
          SMap(entries,
            closed = props.m.get(":closed").contains(Bool(true)),
            rest = restSchema)
        case ":enum" => SEnum(rest.map(litOf))
        case ":re" => SRegex(rest.head match {
          case SStr(s) => s; case Sym(s) => s; case o => o.toString })
        case ":>" | ":>=" | ":<" | ":<=" | ":=" | ":not=" =>
          SCompare(head.drop(1), litOf(rest.head))
        case ":fn" =>
          val n = rest.headOption.map {
            case Sym(s) => s; case SStr(s) => s; case o => o.toString
          }.getOrElse("fn")
          fnFromName(n)
        case ":validate" =>
          val vn = rest.headOption.map {
            case Sym(s) => s; case SStr(s) => s; case o => o.toString
          }.getOrElse("validate")
          def vlost: Nothing = throw new SchemaIR.LostFnException(
            s"validate schema '$vn' was parsed without its error fn — " +
              "re-register the :validate fn before compiling this schema")
          SValidate(vn, _ => vlost)
        case ":maybe" => SMaybe(child)
        case ":not" => SNot(child)
        case ":and" => SAnd(children)
        case ":or" => SOr(children)
        case ":orn" => SOrn(branches)
        case ":andn" => SAndn(branches)
        case ":map-of" =>
          SMapOf(convert(rest(0)), convert(rest(1)),
            pInt(props, ":min"), pInt(props, ":max"))
        case ":vector" | ":sequential" =>
          SVector(child, pInt(props, ":min"), pInt(props, ":max"))
        case ":seqable" =>
          SSeqable(child, pInt(props, ":min"), pInt(props, ":max"))
        case ":set" => SSet(child, pInt(props, ":min"), pInt(props, ":max"))
        case ":every" => SEvery(child, pInt(props, ":min"),
          pInt(props, ":max"), pInt(props, ":limit").getOrElse(101))
        case ":tuple" => STuple(children)
        case ":multi" => SMulti(
          pStr(props, ":dispatch").map(_.stripPrefix(":")).getOrElse(""),
          branches)
        case ":ref" => SRef(rest.head match {
          case Sym(s) => s; case SStr(s) => s; case Kw(k) => k.drop(1)
          case o => o.toString })
        case ":schema" =>
          val local = props.m.get(":registry") match {
            case Some(Props(entries)) =>
              entries.map { case (n, node) => n.stripPrefix(":") ->
                convert(node) }
            case _ => Map.empty[String, SchemaIR]
          }
          SScoped(local, convert(rest.head))
        case ":merge" => SMergeOf(children)
        case ":union" => SUnionOf(children)
        case ":select-keys" => SSelectKeysOf(convert(rest.head),
          rest(1).asInstanceOf[Vec].items.map {
            case Sym(s) => s; case Kw(k) => k.drop(1); case SStr(s) => s
            case o => o.toString })
        case ":cat" => SCat(children)
        case ":catn" => SCatn(branches)
        case ":alt" => SAlt(children)
        case ":altn" => SAltn(branches)
        case ":*" => SStar(child)
        case ":+" => SPlus(child)
        case ":?" => SOpt(child)
        case ":repeat" => SRepeat(child,
          pInt(props, ":min").getOrElse(0),
          pInt(props, ":max").getOrElse(Int.MaxValue))
        case ":custom" =>
          // mirror fromJson: the validator lambda does not serialize —
          // fail FAST at first compile instead of accepting everything
          val nm = rest.head match {
            case Sym(s) => s
            case Kw(k) => k.drop(1)
            case SStr(s) => s
            case o => o.toString
          }
          def lost: Nothing = throw new IllegalArgumentException(
            s"custom schema '$nm' was read from a form without its " +
              "validator — re-register the custom type before compiling")
          SCustom(nm, (_, _) => lost, _ => lost)
        case leaf => leafKw(leaf, props)
      }
      val np = parseNodeProps(props)
      val withNp = if (np.isEmpty) base else SProps(np, base)
      // a {:registry ..} prop on ANY node scopes names to its subtree
      // (core.cljc -property-registry; issue-451 "registry -in schema
      // vector syntax") — wrapped TRANSPARENTLY (boundary=false): only
      // an explicit [:schema ..] head makes a seqex/path boundary
      props.m.get(":registry") match {
        case Some(Props(entries)) if head != ":schema" =>
          SScoped(entries.map { case (n, node) =>
            n.stripPrefix(":") -> convert(node) }, withNp, boundary = false)
        case _ => withNp
      }
    case other => throw new IllegalArgumentException(s"cannot convert $other")
  }

  private def leafKw(k: String, props: Props): SchemaIR = k match {
    case ":any" => SAny
    case ":nil" => SNil
    case ":some" => SSome
    case ":boolean" => SBoolean
    case ":bytes" => SBinary
    case ":uuid" => SUuid
    case ":keyword" | ":simple-keyword" | ":qualified-keyword" | ":symbol" |
         ":simple-symbol" | ":qualified-symbol" | ":char" =>
      SIdent(k.drop(1), pStr(props, ":namespace").map(_.stripPrefix(":")))
    case ":float" => SDouble(pDbl(props, ":min"), pDbl(props, ":max"))
    case ":string" => SString(pInt(props, ":min"), pInt(props, ":max"))
    case ":int" => SInt(pLong(props, ":min"), pLong(props, ":max"))
    case ":double" => SDouble(pDbl(props, ":min"), pDbl(props, ":max"))
    case ":time/instant" => STimestamp(
      pStr(props, ":min").map(java.time.Instant.parse),
      pStr(props, ":max").map(java.time.Instant.parse))
    case ":time/local-date" => SDate(pStr(props, ":min"), pStr(props, ":max"))
    case t if t.startsWith(":time/") =>
      STime(t.stripPrefix(":time/"), pStr(props, ":min"), pStr(props, ":max"))
    // any other keyword is a registry REFERENCE (malli resolves unknown
    // keywords against the options registry, core.cljc:2567-2589 —
    // [:map {:registry {:my/t :string}} [:k :my/t]] reads naturally);
    // an unregistered name still fails loudly, at resolution instead of
    // parse ("unknown schema ref")
    case other => SRef(other.drop(1))
  }

  // ---- JSON-Schema export (json_schema.cljc:210-225) ----------------------

  /** Per-transform reference state (json_schema.cljc:17-37 `-ref`): the
    * lexical registry scope, the collected root `definitions`, and the
    * recursion stopper. `path` is the reference's configurable
    * `::definitions-path` (default `#/definitions/`). */
  private final class RefCtx(val path: String) {
    var scope: Map[String, SchemaIR] = Map.empty
    val defs = scala.collection.mutable.LinkedHashMap[String, String]()
    /** Resolve `n`: register its definition once (placeholder first, so
      * parents precede children like the reference's recursion-stopper
      * swap), then emit the pointer. Unresolvable names still point —
      * a dangling ref is the caller's registry bug, not a render crash. */
    def refTo(n: String, render: SchemaIR => String): String = {
      scope.get(n).foreach { target =>
        if (!defs.contains(n)) {
          defs(n) = "{}"
          defs(n) = render(target)
        }
      }
      obj("$ref" -> esc(path + n.replace("/", "~1")))
    }
  }

  /** Merge the collected `definitions` (if any) into the root output
    * (json_schema.cljc:225 `cond-> ... (assoc :definitions ...)`). */
  private def finishDefs(out: String, ctx: RefCtx): String =
    if (ctx.defs.isEmpty) out
    else mergeJsonObjects(topPairs(out) :+
      ("definitions" -> obj(ctx.defs.toSeq: _*)))

  def toJsonSchema(ir: SchemaIR): String = toJsonSchema(ir, "#/definitions/")

  def toJsonSchema(ir: SchemaIR, definitionsPath: String): String = {
    implicit val ctx: RefCtx = new RefCtx(definitionsPath)
    finishDefs(jsonBody(ir), ctx)
  }

  private def jsonBody(ir: SchemaIR)(implicit ctx: RefCtx): String = ir match {
    case SAny | SSome => "{}"
    case SNil => obj("type" -> esc("null"))
    case SString(mn, mx) => obj(Seq("type" -> esc("string")) ++
      mn.map(m => "minLength" -> m.toString) ++
      mx.map(m => "maxLength" -> m.toString): _*)
    case SInt(mn, mx) => obj(Seq("type" -> esc("integer")) ++
      optNum("minimum", mn) ++ optNum("maximum", mx): _*)
    case SDouble(mn, mx) => obj(Seq("type" -> esc("number")) ++
      optNum("minimum", mn) ++ optNum("maximum", mx): _*)
    case SBoolean => obj("type" -> esc("boolean"))
    case SBinary => obj("type" -> esc("string"),
      "contentEncoding" -> esc("base64"))
    case SUuid => obj("type" -> esc("string"), "format" -> esc("uuid"))
    // bare ident kinds render the reference's plain {:type "string"}
    // (json_schema.cljc:62-78 — keyword?/symbol?/char? carry no pattern);
    // only the engine's {:namespace n} extension narrows with a pattern
    case SIdent(kind, Some(n)) if kind == "qualified-keyword" =>
      obj("type" -> esc("string"),
        "pattern" -> esc(s"^:${java.util.regex.Pattern.quote(n)}/[^\\s/:]+$$"))
    case SIdent(_, _) => obj("type" -> esc("string"))
    case STimestamp(_, _) => obj("type" -> esc("string"),
      "format" -> esc("date-time"))
    case SDate(_, _) => obj("type" -> esc("string"), "format" -> esc("date"))
    case STime(kind, _, _) =>
      val fmt = kind match {
        case "duration" | "period" => "duration"
        case "local-time" | "offset-time" => "time"
        case _ => "date-time"
      }
      obj("type" -> esc("string"), "format" -> esc(fmt))
    // JSON literals, not stringifications: [:enum 1 2] must export as
    // {"enum": [1, 2]} — a consumer validating against ["1", "2"] would
    // reject the actual integers (strings keep their quoting via jsonLit).
    // Homogeneous value sets also carry the inferred base type
    // (json_schema.cljc:160 merges (m/-infer children) under :enum)
    case SEnum(vs) =>
      obj(inferEnumLeaf(vs).map(l => topPairs(jsonBody(l)))
        .getOrElse(Seq.empty) :+ ("enum" -> arr(vs.map(jsonLit))): _*)
    case SRegex(p) => obj("type" -> esc("string"), "pattern" -> esc(p))
    case SMaybe(c) => obj("oneOf" ->
      arr(Seq(jsonBody(c), obj("type" -> esc("null")))))
    case SAnd(cs) => obj("allOf" -> arr(cs.map(jsonBody(_))))
    case SOr(cs) => obj("anyOf" -> arr(cs.map(jsonBody(_))))
    case SOrn(bs) => obj("anyOf" -> arr(bs.map(b => jsonBody(b._2))))
    case SAndn(bs) => obj("allOf" -> arr(bs.map(b => jsonBody(b._2))))
    case SNot(c) => obj("not" -> jsonBody(c))
    case SMap(es, closed, rest) => mapObject(es, closed, rest, jsonBody)
    case SMapOf(_, v, mn, mx) =>
      obj(Seq("type" -> esc("object"),
        "additionalProperties" -> jsonBody(v)) ++
        optNum("minProperties", mn) ++ optNum("maxProperties", mx): _*)
    case SVector(c, mn, mx) => obj(Seq("type" -> esc("array"),
      "items" -> jsonBody(c)) ++
      optNum("minItems", mn) ++ optNum("maxItems", mx): _*)
    case SSet(c, mn, mx) => obj(Seq("type" -> esc("array"),
      "items" -> jsonBody(c), "uniqueItems" -> "true") ++
      optNum("minItems", mn) ++ optNum("maxItems", mx): _*)
    case SEvery(c, mn, mx, _) => jsonBody(SVector(c, mn, mx))
    case SSeqable(c, mn, mx) => jsonBody(SVector(c, mn, mx))
    // draft 2020-12 tuples: prefixItems + items:false forbids extras
    // (json_schema.cljc:162) — tighter than min/maxItems alone
    case STuple(cs) => obj("type" -> esc("array"),
      "prefixItems" -> arr(cs.map(jsonBody(_))), "items" -> "false")
    // recursive schemas (json_schema.cljc:17-37): the local registry
    // extends the lexical scope; refs render as "#/definitions/<n>"
    // pointers and register their definition in the root `definitions`
    // map (the transform wrapper attaches it). Only REACHED names are
    // emitted — the reference registers on deref, not on declaration.
    case SScoped(reg, c, _) =>
      val saved = ctx.scope
      ctx.scope = ctx.scope ++ reg
      try jsonBody(c) finally ctx.scope = saved
    case SCompare(op, v) =>
      val num = String.valueOf(v)
      op match {
        case ">" => obj("type" -> esc("number"), "exclusiveMinimum" -> num)
        case ">=" => obj("type" -> esc("number"), "minimum" -> num)
        case "<" => obj("type" -> esc("number"), "exclusiveMaximum" -> num)
        case "<=" => obj("type" -> esc("number"), "maximum" -> num)
        case "=" => obj("const" -> jsonLit(v))
        case "not=" => obj("not" -> obj("const" -> jsonLit(v)))
      }
    case SRef(n) => ctx.refTo(n, jsonBody)
    // :multi → oneOf over branch outputs, the ::m/default branch last
    // (json_schema.cljc:126; fixture json_schema_test.cljc:75-91)
    case SMulti(_, bs, d) =>
      obj("oneOf" -> arr((bs.map(_._2) ++ d).map(jsonBody(_))))
    case SMultiExpr(_, _, _, bs, d) =>
      obj("oneOf" -> arr((bs.map(_._2) ++ d).map(jsonBody(_))))
    // opaque predicates carry no JSON-Schema contract (:fn → {},
    // json_schema.cljc:164) — any SProps wrapper still contributes
    // passthrough keys on top
    case _: SFn | _: SCustom | _: SValidate => "{}"
    // declarative util proxies export their EXPANSION
    // (json_schema_test.cljc:206-243 — :merge/:union/:select-keys render
    // as the resolved object)
    case m: SMergeOf => jsonBody(SchemaOps.expand(m))
    case u: SUnionOf => jsonBody(SchemaOps.expand(u))
    case sk: SSelectKeysOf => jsonBody(SchemaOps.expand(sk))
    // property passthrough (json_schema.cljc:201-208): a whole
    // `:json-schema` prop REPLACES the output; otherwise
    // (merge (select-keys p [:title :description :default])
    //        <generated> (-unlift-keys p :json-schema)) — later wins
    case SProps(p, c) =>
      p.jsonSchemaFull.map(jsonValue).getOrElse(
        mergeJsonObjects(selectPairs(p) ++ topPairs(jsonBody(c)) ++
          p.jsonSchema.map { case (k, v) => k -> jsonValue(v) }))
    case other => obj("$comment" -> esc(s"unmapped: ${SchemaIR.form(other)}"))
  }

  /** `m/-infer` (core.cljc:243) — the base leaf a homogeneous enum value
    * set implies, rendered through the CALLING dialect so swagger enums
    * keep their int64/double formats. */
  private def inferEnumLeaf(vs: Seq[Any]): Option[SchemaIR] =
    if (vs.isEmpty) None
    else if (vs.forall(_.isInstanceOf[String])) Some(SString())
    else if (vs.forall(v => v.isInstanceOf[Long] || v.isInstanceOf[Int]))
      Some(SInt())
    else if (vs.forall(v => v.isInstanceOf[Double] || v.isInstanceOf[Float]))
      Some(SDouble())
    else None

  /** The `:map` accept (json_schema.cljc:108-123), shared by both
    * dialects via `render`: explicit entries become properties/required;
    * the `::m/default` rest schema's rendered OUTPUT is merged in — its
    * properties/required HOIST into the parent's (rest wins on key
    * conflict, required concatenates distinct), its additionalProperties
    * (or any other key, e.g. a passthrough :default) rides along at the
    * top level, which is what flattens nested ::m/default map chains.
    * Empty `required` is OMITTED (Draft 4 forbids []); an open map with
    * no rest carries no additionalProperties key at all. */
  private def mapObject(es: Seq[Entry], closed: Boolean,
                        rest: Option[SchemaIR],
                        render: SchemaIR => String): String = {
    val restPairs = rest.map(r => topPairs(render(r))).getOrElse(Seq.empty)
    val restMap = restPairs.toMap
    val propsJson = mergeJsonObjects(
      es.map(e => e.key -> render(e.child)) ++
        restMap.get("properties").map(topPairs).getOrElse(Seq.empty))
    val req = (es.filterNot(_.optional).map(e => esc(e.key)) ++
      restMap.get("required").map(topElems).getOrElse(Seq.empty)).distinct
    val addl = restMap.get("additionalProperties")
      .orElse(if (closed) Some("false") else None)
    val others = restPairs.filterNot { case (k, _) =>
      k == "properties" || k == "required" ||
        k == "additionalProperties" || k == "type" }
    obj(others ++ Seq("type" -> esc("object"), "properties" -> propsJson) ++
      (if (req.nonEmpty) Seq("required" -> arr(req)) else Seq.empty) ++
      addl.map("additionalProperties" -> _): _*)
  }

  /** json_schema.cljc:39 `select` — the doc props every output carries. */
  private def selectPairs(p: NodeProps): Seq[(String, String)] =
    p.title.map(t => "title" -> esc(t)).toSeq ++
      p.description.map(d => "description" -> esc(d)) ++
      p.default.map(d => "default" -> jsonValue(d))

  /** EDN-shaped property value → JSON: keyword strings drop their colon
    * (Clojure's json encoders emit keyword NAMES), maps/vectors recurse. */
  private def jsonValue(v: Any): String = v match {
    case s: String if s.startsWith(":") => esc(s.drop(1))
    case s: String => esc(s)
    case null => "null"
    case xs: Seq[_] => arr(xs.map(jsonValue))
    case m: Map[_, _] => obj(m.asInstanceOf[Map[String, Any]].toSeq
      .sortBy(_._1).map { case (k, x) =>
        k.stripPrefix(":") -> jsonValue(x) }: _*)
    case other => String.valueOf(other)
  }

  /** Split one of THIS module's own `obj(...)` rendered objects into its
    * top-level (key, rawValueJson) pairs — a depth/string-aware scan, so
    * merged outputs can drop overridden keys instead of duplicating them. */
  private def topPairs(json: String): Seq[(String, String)] = {
    val s = json.trim
    require(s.startsWith("{") && s.endsWith("}"), s"not an object: $s")
    val inner = s.substring(1, s.length - 1)
    val out = Seq.newBuilder[(String, String)]
    var i = 0
    def skipWs(): Unit = while (i < inner.length && inner(i).isWhitespace) i += 1
    while ({ skipWs(); i < inner.length }) {
      require(inner(i) == '"', s"want key at $i in $inner")
      val kStart = i; i += 1
      while (inner(i) != '"') { if (inner(i) == '\\') i += 1; i += 1 }
      i += 1
      val key = inner.substring(kStart + 1, i - 1) // unescaped enough: keys
      skipWs(); require(inner(i) == ':', s"want : at $i"); i += 1; skipWs()
      val vStart = i
      var depth = 0
      var done = false
      while (!done && i < inner.length) {
        inner(i) match {
          case '"' =>
            i += 1
            while (inner(i) != '"') { if (inner(i) == '\\') i += 1; i += 1 }
          case '{' | '[' => depth += 1
          case '}' | ']' => depth -= 1
          case ',' if depth == 0 => done = true; i -= 1
          case _ => ()
        }
        i += 1
      }
      out += key -> inner.substring(vStart, i).trim
      if (i < inner.length && inner(i) == ',') i += 1
    }
    out.result()
  }

  /** Split one of this module's own `arr(...)` rendered arrays into its
    * raw element strings — the array dual of [[topPairs]]. */
  private def topElems(json: String): Seq[String] = {
    val s = json.trim
    require(s.startsWith("[") && s.endsWith("]"), s"not an array: $s")
    val inner = s.substring(1, s.length - 1).trim
    if (inner.isEmpty) return Seq.empty
    val out = Seq.newBuilder[String]
    var i = 0; var start = 0; var depth = 0
    while (i < inner.length) {
      inner(i) match {
        case '"' =>
          i += 1
          while (inner(i) != '"') { if (inner(i) == '\\') i += 1; i += 1 }
        case '{' | '[' => depth += 1
        case '}' | ']' => depth -= 1
        case ',' if depth == 0 =>
          out += inner.substring(start, i).trim; start = i + 1
        case _ => ()
      }
      i += 1
    }
    out += inner.substring(start).trim
    out.result()
  }

  /** Right-biased merge of (key, rawJson) pairs — LAST value wins, FIRST
    * position kept — rendered back as one object. */
  private def mergeJsonObjects(pairs: Seq[(String, String)]): String = {
    val last = pairs.toMap
    val seen = scala.collection.mutable.LinkedHashSet[String]()
    pairs.foreach { case (k, _) => seen += k }
    seen.toSeq.map(k => s"${esc(k)}: ${last(k)}").mkString("{", ", ", "}")
  }

  private def jsonLit(v: Any): String = v match {
    case s: String => esc(s)
    case other => String.valueOf(other)
  }

  /** Swagger 2.0 schema object — the `malli.swagger` analogue
    * (reference: src/malli/swagger.cljc:1-213; fixtures:
    * test/malli/swagger_test.cljc). Deltas from JSON Schema, per the
    * reference: int/double carry `format`; `:maybe` renders its base
    * with `x-nullable`; `:and`/`:or`/`:multi` render the first
    * NON-NULL child as the base plus `x-allOf`/`x-anyOf` (swagger 2.0
    * has no allOf-of-alternatives); `:not` becomes `x-not`; tuples use
    * `x-items` (no prefixItems). Everything else delegates to
    * [[toJsonSchema]] with swagger recursion through containers. */
  def toSwagger(ir: SchemaIR): String = {
    implicit val ctx: RefCtx = new RefCtx("#/definitions/")
    val out = finishDefs(swaggerBody(ir), ctx)
    // swagger.cljc:102-103: a null-typed top-level output has no
    // representable swagger form
    if (topPairs(out).toMap.get("type").contains("\"null\""))
      throw new IllegalArgumentException(
        s"swagger needs a non-null base: ${SchemaIR.form(ir)}")
    out
  }

  /** `swagger/swagger-spec` (swagger.cljc:106-213): assemble the
    * `::parameters`/`::responses` sections of a swagger doc.
    *
    *  - a `body` parameter wraps its transformed schema whole (name from
    *    the schema's `:title`, required unless the schema is `:maybe`);
    *  - any other `in` (query/header/path/formData) deref-inlines refs
    *    (`m/deref-recursive` — a `\$ref` would replace the whole
    *    parameter object) and FLATTENS the map's properties into one
    *    parameter per entry, the rendered property spread on top;
    *  - parameters deduplicate on (in, name), later entries win;
    *  - every transformed schema's collected `definitions` hoist to the
    *    document root (each schema itself stays `\$ref`-only). */
  def swaggerSpec(parameters: Seq[(String, SchemaIR)],
                  responses: Seq[(Int, Option[SchemaIR], Option[String])])
      : String = {
    val defs = scala.collection.mutable.LinkedHashMap[String, String]()
    def transform(s: SchemaIR): String = {
      implicit val ctx: RefCtx = new RefCtx("#/definitions/")
      val out = swaggerBody(s)
      ctx.defs.foreach { case (k, v) => if (!defs.contains(k)) defs(k) = v }
      out
    }
    def extract(in: String, s: SchemaIR): Seq[((String, String), String)] =
      in match {
        case "body" =>
          val rendered = transform(s)
          val tp = topPairs(rendered).toMap
          val name = tp.getOrElse("title", esc("body"))
          Seq(((in, name), obj(
            "in" -> esc("body"), "name" -> name,
            "description" -> tp.getOrElse("description", esc("")),
            "required" -> (!s.isInstanceOf[SMaybe]).toString,
            "schema" -> rendered)))
        case _ =>
          val rendered = transform(SchemaOps.derefRecursive(s))
          val tp = topPairs(rendered).toMap
          val props = tp.get("properties").map(topPairs).getOrElse(Seq.empty)
          val req = tp.get("required").map(topElems).getOrElse(Seq.empty).toSet
          props.map { case (k, pj) =>
            ((in, esc(k)), mergeJsonObjects(Seq(
              "in" -> esc(in), "name" -> esc(k),
              "description" -> esc(""),
              "required" -> req.contains(esc(k)).toString) ++ topPairs(pj)))
          }
      }
    val extracted = parameters.flatMap { case (in, s) => extract(in, s) }
    // later (in, name) wins, surviving entries keep their relative order
    val lastIdx = extracted.zipWithIndex
      .groupBy(_._1._1).view.mapValues(_.last._2).toMap
    val params = extracted.zipWithIndex
      .collect { case ((key, j), i) if lastIdx(key) == i => j }
    val resps = responses.map { case (st, sch, desc) =>
      st.toString -> obj(Seq(
        "description" -> esc(desc.getOrElse(""))) ++
        sch.map(s => "schema" -> transform(s)): _*)
    }
    obj((if (params.nonEmpty) Seq("parameters" -> arr(params))
         else Seq.empty) ++
      (if (resps.nonEmpty) Seq("responses" -> obj(resps: _*))
       else Seq.empty) ++
      (if (defs.nonEmpty) Seq("definitions" -> obj(defs.toSeq: _*))
       else Seq.empty): _*)
  }

  private def swaggerBody(ir: SchemaIR)(implicit ctx: RefCtx): String = {
    // a child is null-typed only when ITS OWN top-level type is null
    // (exact SNil rendering) — substring search would wrongly skip any
    // child merely CONTAINING a null-typed descendant
    def base(children: Seq[String]): String =
      children.find(_ != """{"type": "null"}""").getOrElse(
        throw new IllegalArgumentException(
          s"swagger needs a non-null base: ${SchemaIR.form(ir)}"))
    def inject(baseJson: String, extra: String): String =
      if (baseJson == "{}") "{" + extra + "}"
      else baseJson.stripSuffix("}") + ", " + extra + "}"
    ir match {
      case SInt(mn, mx) => obj(Seq("type" -> esc("integer"),
        "format" -> esc("int64")) ++
        optNum("minimum", mn) ++ optNum("maximum", mx): _*)
      case SDouble(mn, mx) => obj(Seq("type" -> esc("number"),
        "format" -> esc("double")) ++
        optNum("minimum", mn) ++ optNum("maximum", mx): _*)
      case SMaybe(c) =>
        inject(base(Seq(swaggerBody(c))), "\"x-nullable\": true")
      case SAnd(cs) =>
        val ks = cs.map(swaggerBody(_))
        inject(base(ks), "\"x-allOf\": " + arr(ks))
      case SAndn(bs) =>
        val ks = bs.map(b => swaggerBody(b._2))
        inject(base(ks), "\"x-allOf\": " + arr(ks))
      case SOr(cs) =>
        val ks = cs.map(swaggerBody(_))
        inject(base(ks), "\"x-anyOf\": " + arr(ks))
      case SOrn(bs) =>
        val ks = bs.map(b => swaggerBody(b._2))
        inject(base(ks), "\"x-anyOf\": " + arr(ks))
      case SMulti(_, bs, d) =>
        val ks = (bs.map(_._2) ++ d).map(swaggerBody(_))
        inject(base(ks), "\"x-anyOf\": " + arr(ks))
      case SMultiExpr(_, _, _, bs, d) =>
        val ks = (bs.map(_._2) ++ d).map(swaggerBody(_))
        inject(base(ks), "\"x-anyOf\": " + arr(ks))
      case SNot(c) => obj("x-not" -> swaggerBody(c))
      case STuple(cs) => obj("type" -> esc("array"), "items" -> "{}",
        "x-items" -> arr(cs.map(swaggerBody(_))))
      case SMap(es, closed, rest) => mapObject(es, closed, rest, swaggerBody)
      case SMapOf(_, v, mn, mx) =>
        obj(Seq("type" -> esc("object"),
          "additionalProperties" -> swaggerBody(v)) ++
          optNum("minProperties", mn) ++ optNum("maxProperties", mx): _*)
      // enum inference renders through THIS dialect so int/double enums
      // keep their swagger formats
      case SEnum(vs) =>
        obj(inferEnumLeaf(vs).map(l => topPairs(swaggerBody(l)))
          .getOrElse(Seq.empty) :+ ("enum" -> arr(vs.map(jsonLit))): _*)
      case m: SMergeOf => swaggerBody(SchemaOps.expand(m))
      case u: SUnionOf => swaggerBody(SchemaOps.expand(u))
      case sk: SSelectKeysOf => swaggerBody(SchemaOps.expand(sk))
      case SVector(c, mn, mx) => obj(Seq("type" -> esc("array"),
        "items" -> swaggerBody(c)) ++
        optNum("minItems", mn) ++ optNum("maxItems", mx): _*)
      case SSet(c, mn, mx) => obj(Seq("type" -> esc("array"),
        "items" -> swaggerBody(c), "uniqueItems" -> "true") ++
        optNum("minItems", mn) ++ optNum("maxItems", mx): _*)
      case SEvery(c, mn, mx, _) => swaggerBody(SVector(c, mn, mx))
      case SSeqable(c, mn, mx) => swaggerBody(SVector(c, mn, mx))
      case SScoped(reg, c, _) =>
        val saved = ctx.scope
        ctx.scope = ctx.scope ++ reg
        try swaggerBody(c) finally ctx.scope = saved
      case SRef(n) => ctx.refTo(n, swaggerBody)
      // swagger.cljc:74-81: whole `:swagger` prop replaces; else
      // (merge (select p) <generated> :json-schema/... :swagger/...)
      case SProps(p, c) =>
        p.swaggerFull.map(jsonValue).getOrElse(
          mergeJsonObjects(selectPairs(p) ++ topPairs(swaggerBody(c)) ++
            p.jsonSchema.map { case (k, v) => k -> jsonValue(v) } ++
            p.swagger.map { case (k, v) => k -> jsonValue(v) }))
      case other => jsonBody(other) // identical leaves
    }
  }
}
