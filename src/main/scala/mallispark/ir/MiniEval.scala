package mallispark.ir

import Destructure.{Kw, Sym, VList, VMap, Edn}

/** String-sourced function schemas — the data-plane subset of the
  * reference's sci integration (reference src/malli/sci.cljc: malli
  * evaluates STRING `:fn` / `:multi`-dispatch / `:error/fn` forms with
  * the small-clojure-interpreter so serialized schemas stay executable;
  * core.cljc `-sci` hooks).
  *
  * This is deliberately a SUBSET interpreter, not a Clojure port: pure
  * expressions over the engine's value universe — `(fn [x] body)` with
  * literals, argument references, and a fixed builtin table (comparison,
  * arithmetic, boolean, collection, and predicate forms — the vocabulary
  * the reference's test fixtures use). No defs, no recursion, no
  * host interop; unknown symbols fail at COMPILE time so a typo can't
  * silently validate everything.
  *
  * The compiled [[MiniEval.Fn]] is a plain Serializable case class
  * closing over only the parsed form, so a string-backed `:fn` schema
  * ships to executors and survives EDN round-trips — unlike opaque
  * Scala closures, which deserialize into [[SchemaIR.LostFnException]]
  * placeholders. Truthiness is Clojure's: `false` and `nil` are falsy,
  * everything else truthy. `count` measures CODE POINTS on strings
  * (the engine-wide length convention — Spark `length()` and DuckDB
  * `length()` both count code points). */
object MiniEval {

  final class MiniEvalException(msg: String)
      extends IllegalArgumentException(msg)

  private def fail(msg: String): Nothing = throw new MiniEvalException(msg)

  /** A compiled `(fn [params...] body)` — serializable by construction
    * (its only state is the parsed EDN form). */
  final case class Fn(params: Vector[String], body: Any)
      extends (Seq[Any] => Any) with Serializable {
    def apply(args: Seq[Any]): Any = {
      if (args.length != params.length)
        fail(s"arity: expected ${params.length} args, got ${args.length}")
      // arity 1 is the :fn hot path (one UDF call per row) — a single
      // Map1 allocation instead of zip + builder + map
      val env =
        if (params.length == 1) Map(params(0) -> args(0))
        else params.zip(args).toMap
      eval(body, env)
    }
    /** Single-argument truthiness view (the `:fn` predicate shape). */
    def pred: Any => Boolean = v => truthy(apply(Seq(v)))
  }

  /** Parse + validate `"(fn [x] body)"`. Throws [[MiniEvalException]] on
    * malformed sources (including unterminated input) and on symbols
    * that are neither parameters nor builtins. */
  def compile(src: String): Fn = {
    val form =
      try Edn.read(src)
      catch {
        case e: MiniEvalException => throw e
        case e: Exception => fail(s"malformed fn source: ${e.getMessage}")
      }
    form match {
      case VList(Vector(Sym(None, "fn"), params: Vector[_], body)) =>
        val names = params.map {
          case Sym(None, n) => n
          case other => fail(s"fn parameter must be a simple symbol: $other")
        }
        checkSymbols(body, names.toSet)
        Fn(names.toVector.asInstanceOf[Vector[String]], body)
      case other => fail(s"not a (fn [args] body) form: ${Edn.print(other)}")
    }
  }

  /** Compile a `:gen/fmap` source. malli accepts any sci form there
    * (generator.cljc:472-476 `-create-from-fmap` routes through
    * `m/eval`); the common fixture shapes are a bare builtin symbol
    * (`str`), a partial application (`(partial str "kikka_")`), and a
    * full `(fn [x] ...)` — this normalizes the first two into the third
    * (the value is appended as the LAST argument, matching `partial`).
    * Anything else fails at compile like every unknown MiniEval symbol. */
  def compileFmap(src: String): Fn = {
    val s = src.trim
    if (isFnSource(s)) compile(s)
    else {
      val form =
        try Edn.read(s)
        catch {
          case e: MiniEvalException => throw e
          case e: Exception => fail(s"malformed :gen/fmap source: ${e.getMessage}")
        }
      form match {
        case Sym(None, f) if builtins.contains(f) =>
          Fn(Vector("x"), VList(Vector(Sym(None, f), Sym(None, "x"))))
        case s @ Sym(Some("str"), f) if strBuiltins.contains(f) =>
          Fn(Vector("x"), VList(Vector(s, Sym(None, "x"))))
        case VList(items)
            if items.headOption.contains(Sym(None, "partial")) &&
               items.size >= 2 =>
          val body = VList(items.tail :+ Sym(None, "x"))
          checkSymbols(body, Set("x"))
          Fn(Vector("x"), body)
        case other =>
          fail(s":gen/fmap must be a builtin symbol, (partial f args...) " +
            s"or (fn [x] body) — got ${Edn.print(other)}")
      }
    }
  }

  /** Whether a string looks like a compilable fn source (used by the
    * form/AST readers to decide between a REAL function and the
    * name-only placeholder for opaque Scala closures). Requires a
    * delimiter after "(fn" so legacy opaque NAMES like "(fn-check v2)"
    * keep the placeholder path instead of failing to compile. */
  def isFnSource(s: String): Boolean =
    s.length > 3 && s.startsWith("(fn") &&
      (s.charAt(3).isWhitespace || s.charAt(3) == '[')

  private def checkSymbols(form: Any, bound: Set[String]): Unit = form match {
    case Sym(None, n) =>
      if (!bound.contains(n) && !builtins.contains(n))
        fail(s"unknown symbol $n (not a parameter or builtin)")
    // clojure.string fns keep their reference spelling (str/upper-case)
    case Sym(Some("str"), n) if strBuiltins.contains(n) => ()
    case Sym(ns, n) => fail(s"qualified symbols are not supported: $ns/$n")
    case VList(items) =>
      // `if`/`and`/`or` heads are symbols checked as builtins like the rest
      items.foreach(checkSymbols(_, bound))
    case xs: Vector[_] => xs.foreach(checkSymbols(_, bound))
    case VMap(ps) => ps.foreach { case (k, v) =>
      checkSymbols(k, bound); checkSymbols(v, bound)
    }
    case _ => ()
  }

  def truthy(v: Any): Boolean = v match {
    case null => false
    case b: Boolean => b
    case b: java.lang.Boolean => b.booleanValue
    case _ => true
  }

  /** The `clojure.string` slice usable with its namespaced spelling. */
  private val strBuiltins: Set[String] =
    Set("upper-case", "lower-case", "trim")

  private val reCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.regex.Pattern]()

  private val builtins: Set[String] = Set(
    "fn", "if", "when", "and", "or", "not",
    ">", ">=", "<", "<=", "=", "==", "not=",
    "+", "-", "*", "/", "mod", "min", "max", "inc", "dec", "abs",
    "count", "get", "first", "second", "nth", "contains?", "str",
    "upper-case", "lower-case", "trim", "re-matches",
    "nil?", "some?", "int?", "string?", "boolean?", "double?", "number?",
    "pos?", "neg?", "zero?", "even?", "odd?", "empty?")

  def eval(form: Any, env: Map[String, Any]): Any = form match {
    case Sym(None, n) =>
      env.getOrElse(n, fail(s"unbound symbol $n"))
    case Sym(Some("str"), n) if strBuiltins.contains(n) =>
      fail(s"str/$n must be applied, not referenced")
    case VList(items) if items.nonEmpty => apply(items, env)
    case VList(_) => fail("cannot evaluate ()")
    case xs: Vector[_] => xs.map(eval(_, env))
    case VMap(ps) => // string-keyed like the engine's maps
      ps.map { case (k, v) => (keyName(eval(k, env)), eval(v, env)) }.toMap
    case lit => lit // Long/Double/String/Boolean/null/Kw
  }

  private def keyName(k: Any): String = k match {
    case Kw(ns, n) => ns.fold("")(_ + "/") + n
    case other => String.valueOf(other)
  }

  private def apply(items: Vector[Any], env: Map[String, Any]): Any = {
    items.head match {
      // (:key m) / (:key m default) — the keyword-accessor idiom
      case k: Kw =>
        if (items.size < 2 || items.size > 3) fail(s"keyword call needs 1-2 args: $k")
        val v = getIn(eval(items(1), env), k)
        if (v == null && items.size == 3) eval(items(2), env) else v
      case Sym(Some("str"), op) if strBuiltins.contains(op) =>
        builtin(op, items.tail.map(eval(_, env)))
      case Sym(None, op) =>
        // special forms first (short-circuit); everything else is routed
        // through a guard that converts stray arity crashes into the
        // documented MiniEvalException
        op match {
          case "if" =>
            if (items.size < 3 || items.size > 4) fail("if needs 2-3 forms")
            if (truthy(eval(items(1), env))) eval(items(2), env)
            else if (items.size == 4) eval(items(3), env) else null
          case "when" =>
            if (items.size < 2) fail("when needs a condition")
            if (!truthy(eval(items(1), env))) null
            else if (items.size > 2) eval(items.last, env)
            else null // Clojure: (when c) with an empty body is nil
          case "and" =>
            var r: Any = true
            var i = 1
            while (i < items.size && truthy(r)) { r = eval(items(i), env); i += 1 }
            r
          case "or" =>
            var r: Any = null
            var i = 1
            while (i < items.size && !truthy(r)) { r = eval(items(i), env); i += 1 }
            r
          case "fn" => fail("nested fn forms are not supported")
          case _ =>
            val args = items.tail.map(eval(_, env))
            try builtin(op, args)
            catch {
              case e: MiniEvalException => throw e
              // (mod x 0), (/ x 0) with longs, addExact overflow — keep
              // the documented exception contract (Clojure throws
              // ArithmeticException here too; we normalize it)
              case e: ArithmeticException =>
                fail(s"arithmetic error in $op: ${e.getMessage}")
              case _: IndexOutOfBoundsException |
                   _: UnsupportedOperationException |
                   _: NoSuchElementException =>
                fail(s"wrong number of arguments to $op")
            }
        }
      case other => fail(s"cannot call ${Edn.print(other)}")
    }
  }

  private def asD(v: Any): Double = v match {
    case n: Long => n.toDouble
    case n: Int => n.toDouble
    case n: Double => n
    case n: Float => n.toDouble
    case n: Short => n.toDouble
    case n: Byte => n.toDouble
    case other => fail(s"not a number: $other")
  }

  private def isIntegral(v: Any): Boolean = v match {
    case _: Long | _: Int | _: Short | _: Byte => true
    case _ => false
  }

  private def asL(v: Any): Long = v match {
    case n: Long => n; case n: Int => n.toLong
    case n: Short => n.toLong; case n: Byte => n.toLong
    case other => fail(s"not an integer: $other")
  }

  private def numOp(args: Seq[Any], l: (Long, Long) => Long,
                    d: (Double, Double) => Double): Any =
    if (args.forall(isIntegral)) args.map(asL).reduceLeft(l)
    else args.map(asD).reduceLeft(d)

  /** Pairwise compare — EXACT for long/long pairs (doubles lose longs
    * beyond 2^53, which would flip verdicts vs an exact BIGINT oracle). */
  private def cmp(args: Seq[Any], ok: Int => Boolean): Boolean =
    args.sliding(2).forall {
      case Seq(a, b) =>
        val c =
          if (isIntegral(a) && isIntegral(b))
            java.lang.Long.compare(asL(a), asL(b))
          else java.lang.Double.compare(asD(a), asD(b))
        ok(c)
      case _ => true
    }

  private def cnt(v: Any): Long = v match {
    case null => 0L
    case s: String => s.codePointCount(0, s.length).toLong
    case xs: Seq[_] => xs.size.toLong
    case m: scala.collection.Map[_, _] => m.size.toLong
    case xs: Array[_] => xs.length.toLong
    case other => fail(s"count: not countable: $other")
  }

  private def getIn(c: Any, k: Any): Any = (c, k) match {
    case (null, _) => null
    case (m: scala.collection.Map[_, _], key) =>
      m.asInstanceOf[scala.collection.Map[String, Any]]
        .getOrElse(keyName(key), null)
    case (xs: Seq[_], i: Long) =>
      if (i >= 0 && i < xs.size) xs(i.toInt) else null
    case _ => null
  }

  private def builtin(op: String, args: Seq[Any]): Any = op match {
    case ">" => cmp(args, _ > 0)
    case ">=" => cmp(args, _ >= 0)
    case "<" => cmp(args, _ < 0)
    case "<=" => cmp(args, _ <= 0)
    case "=" => args.sliding(2).forall {
      // Clojure `=` is CATEGORY-strict on numbers: (= 3 3.0) is false;
      // integral/integral compares exactly as longs
      case Seq(a, b) =>
        if ((a == null) != (b == null)) false
        else if (a == null) true
        else if (isIntegral(a) && isIntegral(b)) asL(a) == asL(b)
        else if (isIntegral(a) != isIntegral(b) && isNum(a) && isNum(b))
          false
        else a == b
      case _ => true
    }
    case "==" => cmp(args, _ == 0) // Clojure `==`: cross-type numeric
    case "not=" => !builtin("=", args).asInstanceOf[Boolean]
    // Clojure-faithful long arithmetic: +/-/* THROW on overflow rather
    // than wrapping (normalized to MiniEvalException by the dispatcher)
    case "+" => numOp(args, Math.addExact, _ + _)
    case "-" =>
      if (args.size == 1) numOp(Seq(0L, args.head), Math.subtractExact, _ - _)
      else numOp(args, Math.subtractExact, _ - _)
    case "*" => numOp(args, Math.multiplyExact, _ * _)
    case "/" => args.map(asD).reduceLeft(_ / _) // Clojure ratio → double here
    case "mod" => // Clojure mod: sign of the divisor
      val (a, b) = (asL(args(0)), asL(args(1)))
      ((a % b) + b) % b
    case "min" => numOp(args, math.min, math.min)
    case "max" => numOp(args, math.max, math.max)
    case "inc" => numOp(Seq(args.head, 1L), Math.addExact, _ + _)
    case "dec" => numOp(Seq(args.head, 1L), Math.subtractExact, _ - _)
    case "abs" => if (isIntegral(args.head)) math.abs(asL(args.head))
                  else math.abs(asD(args.head))
    case "count" => cnt(args.head)
    case "get" =>
      val v = getIn(args(0), args(1))
      if (v == null && args.size == 3) args(2) else v
    case "first" => getIn(args.head, 0L)
    case "second" => getIn(args.head, 1L)
    case "nth" => getIn(args(0), asL(args(1)))
    case "contains?" => (args(0), args(1)) match {
      case (m: scala.collection.Map[_, _], k) =>
        m.asInstanceOf[scala.collection.Map[String, Any]]
          .contains(keyName(k))
      case (xs: Seq[_], i) => isNum(i) && asL(i) >= 0 && asL(i) < xs.size
      case _ => false
    }
    case "str" => args.map {
      case null => ""
      case k: Kw => k.toString
      case other => String.valueOf(other)
    }.mkString
    case "nil?" => args.head == null
    case "some?" => args.head != null
    case "int?" => isIntegral(args.head)
    case "string?" => args.head.isInstanceOf[String]
    case "boolean?" => args.head.isInstanceOf[Boolean] ||
      args.head.isInstanceOf[java.lang.Boolean]
    case "double?" => args.head.isInstanceOf[Double] ||
      args.head.isInstanceOf[Float]
    case "number?" => isNum(args.head)
    case "pos?" => asD(args.head) > 0
    case "neg?" => asD(args.head) < 0
    case "zero?" => asD(args.head) == 0
    case "even?" => asL(args.head) % 2 == 0
    case "odd?" => asL(args.head) % 2 != 0
    case "empty?" => cnt(args.head) == 0
    case "upper-case" => asS(args.head).toUpperCase(java.util.Locale.ROOT)
    case "lower-case" => asS(args.head).toLowerCase(java.util.Locale.ROOT)
    case "trim" => asS(args.head).trim
    // Clojure re-matches: whole-string match -> the match (truthy) or nil.
    // The pattern argument is a STRING here (the Edn universe has no
    // regex literals); groups collapse to the full match. Patterns come
    // from schema sources (a bounded set), so compiled forms cache —
    // per-row recompilation would dominate hinted :fn hot loops.
    case "re-matches" =>
      val m = reCache.computeIfAbsent(asS(args(0)),
        (p: String) => java.util.regex.Pattern.compile(p))
        .matcher(asS(args(1)))
      if (m.matches()) m.group() else null
    case "not" => !truthy(args.head)
    case other => fail(s"unknown builtin $other")
  }

  private def asS(v: Any): String = v match {
    case s: String => s
    case other => fail(s"not a string: $other")
  }

  private def isNum(v: Any): Boolean = v match {
    case _: Long | _: Int | _: Double | _: Float | _: Short | _: Byte => true
    case _ => false
  }
}
