package mallispark

import org.scalatest.funsuite.AnyFunSuite
import mallispark.ir.{MiniEval, S, SchemaIR, Export}
import mallispark.ir.MiniEval.MiniEvalException
import mallispark.eval.RowEval

/** The sci-subset interpreter behind string-sourced `:fn` schemas
  * (reference src/malli/sci.cljc — malli evaluates string function forms
  * so SERIALIZED schemas stay executable; this port covers the pure
  * expression subset its fixtures use). */
class MiniEvalSpec extends AnyFunSuite {

  private def run(src: String, args: Any*): Any =
    MiniEval.compile(src)(args.toSeq)

  test("comparison, arithmetic, and numeric-tower semantics") {
    assert(run("(fn [x] (> x 10))", 11L) === true)
    assert(run("(fn [x] (> x 10))", 10L) === false)
    assert(run("(fn [x y] (<= x y 100))", 5L, 50L) === true) // variadic chain
    // Clojure `=` is category-strict on numbers; `==` is cross-type
    assert(run("(fn [x] (= x 3.0))", 3L) === false)
    assert(run("(fn [x] (== x 3.0))", 3L) === true)
    assert(run("(fn [x] (= x 3))", 3L) === true)
    // long/long comparisons are EXACT beyond 2^53 (no double routing)
    assert(run("(fn [n] (>= n 9007199254740993))", 9007199254740992L) === false)
    assert(run("(fn [n] (>= n 9007199254740993))", 9007199254740993L) === true)
    assert(run("(fn [x] (+ x 1))", 2L) === 3L)
    assert(run("(fn [x] (+ x 0.5))", 2L) === 2.5) // promote to double
    assert(run("(fn [x] (- x))", 3L) === -3L) // unary minus
    assert(run("(fn [x] (/ x 2))", 5L) === 2.5) // Clojure ratio → double
    assert(run("(fn [x] (mod x 7))", -3L) === 4L) // sign of the DIVISOR
    assert(run("(fn [x] (max 1 x 3))", 2L) === 3L)
    assert(run("(fn [x] (abs (dec x)))", 0L) === 1L)
  }

  test("truthiness: false and nil are falsy; and/or return values") {
    assert(run("(fn [x] (and x 42))", true) === 42L)
    assert(run("(fn [x] (and x 42))", null) === null)
    assert(run("(fn [x] (or x 42))", null) === 42L)
    assert(run("(fn [x] (or x 42))", 7L) === 7L)
    assert(run("(fn [x] (if x 1 2))", false) === 2L)
    assert(run("(fn [x] (when (pos? x) :yes))", 1L).toString === ":yes")
    assert(run("(fn [x] (when x))", 5L) === null) // empty body → nil
    assert(run("(fn [x] (not x))", null) === true)
  }

  test("keyword-accessor calls: (:key m) and (:key m default)") {
    assert(run("(fn [m] (:a m))", Map("a" -> 7L)) === 7L)
    assert(run("(fn [m] (:b m 9))", Map("a" -> 7L)) === 9L)
    assert(run("(fn [m] (if (:flag m) 1 0))", Map("flag" -> true)) === 1L)
  }

  test("collections: count is code points on strings; get is engine-keyed") {
    assert(run("(fn [s] (count s))", "héllo") === 5L)
    assert(run("(fn [s] (count s))", "🎉🎉") === 2L) // not 4 UTF-16 units
    assert(run("(fn [s] (count s))", null) === 0L)
    assert(run("(fn [xs] (first xs))", Seq(7L, 8L)) === 7L)
    assert(run("(fn [xs] (nth xs 1))", Seq(7L, 8L)) === 8L)
    assert(run("(fn [m] (get m :a))", Map("a" -> 1L)) === 1L)
    assert(run("(fn [m] (get m :b 9))", Map("a" -> 1L)) === 9L)
    assert(run("(fn [m] (contains? m :a))", Map("a" -> 1L)) === true)
    assert(run("(fn [s] (empty? s))", "") === true)
    assert(run("(fn [a] (str a \"-\" 1))", "x") === "x-1")
  }

  test("compile-time rejection: typos cannot silently validate") {
    intercept[MiniEvalException](MiniEval.compile("(fn [x] (> y 10))"))
    intercept[MiniEvalException](MiniEval.compile("(fn [x] (frob x))"))
    intercept[MiniEvalException](MiniEval.compile("(fn [x] (fn [y] y))"))
    intercept[MiniEvalException](MiniEval.compile("(> x 10)"))
    intercept[MiniEvalException](MiniEval.compile("(fn [x] (clojure.core/inc x))"))
    // unterminated input is the documented exception, not a raw crash
    intercept[MiniEvalException](MiniEval.compile("(fn [x] (> x 1)"))
    intercept[MiniEvalException](MiniEval.compile("(fn"))
  }

  test("arity mistakes fail as MiniEvalException, not raw crashes") {
    val when0 = intercept[MiniEvalException](
      run("(fn [x] (when))", 1L))
    assert(when0.getMessage.contains("when"))
    intercept[MiniEvalException](run("(fn [x] (+))", 1L))
    intercept[MiniEvalException](run("(fn [x] (get x))", Map("a" -> 1L)))
  }

  test("arithmetic edges fail as MiniEvalException (mod 0, long overflow)") {
    val mod0 = intercept[MiniEvalException](run("(fn [x] (mod x 0))", 5L))
    assert(mod0.getMessage.contains("mod"))
    // Clojure-faithful: long +/-/* THROW on overflow instead of wrapping
    intercept[MiniEvalException](
      run("(fn [x] (+ x 1))", Long.MaxValue))
    intercept[MiniEvalException](
      run("(fn [x] (* x 3))", Long.MaxValue / 2))
    intercept[MiniEvalException](
      run("(fn [x] (- x 1))", Long.MinValue))
    intercept[MiniEvalException](run("(fn [x] (inc x))", Long.MaxValue))
    // doubles still flow (no exactness contract there)
    assert(run("(fn [x] (+ x 1.0))", Long.MaxValue)
      === Long.MaxValue.toDouble + 1.0)
  }

  test("a non-MiniEval fn source falls back to the placeholder on load") {
    // a reference-sci form using symbols outside the builtin table must
    // not make an exported schema UNLOADABLE — it loads with the
    // permissive name-only placeholder (like opaque Scala closures)
    val form = "[:fn \"(fn [x] (re-find my-pattern x))\"]"
    val loaded = Export.fromForm(form)
    assert(RowEval.validate(loaded, "anything") === true)
    val ast = Export.toJson(Export.fromForm(form))
    assert(RowEval.validate(Export.fromJson(ast), 42L) === true)
  }

  test("opaque names that merely START with (fn keep the placeholder path") {
    assert(!MiniEval.isFnSource("(fn-check v2)"))
    assert(!MiniEval.isFnSource("(fn"))
    assert(MiniEval.isFnSource("(fn [x] x)"))
    assert(MiniEval.isFnSource("(fn\n[x] x)"))
    val opaque = Export.fromForm("[:fn fn-check-v2]")
    assert(RowEval.validate(opaque, 42L) === true)
  }

  test("compiled fns are serializable (ship to executors)") {
    val f = MiniEval.compile("(fn [x] (and (int? x) (> x 10)))")
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(f)
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[MiniEval.Fn]
    assert(back(Seq(11L)) === true)
    assert(back(Seq(5L)) === false)
  }

  test("string :fn schemas round-trip through form AND ast as real fns") {
    val sch = S.mapE(false,
      S.req("v", S.fnS("(fn [v] (and (int? v) (> v 10)))")))
    val form = SchemaIR.form(sch)
    assert(form === """[:map [:v [:fn "(fn [v] (and (int? v) (> v 10)))"]]]""")
    val viaForm = Export.fromForm(form)
    val viaAst = Export.fromJson(Export.toJson(sch))
    for (s2 <- Seq(sch, viaForm, viaAst)) {
      assert(RowEval.validate(s2, Map("v" -> 11L)) === true)
      assert(RowEval.validate(s2, Map("v" -> 5L)) === false)
      assert(RowEval.validate(s2, Map("v" -> "nope")) === false)
    }
    // opaque Scala closures still come back as permissive placeholders
    val opaque = Export.fromForm(SchemaIR.form(
      S.fn("my-pred")(_ => false)))
    assert(RowEval.validate(opaque, 42L) === true)
  }

  test("exceptions inside the fn stay -safe-pred false, not crashes") {
    // (count 42) throws in MiniEval; the :fn wrapper maps it to invalid
    val sch = S.fnS("(fn [x] (> (count x) 1))")
    assert(RowEval.validate(sch, 42L) === false)
    assert(RowEval.validate(sch, "ab") === true)
  }
}
