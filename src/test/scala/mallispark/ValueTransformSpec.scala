package mallispark

import org.scalatest.funsuite.AnyFunSuite
import mallispark.ir.S
import mallispark.ir.SchemaIR._
import mallispark.compile.Transform.{StringMode, JsonMode}
import mallispark.eval.ValueTransform

/** Value-universe decode/encode — the reference's transform_test.cljc
  * value semantics that a static column type cannot carry (seqex gates,
  * keep-original-on-failure, heterogeneous :or). Pure-JVM. */
class ValueTransformSpec extends AnyFunSuite {

  private def dec(s: mallispark.ir.SchemaIR, v: Any): Any =
    ValueTransform.decode(s, v, StringMode)
  private def enc(s: mallispark.ir.SchemaIR, v: Any): Any =
    ValueTransform.encode(s, v)

  // child-inference fixtures (transform_test.cljc:1142-1230)
  test(":enum/:= decode-encode via inferred child type (value tier)") {
    val kwEnum = SEnum(Seq(":kikka", ":kukka"))
    assert(dec(kwEnum, "kikka") === ":kikka")
    assert(dec(SEnum(Seq(1L, 2L)), "1") === 1L)
    assert(dec(SEnum(Seq(1.1, 2.2)), "1.1") === 1.1)
    assert(dec(SCompare("=", ":kikka"), "kikka") === ":kikka")
    assert(dec(SCompare("=", 1L), "1") === 1L)
    // json: keywords move, numbers stay strings
    assert(ValueTransform.decode(kwEnum, "kikka", JsonMode) === ":kikka")
    assert(ValueTransform.decode(SEnum(Seq(1L, 2L)), "1", JsonMode) === "1")
    // idempotent on already-decoded values; heterogeneous = no-op
    assert(dec(kwEnum, ":kikka") === ":kikka")
    assert(dec(SEnum(Seq(":a", 1L)), "x") === "x")
    // encode drops the colon off keyword enums
    assert(enc(kwEnum, ":kikka") === "kikka")
    assert(enc(SCompare("=", ":kikka"), ":kikka") === "kikka")
  }

  test("leaf decode keeps the ORIGINAL on failure (transform.cljc -safe)") {
    assert(dec(S.int, "1") === 1L)
    assert(dec(S.int, "abc") === "abc") // not null — the value survives
    assert(dec(S.int, 1.0) === 1L)
    assert(dec(S.int, 1.5) === 1.5)
    assert(dec(S.double, "1.25") === 1.25)
    assert(dec(S.boolean, "true") === true)
    assert(dec(S.boolean, "TRUE") === "TRUE")
    assert(dec(S.keyword, "abc") === ":abc")
    assert(ValueTransform.decode(S.int, "1", JsonMode) === "1") // json keeps
    assert(dec(STimestamp(), "2024-03-01T10:00:00Z") ===
      java.time.Instant.parse("2024-03-01T10:00:00Z"))
    assert(dec(STimestamp(), "garbage") === "garbage")
    assert(dec(STime("duration"), "PT1H2M3S") ===
      java.time.Duration.parse("PT1H2M3S"))
  }

  test("seqex decode gates on the candidate validating (fixtures :339-393)") {
    assert(dec(S.repeat(S.int, 2, 4), Seq("1", "2")) === Seq(1L, 2L))
    assert(dec(S.repeat(S.repeat(S.int, 0, 100), 0, 100), Seq("1", "2")) ===
      Seq(1L, 2L))
    assert(dec(S.star(S.repeat(S.int, 0, 100)), Seq("1", "2")) ===
      Seq(1L, 2L))
    assert(dec(S.cat(), Seq.empty) === Seq.empty)
    assert(dec(S.cat(), "1") === "1")
    assert(dec(S.cat(), null) === null)
    assert(dec(S.cat(S.int), Seq("1")) === Seq(1L))
    assert(dec(S.cat(S.int, S.keyword), Seq("1", "kikka")) ===
      Seq(1L, ":kikka"))
    assert(dec(S.cat(S.int, S.keyword), Seq("kikka", "kukka")) ===
      Seq("kikka", "kukka")) // candidate fails -> original
    assert(dec(S.catn("n" -> S.int, "k" -> S.keyword), Seq("1", "kikka")) ===
      Seq(1L, ":kikka"))
    // standalone :alt is :or-like over the VALUE (the engine's
    // bounded-form deviation, SURVEY §2.9) — first branch whose DECODE
    // validates wins
    assert(dec(S.alt(S.int, S.keyword), "1") === 1L)
    assert(dec(S.alt(S.keyword, S.int), "1") === ":1")
    assert(dec(S.alt(S.int, S.keyword), "kikka") === ":kikka")
    assert(dec(S.optional(S.int), Seq.empty) === Seq.empty)
    assert(dec(S.optional(S.int), Seq("1")) === Seq(1L))
    assert(dec(S.optional(S.int), Seq("1", "2")) === Seq("1", "2")) // too long
    assert(dec(S.star(S.int), Seq("1", "2")) === Seq(1L, 2L))
    assert(dec(S.star(S.int), Seq("1", "kikka")) === Seq("1", "kikka"))
    assert(dec(S.plus(S.int), Seq.empty) === Seq.empty) // invalid, kept
    assert(dec(S.repeat(S.int, 2, 4), Seq("1")) === Seq("1")) // < min
    assert(dec(S.repeat(S.int, 2, 4), Seq("1", "2", "3", "4", "5")) ===
      Seq("1", "2", "3", "4", "5")) // > max
  }

  test("seqex encode gates on the INPUT validating (fixtures :395-433)") {
    assert(enc(S.cat(S.int), Seq(1L)) === Seq("1"))
    assert(enc(S.cat(S.int, S.keyword), Seq(1L, ":kikka")) ===
      Seq("1", "kikka"))
    assert(enc(S.cat(S.int, S.keyword), Seq(":kikka", ":kukka")) ===
      Seq(":kikka", ":kukka")) // input invalid -> unchanged
    assert(enc(S.alt(S.keyword, S.int), ":1") === "1")
    assert(enc(S.star(S.int), Seq(1L, 2L)) === Seq("1", "2"))
    assert(enc(S.star(S.int), Seq(1L, ":kikka")) === Seq(1L, ":kikka"))
    assert(enc(S.repeat(S.int, 2, 4), Seq(1L)) === Seq(1L))
    assert(enc(S.repeat(S.int, 2, 4), Seq(1L, 2L)) === Seq("1", "2"))
  }

  test("containers, :or, :and and hints at value level") {
    // heterogeneous :or — impossible in one column, exact here
    val or = S.or(S.posInt, S.keyword)
    assert(dec(or, "5") === 5L)
    assert(dec(or, "-1") === ":-1")
    // maps decode entries in place, unknown keys ride
    val m = S.mapE(false, S.req("n", S.int), S.req("kw", S.keyword))
    assert(dec(m, Map("n" -> "5", "kw" -> "en", "x" -> "keep")) ===
      Map("n" -> 5L, "kw" -> ":en", "x" -> "keep"))
    // map-of decodes KEYS too (value maps are not string-bound)
    assert(dec(S.mapOf(S.int, S.int), Map("1" -> "10", "x" -> "y")) ===
      Map(1L -> 10L, "x" -> "y"))
    assert(dec(S.tuple(S.keyword, S.int), Seq("kikka", "1")) ===
      Seq(":kikka", 1L))
    // hints run through full row-level MiniEval
    val hinted = SProps(NodeProps(decodeHints = Seq("string" ->
      THint(enter = Some("str/upper-case")))), S.string)
    assert(dec(hinted, "kikka") === "KIKKA")
    val andHinted = SProps(NodeProps(decodeHints = Seq("string" -> THint(
      enter =
        Some("""(fn [x] (if (re-matches "[0-9]{2}" x) (str x "0") x))"""),
      leave = Some("(fn [x] (if (>= x 100) (* 10 x) x))")))),
      SAnd(Seq(SInt(), SProps(NodeProps(decodeHints = Seq("string" ->
        THint(enter = Some("inc"), leave = Some("(partial * 2)")))),
        SAny))))
    assert(dec(andHinted, "1") === 4L)
    assert(dec(andHinted, "11") === 2220L)
    // encode duals
    assert(enc(m, Map("n" -> 5L, "kw" -> ":en")) ===
      Map("n" -> "5", "kw" -> "en"))
    assert(enc(S.maybe(S.int), null) === null)
    // coerce = decode → validate, Left carries the explain errors
    assert(ValueTransform.coerce(S.int, "5", StringMode) === Right(5L))
    val bad = ValueTransform.coerce(S.int, "abc", StringMode)
    assert(bad.isLeft && bad.left.toOption.get.nonEmpty)
    // :multi decodes through the dispatched branch; unknown dispatch
    // falls to the default, else passes through
    val mu = S.multi("kind", default = Some(S.mapE(false,
      S.req("kind", S.string))))(
      "sized" -> S.mapE(false, S.req("kind", S.string),
        S.req("size", S.int)))
    assert(dec(mu, Map("kind" -> "sized", "size" -> "7")) ===
      Map("kind" -> "sized", "size" -> 7L))
    assert(dec(mu, Map("kind" -> "other", "size" -> "7")) ===
      Map("kind" -> "other", "size" -> "7")) // default branch: size kept
    // recursive decode through a scoped registry (core_test
    // recursive-coercer-test shape): refs deref depth-bounded
    val cons = S.scoped("cons" -> S.maybe(S.mapE(false,
      S.req("head", S.int), S.req("tail", S.ref("cons")))))(S.ref("cons"))
    assert(dec(cons,
      Map("head" -> "1", "tail" -> Map("head" -> "2", "tail" -> null))) ===
      Map("head" -> 1L, "tail" -> Map("head" -> 2L, "tail" -> null)))
  }
}
