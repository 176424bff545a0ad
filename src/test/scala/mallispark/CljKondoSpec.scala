package mallispark

import org.scalatest.funsuite.AnyFunSuite
import mallispark.ir.{CljKondo, S}

/** clj-kondo linter-config emitter vs the reference's own integration
  * fixtures (clj_kondo_test.cljc:9-160). Pure-JVM. */
class CljKondoSpec extends AnyFunSuite {

  // the reference integration Schema (clj_kondo_test.cljc:9-30) adapted
  // to the engine IR: registry refs pre-resolved (the reference walk
  // derefs ::m/schema the same way), keywords in their canonical ":name"
  // string form
  private val schema = S.mapE(false,
    S.req("id", S.string),
    S.opt("price", S.double),
    S.req("name", S.string),
    S.req("description", S.maybe(S.string)),
    S.opt("tags", S.set(S.qualifiedKeyword)),
    S.opt("y", S.boolean),
    S.req("select-keys", S.maybe(S.selectKeysOf(
      S.mapE(false, S.req("x", S.int), S.req("y", S.int)), "x"))),
    S.req("xyz", S.any),
    S.req("xyz2", S.maybe(S.any)),
    S.req("xyz3", S.maybe(S.int)),
    S.req("tuple-of-ints", S.maybe(S.tuple(S.int, S.int))),
    S.req("nested", S.mergeOf(
      S.mapE(false, S.req("id", S.string)),
      S.mapE(false, S.req("price", S.double)))),
    S.req("string-type-enum", S.maybe(S.enum_("b", "c"))),
    S.req("keyword-type-enum", S.enum_(":a", ":b")),
    S.req("any-type-enum", S.enum_(":a", "b", "c")),
    S.req("z", S.vector(S.mapOf(S.int, S.int))))

  test("integration schema transform matches the reference fixture") {
    // expected type map from clj-kondo-integration-test
    // (clj_kondo_test.cljc:87-109); :op/:opt/:req/:nilable print order
    assert(CljKondo.edn(CljKondo.transform(schema)) ===
      "{:op :keys, " +
        ":opt {:price :double, :tags :set, :y :boolean}, " +
        ":req {:id :string, :name :string, " +
        ":description :nilable/string, " +
        ":select-keys {:op :keys, :req {:x :int}, :nilable true}, " +
        ":xyz :any, :xyz2 :any, :xyz3 :nilable/int, " +
        ":tuple-of-ints :nilable/seqable, " +
        ":nested {:op :keys, :req {:id :string, :price :double}}, " +
        ":string-type-enum :nilable/string, " +
        ":keyword-type-enum :keyword, :any-type-enum :any, " +
        ":z :vector}}")
  }

  test("sequential elements + regex (clj_kondo_test.cljc:151-160)") {
    assert(CljKondo.edn(CljKondo.transform(S.repeat(S.int, 0, 3))) ===
      ":seqable")
    assert(CljKondo.edn(CljKondo.transform(
      S.repeat(S.mapE(false, S.req("price", S.int)), 0, 3))) === ":seqable")
    assert(CljKondo.edn(CljKondo.transform(
      S.repeat(S.tuple(S.int), 0, 3))) === ":seqable")
    // ":re models a string, clj-kondo's :regex a Pattern object"
    assert(CljKondo.edn(CljKondo.transform(S.re("kikka"))) === ":string")
  }

  test("repetition inside a map entry stays :seqable (issues 1922-1..3)") {
    for (rep <- Seq(S.plus(S.keyword), S.star(S.int),
                    S.optional(S.string))) {
      val d = CljKondo.FnDef("t", "f",
        Seq(S.mapE(false, S.req("keys", rep))), S.nil)
      assert(CljKondo.linterConfig(Seq(d)).contains(
        "f {:arities {1 {:args [{:op :keys, :req {:keys :seqable}}], " +
          ":ret :nil}}}"))
    }
  }

  test("linter config matches the kikka/varargs/836 fixtures") {
    // kikka arities (clj_kondo_test.cljc:36-39 + expected :105-112):
    // 1-ary [:int]->:int, varargs [:int :int & :int]->:int min-arity 2
    val kikka1 = CljKondo.FnDef("my.ns", "kikka", Seq(S.int), S.intMin(0L))
    val kikkaV = CljKondo.FnDef("my.ns", "kikka", Seq(S.int, S.int), S.int,
      rest = Some(S.int))
    // issue-836: a :fn predicate arg/ret type-checks as :any, not :fn
    val checked = CljKondo.FnDef("my.ns", "checked",
      Seq(S.int, S.fn("int?")(_ => true), S.int), S.fn("int?")(_ => true))
    assert(CljKondo.linterConfig(Seq(kikka1, kikkaV, checked)) ===
      "{:linters {:unresolved-symbol {:exclude [(malli.core/=>)]}, " +
        ":type-mismatch {:namespaces {my.ns {" +
        "kikka {:arities {1 {:args [:int], :ret :int}, " +
        ":varargs {:args [:int :int {:op :rest, :spec :int}], " +
        ":ret :int, :min-arity 2}}}, " +
        "checked {:arities {3 {:args [:int :any :int], :ret :any}}}}}}}}")
  }

  test("fromFnSchema bridges the registered function-schema surface") {
    val fs = mallispark.gen.FnSchemas.FnSchema(Seq(S.int, S.string), S.boolean)
    val d = CljKondo.fromFnSchema("app", "check", fs)
    assert(CljKondo.linterConfig(Seq(d)).contains(
      "check {:arities {2 {:args [:int :string], :ret :boolean}}}"))
  }
}
