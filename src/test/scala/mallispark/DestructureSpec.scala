package mallispark

import org.scalatest.funsuite.AnyFunSuite
import mallispark.ir.Destructure
import mallispark.ir.Destructure.{Options, InvalidArglist, Edn}

/** malli.destructure parity — every fixture from the reference's
  * test/malli/destructure_test.cljc (both the vanilla and schematized
  * tables, the option variants, the error cases, and the
  * function-schema/infer tests). Expected schemas are the reference's
  * fixture data rendered as EDN strings.
  *
  * Where the reference's own fixture is platform-dependent (clj vs cljs
  * map iteration order, destructure_test.cljc:49-90), this port's
  * deterministic insertion order coincides with the CLJS pinning — those
  * fixtures use the cljs variant. */
class DestructureSpec extends AnyFunSuite {

  private def schemaOf(bind: String, opts: Options = Options()): String =
    Destructure.parse(bind, opts).schemaForm

  // ---- vanilla clojure (destructure_test.cljc:6-216) ----------------------

  test("empty") { assert(schemaOf("[]") === ":cat") }

  test("1 arg") { assert(schemaOf("[a]") === "[:cat :any]") }

  test("2 args") { assert(schemaOf("[a b]") === "[:cat :any :any]") }

  test("2 + varargs") {
    assert(schemaOf("[a b & cs]") === "[:cat :any :any [:* :any]]")
  }

  test("sequence destructuring") {
    assert(schemaOf("[a [b1 [b2] & bs :as bss] & [c1 c2 & cs :as css]]") ===
      "[:cat :any" +
        " [:maybe [:cat [:? :any] [:maybe [:cat [:? :any] [:* :any]]] [:* :any]]]" +
        " [:maybe [:cat [:? :any] [:? :any] [:* :any]]]]")
  }

  test("map destructuring") {
    val bind = """[a {:keys [b]
                     :strs [c]
                     :syms [d]
                     :demo/syms [e]
                     :demo/keys [f]
                     g :demo/g
                     h 123
                     :or {b 0, d 0, f 0}
                     :as map}]"""
    assert(schemaOf(bind) ===
      "[:cat :any [:orn" +
        " [:map [:map" +
          " [:b {:optional true} :any]" +
          " [\"c\" {:optional true} :any]" +
          " [d {:optional true} :any]" +
          " [demo/e {:optional true} :any]" +
          " [:demo/f {:optional true}]" +
          " [:demo/g {:optional true}]" +
          " [123 {:optional true} :any]]]" +
        " [:args [:schema [:* [:alt" +
          " [:cat [:= :b] :any]" +
          " [:cat [:= \"c\"] :any]" +
          " [:cat [:= d] :any]" +
          " [:cat [:= demo/e] :any]" +
          " [:cat [:= :demo/f] :demo/f]" +
          " [:cat [:= :demo/g] :demo/g]" +
          " [:cat [:= 123] :any]" +
          " [:cat [:not [:enum :b \"c\" d demo/e :demo/f :demo/g 123]] :any]]]]]]]")
  }

  test("map destructuring errors") {
    // ::keysz / :kikka/keyz — qualified keywords not named keys|syms are
    // not valid binding-map entries (destructure_test.cljc:91-92)
    intercept[InvalidArglist](Destructure.parse("[{:user/keysz [z]}]"))
    intercept[InvalidArglist](Destructure.parse("[{:kikka/keyz [z]}]"))
  }

  test("map destructuring with required-keys") {
    assert(schemaOf("[{:keys [a :demo/b] :demo/keys [c]}]",
        Options(requiredKeys = true)) ===
      "[:cat [:orn" +
        " [:map [:map [:a :any] :demo/b :demo/c]]" +
        " [:args [:schema [:* [:alt" +
          " [:cat [:= :a] :any]" +
          " [:cat [:= :demo/b] :demo/b]" +
          " [:cat [:= :demo/c] :demo/c]" +
          " [:cat [:not [:enum :a :demo/b :demo/c]] :any]]]]]]]")
  }

  test("map destructuring with required-keys and closed-maps") {
    assert(schemaOf("[{:keys [a :demo/b] :demo/keys [c]}]",
        Options(requiredKeys = true, closedMaps = true)) ===
      "[:cat [:orn" +
        " [:map [:map {:closed true} [:a :any] :demo/b :demo/c]]" +
        " [:args [:schema [:* [:alt" +
          " [:cat [:= :a] :any]" +
          " [:cat [:= :demo/b] :demo/b]" +
          " [:cat [:= :demo/c] :demo/c]]]]]]]")
  }

  test("map destructuring with required-keys, closed-maps and references disallowed") {
    assert(schemaOf("[{:keys [a :demo/b] :demo/keys [c]}]",
        Options(requiredKeys = true, closedMaps = true, references = false)) ===
      "[:cat [:orn" +
        " [:map [:map {:closed true} [:a :any] [:demo/b :any] [:demo/c :any]]]" +
        " [:args [:schema [:* [:alt" +
          " [:cat [:= :a] :any]" +
          " [:cat [:= :demo/b] :any]" +
          " [:cat [:= :demo/c] :any]]]]]]]")
  }

  test("map destructuring with required-keys, closed-maps and no sequential-maps") {
    assert(schemaOf("[{:keys [a :demo/b] :demo/keys [c]}]",
        Options(requiredKeys = true, closedMaps = true, sequentialMaps = false)) ===
      "[:cat [:map {:closed true} [:a :any] :demo/b :demo/c]]")
  }

  test("keyword argument functions also accept maps") {
    val bind = """[a & {:keys [b]
                        :strs [c]
                        :syms [d]
                        :demo/keys [e]
                        :demo/syms [f]
                        :or {b 0, d 0, f 0} :as map}]"""
    // ::md/sequential-maps false has no effect on a REST map (the
    // reference passes it to prove that, destructure_test.cljc:153)
    assert(schemaOf(bind, Options(sequentialMaps = false)) ===
      "[:cat :any [:orn" +
        " [:map [:map" +
          " [:b {:optional true} :any]" +
          " [\"c\" {:optional true} :any]" +
          " [d {:optional true} :any]" +
          " [:demo/e {:optional true}]" +
          " [demo/f {:optional true} :any]]]" +
        " [:args [:* [:alt" +
          " [:cat [:= :b] :any]" +
          " [:cat [:= \"c\"] :any]" +
          " [:cat [:= d] :any]" +
          " [:cat [:= :demo/e] :demo/e]" +
          " [:cat [:= demo/f] :any]" +
          " [:cat [:not [:enum :b \"c\" d :demo/e demo/f]] :any]]]]]]")
  }

  test("nested keyword argument") {
    val inner =
      "[:orn" +
        " [:map [:map [:a {:optional true} :any] [:b {:optional true} :any]]]" +
        " [:args [:* [:alt" +
          " [:cat [:= :a] :any]" +
          " [:cat [:= :b] :any]" +
          " [:cat [:not [:enum :a :b]] :any]]]]]"
    assert(schemaOf("[[& {:keys [a b] :as opts}] & {:keys [a b] :as opts}]") ===
      s"[:cat [:maybe [:cat $inner]] $inner]")
  }

  test("nest right-to-left map syntax") {
    val inner =
      "[:orn" +
        " [:map [:map [:inner {:optional true} :any]]]" +
        " [:args [:schema [:* [:alt" +
          " [:cat [:= :inner] :any]" +
          " [:cat [:not [:enum :inner]] :any]]]]]]"
    assert(schemaOf("[{{inner :inner} :outer}]") ===
      "[:cat [:orn" +
        s" [:map [:map [:outer {:optional true} $inner]]]" +
        " [:args [:schema [:* [:alt" +
          s" [:cat [:= :outer] $inner]" +
          " [:cat [:not [:enum :outer]] :any]]]]]]]")
  }

  // ---- schematized clojure (destructure_test.cljc:218-334) ----------------

  test("schematized: 1 arg") {
    assert(schemaOf("[a :- :int]") === "[:cat :int]")
  }

  test("schematized: 2 args") {
    assert(schemaOf("[a :- :int, b :- :boolean]") === "[:cat :int :boolean]")
  }

  test("schematized: 2 + varargs") {
    assert(schemaOf("[a, b :- :int & cs :- [:* :boolean]]") ===
      "[:cat :any :int [:* :boolean]]")
  }

  test("schematized: sequence destructuring - 1") {
    assert(schemaOf("[a :- :int [b1 :- :int [b2 :- :int] & bs :as bss]]") ===
      "[:cat :int [:maybe [:cat [:? :int]" +
        " [:maybe [:cat [:? :int] [:* :any]]] [:* :any]]]]")
  }

  test("schematized: sequence destructuring - 2 (rest)") {
    assert(schemaOf("[a :- :int [b1 :- :int [b2 :- :int] & bs :- [:* :int] :as bss]]") ===
      "[:cat :int [:maybe [:cat [:? :int]" +
        " [:maybe [:cat [:? :int] [:* :any]]] [:* :int]]]]")
  }

  test("schematized: sequence destructuring - 3 (as)") {
    assert(schemaOf("[a :- :int [b1 :- :int [b2 :- :int] & bs :as bss :- [:* :int]]]") ===
      "[:cat :int [:schema [:* :int]]]")
  }

  test("schematized: sequence destructuring - 4 (bind rest)") {
    assert(schemaOf("[a :- :int & [b1 :- :int [b2 :- :int] & bs :- [:* :int] :as bss]]") ===
      "[:cat :int [:maybe [:cat [:? :int]" +
        " [:maybe [:cat [:? :int] [:* :any]]] [:* :int]]]]")
  }

  test("schematized: map destructuring") {
    val bind = """[a :- :int, {:keys [b]
                               :strs [c]
                               :syms [d]
                               :demo/keys [e]
                               :demo/syms [f]
                               :or {b 0, d 0, f 0} :as map}
                   :- [:map [:b :int] ["c" :int] [d :string]
                       [:demo/e :string] [demo/f :symbol]]]"""
    assert(schemaOf(bind) ===
      "[:cat :int [:map [:b :int] [\"c\" :int] [d :string]" +
        " [:demo/e :string] [demo/f :symbol]]]")
  }

  test("schematized: keyword argument functions also accept maps") {
    val bind = """[& {:keys [b] :strs [c] :syms [d]
                      :demo/keys [e] :demo/syms [f]
                      :or {b 0, d 0, f 0} :as map}
                   :- [:map [:b :int] ["c" :int] [d :string]
                       [:demo/e :string] [demo/f :symbol]]]"""
    assert(schemaOf(bind) ===
      "[:cat [:map [:b :int] [\"c\" :int] [d :string]" +
        " [:demo/e :string] [demo/f :symbol]]]")
  }

  test("schematized: nested keyword argument") {
    assert(schemaOf("[[& {:keys [a b] :as opts} :- [:map [:a :int] [:b :int]]]" +
        " & {:keys [a b] :as opts} :- [:map [:a :int] [:b :int]]]") ===
      "[:cat [:maybe [:cat [:map [:a :int] [:b :int]]]]" +
        " [:map [:a :int] [:b :int]]]")
  }

  test("schematized: derived map keys") {
    val bind = """[{[g :- :int & gs :- [:* :string]] :value
                    [a & as :as aas :- [:* :boolean]] 123}]"""
    assert(schemaOf(bind, Options(sequentialMaps = false, requiredKeys = true)) ===
      "[:cat [:map" +
        " [:value [:maybe [:cat [:? :int] [:* :string]]]]" +
        " [123 [:schema [:* :boolean]]]]]")
  }

  // ---- parse options + arglist output (destructure_test.cljc:336-364) -----

  test("schematized syntax fails when inline-schemas is disabled") {
    assert(schemaOf("[x :- :int]") === "[:cat :int]")
    intercept[InvalidArglist](
      Destructure.parse("[x :- :int]", Options(inlineSchemas = false)))
  }

  test("arglist output strips inline schemas") {
    val r = Destructure.parse("[a :- :int, b :- :boolean & cs :- [:* :int]]")
    assert(r.arglistForm === "[a b & cs]")
    val m = Destructure.parse(
      "[{:keys [a] :or {a 1} :as m} :- [:map [:a :int]]]")
    assert(m.arglistForm === "[{:keys [a], :or {a 1}, :as m}]")
  }

  // ---- function schemas (destructure_test.cljc:369-391) -------------------

  test("function-schema") {
    assert(Edn.print(Destructure.functionSchema(
        Seq("[{:keys [a :demo/b] :demo/keys [c]}]"),
        Options(sequentialMaps = false, requiredKeys = true))) ===
      "[:=> [:cat [:map [:a :any] :demo/b :demo/c]] :any]")
    assert(Edn.print(Destructure.functionSchema(
        Seq("[a :- :int]", "[a :- :int & bs :- [:* :int]]"))) ===
      "[:function [:=> [:cat :int] :any] [:=> [:cat :int [:* :int]] :any]]")
  }

  test("infer (arglists in, Var scraping out of scope)") {
    assert(Edn.print(Destructure.infer(Seq("[a]", "[a & bs]"))) ===
      "[:function [:=> [:cat :any] :any] [:=> [:cat :any [:* :any]] :any]]")
  }

  // ---- malformed bindings ------------------------------------------------

  test("malformed bindings throw") {
    intercept[InvalidArglist](Destructure.parse("[a &]"))        // dangling &
    intercept[InvalidArglist](Destructure.parse("[a :-]"))       // dangling :-
    intercept[InvalidArglist](Destructure.parse("[:kw]"))        // keyword arg
    intercept[InvalidArglist](Destructure.parse("[a :as b]"))    // :as at top level
    intercept[InvalidArglist](Destructure.parse("[{:as 42}]"))   // :as non-symbol
    intercept[InvalidArglist](Destructure.parse("[{:or [b 0]}]")) // :or not a map
  }

  test("Edn string reader: escape table + clean end-of-input errors") {
    // every escape Edn.print emits reads back, plus \t and \r
    assert(Edn.read("\"a\\\"b\"") === "a\"b")
    assert(Edn.read("\"a\\\\b\"") === "a\\b")
    assert(Edn.read("\"a\\nb\"") === "a\nb")
    assert(Edn.read("\"a\\tb\"") === "a\tb")
    assert(Edn.read("\"a\\rb\"") === "a\rb")
    assert(Edn.read(Edn.print("q\\u\"o\tte")) === "q\\u\"o\tte") // round-trip
    // a backslash at end-of-input is an unterminated string, not an
    // index crash
    val e = intercept[IllegalArgumentException](Edn.read("\"ab\\"))
    assert(e.getMessage.contains("unterminated"))
    assert(!e.isInstanceOf[StringIndexOutOfBoundsException])
  }
}
