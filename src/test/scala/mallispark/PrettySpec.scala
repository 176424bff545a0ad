package mallispark

import org.scalatest.funsuite.AnyFunSuite
import mallispark.dev.{Virhe, Pretty}
import mallispark.dev.Virhe._
import mallispark.ir.S
import mallispark.ir.Destructure.{Kw, VMap}

/** malli.dev.virhe + malli.dev.pretty parity. The reference pins no
  * byte-exact goldens (its pretty_test greps the title only,
  * test/malli/dev/pretty_test.cljc:6-18), so these specs pin the
  * layout-engine SEMANTICS (fipp's documented group/align/line rules,
  * which virhe composes — virhe.cljc:127-177) plus this engine's
  * deterministic report renderings. */
class PrettySpec extends AnyFunSuite {

  private val plain = Printer(width = 20, colors = Map.empty)

  // ---- layout engine -------------------------------------------------------

  test("group renders flat when it fits, broken when it does not") {
    val d = group(text("["), align(0, text("aa"), DLine, text("bb")), text("]"))
    assert(render(d, Printer(width = 20, colors = Map.empty)) === "[aa bb]")
    assert(render(d, Printer(width = 5, colors = Map.empty)) === "[aa\n bb]")
  }

  test("align indents to the column where it starts") {
    val d = group(text("xy"), text("["),
      align(0, text("1"), DLine, text("2")), text("]"))
    // the align begins at column 3 → the broken line indents to 3
    assert(render(d, Printer(width = 4, colors = Map.empty)) === "xy[1\n   2]")
  }

  test("a hard break forces the enclosing group to break") {
    val d = group(text("a"), DBreak, text("b"))
    assert(render(d, Printer(width = 80, colors = Map.empty)) === "a\nb")
  }

  test("align entered after a break indents the following text") {
    // the -block shape: label, blank line, 2-aligned body
    val d = block("Value", text("42"), plain)
    assert(render(d, plain) === "Value\n\n  42")
  }

  test("pass nodes are zero-width for fitting") {
    val colored = Printer(width = 7, colors = Map("text" -> 253))
    val d = group(color("text", text("aaa"), colored), DLine, text("bbb"))
    // 3+1+3 = 7 fits even though the ANSI codes add invisible characters
    assert(render(d, colored) ===
      "[38;5;253maaa[0m bbb")
  }

  test("empty colors render plain (virhe.cljc:25-31 fallthrough)") {
    assert(render(color("title", text("x"), plain), plain) === "x")
  }

  // ---- EDN visitor ---------------------------------------------------------

  test("maps sort keys with the cross-type rank") {
    val m = VMap(Vector(
      (Kw("b"), 1L), ("s", 2L), (3L, 3L), (Kw("a"), 4L)))
    // numbers < strings < keywords; keywords alphabetical
    assert(render(visit(m, plain), Printer(width = 80, colors = Map.empty)) ===
      "{3 3, \"s\" 2, :a 4, :b 1}")
  }

  test("wide collections break one element per line, aligned") {
    val v = Vector(Kw("aaaa"): Any, Kw("bbbb"): Any, Kw("cccc"): Any)
    // 19 flat chars: fits at width 20, breaks (aligned to col 1) at 10
    assert(render(visit(v, plain), plain) === "[:aaaa :bbbb :cccc]")
    assert(render(visit(v, plain), Printer(width = 10, colors = Map.empty)) ===
      "[:aaaa\n :bbbb\n :cccc]")
  }

  test("title bar pads to the printer width") {
    val p = Printer(width = 40, colors = Map.empty)
    val t = render(title("Some Error", None, p), p)
    assert(t.length === 40)
    assert(t === "-- Some Error ---------------------------".take(40))
    assert(render(footer(p), p) === "-" * 40)
  }

  // ---- pretty reports -------------------------------------------------------

  private val schema = S.mapE(false,
    S.req("url", S.string),
    S.req("count", S.intMin(0L)),
    S.opt("lang", S.enum_("en", "de")))

  test("explain returns None for valid values (pretty_test.cljc:7)") {
    assert(Pretty.explain(schema,
      Map("url" -> "http://x", "count" -> 1L)).isEmpty)
  }

  test("explain renders the Validation Error report") {
    val out = Pretty.explain(schema,
      Map("url" -> 42L, "count" -> 3L, "lang" -> "xx")).get
    assert(out ===
      """-- Validation Error ----------------------------------------
        |
        |Value
        |
        |  {:count ..., :lang "xx", :url 42}
        |
        |Errors
        |
        |  {:lang ["should be one of the allowed values"],
        |   :url ["should be a string"]}
        |
        |Schema
        |
        |  [:map
        |   [:url :string]
        |   [:count [:int {:min 0}]]
        |   [:lang {:optional true} [:enum "en" "de"]]]
        |
        |More information
        |
        |  https://cljdoc.org/d/metosin/malli/CURRENT
        |
        |------------------------------------------------------------""".stripMargin)
  }

  test("explain masks valid leaves with ... (::me/mask-valid-values)") {
    val out = Pretty.explain(schema,
      Map("url" -> 42L, "count" -> 3L, "lang" -> "en")).get
    assert(out.contains("{:count ..., :lang ..., :url 42}"))
  }

  test("invalid-input report includes args, var, schema and error maps") {
    val out = Pretty.invalidInput(S.string, Seq(42L),
      Some("graft.pages/valid-page?"))
    assert(out.startsWith(
      "-- Invalid Function Input ----------------------------------" +
        "--------------------"))
    assert(out.contains("Invalid function arguments\n\n  [42]"))
    assert(out.contains("Function Var\n\n  graft.pages/valid-page?"))
    assert(out.contains("Input Schema\n\n  :string"))
    assert(out.contains("{:in [],\n   :message \"should be a string\",\n" +
      "   :path [],\n   :schema :string,\n   :value [42]}"))
    assert(out.endsWith("-" * 80))
  }

  test("invalid-schema proposes the nearest known tag (Did you mean)") {
    val out = Pretty.invalidSchema(":strng", Set(":string", ":int", ":double"))
    assert(out.contains("Invalid Schema\n\n  :strng"))
    assert(out.contains("Did you mean\n\n  :string"))
    // no proposal within tolerance → no block
    val far = Pretty.invalidSchema(":zzzzzzz", Set(":string", ":int"))
    assert(!far.contains("Did you mean"))
  }

  test("child-error report renders the constraint reason") {
    val out = Pretty.childError("[:maybe]", 0, 1, Some(1))
    // the visitor's rank sort orders map keys alphabetically: :max < :min
    assert(out.contains(
      "Reason\n\n  Schema has 0 children, expected {:max 1, :min 1}"))
  }

  test("invalid-entry proposes the :any completion") {
    val out = Pretty.invalidEntry(Vector(Kw("id")))
    assert(out.contains("Invalid Entry\n\n  [:id]"))
    assert(out.contains("Did you mean\n\n  [:id :any]"))
  }

  test("duplicate-keys report") {
    val out = Pretty.duplicateKeys(Seq(Kw("x"), Kw("x")))
    assert(out.contains("Duplicate Keys\n\n  [:x :x]"))
  }

  test("humanize nests error messages in value shape") {
    val errs = mallispark.eval.RowEval.explain(schema,
      Map("url" -> 42L, "count" -> -1L))
    val nested = Pretty.humanizedEdn(errs)
    assert(mallispark.ir.Destructure.Edn.print(nested) ===
      """{:count ["should be an int"], :url ["should be a string"]}""")
  }

  test("thrower throws with the report as message") {
    val ex = intercept[IllegalArgumentException](
      Pretty.thrower()("::m/explain", "REPORT"))
    assert(ex.getMessage.contains("REPORT"))
  }
}
