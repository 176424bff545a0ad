package mallispark.dev

import mallispark.ir.{SchemaIR, Destructure}
import mallispark.ir.SchemaIR.Registry
import mallispark.ir.Destructure.{Kw, VMap, Edn}
import mallispark.eval.RowEval
import mallispark.msg.Messages
import Virhe._

/** Development-time pretty error reports — the `malli.dev.pretty` port
  * (reference src/malli/dev/pretty.cljc). Every formatter builds a virhe
  * document and renders it through the width-aware layout engine:
  *
  * {{{
  * -- Validation Error ------------------------------------------------- --
  *
  * Value
  *
  *   {:url 42, :lang "xx"}
  *
  * Errors
  *
  *   {:url ["should be a string"], ...}
  * ...
  * }}}
  *
  * Reference formatter → here:
  *   - `::m/explain` (pretty.cljc:41-46) → [[explain]]: masked error
  *     value (`::me/mask-valid-values`, default `...`), humanized nested
  *     errors, the schema form, the docs link.
  *   - `::m/invalid-input` / `::m/invalid-output` (:51-68) →
  *     [[invalidInput]]/[[invalidOutput]] — wired to FnSchemas
  *     counterexamples.
  *   - `::m/invalid-arity` (:79-84) → [[invalidArity]].
  *   - `::m/invalid-schema` with "Did you mean" Levenshtein proposals
  *     over the known tag set (:101-109, me/-most-similar-to) →
  *     [[invalidSchema]].
  *   - `::m/child-error` / `::m/invalid-entry` / `::m/duplicate-keys` /
  *     `::m/invalid-ref` (:95-138) → the matching builders below.
  *
  * The reference pins no byte-exact goldens for these reports (its
  * pretty_test only greps for the title), so PrettySpec pins THIS
  * engine's deterministic renderings; the layout rules they follow are
  * fipp's documented group/align/line semantics (see Virhe). Colors
  * default OFF here (plain `colors = Map.empty` printer) — pass
  * [[Virhe.DarkColors]] for the reference's 256-color output. */
object Pretty {

  val MoreInfo = "https://cljdoc.org/d/metosin/malli/CURRENT"
  val MoreInfoFns = MoreInfo + "/doc/function-schemas"

  /** `pretty/-printer` (pretty.cljc:8-18) — plain colors by default. */
  def printer(width: Int = 80, colors: Map[String, Int] = Map.empty,
              title: String = "Schema Error"): Printer =
    Printer(width = width, colors = colors, title = title)

  // ---- value ↔ EDN bridging ------------------------------------------------

  /** Engine values (what RowEval validates) → the EDN universe Virhe
    * visits: map keys become keywords (the engine's string keys ARE
    * keyword names), numeric path segments become longs. */
  def toEdn(v: Any): Any = v match {
    case m: Map[_, _] =>
      VMap(m.asInstanceOf[Map[String, Any]].toVector
        .sortBy(_._1)
        .map { case (k, x) => (kwOrIdx(k), toEdn(x)) })
    case m: scala.collection.Map[_, _] =>
      toEdn(m.asInstanceOf[scala.collection.Map[String, Any]].toMap)
    case s: Seq[_] => s.map(toEdn).toVector
    case i: Int => i.toLong
    case other => other
  }

  private def kwOrIdx(seg: String): Any =
    if (seg.matches("-?\\d+")) java.lang.Long.valueOf(seg) else Kw(seg)

  /** A schema's vector-syntax form as EDN data (via the form string —
    * SchemaIR.form is the engine's canonical rendering). */
  def schemaEdn(ir: SchemaIR): Any = Edn.read(SchemaIR.form(ir))

  // ---- explain (::m/explain, pretty.cljc:41-46) ------------------------------

  /** Humanized errors in value shape (me/humanize nesting): flat
    * (in-path → messages) rebuilt into nested maps/index maps. */
  def humanizedEdn(errors: Seq[RowEval.Err],
                   overrides: Map[String, String] = Map.empty): Any = {
    val flat = Messages.humanize(
      errors.map(e => e.in.mkString("/") -> e.key), overrides)
    def nest(paths: Map[Seq[String], Seq[String]]): Any = {
      val (leaves, deeper) = paths.partition(_._1.isEmpty)
      val leafMsgs = leaves.values.flatten.toVector.sorted.map(x => x: Any)
      if (deeper.isEmpty) leafMsgs
      else {
        val kids = deeper.groupBy(_._1.head).toVector
          .sortBy(_._1)
          .map { case (seg, sub) =>
            (kwOrIdx(seg),
              nest(sub.map { case (p, ms) => p.tail -> ms }))
          }
        if (leafMsgs.isEmpty) VMap(kids)
        else VMap(kids :+ ((Kw("malli/error"), leafMsgs: Any)))
      }
    }
    nest(flat)
  }

  /** The `::m/explain` report body. `maskValid` plays
    * `::me/mask-valid-values` (default `...`, pretty.cljc:17). */
  def explainDoc(ir: SchemaIR, value: Any, p: Printer,
                 maskValid: Option[String] = Some("..."),
                 overrides: Map[String, String] = Map.empty)(
      implicit reg: Registry = Registry.empty): Option[Doc] = {
    val errors = RowEval.explain(ir, value)
    if (errors.isEmpty) None
    else {
      val errIns = errors.map(_.in.map(_.toString): Seq[String]).toSet
      val masked = toEdn(Messages.errorValue(value, errIns, maskValid)) match {
        case m if maskValid.isDefined =>
          // the reference masks with the SYMBOL ... (prints unquoted)
          replaceMask(m, maskValid.get)
        case m => m
      }
      Some(group(
        block("Value", visit(masked, p), p), DBreak, DBreak,
        block("Errors", visit(humanizedEdn(errors, overrides), p), p),
        DBreak, DBreak,
        block("Schema", visit(schemaEdn(ir), p), p), DBreak, DBreak,
        block("More information", link(MoreInfo, p), p)))
    }
  }

  private def replaceMask(v: Any, mask: String): Any = v match {
    case s: String if s == mask => Destructure.Sym(mask)
    case VMap(ps) => VMap(ps.map { case (k, x) =>
      (k, replaceMask(x, mask)) })
    case xs: Vector[_] => xs.map(replaceMask(_, mask))
    case other => other
  }

  /** `pretty/explain` (pretty.cljc:186-190): None when valid, else the
    * rendered "Validation Error" report. */
  def explain(ir: SchemaIR, value: Any, p: Printer = printer(width = 60),
              overrides: Map[String, String] = Map.empty)(
      implicit reg: Registry = Registry.empty): Option[String] =
    explainDoc(ir, value, p, overrides = overrides)
      .map(body => render(section("Validation Error", None, body, p), p))

  // ---- function-schema reports (pretty.cljc:51-84) ----------------------------

  /** Per-error maps for the Errors block of the fn reports
    * (pretty.cljc:20-22 `-errors`: one sorted map per error, one per
    * line). */
  private def errorMaps(ir: SchemaIR, value: Any, p: Printer)(
      implicit reg: Registry): Doc = {
    val errors = RowEval.explain(ir, value)
    val docs = errors.map { e =>
      // the error's leaf schema, resolved down the schema path where the
      // tree supports it (entry keys), else the root
      val leaf = SchemaIR.getIn(ir, e.path).getOrElse(ir)
      visit(VMap(Vector(
        (Kw("in"), e.in.map(kwSegment).toVector: Any),
        (Kw("message"), Messages.message(e.key): Any),
        (Kw("path"), e.path.map(kwSegment).toVector: Any),
        (Kw("schema"), schemaEdn(leaf)),
        (Kw("value"), toEdn(e.value)))), p)
    }
    span(docs.flatMap(d => Vector(d, DBreak)).dropRight(1): _*)
  }

  private def kwSegment(seg: String): Any =
    if (seg.matches("-?\\d+")) java.lang.Long.valueOf(seg) else Kw(seg)

  def invalidInput(inputIr: SchemaIR, args: Seq[Any],
                   fnName: Option[String] = None,
                   p: Printer = printer())(
      implicit reg: Registry = Registry.empty): String = {
    val body = group(
      block("Invalid function arguments", visit(args.map(toEdn).toVector, p), p),
      DBreak, DBreak) +:
      fnName.toVector.map(n => group(
        block("Function Var", visit(Destructure.Sym(n), p), p),
        DBreak, DBreak)) :+
      group(
        block("Input Schema", visit(schemaEdn(inputIr), p), p), DBreak, DBreak,
        block("Errors", errorMaps(inputIr, args, p), p), DBreak, DBreak,
        block("More information", link(MoreInfoFns, p), p))
    render(section("Invalid Function Input", None,
      span(body: _*), p), p)
  }

  def invalidOutput(outputIr: SchemaIR, value: Any, args: Seq[Any],
                    fnName: Option[String] = None,
                    p: Printer = printer())(
      implicit reg: Registry = Registry.empty): String = {
    val body = group(
      block("Invalid function return value", visit(toEdn(value), p), p),
      DBreak, DBreak) +:
      fnName.toVector.map(n => group(
        block("Function Var", visit(Destructure.Sym(n), p), p),
        DBreak, DBreak)) :+
      group(
        block("Function arguments", visit(args.map(toEdn).toVector, p), p),
        DBreak, DBreak,
        block("Output Schema", visit(schemaEdn(outputIr), p), p), DBreak, DBreak,
        block("Errors", errorMaps(outputIr, value, p), p), DBreak, DBreak,
        block("More information", link(MoreInfoFns, p), p))
    render(section("Invalid Function Output", None, span(body: _*), p), p)
  }

  /** `::m/invalid-guard` (pretty.cljc:70-77): the guard schema sees the
    * `[args ret]` pair. */
  def invalidGuard(guardIr: SchemaIR, args: Seq[Any], ret: Any,
                   fnName: Option[String] = None,
                   p: Printer = printer())(
      implicit reg: Registry = Registry.empty): String = {
    val pair = Seq(args, ret)
    val body = fnName.toVector.map(n => group(
      block("Function Var", visit(Destructure.Sym(n), p), p),
      DBreak, DBreak)) :+
      group(
        block("Guard arguments", visit(toEdn(pair), p), p), DBreak, DBreak,
        block("Guard Schema", visit(schemaEdn(guardIr), p), p), DBreak, DBreak,
        block("Errors", errorMaps(guardIr, pair, p), p), DBreak, DBreak,
        block("More information", link(MoreInfoFns, p), p))
    render(section("Function Guard Error", None, span(body: _*), p), p)
  }

  def invalidArity(args: Seq[Any], arity: Int, schemaForm: String,
                   p: Printer = printer()): String =
    render(section(p.title, None, group(
      block(s"Invalid function arity ($arity)",
        visit(args.map(toEdn).toVector, p), p), DBreak, DBreak,
      block("Function Schema", visit(Edn.read(schemaForm), p), p),
      DBreak, DBreak,
      block("More information", link(MoreInfoFns, p), p)), p), p)

  // ---- schema-creation reports (pretty.cljc:95-138) ----------------------------

  /** `::m/invalid-schema` with "Did you mean" proposals — nearest known
    * tags by the same Levenshtein tolerance me/-most-similar-to uses
    * (Messages.spellCheck). */
  def invalidSchema(form: String, knownTags: Set[String],
                    p: Printer = printer()): String = {
    val tag = Edn.read(form) match {
      case k: Kw => k.toString
      case xs: Vector[_] => xs.headOption.map(Edn.print).getOrElse(form)
      case other => Edn.print(other)
    }
    val proposal = Messages.spellCheck(tag, knownTags)
    val blocks = Vector(
      block("Invalid Schema", visit(Edn.read(form), p), p)) ++
      proposal.map(t => block("Did you mean", visit(Kw(t.stripPrefix(":")), p), p)) :+
      block("More information", link(MoreInfo, p), p)
    render(section("Schema Creation Error", None,
      span(blocks.flatMap(b => Vector(b: Doc, DBreak, DBreak)).dropRight(2): _*),
      p), p)
  }

  def duplicateKeys(keys: Seq[Any], p: Printer = printer()): String =
    render(section("Schema Creation Error", None, group(
      block("Duplicate Keys", visit(keys.map(toEdn).toVector, p), p),
      DBreak, DBreak,
      block("More information", link(MoreInfo, p), p)), p), p)

  /** `::m/invalid-entry`: a 1-element entry proposes `[k :any]`. */
  def invalidEntry(entry: Vector[Any], p: Printer = printer()): String = {
    val example = if (entry.size == 1) entry :+ (Kw("any"): Any) else entry
    render(section("Schema Creation Error", None, group(
      block("Invalid Entry", visit(entry, p), p), DBreak, DBreak,
      block("Did you mean", visit(example, p), p), DBreak, DBreak,
      block("More information", link(MoreInfo, p), p)), p), p)
  }

  def childError(form: String, childCount: Int, min: Int, max: Option[Int],
                 p: Printer = printer()): String = {
    val constraints = VMap(
      Vector((Kw("min"): Any, min.toLong: Any)) ++
        max.map(m => (Kw("max"): Any, m.toLong: Any)))
    render(section("Schema Creation Error", None, group(
      block("Invalid Schema", visit(Edn.read(form), p), p), DBreak, DBreak,
      block("Reason", span(text("Schema has "),
        visit(childCount.toLong, p),
        text(if (childCount == 1) " child" else " children"),
        text(", expected "), visit(constraints, p)), p), DBreak, DBreak,
      block("More information", link(MoreInfo, p), p)), p), p)
  }

  def invalidRef(ref: String, p: Printer = printer()): String =
    render(section(p.title, None, group(
      block("Invalid Reference",
        visit(Vector(Kw("ref"), Kw(ref.stripPrefix(":"))), p), p),
      DBreak, DBreak,
      block("Reason", span(text("Reference should be a registered schema name")), p),
      DBreak, DBreak,
      block("More information", link(MoreInfo, p), p)), p), p)

  // ---- reporter / thrower (pretty.cljc:164-179) --------------------------------

  /** `pretty/thrower`: render the report, then throw with it as the
    * message (instrument-style fail-fast with a readable report). */
  def thrower(p: Printer = printer()): (String, String) => Nothing =
    (tpe, report) => throw new IllegalArgumentException(s"$tpe\n$report")
}
