package mallispark.dev

import mallispark.ir.Destructure.{Kw, Sym, VMap, Edn}

/** Development-time error-document layout — the `malli.dev.virhe` port
  * (reference src/malli/dev/virhe.cljc, itself "initial code for
  * metosin/virhe" on top of fipp).
  *
  * Documents are the same node algebra fipp documents use
  * (virhe.cljc:127-177 composes them; fipp.engine defines them):
  *
  *   - a String — literal text
  *   - [[DSpan]] — concatenation
  *   - [[DGroup]] — render flat if the whole group fits the remaining
  *     width, else break its lines
  *   - [[DAlign]] — set the indent of contained newlines to the column
  *     where the align starts (+offset)
  *   - [[DLine]] — a space when the enclosing group is flat, a newline
  *     when broken
  *   - [[DBreak]] — a hard newline (a group containing one never fits)
  *   - [[DPass]] — zero-width passthrough (ANSI color codes)
  *
  * The renderer is the classic Wadler "fits in remaining width" layout
  * (documents here are small reports, so the simple recursive form
  * replaces fipp's streaming bounded-lookahead engine). The EDN visitor
  * mirrors virhe's EdnPrinter (virhe.cljc:37-106): map entries sorted
  * with a cross-type rank (arrangement.core semantics), colored leaves,
  * `, `-free map pairs (`{:a 1, :b 2}` broken over lines when wide).
  *
  * Values are the engine's EDN universe (mallispark.ir.Destructure):
  * Kw/Sym/VMap/Vector/String/Long/Boolean/null. */
object Virhe {

  // ---- document nodes ----------------------------------------------------

  sealed trait Doc
  final case class DText(s: String) extends Doc
  final case class DSpan(children: Vector[Doc]) extends Doc
  final case class DGroup(children: Vector[Doc]) extends Doc
  final case class DAlign(offset: Int, children: Vector[Doc]) extends Doc
  case object DLine extends Doc
  case object DBreak extends Doc
  final case class DPass(s: String) extends Doc

  def text(s: String): Doc = DText(s)
  def span(ds: Doc*): Doc = DSpan(ds.toVector)
  def group(ds: Doc*): Doc = DGroup(ds.toVector)
  def align(offset: Int, ds: Doc*): Doc = DAlign(offset, ds.toVector)

  // ---- colors (virhe.cljc:15-31) -----------------------------------------

  /** 256-color codes, the reference's -dark-colors table. */
  val DarkColors: Map[String, Int] = Map(
    "title" -> 45, "title-dark" -> 32, "text" -> 253, "link" -> 255,
    "string" -> 180, "constant" -> 149, "type" -> 123, "error" -> 196)

  /** Printer options. An EMPTY colors map renders plain (the reference's
    * `-color` falls through to `[:span body]` when the lookup and the
    * :error fallback both miss, virhe.cljc:25-31). */
  final case class Printer(width: Int = 80,
                           colors: Map[String, Int] = DarkColors,
                           title: String = "Error")

  def color(key: String, body: Doc, p: Printer): Doc =
    p.colors.get(key).orElse(p.colors.get("error")) match {
      case Some(c) => span(DPass(s"[38;5;${c}m"), body, DPass("[0m"))
      case None => span(body)
    }

  // ---- EDN visitor (virhe.cljc:37-106) -------------------------------------

  /** arrangement.core/rank — total order across types: nil, booleans,
    * numbers, strings, keywords, symbols, then collections. */
  private def rankClass(x: Any): Int = x match {
    case null => 0
    case _: java.lang.Boolean => 1
    case _: Long | _: Int | _: Double => 2
    case _: String => 3
    case _: Kw => 4
    case _: Sym => 5
    case _: Vector[_] => 6
    case _ => 7
  }

  private def rankLt(a: Any, b: Any): Boolean = {
    val (ca, cb) = (rankClass(a), rankClass(b))
    if (ca != cb) ca < cb
    else (a, b) match {
      case (x: java.lang.Boolean, y: java.lang.Boolean) => !x.booleanValue && y.booleanValue
      case (x: Long, y: Long) => x < y
      case (x: String, y: String) => x < y
      case (x: Kw, y: Kw) => x.toString < y.toString
      case (x: Sym, y: Sym) => x.toString < y.toString
      case _ => Edn.print(a) < Edn.print(b)
    }
  }

  /** visit — EDN value → colored document. */
  def visit(x: Any, p: Printer): Doc = x match {
    case null => color("text", text("nil"), p)
    case b: java.lang.Boolean => color("text", text(b.toString), p)
    case s: String => color("string", text(Edn.print(s)), p)
    case k: Kw => color("constant", text(k.toString), p)
    case s: Sym => color("text", text(s.toString), p)
    case n @ (_: Long | _: Int | _: Double) =>
      color("text", text(String.valueOf(n)), p)
    case xs: Vector[_] =>
      prettyColl(color("text", text("["), p), xs.map(visit(_, p)),
        Vector(DLine), color("text", text("]"), p))
    case VMap(pairs) =>
      val sorted = pairs.sortWith((a, b) => rankLt(a._1, b._1))
      prettyColl(color("text", text("{"), p),
        sorted.map { case (k, v) => span(visit(k, p), text(" "), visit(v, p)) },
        Vector(span(color("text", text(","), p)), DLine),
        color("text", text("}"), p))
    case d: Doc => d // pre-built documents pass through
    case other => color("text", text(String.valueOf(other)), p)
  }

  /** fipp.edn/pretty-coll shape: [:group open [:align items…] close]. */
  private def prettyColl(open: Doc, items: Vector[Doc], sep: Vector[Doc],
                         close: Doc): Doc = {
    val body = items.zipWithIndex.flatMap { case (d, i) =>
      if (i == 0) Vector(d) else sep :+ d
    }
    DGroup(Vector(open, DAlign(0, body), close))
  }

  // ---- layout (render) ------------------------------------------------------

  /** Flat width of a document; None when it contains a hard break. */
  private def flatWidth(d: Doc): Option[Int] = d match {
    case DText(s) => Some(s.length)
    case DPass(_) => Some(0)
    case DLine => Some(1)
    case DBreak => None
    case DSpan(cs) => widths(cs)
    case DGroup(cs) => widths(cs)
    case DAlign(_, cs) => widths(cs)
  }

  private def widths(cs: Vector[Doc]): Option[Int] =
    cs.foldLeft(Option(0)) { (acc, c) =>
      for (a <- acc; w <- flatWidth(c)) yield a + w
    }

  /** Newlines defer their indentation: the pad is emitted when the next
    * visible text arrives, at the indentation IN EFFECT THERE (fipp
    * emits per-line indentation the same way — an `[:align 2 body]`
    * entered right after a break indents the body, not the break). */
  def render(d: Doc, p: Printer): String = {
    val sb = new StringBuilder
    var col = 0
    var atStart = false // pending newline, pad on next text
    def pad(indent: Int): Unit =
      if (atStart) { sb ++= " " * indent; col = indent; atStart = false }
    def go(d: Doc, indent: Int, flat: Boolean): Unit = d match {
      case DText(s) => pad(indent); sb ++= s; col += s.length
      case DPass(s) => pad(indent); sb ++= s // zero width
      case DLine =>
        if (flat) { pad(indent); sb += ' '; col += 1 }
        else { sb += '\n'; col = 0; atStart = true }
      case DBreak => sb += '\n'; col = 0; atStart = true
      case DSpan(cs) => cs.foreach(go(_, indent, flat))
      case DAlign(off, cs) =>
        val here = (if (atStart) indent else col) + off
        cs.foreach(go(_, here, flat))
      case DGroup(cs) =>
        val at = if (atStart) indent else col
        val fits = widths(cs).exists(_ <= p.width - at)
        cs.foreach(go(_, indent, fits))
    }
    go(d, 0, flat = false)
    sb.toString
  }

  // ---- report scaffolding (virhe.cljc:151-177) -------------------------------

  def title(message: String, source: Option[String], p: Printer): Doc = {
    val between = p.width - message.length - 8 - source.fold(0)(_.length)
    group(
      color("title-dark", text("-- "), p),
      color("title", span(text(message), text(" ")), p),
      color("title-dark", text("-" * math.max(0, between)), p),
      source.fold(color("title-dark", text("--"), p))(s =>
        color("title", span(text(" "), text(s), text(" ")), p)),
      color("title-dark", text("--"), p))
  }

  def footer(p: Printer): Doc = color("title-dark", text("-" * p.width), p)

  def section(titleText: String, source: Option[String], body: Doc,
              p: Printer): Doc =
    group(title(titleText, source, p), DBreak, DBreak, body, DBreak, DBreak,
      footer(p))

  def block(label: String, body: Doc, p: Printer): Doc =
    group(color("text", text(label), p), DBreak, DBreak, align(2, body))

  def link(url: String, p: Printer): Doc = color("link", text(url), p)
}
