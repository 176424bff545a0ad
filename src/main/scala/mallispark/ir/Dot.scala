package mallispark.ir

import SchemaIR._

/** Graphviz DOT emitter — the `malli.dot` analogue (reference:
  * src/malli/dot.cljc:1-83; fixtures: test/malli/dot_test.cljc).
  *
  * Same pipeline as the reference: lift (anonymous schemas become a
  * one-entry registry under `:mallispark.dot/schema`), normalize
  * (nested `:map`s inside a registry entry are extracted into their own
  * `Base$Path$Segments` entities and replaced by references), then emit
  * record-shaped nodes (one line per map entry) and back-edges for
  * every reference — `diamond` arrowtails for extracted entities
  * (composition), `odiamond` for explicit registry members
  * (aggregation). Entry forms use this engine's vector syntax where the
  * Clojure original prints predicate symbols (`:string` vs `string?`).
  *
  * Driver-side dev tooling; no Spark surface. */
object Dot {

  private val AnonName = ":mallispark.dot/schema"

  private def esc(s: String): String =
    s.flatMap {
      case '>' => "\\>"
      case '<' => "\\<"
      case '{' => "\\{"
      case '}' => "\\}"
      case '"' => "\\\""
      case c => c.toString
    }

  private def cap(s: String): String =
    if (s.isEmpty) s else s.head.toUpper.toString + s.tail

  /** Extract nested `:map`s of `v` (post-order, like the reference's
    * m/walk) into `acc` under `base$CapSegments` names; returns the
    * rewritten schema. `extracted` collects the entity names. */
  private def normalize(base: String, v: SchemaIR,
                        acc: scala.collection.mutable.LinkedHashMap[String, SchemaIR],
                        extracted: scala.collection.mutable.LinkedHashSet[String]): SchemaIR = {
    def go(s: SchemaIR, path: Vector[String]): SchemaIR = {
      val rewritten = s match {
        case m: SMap => m.copy(entries = m.entries.map(e =>
          e.copy(child = go(e.child, path :+ e.key))))
        case SVector(c, mn, mx) => SVector(go(c, path), mn, mx)
        case SSeqable(c, mn, mx) => SSeqable(go(c, path), mn, mx)
        case SSet(c, mn, mx) => SSet(go(c, path), mn, mx)
        case SEvery(c, mn, mx, l) => SEvery(go(c, path), mn, mx, l)
        case SMaybe(c) => SMaybe(go(c, path))
        case SMapOf(k, vv, mn, mx) => SMapOf(go(k, path), go(vv, path), mn, mx)
        case STuple(cs) => STuple(cs.map(go(_, path)))
        case SAnd(cs) => SAnd(cs.map(go(_, path)))
        case SOr(cs) => SOr(cs.map(go(_, path)))
        // tagged branches contribute their tag to the entity path (the
        // reference's m/walk does the same via the branch key); untagged
        // positional regex ops keep the path — their members stay inline
        case SOrn(bs) => SOrn(bs.map { case (t, c) => (t, go(c, path :+ t)) })
        case SAndn(bs) =>
          SAndn(bs.map { case (t, c) => (t, go(c, path :+ t)) })
        case SMulti(dk, bs, d) =>
          SMulti(dk, bs.map { case (t, c) => (t, go(c, path :+ t)) },
            d.map(go(_, path)))
        case SCat(cs) => SCat(cs.map(go(_, path)))
        case SCatn(es) =>
          SCatn(es.map { case (t, c) => (t, go(c, path :+ t)) })
        case SAlt(cs) => SAlt(cs.map(go(_, path)))
        case SAltn(es) =>
          SAltn(es.map { case (t, c) => (t, go(c, path :+ t)) })
        case SStar(c) => SStar(go(c, path))
        case SPlus(c) => SPlus(go(c, path))
        case SOpt(c) => SOpt(go(c, path))
        case SRepeat(c, mn, mx) => SRepeat(go(c, path), mn, mx)
        case SProps(p, c) => SProps(p, go(c, path))
        case other => other // leaves and refs stay in place
      }
      rewritten match {
        case m: SMap if path.nonEmpty =>
          val name = (base +: path.map(cap)).mkString("$")
          acc(name) = m
          extracted += name
          SRef(name)
        case other => other
      }
    }
    go(v, Vector.empty)
  }

  private def refsOf(s: SchemaIR): Set[String] = s match {
    case SRef(n) => Set(n)
    case other => SchemaIR.childrenWithPath(other)
      .map(_._2).map(refsOf).foldLeft(Set.empty[String])(_ ++ _)
  }

  /** Record label: map entries one per `\l` line (`:key child-form`,
    * extracted entities printed bare by name); non-map schemas print
    * their whole form. */
  private def label(k: String, v: SchemaIR,
                    extracted: String => Boolean): String = {
    val body = v match {
      case m: SMap if m.entries.nonEmpty =>
        m.entries.map { e =>
          val cf = e.child match {
            case SRef(n) if extracted(n) => n
            case other => esc(SchemaIR.form(other))
          }
          s":${e.key} $cf"
        }.mkString("\\l")
      case other => esc(SchemaIR.form(other))
    }
    s""""{$k|$body\\l}""""
  }

  /** Shared lift+normalize pipeline: sorted registry, extracted-entity
    * names, sorted reference edges. */
  private def normalized(ir: SchemaIR)
      : (Seq[(String, SchemaIR)], String => Boolean, Seq[(String, String)]) = {
    val registry0: Seq[(String, SchemaIR)] = ir match {
      case sc: SScoped => sc.registry.toSeq
      case other => Seq(AnonName -> other)
    }
    val acc = scala.collection.mutable.LinkedHashMap[String, SchemaIR]()
    val extracted = scala.collection.mutable.LinkedHashSet[String]()
    registry0.foreach { case (k, v) =>
      val rewritten = normalize(k, v, acc, extracted)
      acc(k) = rewritten
    }
    val registry = acc.toSeq.sortBy(_._1)
    val links = registry.flatMap { case (from, v) =>
      refsOf(v).toSeq.sorted.map(from -> _)
    }.sortBy(p => (p._1, p._2))
    (registry, extracted, links)
  }

  /** Schema → Graphviz digraph source (dot.cljc `transform`). */
  def transform(ir: SchemaIR): String = {
    val (registry, extracted, links) = normalized(ir)
    val sb = new StringBuilder
    sb.append("digraph {\n")
    sb.append("  node [shape=\"record\", style=\"filled\", color=\"#000000\"]\n")
    sb.append("  edge [dir=\"back\", arrowtail=\"none\"]\n")
    sb.append("  \n")
    registry.foreach { case (k, v) =>
      val fill = if (extracted(k)) "#e6caab" else "#fff0cd"
      sb.append(s"""  "$k" [label=${label(k, v, extracted)}, fillcolor="$fill"]\n""")
    }
    sb.append("  \n")
    links.foreach { case (from, to) =>
      val tail = if (extracted(to)) "diamond" else "odiamond"
      sb.append(s"""  "$from" -> "$to" [arrowtail="$tail"]\n""")
    }
    sb.append("}\n")
    sb.toString
  }

  /** Schema → PlantUML class-diagram source — the `malli.plantuml`
    * analogue (reference: src/malli/plantuml.cljc:1-21): explicit
    * registry members print as `entity`, extracted nested maps as
    * `abstract`; edges are `o--` (aggregation) to explicit members and
    * `*--` (composition) to extracted entities. */
  def plantuml(ir: SchemaIR): String = {
    val (registry, extracted, links) = normalized(ir)
    val sb = new StringBuilder
    sb.append("@startuml\n")
    registry.foreach { case (k, v) =>
      val kw = if (extracted(k)) "abstract" else "entity"
      val body = v match {
        case m: SMap if m.entries.nonEmpty =>
          m.entries.map { e =>
            val cf = e.child match {
              case SRef(n) if extracted(n) => n
              case other => SchemaIR.form(other)
            }
            s":${e.key} $cf"
          }.mkString("\n ")
        case other => SchemaIR.form(other)
      }
      sb.append(s"$kw $k {\n $body\n}\n")
    }
    links.foreach { case (from, to) =>
      sb.append(s"$from ${if (extracted(to)) "*--" else "o--"} $to\n")
    }
    sb.append("@enduml\n")
    sb.toString
  }
}
