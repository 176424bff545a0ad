package mallispark.ir

import SchemaIR._

/** Human-readable schema descriptions — the
  * `malli.experimental/describe` analogue (reference:
  * src/malli/experimental/describe.cljc:1-265; wording fixtures:
  * test/malli/experimental/describe_test.cljc).
  *
  * Driver-side pure function over the IR; wording matches the reference
  * wherever the reference defines it (map/vector/string/int/enum/
  * multi/tuple/repeat/registry shapes). Extensions where the reference
  * falls through to its empty default: `:time/...` kinds (the reference's
  * time schemas have no describe methods), custom leaves (described by
  * name), and the schema-algebra nodes (described through their
  * expansion, like the reference's `:merge`/`:union`/`:select-keys`
  * deref methods). */
object Describe {

  /** Given a schema, returns a string explaining the required shape in
    * English (describe.cljc:255-265). */
  def describe(ir: SchemaIR): String = go(ir).trim

  private def diamond(s: String): String = s"<$s>"

  /** " with length >= 1" etc (describe.cljc:20-26). */
  private def lengthSuffix(mn: Option[Int], mx: Option[Int]): String =
    (mn, mx) match {
      case (Some(a), Some(b)) => s" with length between $a and $b inclusive"
      case (Some(a), None) => s" with length >= $a"
      case (None, Some(b)) => s" with length <= $b"
      case _ => ""
    }

  /** " greater than or equal to 0" etc (describe.cljc:42-48). */
  private def minMaxNumber[T](mn: Option[T], mx: Option[T]): String =
    (mn, mx) match {
      case (Some(a), Some(b)) => s" between $a and $b inclusive"
      case (Some(a), None) => s" greater than or equal to $a"
      case (None, Some(b)) => s" less than or equal to $b"
      case _ => ""
    }

  /** " at least 1 time, up to 7 times" (describe.cljc:28-40). */
  private def repeatSuffix(mn: Int, mx: Int): String = {
    def times(n: Int) = if (n == 1) "time" else "times"
    s" at least $mn ${times(mn)}, up to $mx ${times(mx)}"
  }

  /** "c (tag: name)" branch rendering (describe.cljc:160). */
  private def tagged(bs: Seq[(String, SchemaIR)]): Seq[String] =
    bs.map { case (tag, c) => s"${go(c)} (tag: :$tag)" }

  private def lit(v: Any): String = v match {
    case s: String => s
    case other => String.valueOf(other)
  }

  private def go(ir: SchemaIR): String = ir match {
    case SProps(_, c) => go(c) // describe ignores non-structural props
    case SAny => "anything"
    case SSome => "anything but null"
    case SNil => "null"
    case SBoolean => "boolean"
    case SUuid => "uuid"
    case SBinary => "bytes"
    case SString(mn, mx) => "string" + lengthSuffix(mn, mx)
    case SInt(mn, mx) => "integer" + minMaxNumber(mn, mx)
    case SDouble(mn, mx) => "double" + minMaxNumber(mn, mx)
    case SIdent(kind, _) => kind match {
      case "keyword" => "keyword"
      case "simple-keyword" => "simple-keyword"
      case "qualified-keyword" => "qualified keyword"
      case "symbol" => "symbol"
      case "simple-symbol" => "simple-symbol"
      case "qualified-symbol" => "qualified symbol"
      case other => other
    }
    case STimestamp(_, _) => "inst (aka date time)"
    case SDate(_, _) => "date" // :time extension (no reference wording)
    case STime(kind, _, _) => kind // :time extension
    case SEnum(vs) => "enum of " + vs.map(lit).mkString(", ")
    case SRegex(p) => "regex pattern matching \"" + p + "\""
    case SCompare(op, v) => op match {
      case ">" => s"> ${lit(v)}"
      case ">=" => s">= ${lit(v)}"
      case "<" => s"< ${lit(v)}"
      case "<=" => s"<= ${lit(v)}"
      case "=" => s"must equal ${lit(v)}"
      case "not=" => s"not equal ${lit(v)}"
    }
    case SMaybe(c) => "nullable " + go(c)
    case SNot(c) => "{:not " + go(c) + "}"
    case SAnd(cs) => cs.map(go).mkString(", and ")
    case SAndn(bs) => tagged(bs).mkString(", and ")
    case SOr(cs) => cs.map(go).mkString(", or ")
    case SOrn(bs) => tagged(bs).mkString(", or ")
    case STuple(cs) =>
      s"vector with exactly ${cs.size} items of type: " +
        cs.map(go).mkString(", ")
    case SVector(c, mn, mx) =>
      "vector" + lengthSuffix(mn, mx) + " of " + go(c)
    case SSeqable(c, mn, mx) =>
      "seqable" + lengthSuffix(mn, mx) + " of " + go(c)
    case SEvery(c, mn, mx, _) =>
      "sequence" + lengthSuffix(mn, mx) + " of " + go(c)
    case SSet(c, mn, mx) => "set" + lengthSuffix(mn, mx) + " of " + go(c)
    case SMapOf(k, v, mn, mx) =>
      s"map from ${diamond(go(k))} to ${diamond(go(v))}" +
        lengthSuffix(mn, mx)
    case m: SMap =>
      val kv = m.entries.map { e =>
        s":${e.key}${if (e.optional) " (optional)" else ""} -> " +
          diamond(go(e.child))
      }.mkString(", ")
      (("map " +
        (if (kv.nonEmpty) s"where {$kv} " else "") +
        (if (m.closed) "with no other keys " else ""))).trim
    case SMulti(dk, bs, _) =>
      "one of " + diamond(bs.map { case (k, c) => s":$k = ${go(c)}" }
        .mkString(" | ")) + s" dispatched by :$dk"
    case SCat(cs) => cs.map(go).mkString(", ")
    case SCatn(es) => tagged(es).mkString(", and ")
    case SAlt(cs) => cs.map(go).mkString(", or ")
    case SAltn(es) => tagged(es).mkString(", or ")
    case SStar(c) => "zero or more " + go(c)
    case SPlus(c) => "one or more " + go(c)
    case SOpt(c) => "zero or one " + go(c)
    case SRepeat(c, mn, mx) =>
      "repeat " + diamond(go(c)) + repeatSuffix(mn, mx)
    case SRef(name) => "\"" + name + "\"" // pr-str of the ref target
    case sc: SScoped =>
      // describe.cljc:54-62 — body first, then the local registry in a
      // diamond; a single-binding registry inlines without "which is: "
      val body = sc.child match {
        case SRef(n) => n
        case other => go(other)
      }
      val regs = sc.registry.toSeq
      val inner =
        if (regs.size == 1) diamond(go(regs.head._2))
        else "which is: " + diamond(regs.map { case (n, s) =>
          s"$n is ${go(s)}"
        }.mkString(", "))
      s"$body $inner"
    case SFn(_, _) => "function"
    case SCustom(name, _, _) => name // extension: custom leaf by name
    case SValidate(_, _) => "function" // error-returning predicate
    case alg @ (_: SMergeOf | _: SUnionOf | _: SSelectKeysOf) =>
      go(mallispark.ir.SchemaOps.expand(alg)) // deref like :merge/:union
    case other => SchemaIR.form(other) // never silently empty
  }
}
