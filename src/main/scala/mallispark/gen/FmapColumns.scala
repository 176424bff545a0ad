package mallispark.gen

import org.apache.spark.sql.{Column, functions => F}
import org.apache.spark.sql.types._
import mallispark.ir.{Destructure, MiniEval}
import Destructure.{Sym, VList}

/** `:gen/fmap` → Catalyst Column compiler.
  *
  * malli's generator wraps a sci-evaluated function around the child
  * generator (reference generator.cljc:472-476, `-create-from-fmap` via
  * `m/eval`). A driver-side closure would force generation through a UDF
  * — off the codegen path AND invisible to the DuckDB oracle. Instead the
  * [[MiniEval]] body is compiled to Column expressions for the builtin
  * subset that has an exact SQL twin, keeping generated columns
  * whole-stage-codegen'd and cross-engine replayable (the gen_roundtrip
  * gate mirrors each draw AND each fmap in DuckDB SQL).
  *
  * Unsupported bodies throw — same fail-fast contract as the rest of
  * generation ("needs a custom generator"), never a silent wrong value.
  *
  * Clojure-parity notes, shared with the oracle SQL:
  *  - `(str ...)` of nil is "" → `concat_ws('', ...)` (skips NULLs);
  *    DuckDB twin: `concat_ws('', ...)` with identical NULL behavior.
  *  - `mod` is sign-of-divisor in Clojure → `pmod` matches it for the
  *    positive divisors generation uses (negative divisors are rejected
  *    rather than silently diverging).
  */
object FmapColumns {

  /** Compile `src` applied to `in` (typed `inType`). Returns the mapped
    * column and its result type. Throws [[IllegalArgumentException]] on
    * bodies outside the Column-expressible subset. */
  def compile(src: String, in: Column, inType: DataType): (Column, DataType) = {
    val fn = MiniEval.compileFmap(src)
    require(fn.params.length == 1,
      s":gen/fmap must take exactly one argument, got ${fn.params.length}")
    val param = fn.params.head

    def unsupported(form: Any): Nothing =
      throw new IllegalArgumentException(
        "fn body is not Column-expressible (supported: parameter, " +
          "literals, str, + - * inc dec abs min max mod, if, " +
          "comparisons, re-matches, upper/lower-case, trim): " + form)

    def numType(ts: Seq[DataType]): DataType =
      if (ts.contains(DoubleType)) DoubleType else LongType

    def asBool(ct: (Column, DataType), form: Any): Column = ct match {
      case (c, BooleanType) => c
      // MiniEval truthiness for non-boolean conditions: non-null is true
      case (c, _) => c.isNotNull
    }

    def go(form: Any): (Column, DataType) = form match {
      case Sym(None, n) if n == param => (in, inType)
      case l: Long => (F.lit(l), LongType)
      case d: Double => (F.lit(d), DoubleType)
      case s: String => (F.lit(s), StringType)
      case b: Boolean => (F.lit(b), BooleanType)
      case null => (F.lit(null).cast(StringType), StringType)
      case VList(items) if items.nonEmpty =>
        items.head match {
          case Sym(None, "str") =>
            val cols = items.tail.map(a => go(a)._1.cast(StringType))
            (F.concat_ws("", cols: _*), StringType)
          case Sym(None, op @ ("+" | "*")) if items.size >= 2 =>
            val parts = items.tail.map(go)
            val col = parts.map(_._1).reduceLeft((a, b) =>
              if (op == "+") a + b else a * b)
            (col, numType(parts.map(_._2)))
          case Sym(None, "-") if items.size >= 2 =>
            val parts = items.tail.map(go)
            val col =
              if (parts.size == 1) -parts.head._1
              else parts.map(_._1).reduceLeft(_ - _)
            (col, numType(parts.map(_._2)))
          case Sym(None, "inc") if items.size == 2 =>
            val (c, t) = go(items(1)); (c + F.lit(1), t)
          case Sym(None, "dec") if items.size == 2 =>
            val (c, t) = go(items(1)); (c - F.lit(1), t)
          case Sym(None, "abs") if items.size == 2 =>
            val (c, t) = go(items(1)); (F.abs(c), t)
          case Sym(None, "min") if items.size >= 3 =>
            val parts = items.tail.map(go)
            (F.least(parts.map(_._1): _*), numType(parts.map(_._2)))
          case Sym(None, "max") if items.size >= 3 =>
            val parts = items.tail.map(go)
            (F.greatest(parts.map(_._1): _*), numType(parts.map(_._2)))
          case Sym(None, "mod") if items.size == 3 =>
            (items(2) match {
              case d: Long if d > 0 => ()
              case d: Double if d > 0 => ()
              case other => throw new IllegalArgumentException(
                s":gen/fmap mod needs a positive literal divisor, got $other")
            })
            val (a, t) = go(items(1))
            val (b, _) = go(items(2))
            (F.pmod(a, b), t)
          // ---- transform-hint vocabulary (schema-hinted decode/encode) ----
          case Sym(None, "if") if items.size >= 3 && items.size <= 4 =>
            val cond = asBool(go(items(1)), items(1))
            val (thenC, thenT) = go(items(2))
            if (items.size == 4) {
              val (elseC, elseT) = go(items(3))
              require(thenT == elseT,
                s"if branches must have one column type, got $thenT/$elseT")
              (F.when(cond, thenC).otherwise(elseC), thenT)
            } else (F.when(cond, thenC), thenT)
          case Sym(None, op @ (">" | ">=" | "<" | "<=" | "=" | "not="))
              if items.size == 3 =>
            val (a, _) = go(items(1)); val (b, _) = go(items(2))
            val col = op match {
              case ">" => a > b
              case ">=" => a >= b
              case "<" => a < b
              case "<=" => a <= b
              case "=" => a === b
              case "not=" => a =!= b
            }
            (col, BooleanType)
          // whole-string match as a CONDITION (the fixture position);
          // truthiness of match-or-nil collapses to a boolean column
          case Sym(None, "re-matches") if items.size == 3 =>
            val pat = items(1) match {
              case s: String => s
              case other => throw new IllegalArgumentException(
                s"re-matches needs a literal string pattern, got $other")
            }
            val (c, _) = go(items(2))
            (c.rlike("^(?:" + pat + ")$"), BooleanType)
          case Sym(ns, op @ ("upper-case" | "lower-case" | "trim"))
              if items.size == 2 && (ns.isEmpty || ns.contains("str")) =>
            val (c, _) = go(items(1))
            (op match {
              case "upper-case" => F.upper(c)
              case "lower-case" => F.lower(c)
              case "trim" => F.trim(c)
            }, StringType)
          case _ => unsupported(form)
        }
      case _ => unsupported(form)
    }
    go(fn.body)
  }

  /** Result type of `src` over an input of `inType` (for null casts and
    * struct field typing) — compiles against a typed null probe. */
  def outType(src: String, inType: DataType): DataType =
    compile(src, F.lit(null).cast(inType), inType)._2
}
