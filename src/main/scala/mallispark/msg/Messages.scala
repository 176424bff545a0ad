package mallispark.msg

import mallispark.ir.SchemaIR.ErrorKeys

/** Error humanization — malli's `malli.error` namespace
  * (reference: /root/reference/src/malli/error.cljc).
  *
  * Violation rows store the error KEY (cheap, groupable at scale);
  * humanization happens at report time on the driver — the same split
  * malli makes between `explain` (data) and `me/humanize` (strings).
  * English strings match `default-errors` (error.cljc:44-172) so
  * humanized fixtures are comparable with the reference. */
object Messages {

  /** error key → English message (error.cljc defaults). */
  val defaults: Map[String, String] = Map(
    ErrorKeys.MissingKey -> "missing required key", // error.cljc:46
    ErrorKeys.ExtraKey -> "disallowed key", // error.cljc:57
    ErrorKeys.InvalidType -> "invalid type", // error.cljc:56
    ErrorKeys.InvalidDispatch -> "invalid dispatch value", // error.cljc:58
    ErrorKeys.InputRemaining -> "input remaining", // error.cljc:65
    ErrorKeys.EndOfInput -> "end of input", // error.cljc:66
    ErrorKeys.Limits -> "invalid count", // ::m/limits shape (error.cljc:47-52)
    ErrorKeys.DuplicateKey -> "duplicate key",
    // the reference renders ::m/tuple-size and the comparators through
    // :error/fn closures that splice the VALUE/bound into the string
    // (error.cljc:53-55, 145-172); violation rows here carry only the
    // KEY, so these render the reference phrasing without the number —
    // pass an override with the bound for byte-exact reference strings
    ErrorKeys.TupleSize -> "invalid tuple size",
    ":>" -> "should be larger than the bound",
    ":>=" -> "should be at least the bound",
    ":<" -> "should be smaller than the bound",
    ":<=" -> "should be at most the bound",
    ":=" -> "should be the expected value",
    ":not=" -> "should not be the expected value",
    ":string" -> "should be a string", // error.cljc:80
    ":int" -> "should be an int", // error.cljc:71
    ":double" -> "should be a double", // error.cljc:78
    ":boolean" -> "should be a boolean", // error.cljc:79
    ":bytes" -> "should be bytes",
    ":uuid" -> "should be a uuid",
    ":keyword" -> "should be a keyword", // error.cljc:72
    ":simple-keyword" -> "should be a simple keyword",
    ":qualified-keyword" -> "should be a qualified keyword", // error.cljc:74
    ":symbol" -> "should be a symbol", // error.cljc:73
    ":simple-symbol" -> "should be a simple symbol",
    ":qualified-symbol" -> "should be a qualified symbol",
    ":char" -> "should be a char",
    ":enum" -> "should be one of the allowed values",
    ":re" -> "should match the pattern",
    ":some" -> "should be some", // error.cljc:68
    ":nil" -> "should be nil",
    ":not" -> "should not match",
    ":time/instant" -> "should be a timestamp in range",
    ":time/local-date" -> "should be a date in range",
    ":time/duration" -> "should be a duration in range",
    ":time/period" -> "should be a period in range",
    ":time/local-time" -> "should be a local time in range",
    ":time/local-date-time" -> "should be a local date-time in range",
    ":time/offset-date-time" -> "should be an offset date-time in range",
    ":time/offset-time" -> "should be an offset time",
    ":time/zoned-date-time" -> "should be a zoned date-time",
    ":time/zone-id" -> "should be a zone id",
    ":time/zone-offset" -> "should be a zone offset")

  /** Message lookup chain (error.cljc:293-310): explicit property
    * override → key table → unknown. */
  def message(errorKey: String,
              overrides: Map[String, String] = Map.empty): String =
    overrides.getOrElse(errorKey,
      defaults.getOrElse(errorKey, "unknown error")) // ::unknown, error.cljc:45

  /** One humanized violation: (in-path, message). */
  final case class Humanized(in: Seq[String], message: String)

  /** `me/humanize` (error.cljc:379-395): errors → value-shaped nested map
    * of messages, keyed by the value path (`-push-in` semantics: messages
    * accumulate per path). Driver-side, for explain fixtures and report
    * rendering — NOT part of the distributed plan.
    *
    * `in` arrives in the engine-wide "/"-joined encoding (the same one
    * violation rows and oracle SQL use); a data key CONTAINING a slash
    * is therefore ambiguous in this representation — callers with such
    * keys should pass pre-split paths through [[errorValue]] instead. */
  def humanize(errors: Seq[(String, String)],
               overrides: Map[String, String] = Map.empty)
      : Map[Seq[String], Seq[String]] =
    errors
      .map { case (in, key) =>
        (if (in.isEmpty) Seq.empty[String] else in.split("/").toSeq) ->
          message(key, overrides)
      }
      .groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap

  /** `me/error-value` (error.cljc:397-408): the input reshaped to only its
    * FAILING parts — leaves whose `in` path appears in `errIns` are kept;
    * with `maskValid` set, valid leaves become the mask string instead of
    * being dropped (the `::mask-valid-values` option, error.cljc:232-244).
    * Driver-side, like humanize. */
  def errorValue(value: Any, errIns: Set[Seq[String]],
                 maskValid: Option[String] = None): Any = {
    def go(v: Any, here: Seq[String]): Option[Any] = {
      val failingHere = errIns.contains(here)
      v match {
        // Rows pair naturally with explain output at report time —
        // convert to a field map so masking descends instead of
        // treating the whole row as one leaf (which would return every
        // column, defeating the masking)
        case r: org.apache.spark.sql.Row if !failingHere =>
          go(r.schema.fieldNames.zip(r.toSeq).toMap, here)
        case m: Map[_, _] if !failingHere =>
          val mm = m.asInstanceOf[Map[String, Any]]
          val kept = mm.flatMap { case (k, x) =>
            go(x, here :+ k).map(k -> _)
          }
          if (kept.nonEmpty) Some(kept) else None
        case s: Seq[_] if !failingHere =>
          val kept = s.zipWithIndex.flatMap { case (x, i) =>
            go(x, here :+ i.toString).map(i -> _)
          }
          if (kept.nonEmpty) Some(kept.toMap) else None
        case leaf =>
          if (failingHere || errIns.exists(_.startsWith(here))) Some(leaf)
          else maskValid.map(m => m)
      }
    }
    go(value, Seq.empty).getOrElse(Map.empty)
  }

  /** Spell-check suggestion for `::m/extra-key` (error.cljc:249-281):
    * closest known key by Levenshtein distance, if within tolerance
    * max(length/3, 1) like the reference's `-most-similar-to`. */
  def spellCheck(unknownKey: String, knownKeys: Set[String]): Option[String] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val tolerance = math.max(unknownKey.length / 3, 1)
    // ties break LEXICOGRAPHICALLY, not by hash-set iteration order —
    // adding an unrelated key to the schema must never flip the
    // suggestion (cross-run determinism, like everything else here)
    knownKeys.toSeq
      .map(k => k -> lev(unknownKey, k))
      .filter(_._2 <= tolerance)
      .sortBy { case (k, d) => (d, k) }
      .headOption.map(_._1)
  }
}
