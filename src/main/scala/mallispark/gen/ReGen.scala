package mallispark.gen

import org.apache.spark.sql.{Column, functions => F}
import org.apache.spark.sql.types._
import mallispark.expressions.AnchoredScan
import mallispark.expressions.AnchoredScan.{BytesSeg, ClassSeg, GroupOpt, Seg}

/** String generation from `:re` schemas — the `-re-gen` analogue
  * (reference generator.cljc; malli itself needs test.chuck's
  * string-from-regex there).
  *
  * Instead of a general regex solver, this runs [[AnchoredScan]]'s
  * segment parser IN REVERSE: the pattern compiles to the same
  * literal/class/optional-group segments the validator kernel matches
  * with, and each segment draws a count from its quantifier range plus
  * member bytes from its class mask. The validate∘generate law is then
  * structural — every emitted string walks the exact segment sequence
  * the matcher accepts — and fuzz-pinned in GenerateSpec against
  * java.util.regex. Patterns outside the anchored subset keep the
  * fail-fast "needs a custom generator" contract (reach for
  * `:gen/elements`/`:gen/fmap` like malli users without test.chuck).
  *
  * malli's `:re` validates with re-FIND (partial match, core.cljc:
  * 1730-1731), so generating a FULL match of the `^...\z`-anchored
  * pattern is always a valid draw for the unanchored original. */
object ReGen {

  /** Unbounded quantifiers (`*`/`+`/`{n,}`) draw counts from
    * [min, min+6] — mirrors the reference generators' sized smallness. */
  private val UnboundedSpan = 6
  /** Bounded spans are capped so `{0,100000}` doesn't emit megabyte
    * rows; the cap keeps draws inside the validated range. */
  private val BoundedCap = 12

  /** Anchor for generation: a full match of `^p\z` re-finds under `p`. */
  private def anchored(p: String): String = {
    val s = if (p.startsWith("^")) p else "^" + p
    if (s.endsWith("\\z") || (s.endsWith("$") && !s.endsWith("\\$"))) s
    else s + "\\z"
  }

  /** Printable members of a class mask (positive: the mask itself;
    * negated: printable-ASCII complement — the kernel counts multibyte
    * chars as single units too, but ASCII keeps draws 1 byte = 1 char). */
  private def classChars(m0: Long, m1: Long, neg: Boolean): IndexedSeq[String] = {
    def in(b: Int): Boolean =
      if (b < 64) (m0 & (1L << b)) != 0 else (m1 & (1L << (b - 64))) != 0
    val range = if (neg) 0x20 until 0x7f else 0 until 128
    range.collect { case b if in(b) != neg => b.toChar.toString }
  }

  /** Whether [[gen]] supports `pattern` (compiles AND every class has
    * at least one drawable member). */
  def supported(pattern: String): Boolean =
    AnchoredScan.compile(anchored(pattern)).exists(c =>
      segsDrawable(c.segs))

  private def segsDrawable(segs: Array[Seg]): Boolean = segs.forall {
    case ClassSeg(m0, m1, neg, _, mx) =>
      mx == 0 || classChars(m0, m1, neg).nonEmpty
    case GroupOpt(inner) => segsDrawable(inner)
    case _: BytesSeg => true
  }

  /** Deterministic draw column for `pattern`, keyed by (id, salt) like
    * every other [[Generate]] generator. Throws on unsupported
    * patterns. */
  def gen(pattern: String, id: Column, salt: Int)
         (implicit rng: Generate.Rng): Column = {
    val compiled = AnchoredScan.compile(anchored(pattern)).getOrElse(
      throw new IllegalArgumentException(
        s"cannot generate from :re pattern outside the anchored subset " +
          s"(needs a custom generator): $pattern"))
    require(segsDrawable(compiled.segs),
      s"cannot generate from :re with an empty class: $pattern")
    genSegs(compiled.segs, id, salt)
  }

  private def genSegs(segs: Array[Seg], id: Column, salt: Int)
                     (implicit rng: Generate.Rng): Column = {
    val parts = segs.zipWithIndex.map { case (seg, i) =>
      genSeg(seg, id, salt + 37 * (i + 1))
    }
    if (parts.isEmpty) F.lit("") else F.concat(parts.toIndexedSeq: _*)
  }

  private def genSeg(seg: Seg, id: Column, salt: Int)
                    (implicit rng: Generate.Rng): Column = seg match {
    case BytesSeg(bytes) =>
      F.lit(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
    case GroupOpt(inner) =>
      F.when(rng.rnd(id, salt, 2) === 0, F.lit(""))
        .otherwise(genSegs(inner, id, salt + 1))
    case ClassSeg(m0, m1, neg, mn, mx) =>
      val chars = classChars(m0, m1, neg)
      val hi =
        if (mx == Int.MaxValue) mn + UnboundedSpan
        else math.min(mx, math.max(mn, BoundedCap))
      val pick: Column => Column =
        if (chars.size == 1) _ => F.lit(chars.head)
        else k => F.element_at(F.array(chars.map(F.lit): _*),
          (rng.rnd(rng.mix(id, k), salt, chars.size) + 1).cast(IntegerType))
      if (mn == hi) {
        if (mn == 0) F.lit("")
        else F.concat((1 to mn).map(i => pick(F.lit(i.toLong))): _*)
      } else {
        val cnt = (F.lit(mn) +
          rng.rnd(id, salt + 11, (hi - mn + 1).toLong)).cast(IntegerType)
        F.when(cnt === 0, F.lit(""))
          .otherwise(F.array_join(F.transform(
            F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
            i => pick(i.cast(LongType))), ""))
      }
  }
}
