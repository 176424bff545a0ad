package mallispark.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.MallisparkBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Anchored character-class-sequence regexes as a linear UTF-8 byte
  * scan — the codegen fast path for the validation engine's
  * regex-dominated hot loop (the flagship url check
  * `^https?://[^\s]+$`, the uuid shape `^[0-9a-fA-F]{8}-...$`, and
  * everything else whose pattern is a sequence of literal chars and
  * character classes with quantifiers).
  *
  * Spark's `RLike` calls `pattern.matcher(s.toString)` per row: a String
  * copy plus the java.util.regex backtracking machine. For the anchored
  * subset
  *
  * {{{ ^ (literal | class)(quant?) ... $    quant ∈ ? + * {n} {n,} {n,m} }}}
  *
  * the match is decided by a reachable-positions DP over the UTF8String
  * BYTES — O(len × segments), no allocation beyond two bitsets, no
  * backtracking blowup. Class membership is ASCII-determined (all class
  * members must be ASCII, so in UTF-8 a non-ASCII byte is uniformly
  * allowed by a negated class and uniformly rejected by a positive
  * one); multi-byte literal characters travel as fixed byte runs.
  *
  * Exactness contract (fuzz-tested against Pattern.find in
  * AnchoredScanSpec):
  *   - `rlike` is FIND semantics; `^` keeps the match at position 0 and
  *     Java's `$` also matches before one FINAL line terminator (`\n`,
  *     `\r`, `\r\n`, U+0085, U+2028, U+2029) — reproduced via the
  *     terminal-suffix acceptance rule. A `\z` anchor disables it.
  *   - class escapes: `\s \t \n \r \f \d \w` + literal escapes; ranges.
  *   - anything else (groups, alternation, `.`, backreferences,
  *     non-ASCII class members, reluctant/possessive quantifiers) →
  *     [[AnchoredScan.compile]] returns None and the caller keeps
  *     `rlike`.
  *
  * Used two ways: [[mallispark.compile.SchemaCompiler]] emits it
  * directly for `:re` leaves, and [[SimpleRegexRule]] rewrites any
  * `RLike(col, lit)` whose pattern compiles, so plain
  * `spark.sql("... RLIKE ...")` plans get the kernel too. */
object AnchoredScan {

  /** One parsed segment: a byte-class with a count range, or a fixed
    * byte run (multi-byte literals). `max = Int.MaxValue` = unbounded. */
  sealed trait Seg extends Serializable
  final case class ClassSeg(mask0: Long, mask1: Long, negated: Boolean,
                            min: Int, max: Int) extends Seg
  final case class BytesSeg(bytes: Array[Byte]) extends Seg
  /** `(...)?` — an optional group of segments (one level deep; the
    * ident-leaf shapes `^:seg(/seg)?\z` need exactly this). */
  final case class GroupOpt(inner: Array[Seg]) extends Seg

  /** Post-parse execution form: fixed-length runs (every exactly-once
    * position folded together — the whole uuid pattern is ONE run) and
    * variable-count classes. Runs check `len` bytes from each reachable
    * position; variable classes do the reachability DP. Fixed shapes
    * keep the reachable set a single narrow window, so the matcher
    * never touches positions outside it. */
  private sealed trait Exec extends Serializable
  /** exact(i) ≥ 0 → byte must equal it; else the mask class at i. */
  private final case class FixedRun(exact: Array[Int],
                                    m0: Array[Long], m1: Array[Long],
                                    neg: Array[Boolean]) extends Exec {
    val len: Int = exact.length
  }
  private final case class VarClass(m0: Long, m1: Long, neg: Boolean,
                                    min: Int, max: Int) extends Exec
  /** Optional block: result = skip-positions ∪ positions-after-inner. */
  private final case class OptBlock(inner: Array[Exec]) extends Exec

  /** Per-thread DP scratch — matches() stays allocation-free per row
    * (tasks are single-threaded; the buffers grow to the longest string
    * seen on the thread). */
  private final class Scratch {
    var cur: Array[Boolean] = new Array[Boolean](256)
    var sav: Array[Boolean] = new Array[Boolean](256)
    var run: Array[Int] = new Array[Int](256)
    var diff: Array[Int] = new Array[Int](256)
    def ensure(n: Int): Unit = if (cur.length < n + 2) {
      val cap = Integer.highestOneBit(n + 2) * 2
      cur = new Array[Boolean](cap); sav = new Array[Boolean](cap)
      run = new Array[Int](cap); diff = new Array[Int](cap)
    }
  }

  private val scratch = new ThreadLocal[Scratch] {
    override def initialValue(): Scratch = new Scratch
  }

  /** Compiled matcher: reachable-positions DP over the execution
    * segments, bounded to the live window [lo, hi] of reachable
    * positions (fixed runs keep it a point; only variable classes widen
    * it), so the common all-fixed patterns (uuid) cost one byte-run
    * check and the url shape costs one run + one tail scan. */
  final class Compiled(val segs: Array[Seg], val dollarTerm: Boolean)
      extends Serializable {

    private val execs: Array[Exec] = toExec(segs)

    private def inMask(m0: Long, m1: Long, b: Byte): Boolean =
      if (b < 0) false // non-ASCII byte is never in an ASCII set
      else if (b < 64) (m0 & (1L << b)) != 0
      else (m1 & (1L << (b - 64))) != 0

    def matches(s: UTF8String): Boolean = {
      val n = s.numBytes
      val sc = scratch.get()
      sc.ensure(n)
      val cur = sc.cur
      cur(0) = true
      val te = if (dollarTerm) termEnd(s, n) else -1
      val w = runExecs(execs, s, n, sc, 0, 0, te)
      if (w < 0) return false
      val lo = (w >>> 32).toInt
      val hi = (w & 0xFFFFFFFFL).toInt
      val ok = cur(n) && lo <= n && hi >= n
      var p = lo
      val res =
        if (ok) true
        else te >= lo && te <= hi && cur(te)
      // clear the final window for the next call on this thread
      while (p <= hi) { cur(p) = false; p += 1 }
      res
    }

    /** Run a segment sequence from window [lo0, hi0]; returns the packed
      * result window (lo << 32 | hi) or -1 with `cur` cleared.
      * `finalTe` enables the last-segment fast path: -2 = this is not
      * the top-level sequence (OptBlock inner), else the terminal-suffix
      * end position (or -1 when none) — the ONLY two positions the
      * caller will accept are n and finalTe, so a trailing class can
      * test them directly instead of marking every reachable end. */
    private def runExecs(es: Array[Exec], s: UTF8String, n: Int,
                         sc: Scratch, lo0: Int, hi0: Int,
                         finalTe: Int): Long = {
      val cur = sc.cur
      // live window: positions lo..hi, cur(p) valid only inside it
      var lo = lo0
      var hi = hi0
      var si = 0
      while (si < es.length) {
        es(si) match {
          case g: OptBlock =>
            // save the skip path, run the inner sequence, union the two
            val sav = sc.sav
            var q = lo
            while (q <= hi) { sav(q) = cur(q); q += 1 }
            val w2 = runExecs(g.inner, s, n, sc, lo, hi, -2)
            if (w2 < 0) {
              // inner dead end (cur cleared): the skip path remains
              q = lo
              while (q <= hi) { cur(q) = sav(q); sav(q) = false; q += 1 }
            } else {
              val l2 = (w2 >>> 32).toInt
              val h2 = (w2 & 0xFFFFFFFFL).toInt
              q = lo
              while (q <= hi) {
                if (sav(q)) cur(q) = true
                sav(q) = false
                q += 1
              }
              lo = math.min(lo, l2)
              hi = math.max(hi, h2)
            }
          case f: FixedRun =>
            // every reachable position shifts by the bytes its f.len
            // UNITS consume (negated entries eat whole multibyte chars).
            // HIGH→LOW so an output position (always > p) can never be
            // re-read as an input of the same segment when the window
            // is wider than the run
            if (lo + f.len > n) return clearFail(cur, lo, hi)
            val newHi = math.min(hi, n - f.len) // each unit is ≥ 1 byte
            var p = hi
            while (p > newHi) { cur(p) = false; p -= 1 }
            var anyLo = -1
            var anyHi = -2
            while (p >= lo) {
              val in = cur(p)
              cur(p) = false // consumed
              if (in) {
                val end = runEnd(f, s, p, n)
                if (end >= 0) {
                  cur(end) = true
                  anyLo = math.min(if (anyLo < 0) end else anyLo, end)
                  anyHi = math.max(anyHi, end)
                }
              }
              p -= 1
            }
            if (anyLo < 0) return -1L
            lo = anyLo; hi = anyHi
          case c: VarClass if si == es.length - 1 && finalTe != -2 &&
              (!c.neg || (c.min <= 1 && c.max == Int.MaxValue)) =>
            // LAST-SEGMENT fast path: only n and finalTe can be accepted
            // ends, so test those two directly — one backward allowed-
            // suffix scan per candidate instead of term/diff/sweep
            // machinery over the whole tail. E is reachable from p iff
            // no disallowed byte sits in [p, E) (for a negated class the
            // chain steps whole chars and E is a char boundary, so the
            // byte condition is exact) and the count bound holds (chars
            // for negated — but with min ≤ 1, units ≥ 1 ⟺ E > p; byte
            // distance works for positive members, which are ASCII).
            var found = -1
            var cand = 0
            while (found < 0 && cand < 2) {
              val e = if (cand == 0) n else finalTe
              if (e >= 0 && (cand == 0 || e != n)) {
                // earliest start whose whole suffix [start, e) is allowed
                var start = e
                var scanning = true
                while (scanning && start > lo) {
                  val b = s.getByte(start - 1)
                  val allowedB =
                    if (c.neg) !(b >= 0 && inMask(c.m0, c.m1, b))
                    else b >= 0 && inMask(c.m0, c.m1, b)
                  if (allowedB) start -= 1 else scanning = false
                }
                // reachable p ∈ [start, e] ∩ window with the count bound;
                // negated runs here only with min ≤ 1 / max = ∞ (a finite
                // CHAR bound is not decidable from byte distance), so the
                // byte arithmetic below is exact for both polarities
                val pHi = math.min(hi, e - c.min)
                val pLo = math.max(math.max(lo, start),
                  if (c.max == Int.MaxValue) 0
                  else math.max(0L, e.toLong - c.max).toInt)
                var p = pLo
                while (found < 0 && p <= pHi) {
                  if (cur(p)) found = e
                  p += 1
                }
              }
              cand += 1
            }
            // consume the window either way
            var p2 = lo
            while (p2 <= hi) { cur(p2) = false; p2 += 1 }
            if (found < 0) return -1L
            cur(found) = true
            lo = found; hi = found
          case c: VarClass if !c.neg && c.max <= 64 =>
            // small-bounded positive class (s?, a{2,5}...): walk ≤ max
            // bytes forward per window position instead of the whole-tail
            // run[] scan the unbounded case needs
            val newLo = lo + c.min
            val newHiCap = math.min(n, hi + c.max)
            if (newLo > n) return clearFail(cur, lo, hi)
            val diff = sc.diff
            java.util.Arrays.fill(diff, newLo, newHiCap + 2, 0)
            var p = lo
            var any = false
            while (p <= hi) {
              if (cur(p)) {
                var q = p
                var k = 0
                while (k < c.min && q < n &&
                       inMask(c.m0, c.m1, s.getByte(q))) { q += 1; k += 1 }
                if (k == c.min) {
                  var go = true
                  while (go && k <= c.max) {
                    diff(q) += 1; diff(q + 1) -= 1; any = true
                    if (k < c.max && q < n &&
                        inMask(c.m0, c.m1, s.getByte(q))) { q += 1; k += 1 }
                    else go = false
                  }
                }
              }
              cur(p) = false
              p += 1
            }
            if (!any) return -1L
            var acc = 0
            p = newLo
            var anyLo = -1
            var anyHi = -2
            while (p <= newHiCap) {
              acc += diff(p)
              val r = acc > 0
              cur(p) = r
              if (r) { if (anyLo < 0) anyLo = p; anyHi = p }
              p += 1
            }
            if (anyLo < 0) return -1L
            lo = anyLo; hi = anyHi
          case c: VarClass if !c.neg =>
            // positive class — ASCII members only, so a multibyte char
            // can never match and byte count ≡ char count. run(p) =
            // maximal allowed run from p, computed right-to-left over
            // [lo, n); reachable q = p+min .. min(p+max, p+run(p))
            val run = sc.run
            run(n) = 0
            var i = n - 1
            while (i >= lo) {
              run(i) = if (inMask(c.m0, c.m1, s.getByte(i))) run(i + 1) + 1
                       else 0
              i -= 1
            }
            val newLo = clampAdd(lo, c.min, n + 1) // long math: {2^31}-ish bounds
            val newHiCap = clampAdd(hi, c.max, n)
            if (newLo > n) return clearFail(cur, lo, hi)
            // clear the output range, then diff-mark
            val diff = sc.diff
            java.util.Arrays.fill(diff, newLo, newHiCap + 2, 0)
            var p = lo
            var any = false
            while (p <= hi) {
              if (cur(p)) {
                val qlo = clampAdd(p, c.min, n + 1)
                val qhi = math.min(clampAdd(p, c.max, n), p + run(p))
                if (qlo <= qhi) { diff(qlo) += 1; diff(qhi + 1) -= 1; any = true }
              }
              cur(p) = false
              p += 1
            }
            if (!any) return -1L
            var acc = 0
            p = newLo
            var anyLo = -1
            var anyHi = -2
            while (p <= newHiCap) {
              acc += diff(p)
              val r = acc > 0
              cur(p) = r
              if (r) { if (anyLo < 0) anyLo = p; anyHi = p }
              p += 1
            }
            if (anyLo < 0) return -1L
            lo = anyLo; hi = anyHi
          case c: VarClass =>
            // NEGATED class: the banned set is ASCII, so every multibyte
            // char matches — units are chars, not bytes. Chain stepping:
            // from a unit-start, step(p) = p + unitWidth(p); positions
            // strictly between chain points are continuation bytes, so
            // every unit-start inside [p, term(p)] lies ON p's chain and
            // the ≥min tail of a chain is one contiguous byte interval
            // filtered to non-continuation positions. term(p) computed
            // right-to-left once; min-walks are ≤ 64 by compile guard.
            val term = sc.run // reuse: term(p) = end of the unit chain at p
            term(n) = n
            var i = n - 1
            while (i >= lo) {
              val w = unitWidth(c, s, i, n)
              term(i) = if (w > 0) term(i + w) else i
              i -= 1
            }
            val newLo = lo + c.min // units are ≥ 1 byte each
            val newHiCap = clampAdd(hi, 4 * c.max.toLong, n)
            if (newLo > n) return clearFail(cur, lo, hi)
            val diff = sc.diff
            java.util.Arrays.fill(diff, newLo, newHiCap + 2, 0)
            var p = lo
            var any = false
            while (p <= hi) {
              if (cur(p)) {
                // walk min units (≤ 64 by the compile guard)
                var q = p
                var k = 0
                var dead = false
                while (k < c.min && !dead) {
                  val w = unitWidth(c, s, q, n)
                  if (w <= 0) dead = true else { q += w; k += 1 }
                }
                if (!dead) {
                  if (c.max == Int.MaxValue) {
                    // whole remaining chain [q, term(p)] is reachable
                    val t = term(p)
                    if (q <= t) { diff(q) += 1; diff(t + 1) -= 1; any = true }
                  } else {
                    // bounded: walk and mark up to max-min more ends
                    var j = c.min
                    var qq = q
                    var go = true
                    while (go && j <= c.max) {
                      diff(qq) += 1; diff(qq + 1) -= 1; any = true
                      val w = unitWidth(c, s, qq, n)
                      if (w <= 0) go = false else { qq += w; j += 1 }
                    }
                  }
                }
              }
              cur(p) = false
              p += 1
            }
            if (!any) return -1L
            var acc = 0
            p = newLo
            var anyLo = -1
            var anyHi = -2
            while (p <= newHiCap) {
              acc += diff(p)
              // a marked position strictly inside a decode unit is not a
              // valid end (stray continuation bytes ARE unit starts)
              val r = acc > 0 && (p >= n || isUnitStart(s, p, n))
              cur(p) = r
              if (r) { if (anyLo < 0) anyLo = p; anyHi = p }
              p += 1
            }
            if (anyLo < 0) return -1L
            lo = anyLo; hi = anyHi
        }
        si += 1
      }
      (lo.toLong << 32) | hi.toLong
    }

    private def clampAdd(base: Int, add: Long, n: Int): Int =
      math.min(n.toLong, base.toLong + add).toInt

    /** Window positions must never leak into the next row's call on the
      * same thread — every early exit clears what it read. */
    private def clearFail(cur: Array[Boolean], lo: Int, hi: Int): Long = {
      var p = lo
      while (p <= hi) { cur(p) = false; p += 1 }
      -1L
    }

    /** Width of the unit a NEGATED class consumes at pos: 1 for an
      * allowed ASCII byte, the DECODE-unit width for any non-ASCII byte
      * (always allowed — the banned set is ASCII and a U+FFFD
      * replacement char is not in it), 0 only for a banned ASCII byte
      * or end of input. */
    private def unitWidth(c: VarClass, s: UTF8String, pos: Int, n: Int): Int = {
      if (pos >= n) return 0
      val b = s.getByte(pos)
      if (b >= 0) { if (inMask(c.m0, c.m1, b)) 0 else 1 }
      else rawUnitWidth(s, pos, n)
    }

    @inline private def isContByte(b: Byte): Boolean = (b & 0xC0) == 0x80

    /** Width of the DECODE UNIT at pos (assumed to be a unit start) —
      * mirrors Java's UTF-8 REPLACE decoding, which emits one U+FFFD per
      * MAXIMAL ILL-FORMED SUBSEQUENCE (longest valid prefix, with the
      * constrained first-continuation ranges for E0/ED/F0/F4). This is
      * what `UTF8String.toString` feeds java.util.regex, so matching on
      * raw bytes stays verdict-identical to stock `rlike` even on
      * invalid UTF-8 (reachable via cast(binary as string)): a valid
      * sequence consumes its full width, an ill-formed one consumes its
      * valid prefix (≥ 1 byte) as a single always-allowed FFFD unit. */
    private def rawUnitWidth(s: UTF8String, pos: Int, n: Int): Int = {
      val u = s.getByte(pos) & 0xFF
      if (u < 0xC2) 1 // ASCII, stray continuation, or overlong C0/C1 lead
      else if (u < 0xE0) { // 2-byte lead
        if (pos + 1 < n && isContByte(s.getByte(pos + 1))) 2 else 1
      } else if (u < 0xF0) { // 3-byte lead; E0 has a narrowed c1 range.
        // ED is deliberately GENERIC here: the JDK String decoder
        // (probed on 17) consumes a whole surrogate-shaped sequence
        // [ED A0-BF cont] as ONE U+FFFD, unlike the Unicode
        // maximal-subsequence recommendation — width must follow the
        // decoder rlike actually sees
        val c1ok = pos + 1 < n && {
          val c1 = s.getByte(pos + 1) & 0xFF
          if (u == 0xE0) c1 >= 0xA0 && c1 <= 0xBF
          else c1 >= 0x80 && c1 <= 0xBF
        }
        if (!c1ok) 1
        else if (pos + 2 < n && isContByte(s.getByte(pos + 2))) 3 else 2
      } else if (u <= 0xF4) { // 4-byte lead; F0/F4 have narrowed c1 ranges
        val c1ok = pos + 1 < n && {
          val c1 = s.getByte(pos + 1) & 0xFF
          if (u == 0xF0) c1 >= 0x90 && c1 <= 0xBF
          else if (u == 0xF4) c1 >= 0x80 && c1 <= 0x8F
          else c1 >= 0x80 && c1 <= 0xBF
        }
        if (!c1ok) 1
        else if (pos + 2 >= n || !isContByte(s.getByte(pos + 2))) 2
        else if (pos + 3 < n && isContByte(s.getByte(pos + 3))) 4 else 3
      } else 1 // F5-FF: invalid lead, one FFFD
    }

    /** Whether p is a decode-unit boundary: any non-continuation byte
      * starts a unit; a continuation byte starts one iff it is STRAY —
      * not covered by a valid-prefix sequence whose lead sits ≤ 3 bytes
      * back (lead bytes are never themselves absorbed by an ill-formed
      * run, so the back-scan is non-recursive). */
    private def isUnitStart(s: UTF8String, p: Int, n: Int): Boolean = {
      if (!isContByte(s.getByte(p))) return true
      var k = 1
      while (k < 4 && p - k >= 0 && isContByte(s.getByte(p - k))) k += 1
      if (k >= 4 || p - k < 0) true // no lead within reach → stray FFFD unit
      else rawUnitWidth(s, p - k, n) <= k
    }

    /** End position after consuming f's units from p, or -1. Positive
      * and exact entries consume one byte; negated entries consume one
      * CHAR (units, like unitWidth — inlined here for the mixed run). */
    private def runEnd(f: FixedRun, s: UTF8String, p: Int, n: Int): Int = {
      var pos = p
      var i = 0
      while (i < f.len) {
        if (pos >= n) return -1
        val b = s.getByte(pos)
        val e = f.exact(i)
        if (e >= 0) {
          if (b != e.toByte) return -1
          pos += 1
        } else if (!f.neg(i)) {
          if (!inMask(f.m0(i), f.m1(i), b)) return -1
          pos += 1
        } else {
          if (b >= 0) {
            if (inMask(f.m0(i), f.m1(i), b)) return -1
            pos += 1
          } else {
            // any non-ASCII unit start is allowed (real char or FFFD);
            // consume its decode-unit width
            pos += rawUnitWidth(s, pos, n)
          }
        }
        i += 1
      }
      pos
    }

    /** Position before a single TERMINAL line terminator, or -1: `\n`,
      * `\r`, `\r\n`, U+0085 (C2 85), U+2028/U+2029 (E2 80 A8/A9). */
    private def termEnd(s: UTF8String, n: Int): Int = {
      if (n == 0) return -1
      val last = s.getByte(n - 1)
      if (last == 0x0A) { // \n, possibly \r\n
        if (n >= 2 && s.getByte(n - 2) == 0x0D) n - 2 else n - 1
      } else if (last == 0x0D) n - 1
      else if (last == 0x85.toByte && n >= 2 && s.getByte(n - 2) == 0xC2.toByte)
        n - 2
      else if ((last == 0xA8.toByte || last == 0xA9.toByte) && n >= 3 &&
               s.getByte(n - 3) == 0xE2.toByte &&
               s.getByte(n - 2) == 0x80.toByte) n - 3
      else -1
    }
  }

  /** Parsed segments → execution form: consecutive exact-count pieces
    * (literal bytes, multi-byte literals, `[x]{k}` with k ≤ 64) coalesce
    * into one FixedRun; variable-count classes stay DP segments. */
  private def toExec(segs: Array[Seg]): Array[Exec] = {
    val out = Vector.newBuilder[Exec]
    val exact = scala.collection.mutable.ArrayBuffer.empty[Int]
    val m0s = scala.collection.mutable.ArrayBuffer.empty[Long]
    val m1s = scala.collection.mutable.ArrayBuffer.empty[Long]
    val negs = scala.collection.mutable.ArrayBuffer.empty[Boolean]
    def flush(): Unit = if (exact.nonEmpty) {
      out += FixedRun(exact.toArray, m0s.toArray, m1s.toArray, negs.toArray)
      exact.clear(); m0s.clear(); m1s.clear(); negs.clear()
    }
    def addMask(m0: Long, m1: Long, neg: Boolean): Unit = {
      exact += -1; m0s += m0; m1s += m1; negs += neg
    }
    def addByte(b: Byte): Unit = {
      exact += (b & 0xFF); m0s += 0L; m1s += 0L; negs += false
    }
    segs.foreach {
      case BytesSeg(bs) => bs.foreach(addByte)
      case ClassSeg(m0, m1, neg, min, max) if min == max && max <= 64 =>
        var k = 0
        while (k < min) { addMask(m0, m1, neg); k += 1 } // {0} drops out
      case ClassSeg(m0, m1, neg, min, max) =>
        flush(); out += VarClass(m0, m1, neg, min, max)
      case GroupOpt(inner) =>
        flush(); out += OptBlock(toExec(inner))
    }
    flush()
    out.result().toArray
  }

  /** Parse the supported subset; None → caller keeps rlike. */
  def compile(pattern: String): Option[Compiled] = {
    if (!pattern.startsWith("^")) return None
    // a literal U+FFFD in the pattern would match DECODED invalid bytes
    // under java.util.regex but not under byte comparison — bail
    if (pattern.indexOf('\uFFFD') >= 0) return None
    val (body, dollarTerm) =
      if (pattern.endsWith("\\z"))
        (pattern.substring(1, pattern.length - 2), false)
      else if (pattern.endsWith("$") && !pattern.endsWith("\\$"))
        (pattern.substring(1, pattern.length - 1), true)
      else return None
    parseSegs(body, inGroup = false).collect {
      case arr if arr.nonEmpty => new Compiled(arr.toArray, dollarTerm)
    }
  }

  /** One segment-sequence level; `inGroup` forbids nesting (one level of
    * `(...)?` is all the ident shapes need, and all the skip-union
    * matcher supports with a single save buffer). */
  private def parseSegs(body: String, inGroup: Boolean): Option[Vector[Seg]] = {
    val segs = Vector.newBuilder[Seg]
    var i = 0
    def parseQuant(): Option[(Int, Int)] = {
      // returns the count range; bails (None) on malformed/reluctant
      if (i >= body.length) return Some((1, 1))
      body.charAt(i) match {
        case '?' => i += 1; Some((0, 1))
        case '+' => i += 1; Some((1, Int.MaxValue))
        case '*' => i += 1; Some((0, Int.MaxValue))
        case '{' =>
          val close = body.indexOf('}', i)
          if (close < 0) return None
          val spec = body.substring(i + 1, close)
          i = close + 1
          val parts = spec.split(",", -1)
          val range =
            try parts match {
              case Array(n) => Some((n.toInt, n.toInt))
              case Array(n, "") => Some((n.toInt, Int.MaxValue))
              case Array(n, m) => Some((n.toInt, m.toInt))
              case _ => None
            } catch { case _: NumberFormatException => None }
          // Java REJECTS {-1} and {5,2} (PatternSyntaxException) — the
          // kernel must not silently accept what rlike would throw on
          range.filter { case (mn, mx) => mn >= 0 && mx >= mn }
        case _ => Some((1, 1))
      }
    }
    def reluctant(): Boolean = // a trailing ? or + makes it non-greedy/possessive
      i < body.length && (body.charAt(i) == '?' || body.charAt(i) == '+')

    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '[') {
        val close = findClassEnd(body, i)
        if (close < 0) return None
        val cls = body.substring(i + 1, close)
        i = close + 1
        val q = parseQuant().getOrElse(return None)
        if (reluctant()) return None
        val parsed = parseClass(cls).getOrElse(return None)
        // negated classes count CHARS (multibyte units): bounded counts
        // run a per-position walk capped at 64 — larger bounds bail
        if (parsed._3 && (q._1 > 64 || (q._2 != Int.MaxValue && q._2 > 64)))
          return None
        segs += ClassSeg(parsed._1, parsed._2, parsed._3, q._1, q._2)
      } else if (c == '(') {
        if (inGroup) return None // one level only
        val close = findGroupEnd(body, i)
        if (close < 0) return None
        var inner = body.substring(i + 1, close)
        if (inner.startsWith("?:")) inner = inner.drop(2) // non-capturing
        else if (inner.startsWith("?")) return None // lookaround etc
        i = close + 1
        // only `(...)?` — other group quantifiers would need repeat
        // machinery beyond the one-save-buffer skip-union
        if (i >= body.length || body.charAt(i) != '?') return None
        i += 1
        if (reluctant()) return None
        val innerSegs = parseSegs(inner, inGroup = true).getOrElse(return None)
        if (innerSegs.isEmpty) return None
        segs += GroupOpt(innerSegs.toArray)
      } else if ("\\^$.|?*+(){}".contains(c) && c != '\\') {
        return None // bare metachar outside a class
      } else {
        val lit: Char =
          if (c == '\\') {
            if (i + 1 >= body.length) return None
            i += 1
            val e = body.charAt(i)
            e match {
              case 't' => '\t'; case 'n' => '\n'; case 'r' => '\r'
              case 'f' => '\f'
              case x if "\\^$.|?*+()[]{}/:-@&~#=!,<>'\"".contains(x) => x
              case _ => return None // \s \d \w etc unclassed: bail
            }
          } else c
        i += 1
        val q = parseQuant().getOrElse(return None)
        if (reluctant()) return None
        if (lit < 0x80) {
          val (m0, m1) =
            if (lit < 64) (1L << lit, 0L) else (0L, 1L << (lit - 64))
          segs += ClassSeg(m0, m1, negated = false, q._1, q._2)
        } else {
          // multi-byte literal: fixed byte run; only exact counts stay
          // byte-exact without a sequence-repeat matcher
          if (q != ((1, 1))) return None
          segs += BytesSeg(
            lit.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
      }
    }
    Some(segs.result())
  }

  /** Matching `)` for the `(` at `open`, skipping escapes and classes;
    * -1 when unbalanced or nested. */
  private def findGroupEnd(s: String, open: Int): Int = {
    var j = open + 1
    while (j < s.length) {
      s.charAt(j) match {
        case '\\' => j += 2
        case '[' =>
          val ce = findClassEnd(s, j)
          if (ce < 0) return -1
          j = ce + 1
        case '(' => return -1 // nested group: bail
        case ')' => return j
        case _ => j += 1
      }
    }
    -1
  }

  private def findClassEnd(s: String, open: Int): Int = {
    // NOTE no POSIX leading-] rule: Java errors on `[]]`, so a pattern
    // relying on it is not a valid rlike pattern to begin with
    var j = open + 1
    if (j < s.length && s.charAt(j) == '^') j += 1
    while (j < s.length) {
      s.charAt(j) match {
        case '\\' => j += 2
        case ']' => return j
        case _ => j += 1
      }
    }
    -1
  }

  /** Class body → (mask0, mask1, negated); None on non-ASCII members or
    * unsupported escapes. */
  private def parseClass(src: String): Option[(Long, Long, Boolean)] = {
    var cs = src
    val negated = cs.startsWith("^")
    if (negated) cs = cs.drop(1)
    if (cs.isEmpty) return None
    var m0 = 0L; var m1 = 0L
    def add(ch: Int): Unit =
      if (ch < 64) m0 |= 1L << ch else m1 |= 1L << (ch - 64)
    def addRange(a: Int, b: Int): Unit = {
      var x = a; while (x <= b) { add(x); x += 1 }
    }
    // one endpoint: a raw ASCII char or a single-char escape. Class
    // escapes (\s \d \w) return -1 — legal as members, not as range
    // endpoints. A range is endpoint '-' endpoint regardless of which
    // side is escaped (the old raw-char-only check mis-read [\t-\r] as
    // three literals).
    var j = 0
    def endpoint(): Int = {
      val c = cs.charAt(j)
      if (c >= 0x80) { j = cs.length + 1; -2 } // force the caller to bail
      else if (c == '\\') {
        if (j + 1 >= cs.length) { j = cs.length + 1; return -2 }
        val e = cs.charAt(j + 1)
        j += 2
        e match {
          case 's' => add(' '); add('\t'); add('\n'); add(0x0B); add('\f'); add('\r'); -1
          case 'd' => addRange('0', '9'); -1
          case 'w' => addRange('a', 'z'); addRange('A', 'Z'); addRange('0', '9'); add('_'); -1
          case 't' => '\t'.toInt; case 'n' => '\n'.toInt; case 'r' => '\r'.toInt
          case 'f' => '\f'.toInt
          case x if "\\][-^.$+*?()|/".contains(x) => x.toInt
          case _ => -2 // \S \W \D \p{...}: bail
        }
      } else { j += 1; c.toInt }
    }
    while (j < cs.length) {
      val markJ = j
      val e1 = endpoint()
      if (e1 == -2) return None
      if (e1 >= 0 && j + 1 < cs.length && cs.charAt(j) == '-' &&
          cs.charAt(j + 1) != ']') {
        j += 1 // consume '-'
        val e2 = endpoint()
        if (e2 < 0 || e2 < e1) return None
        addRange(e1, e2)
      } else if (e1 >= 0) add(e1)
      // class escapes (e1 == -1) already added their members
      if (j <= markJ) return None // no progress: malformed
    }
    Some((m0, m1, negated))
  }

  /** Column builder: Some(kernel) when the pattern compiles. */
  def column(c: Column, pattern: String): Option[Column] =
    compile(pattern).map(_ =>
      MallisparkBridge.column(
        AnchoredScanMatch(MallisparkBridge.expression(c), pattern)))
}

/** The Expression wrapper; `pattern` is kept (not the Compiled) so the
  * node round-trips through Catalyst transforms and explain cleanly. */
case class AnchoredScanMatch(child: Expression, pattern: String)
    extends UnaryExpression {

  @transient private lazy val scan: AnchoredScan.Compiled =
    AnchoredScan.compile(pattern).getOrElse(
      throw new IllegalArgumentException(
        s"pattern not in the anchored-scan subset: $pattern"))

  override def dataType: DataType = BooleanType
  override def checkInputDataTypes() =
    if (child.dataType.isInstanceOf[org.apache.spark.sql.types.StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"anchored_scan needs a string child, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    scan.matches(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("anchoredScan", scan,
      classOf[AnchoredScan.Compiled].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.matches($c);")
  }

  override def prettyName: String = "anchored_scan"
  override protected def withNewChildInternal(newChild: Expression): AnchoredScanMatch =
    copy(child = newChild)
}
