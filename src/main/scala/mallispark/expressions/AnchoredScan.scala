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

  /** Per-thread DP scratch — matches() stays allocation-free per row
    * (tasks are single-threaded; the buffers grow to the longest string
    * seen on the thread). */
  private final class Scratch {
    var cur: Array[Boolean] = new Array[Boolean](256)
    var nxt: Array[Boolean] = new Array[Boolean](256)
    var run: Array[Int] = new Array[Int](256)
    var diff: Array[Int] = new Array[Int](256)
    def ensure(n: Int): Unit = if (cur.length < n + 2) {
      val cap = Integer.highestOneBit(n + 2) * 2
      cur = new Array[Boolean](cap); nxt = new Array[Boolean](cap)
      run = new Array[Int](cap); diff = new Array[Int](cap)
    }
  }

  private val scratch = new ThreadLocal[Scratch] {
    override def initialValue(): Scratch = new Scratch
  }

  /** Compiled matcher (reachable-positions DP over segments). */
  final class Compiled(val segs: Array[Seg], val dollarTerm: Boolean)
      extends Serializable {

    private def allowed(c: ClassSeg, b: Byte): Boolean = {
      val in =
        if (b < 0) false // non-ASCII byte is never in an ASCII set
        else if (b < 64) (c.mask0 & (1L << b)) != 0
        else (c.mask1 & (1L << (b - 64))) != 0
      in != c.negated
    }

    def matches(s: UTF8String): Boolean = {
      val n = s.numBytes
      val sc = scratch.get()
      sc.ensure(n)
      // reachable byte positions after consuming a prefix of segments
      var cur = sc.cur
      var nxt = sc.nxt
      java.util.Arrays.fill(cur, 0, n + 1, false)
      cur(0) = true
      var si = 0
      while (si < segs.length) {
        java.util.Arrays.fill(nxt, 0, n + 1, false)
        var any = false
        segs(si) match {
          case b: BytesSeg =>
            val bs = b.bytes
            var p = 0
            while (p + bs.length <= n) {
              if (cur(p)) {
                var i = 0
                var ok = true
                while (ok && i < bs.length) {
                  if (s.getByte(p + i) != bs(i)) ok = false
                  i += 1
                }
                if (ok) { nxt(p + bs.length) = true; any = true }
              }
              p += 1
            }
          case c: ClassSeg if c.min == 1 && c.max == 1 =>
            // the common literal-char segment: a plain shift
            var p = 0
            while (p < n) {
              if (cur(p) && allowed(c, s.getByte(p))) {
                nxt(p + 1) = true; any = true
              }
              p += 1
            }
          case c: ClassSeg =>
            // for each reachable p, mark p+min .. min(p+max, p+run(p));
            // run(p) = maximal allowed run starting at p, computed once
            // right-to-left
            val run = sc.run
            run(n) = 0
            var i = n - 1
            while (i >= 0) {
              run(i) = if (allowed(c, s.getByte(i))) run(i + 1) + 1 else 0
              i -= 1
            }
            // range-marking via a diff array keeps this O(n) per segment
            val diff = sc.diff
            java.util.Arrays.fill(diff, 0, n + 2, 0)
            var p = 0
            while (p <= n) {
              if (cur(p)) {
                val lo = p + c.min
                val hiCap = if (c.max == Int.MaxValue) n
                            else math.min(n, p + c.max)
                val hi = math.min(hiCap, p + run(p))
                if (lo <= hi) { diff(lo) += 1; diff(hi + 1) -= 1 }
              }
              p += 1
            }
            var acc = 0
            p = 0
            while (p <= n) {
              acc += diff(p)
              if (acc > 0) { nxt(p) = true; any = true }
              p += 1
            }
        }
        if (!any) return false
        val t = cur; cur = nxt; nxt = t
        si += 1
      }
      if (cur(n)) return true
      if (!dollarTerm) return false
      val p = termEnd(s, n)
      p >= 0 && cur(p)
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

  /** Parse the supported subset; None → caller keeps rlike. */
  def compile(pattern: String): Option[Compiled] = {
    if (!pattern.startsWith("^")) return None
    val (body, dollarTerm) =
      if (pattern.endsWith("\\z"))
        (pattern.substring(1, pattern.length - 2), false)
      else if (pattern.endsWith("$") && !pattern.endsWith("\\$"))
        (pattern.substring(1, pattern.length - 1), true)
      else return None

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
          try parts match {
            case Array(n) => Some((n.toInt, n.toInt))
            case Array(n, "") => Some((n.toInt, Int.MaxValue))
            case Array(n, m) => Some((n.toInt, m.toInt))
            case _ => None
          } catch { case _: NumberFormatException => None }
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
        segs += ClassSeg(parsed._1, parsed._2, parsed._3, q._1, q._2)
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
    val arr = segs.result()
    if (arr.isEmpty) None
    else Some(new Compiled(arr.toArray, dollarTerm))
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
    var j = 0
    while (j < cs.length) {
      val c = cs.charAt(j)
      if (c >= 0x80) return None // non-ASCII member: byte scan unsound
      else if (c == '\\') {
        if (j + 1 >= cs.length) return None
        cs.charAt(j + 1) match {
          case 's' => add(' '); add('\t'); add('\n'); add(0x0B); add('\f'); add('\r')
          case 'd' => addRange('0', '9')
          case 'w' => addRange('a', 'z'); addRange('A', 'Z'); addRange('0', '9'); add('_')
          case 't' => add('\t'); case 'n' => add('\n'); case 'r' => add('\r')
          case 'f' => add('\f')
          case e @ ('\\' | ']' | '[' | '-' | '^' | '.' | '$' | '+' | '*' |
                    '?' | '(' | ')' | '|' | '/') => add(e)
          case _ => return None // \S \W \D \p{...}: bail
        }
        j += 2
      } else if (j + 2 < cs.length && cs.charAt(j + 1) == '-' &&
                 cs.charAt(j + 2) != ']') {
        val hi = cs.charAt(j + 2)
        if (hi == '\\' || hi >= 0x80 || hi < c) return None
        addRange(c, hi)
        j += 3
      } else { add(c); j += 1 }
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
