package mallispark.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.MallisparkBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Anchored prefix + character-class regex as a zero-allocation UTF-8
  * byte scan — the codegen fast path for the validation engine's
  * regex-dominated hot loop (the flagship url check
  * `^https?://[^\s]+$` and everything shaped like it).
  *
  * Spark's `RLike` calls `pattern.matcher(s.toString)` per row: a String
  * copy plus the java.util.regex backtracking machine. For the anchored
  * subset
  *
  * {{{ ^ literal-prefix (with optional chars)  [^X]+|[X]*  $ }}}
  *
  * the match is decidable by one linear pass over the UTF8String BYTES
  * with no allocation: class membership is ASCII-determined (all class
  * members are ASCII, so non-ASCII UTF-8 bytes are uniformly allowed in
  * a negated class and uniformly banned in a positive one), and Java's
  * find/anchor semantics reduce to a suffix rule.
  *
  * Exactness contract (parity-tested against rlike in PlanSpec):
  *   - `rlike` is FIND semantics; with `^...$` the only liberty left is
  *     Java's `$`, which also matches before one FINAL line terminator
  *     (`\n`, `\r`, `\r\n`, U+0085, U+2028, U+2029) — reproduced via
  *     the terminal-suffix end positions.
  *   - optional literal chars (`https?`) expand into alternative
  *     prefixes (capped at [[AnchoredScan.MaxPrefixes]]).
  *   - class escapes: `\s \t \n \r \f \d \w` + literal escapes; ranges.
  *     Anything else (groups, alternation, `.`, bounded quantifiers,
  *     multiple classes, non-ASCII class members) → [[AnchoredScan
  *     .compile]] returns None and the caller keeps `rlike`.
  *
  * Used two ways: [[mallispark.compile.SchemaCompiler]] emits it
  * directly for `:re` leaves, and [[MallisparkExtensions]] installs an
  * optimizer rule rewriting any `RLike(col, lit)` whose pattern compiles
  * (so `spark.sql("... RLIKE ...")` plans get the kernel too). */
object AnchoredScan {

  val MaxPrefixes = 16

  /** The compiled scan: alternative UTF-8 prefixes, a 128-bit ASCII
    * membership mask, negation flag, min body length (`+` vs `*`), and
    * whether a class exists at all (`^literal$` compiles too). */
  final class Compiled(val prefixes: Array[Array[Byte]],
                       val negated: Boolean,
                       val mask0: Long, val mask1: Long,
                       val minBody: Int,
                       val hasClass: Boolean) extends Serializable {

    private def inSet(b: Byte): Boolean =
      if (b < 0) false // non-ASCII byte: never a member of an ASCII set
      else if (b < 64) (mask0 & (1L << b)) != 0
      else (mask1 & (1L << (b - 64))) != 0

    private def allowed(b: Byte): Boolean = inSet(b) != negated

    def matches(s: UTF8String): Boolean = {
      val n = s.numBytes
      var pi = 0
      while (pi < prefixes.length) {
        val pre = prefixes(pi)
        if (n >= pre.length && startsWith(s, pre)) {
          val start = pre.length
          if (!hasClass) {
            // body must be empty: $ at start, or start + one terminator
            if (start == n || termEnd(s, n) == start) return true
          } else {
            var i = start
            while (i < n && allowed(s.getByte(i))) i += 1
            // valid $ positions: end of input, or before ONE final line
            // terminator; the body must reach it and satisfy minBody
            if ((n <= i && n - start >= minBody) || {
                  val p = termEnd(s, n)
                  p >= 0 && p <= i && p - start >= minBody
                }) return true
          }
        }
        pi += 1
      }
      false
    }

    private def startsWith(s: UTF8String, pre: Array[Byte]): Boolean = {
      var i = 0
      while (i < pre.length) {
        if (s.getByte(i) != pre(i)) return false
        i += 1
      }
      true
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
    val p = pattern
    if (!p.startsWith("^") || !p.endsWith("$") || p.length < 3) return None
    val body = p.substring(1, p.length - 1)
    // split into prefix part and ONE trailing class+quantifier
    val classStart = body.indexOf('[')
    // a '[' escaped in the prefix would confuse the split — bail
    if (classStart > 0 && body.charAt(classStart - 1) == '\\') return None
    val (prefixSrc, classSrc) =
      if (classStart < 0) (body, "") else body.splitAt(classStart)
    if (classSrc.contains('[') && classSrc.indexOf('[', 1) >= 0) return None

    // ---- prefix: literal chars, optional (c?) expansion ----
    var alts = List("")
    var i = 0
    while (i < prefixSrc.length) {
      val c = prefixSrc.charAt(i)
      val lit: Char =
        if (c == '\\') {
          if (i + 1 >= prefixSrc.length) return None
          i += 1
          prefixSrc.charAt(i) match {
            case e @ ('.' | '/' | '\\' | '-' | '+' | '*' | '?' | '(' | ')' |
                      '[' | ']' | '{' | '}' | '^' | '$' | '|' | ':' | '@' |
                      '&' | '~' | '#' | '=' | '!' | ',') => e
            case 't' => '\t'; case 'n' => '\n'; case 'r' => '\r'
            case _ => return None // \s \d etc in prefix position: bail
          }
        } else if ("\\^$.|?*+()[]{}".contains(c)) return None
        else c
      val optional = i + 1 < prefixSrc.length && prefixSrc.charAt(i + 1) == '?'
      if (optional) i += 1
      alts =
        if (optional) alts.flatMap(a => List(a, a + lit))
        else alts.map(_ + lit)
      if (alts.length > MaxPrefixes) return None
      i += 1
    }

    // ---- class + quantifier ----
    if (classSrc.isEmpty) {
      return Some(new Compiled(
        alts.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray,
        negated = false, 0L, 0L, 0, hasClass = false))
    }
    if (classSrc.length < 4) return None // at least [x]+
    val quant = classSrc.last
    val minBody = quant match {
      case '+' => 1
      case '*' => 0
      case _ => return None
    }
    if (classSrc.charAt(classSrc.length - 2) != ']') return None
    var cs = classSrc.substring(1, classSrc.length - 2)
    val negated = cs.startsWith("^")
    if (negated) cs = cs.drop(1)
    if (cs.isEmpty) return None

    var m0 = 0L; var m1 = 0L
    def add(ch: Int): Unit =
      if (ch < 64) m0 |= 1L << ch else m1 |= 1L << (ch - 64)
    def addRange(a: Int, b: Int): Unit = { var x = a; while (x <= b) { add(x); x += 1 } }
    var j = 0
    var ok = true
    while (ok && j < cs.length) {
      val c = cs.charAt(j)
      if (c >= 0x80) ok = false // non-ASCII member: byte scan unsound
      else if (c == '\\') {
        if (j + 1 >= cs.length) ok = false
        else {
          cs.charAt(j + 1) match {
            case 's' => add(' '); add('\t'); add('\n'); add(0x0B); add('\f'); add('\r')
            case 'd' => addRange('0', '9')
            case 'w' => addRange('a', 'z'); addRange('A', 'Z'); addRange('0', '9'); add('_')
            case 't' => add('\t'); case 'n' => add('\n'); case 'r' => add('\r')
            case 'f' => add('\f')
            case e @ ('\\' | ']' | '[' | '-' | '^' | '.' | '$' | '+' | '*' |
                      '?' | '(' | ')' | '|' | '/') => add(e)
            case _ => ok = false // \S \W \D \p{...}: bail
          }
          j += 1
        }
      } else if (j + 2 < cs.length && cs.charAt(j + 1) == '-' &&
                 cs.charAt(j + 2) != ']') {
        val hi = cs.charAt(j + 2)
        if (hi == '\\' || hi >= 0x80 || hi < c) ok = false
        else { addRange(c, hi); j += 2 }
      } else add(c)
      j += 1
    }
    if (!ok) return None
    Some(new Compiled(
      alts.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray,
      negated, m0, m1, minBody, hasClass = true))
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
    if (child.dataType == StringType)
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
