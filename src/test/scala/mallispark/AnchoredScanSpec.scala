package mallispark

import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.unsafe.types.UTF8String
import mallispark.expressions.{AnchoredScan, MallisparkExtensions}

/** AnchoredScan byte-scan kernel ≡ java.util.regex find semantics —
  * the exactness contract behind the SchemaCompiler :re fast path and
  * the SimpleRegexRule RLike rewrite. Parity is checked three ways:
  * exhaustive fuzz against Pattern.find (driver-side), DataFrame
  * codegen vs rlike on the same strings, and plan-shape assertions that
  * the rewrite actually fires. */
class AnchoredScanSpec extends SparkSuite {

  private val compiling = Seq(
    "^https?://[^\\s]+$",      // the flagship url check
    "^[a-z]+$",
    "^[a-z]*$",
    "^abc$",                   // no class at all
    "^ab?c?$",                 // optional chars
    "^x[0-9A-Fa-f]+$",         // ranges
    "^v\\.[-a-z0-9_]*$",       // escaped literal + leading range dash
    "^[^:/]+$",                // negated multi-char
    "^a{2,3}$",                // bounded quantifier
    "^[a-z]+[0-9]+$",          // class sequence (needs the split DP)
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
    "^[ab]{2,}c?$",            // open-ended bound + optional tail
    "^[a-z]*[0-9]*$",          // adjacent unbounded classes
    "^:[^\\s/:]+(/[^\\s/:]+)?$",            // the keyword ident shape
    "^[^\\s/:0-9][^\\s/:]*(/[^\\s/:]+)?$",  // the symbol ident shape
    "^a(?:bc)?d$",             // non-capturing optional group
    "^([0-9]{2}-)?[a-z]+$",    // optional group with inner bound
    "^[^a]$",                  // negated single CHAR (multibyte unit!)
    "^[^a]{2}$",               // negated bounded count in chars
    "^[^a]{1,3}x$",            // negated {n,m} + tail
    "^[^a]+[^b]+$",            // adjacent negated classes (char split)
    "^[^a]*[^b]*$",            // adjacent negated, both optional
    "^[\\t-\\r]+$",            // range with ESCAPED endpoints
    "^[+-\\]]+$")              // range ending at an escaped bracket

  private val zAnchored = Seq( // \z disables the final-terminator rule
    "^https?://[^\\s]+\\z",
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\\z")

  private val nonCompiling = Seq(
    "^(a|b)$",                 // alternation group
    "^.*$",                    // dot
    "^[^\\s]+://",             // unanchored tail
    "https?://[^\\s]+$",       // unanchored head
    "^[\\S]+$",                // negated escape class
    "^a*?b$",                  // reluctant quantifier
    "^a[é]+$",                 // non-ASCII class member
    "^a(b(c)?)?$",             // nested group
    "^(ab)+$",                 // non-optional group quantifier
    "^(a|b)c$",                // alternation inside a group
    "^a{-1}b$",                // Java rejects: so must compile()
    "^a{5,2}$",                // Java rejects: inverted bound
    "^[^a]{100}$")             // negated bounded count over the walk cap

  private val strings = Seq(
    "", "x", "http://x", "https://x", "http://", "https://",
    "http://a b", "http://x\n", "http://x\r\n", "http://x\n\n",
    "http://x\r", "http://x", "http://x ", "http://x ",
    "https://ünïcode/路径", "HTTP://x", "xhttp://x", " http://x",
    "http://x ", "abc", "abc\n", "abc\r\n", "ab", "ac", "abcd", "a", "c",
    "xFF", "x", "xg", "x0f\n", "v.", "v.x-y_9", "v,x", "a:b", "a/b",
    "aaa", "\n", "\r\n", " ", "httpss://x", "http:/x",
    "a", "aa", "aaaa", "ab12", "ab", "12", "a1b2",
    "abc123", "aabbc", "aab", "abcc",
    "550e8400-e29b-41d4-a716-446655440000",
    "550E8400-E29B-41D4-A716-446655440000",
    "550e8400-e29b-41d4-a716-44665544000",
    "550e8400-e29b-41d4-a716-4466554400000",
    "550e8400e29b41d4a716446655440000",
    "550e8400-e29b-41d4-a716-446655440000\n",
    "550e8400-e29b-41d4-a716-446655440000\r\n",
    "zz0e8400-e29b-41d4-a716-446655440000",
    ":kw", ":a/b", ":a/b/c", "sym", "9sym", ":a/", "/a", ":", ":a\n",
    "s/t", "s/", "abcd", "ad", "abd", "acd", "12-ab", "1-ab", "12-", "-ab",
    // multibyte units for the negated-class char counting
    "é", "éé", "ééé", "éx", "xé", "ééx", "路", "路径", "é路x", "🎉", "🎉🎉",
    "é\n", ":é", ":é/ü", "ü/é", "\t", "", "\t\n\r", "a]b", "]]")

  private def fuzzStrings: Seq[String] = {
    val rnd = new scala.util.Random(7)
    val alphabet = "ab :/htps\n\r\tü0-".toCharArray
    // whole code points (🎉 is a surrogate pair — keep it a unit)
    val wide = Array("a", "b", "é", "路", "x", "🎉", ":", "/")
    Seq.fill(400) {
      val n = rnd.nextInt(12)
      new String(Array.fill(n)(alphabet(rnd.nextInt(alphabet.length))))
    } ++ Seq.fill(200) {
      val n = rnd.nextInt(6)
      (0 until n).map(_ => wide(rnd.nextInt(wide.length))).mkString
    }
  }

  /** Invalid-UTF-8 byte sequences — reachable via cast(binary as
    * string). Kernel parity target is java.util.regex over the REPLACE
    * decoding (`UTF8String.toString`), which emits one U+FFFD per
    * maximal ill-formed subsequence. */
  private def invalidByteSeqs: Seq[Array[Byte]] = {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val atoms = Seq(
      b(0x80), b(0xBF), b(0x80, 0x80),           // stray continuations
      b(0xC2), b(0xE2), b(0xE2, 0x80), b(0xF0), b(0xF0, 0x9F),
      b(0xF0, 0x9F, 0x8E),                        // truncated leads
      b(0xC0, 0xAF), b(0xC1, 0x80),               // overlong 2-byte
      b(0xE0, 0x9F, 0x80),                        // E0 constrained c1
      b(0xED, 0xA0, 0x80),                        // surrogate (ED c1>9F)
      b(0xF0, 0x80, 0x80), b(0xF4, 0x90, 0x80),   // F0/F4 constrained c1
      b(0xF5, 0x80), b(0xFE), b(0xFF),            // invalid leads
      b(0xC2, 0x41),                              // lead + ASCII (no cont)
      b(0xE2, 0x80, 0x41))                        // 2-byte valid prefix + ASCII
    val ascii = Seq("", "a", ":", "/", "ab", "http://x", ":k", "aa",
      "\n", "0f")
    val rnd = new scala.util.Random(13)
    val combos = for {
      pre <- ascii; a <- atoms; post <- Seq("", "a", ":", "/b", "\n")
    } yield pre.getBytes("UTF-8") ++ a ++ post.getBytes("UTF-8")
    val fuzz = Seq.fill(300) {
      Array.fill(rnd.nextInt(10))((rnd.nextInt(256) - 128).toByte)
    }
    combos ++ fuzz ++ atoms.map(a => a ++ a) // doubled ill-formed runs
  }

  test("kernel ≡ java.util.regex on INVALID UTF-8 (FFFD replacement)") {
    (compiling ++ zAnchored).foreach { p =>
      val scan = AnchoredScan.compile(p).get
      val jre = java.util.regex.Pattern.compile(p)
      invalidByteSeqs.foreach { bytes =>
        val us = UTF8String.fromBytes(bytes)
        // us.toString is exactly what stock rlike matches against
        assert(scan.matches(us) === jre.matcher(us.toString).find(),
          s"pattern=$p bytes=${bytes.map(x => f"${x & 0xFF}%02X").mkString(" ")}")
      }
    }
  }

  test("a pattern containing a literal U+FFFD is declined") {
    assert(AnchoredScan.compile("^a\uFFFDb$").isEmpty)
    assert(AnchoredScan.compile("^[^\\s]+\uFFFD$").isEmpty)
  }

  test("the supported subset compiles; the rest is declined") {
    compiling.foreach(p => assert(AnchoredScan.compile(p).isDefined, p))
    nonCompiling.foreach(p => assert(AnchoredScan.compile(p).isEmpty, p))
  }

  test("kernel ≡ java.util.regex find on every (pattern, string) pair") {
    val all = strings ++ fuzzStrings
    (compiling ++ zAnchored).foreach { p =>
      assert(AnchoredScan.compile(p).isDefined, p)
      val jre = java.util.regex.Pattern.compile(p)
      val scan = AnchoredScan.compile(p).get
      all.foreach { s =>
        assert(scan.matches(UTF8String.fromString(s)) ===
          jre.matcher(s).find(), s"pattern=$p string=${s.map(_.toInt)}")
      }
    }
  }

  test("DataFrame codegen parity: kernel column ≡ rlike column") {
    import spark.implicits._
    val df = (strings ++ fuzzStrings).toDF("s")
    compiling.foreach { p =>
      val mismatch = df.select(
          col("s"),
          AnchoredScan.column(col("s"), p).get.as("k"),
          col("s").rlike(p).as("r"))
        .where(col("k") =!= col("r"))
        .count()
      assert(mismatch === 0L, p)
    }
  }

  test("null propagates like rlike") {
    import spark.implicits._
    val df = Seq(Some("http://x"), None).toDF("s")
    val out = df.select(
      AnchoredScan.column(col("s"), "^https?://[^\\s]+$").get.as("k"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0))
    assert(out.toSeq === Seq(true, null))
  }

  test("SimpleRegexRule rewrites literal RLIKE in SQL plans") {
    MallisparkExtensions.register(spark)
    // the url must not be statically decidable — a CASE over literals
    // lets constant folding evaluate the RLIKE before the rewrite runs
    spark.range(2).selectExpr(
      "concat('http://x', repeat(' ', CAST(id AS INT))) AS url")
      .createOrReplaceTempView("asc_urls")
    val q = spark.sql(
      "SELECT url RLIKE '^https?://[^\\\\s]+$' AS ok FROM asc_urls")
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("anchored_scan"), optimized)
    assert(!optimized.contains("RLIKE"), optimized)
    assert(q.orderBy("ok").collect().map(_.getBoolean(0)).toSeq ===
      Seq(false, true))
    // a pattern outside the subset keeps RLike
    val q2 = spark.sql("SELECT url RLIKE '^(a|b)$' AS ok FROM asc_urls")
    assert(!q2.queryExecution.optimizedPlan.toString.contains("anchored_scan"))
  }

  test("the compiled validator uses the kernel for the url :re leaf") {
    import mallispark.ir.S
    val df = spark.range(2).selectExpr(
      "CASE WHEN id = 0 THEN 'bad url' ELSE 'http://ok' END AS url")
    val schema = S.mapE(false, S.req("url", S.re("^https?://[^\\s]+$")))
    val out = mallispark.compile.SchemaCompiler.validateDF(schema, df, "ok")
    assert(out.queryExecution.optimizedPlan.toString.contains("anchored_scan"))
    assert(out.orderBy("url").select("ok").collect().map(_.getBoolean(0))
      .toSeq === Seq(false, true))
  }
}
