package mallispark

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._
import mallispark.ir.S
import mallispark.ir.SchemaIR
import mallispark.ir.SchemaIR._
import mallispark.compile.SchemaCompiler
import mallispark.eval.RowEval

/** Fixture tables F1-F10 from FIXTURES.md — semantics hand-derived from the
  * malli test suite (test/malli/core_test.cljc), asserted against BOTH the
  * Catalyst compilation and the RowEval reference interpreter (duality,
  * SURVEY §5.3). */
class CoreValidationSpec extends SparkSuite {

  implicit val ctx: SchemaCompiler.Ctx = SchemaCompiler.Ctx()

  private def dfOf(dt: DataType, values: Seq[Any]): DataFrame = {
    val schema = StructType(Seq(StructField("v", dt, nullable = true)))
    val rows = values.map(v => Row(v))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
  }

  /** Evaluate compiled valid+errors for each value; return
    * (valid, Set[(path,in,key)]) per input. */
  private def runCatalyst(ir: SchemaIR, dt: DataType, values: Seq[Any])
      : Seq[(Boolean, Set[(String, String, String)])] = {
    val df = dfOf(dt, values)
    val out = df.select(
      SchemaCompiler.valid(ir, F.col("v"), dt).as("ok"),
      SchemaCompiler.errors(ir, F.col("v"), dt, "", F.lit("")).as("errs"))
    out.collect().toSeq.map { r =>
      val ok = r.getBoolean(0)
      val errs = r.getSeq[Row](1).map(e =>
        (e.getString(0), e.getString(1), e.getString(2))).toSet
      (ok, errs)
    }
  }

  private def rowEvalErrs(ir: SchemaIR, v: Any): Set[(String, String, String)] =
    RowEval.explain(ir, v).map(e =>
      (e.path.mkString("/"), e.in.mkString("/"), e.key)).toSet

  /** Test fixtures use schemaless GenericRow — attach the declared
    * StructType so RowEval sees a map-like value. */
  private def toScala(v: Any, dt: DataType): Any = (v, dt) match {
    case (r: Row, st: StructType) =>
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        r.toSeq.toArray, st)
    case _ => v
  }

  /** Assert Catalyst and RowEval agree AND match the expected fixtures. */
  private def check(ir: SchemaIR, dt: DataType,
                    fixtures: Seq[(Any, Boolean, Set[(String, String, String)])])
      : Unit = {
    val catalyst = runCatalyst(ir, dt, fixtures.map(_._1))
    fixtures.zip(catalyst).foreach {
      case ((v, expValid, expErrs), (gotValid, gotErrs)) =>
        assert(gotValid === expValid,
          s"catalyst valid mismatch for $v (schema ${SchemaIR.form(ir)})")
        assert(gotErrs === expErrs,
          s"catalyst errors mismatch for $v (schema ${SchemaIR.form(ir)})")
        assert(RowEval.validate(ir, toScala(v, dt)) === expValid,
          s"roweval valid mismatch for $v")
        assert(rowEvalErrs(ir, toScala(v, dt)) === expErrs,
          s"roweval errors mismatch for $v")
        assert((gotErrs.isEmpty) === gotValid,
          s"valid/errors disagreement for $v")
    }
  }

  // F1: [:and int? [:or pos-int? neg-int?]] — core_test.cljc:228-250
  test("F1 and/or composite: errors carry branch-index paths") {
    val s = S.and(S.int, S.or(S.posInt, S.negInt))
    check(s, LongType, Seq(
      (1L, true, Set.empty),
      (-1L, true, Set.empty),
      (0L, false, Set(("1/0", "", ":int"), ("1/1", "", ":int"))),
      (null, false, Set(("0", "", ":int"), ("1/0", "", ":int"), ("1/1", "", ":int")))))
  }

  // F2: [:orn [:pos pos-int?] [:neg neg-int?]] — tagged branches in path
  test("F2 orn: tagged branch paths") {
    val s = S.orn("pos" -> S.posInt, "neg" -> S.negInt)
    check(s, LongType, Seq(
      (1L, true, Set.empty),
      (-3L, true, Set.empty),
      (0L, false, Set(("pos", "", ":int"), ("neg", "", ":int")))))
  }

  // F3: [:map [:x boolean?] [:y {:optional true} int?] [:z string?]]
  test("F3 map: required/optional keys, missing-key") {
    val s = S.mapE(false,
      S.req("x", S.boolean), S.opt("y", S.int), S.req("z", S.string))
    val dt = StructType(Seq(
      StructField("x", BooleanType), StructField("y", LongType),
      StructField("z", StringType)))
    check(s, dt, Seq(
      (Row(true, 1L, "kikka"), true, Set.empty),
      (Row(true, null, "kikka"), true, Set.empty), // :y optional
      (Row(true, 1L, null), false,
        Set(("z", "z", ErrorKeys.MissingKey))),
      (null, false, Set(("", "", ErrorKeys.InvalidType)))))
  }

  // F4: closed map + extra key → ::extra-key
  test("F4 closed map: extra-key") {
    val s = S.map(closed = true)("x" -> S.boolean)
    val dt = StructType(Seq(
      StructField("x", BooleanType), StructField("extra", StringType)))
    // physical column `extra` present and non-null → ::m/extra-key
    check(s, dt, Seq(
      (Row(true, null), true, Set.empty),
      (Row(true, "boom"), false, Set(("extra", "extra", ErrorKeys.ExtraKey)))))
  }

  // F5: [:map-of :string :int] with :min/:max → ::limits
  test("F5 map-of: key/value schemas + entry-count limits") {
    val s = S.mapOf(S.string, S.int, min = Some(1), max = Some(2))
    val dt = MapType(StringType, LongType)
    check(s, dt, Seq(
      (Map("a" -> 1L), true, Set.empty),
      (Map.empty[String, Long], false, Set(("", "", ErrorKeys.Limits))),
      (Map("a" -> 1L, "b" -> 2L, "c" -> 3L), false,
        Set(("", "", ErrorKeys.Limits)))))
  }

  // F6: [:vector {:max 3} [:and int? [:or pos-int? neg-int?]]]
  test("F6 vector: element errors carry runtime indices; limits") {
    val s = S.vector(S.and(S.int, S.or(S.posInt, S.negInt)), max = Some(3))
    val dt = ArrayType(LongType)
    check(s, dt, Seq(
      (Seq(-1L), true, Set.empty),
      (Seq(-1L, 1L, 2L), true, Set.empty),
      (Seq(-1L, 0L, 2L), false,
        Set(("0/1/0", "1", ":int"), ("0/1/1", "1", ":int"))),
      (Seq(-1L, -1L, -1L, -1L), false, Set(("", "", ErrorKeys.Limits)))))
  }

  // F7: [:tuple :keyword :string number?] wrong size → ::tuple-size
  test("F7 tuple: size + positional checks") {
    val s = S.tuple(S.string, S.string)
    val dt = ArrayType(StringType)
    check(s, dt, Seq(
      (Seq("a", "b"), true, Set.empty),
      (Seq("a"), false, Set(("", "", ErrorKeys.TupleSize)))))
  }

  // F8: enum membership; maybe nil
  test("F8 enum + maybe") {
    val e = S.enum_("en", "de", "fr")
    check(e, StringType, Seq(
      ("en", true, Set.empty),
      ("xx", false, Set(("", "", ":enum"))),
      (null, false, Set(("", "", ":enum")))))
    val m = S.maybe(S.enum_("en", "de"))
    check(m, StringType, Seq(
      (null, true, Set.empty),
      ("en", true, Set.empty),
      ("xx", false, Set(("0", "", ":enum")))))
  }

  // F9: :re partial-match (re-find) semantics — NOT anchored
  test("F9 regex: partial match like malli re-find") {
    val s = S.re("ab+c")
    check(s, StringType, Seq(
      ("xxabbcyy", true, Set.empty), // partial match suffices
      ("abc", true, Set.empty),
      ("ac", false, Set(("", "", ":re")))))
    // anchored pattern stays anchored
    val anchored = S.re("^https?://[^\\s]+$")
    check(anchored, StringType, Seq(
      ("https://example.com/x", true, Set.empty),
      ("ftp://example.com", false, Set(("", "", ":re"))),
      ("https://bad url", false, Set(("", "", ":re")))))
  }

  // F10: :multi dispatch
  test("F10 multi: dispatch + invalid-dispatch-value") {
    val s = S.multi("type")(
      "a" -> S.mapE(false, S.req("type", S.string), S.req("n", S.posInt)),
      "b" -> S.mapE(false, S.req("type", S.string), S.req("s", S.string)))
    val dt = StructType(Seq(
      StructField("type", StringType), StructField("n", LongType),
      StructField("s", StringType)))
    check(s, dt, Seq(
      (Row("a", 5L, null), true, Set.empty),
      (Row("b", null, "hi"), true, Set.empty),
      (Row("a", 0L, null), false, Set(("a/n", "n", ":int"))),
      (Row("zz", 1L, "x"), false, Set(("", "", ErrorKeys.InvalidDispatch)))))
  }

  test("not / compare / some / nil / uuid leaves") {
    check(S.not(S.posInt), LongType, Seq(
      (0L, true, Set.empty),
      (5L, false, Set(("", "", ":not")))))
    check(S.gt(3L), LongType, Seq(
      (4L, true, Set.empty), (3L, false, Set(("", "", ":>")))))
    check(S.uuid, StringType, Seq(
      ("123e4567-e89b-12d3-a456-426614174000", true, Set.empty),
      ("nope", false, Set(("", "", ":uuid")))))
  }

  test(":map schema over a MapType column (fixed keys as physical map data)") {
    val mt = MapType(StringType, LongType)
    val closedSch = S.mapE(true,
      S.req("a", S.int(0L, 10L)), S.opt("b", S.intMin(5L)))
    check(closedSch, mt, Seq(
      (Map("a" -> 3L), true, Set.empty),
      (Map("a" -> 3L, "b" -> 7L), true, Set.empty),
      (Map("b" -> 7L), false, Set(("a", "a", "malli.core/missing-key"))),
      (Map("a" -> 20L), false, Set(("a", "a", ":int"))),
      // stray key: runtime key lands in the schema path (RowEval parity)
      (Map("a" -> 3L, "x" -> 1L), false,
        Set(("x", "x", "malli.core/extra-key")))))
    val restSch = S.mapRest(S.int(0L, 5L), S.req("a", S.int))
    check(restSch, mt, Seq(
      (Map("a" -> 1L, "z" -> 4L), true, Set.empty),
      (Map("a" -> 1L, "z" -> 9L), false,
        Set(("malli.core/default/z", "z", ":int")))))
  }

  test(":schema with local registry: self-contained recursive validation") {
    val sch = S.scoped("node" -> S.mapE(false,
        S.req("v", S.intMin(0L)),
        S.opt("kids", S.vector(S.ref("node")))))(S.ref("node"))
    val kidT = StructType(Seq(StructField("v", LongType)))
    val dt = StructType(Seq(StructField("v", LongType),
      StructField("kids", ArrayType(kidT))))
    // inner rows need their schema attached for the RowEval duality side
    // (toScala only wraps the top level)
    def kid(v: Long): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](v), kidT)
    check(sch, dt, Seq(
      (Row(1L, Seq(kid(2L))), true, Set.empty),
      (Row(-1L, Seq(kid(2L))), false, Set(("v", "v", ":int"))),
      (Row(1L, Seq(kid(-2L))), false,
        Set(("kids/0/v", "kids/0/v", ":int")))))
  }

  test("ident/char leaves: keyword/symbol string forms, one-code-point char") {
    check(S.keyword, StringType, Seq(
      (":en", true, Set.empty),
      (":ns/name", true, Set.empty),
      ("en", false, Set(("", "", ":keyword"))), // no leading ':'
      (":a/b/c", false, Set(("", "", ":keyword"))),
      (": sp", false, Set(("", "", ":keyword"))),
      // trailing newline: Java '$' would accept — the \z anchor must not
      (":en\n", false, Set(("", "", ":keyword"))),
      (null, false, Set(("", "", ":keyword")))))
    check(S.qualifiedKeyword, StringType, Seq(
      (":ns/name", true, Set.empty),
      (":bare", false, Set(("", "", ":qualified-keyword")))))
    // {:namespace :user} property-pred (core.cljc:753-755, 830;
    // core_test.cljc:2237-2246: success [:user/abba], failure
    // [:abba :zzz/abba nil "invalid"])
    check(SIdent("qualified-keyword", Some("user")), StringType, Seq(
      (":user/abba", true, Set.empty),
      (":abba", false, Set(("", "", ":qualified-keyword"))),
      (":zzz/abba", false, Set(("", "", ":qualified-keyword"))),
      (null, false, Set(("", "", ":qualified-keyword"))),
      ("invalid", false, Set(("", "", ":qualified-keyword")))))
    check(S.symbol, StringType, Seq(
      ("sym", true, Set.empty),
      ("ns/sym", true, Set.empty),
      ("x", true, Set.empty), // single-char symbol
      (":kw", false, Set(("", "", ":symbol"))), // keywords aren't symbols
      ("0sym", false, Set(("", "", ":symbol"))))) // digit start
    check(S.qualifiedSymbol, StringType, Seq(
      ("ns/sym", true, Set.empty),
      ("bare", false, Set(("", "", ":qualified-symbol")))))
    check(S.char, StringType, Seq(
      ("x", true, Set.empty),
      ("😀", true, Set.empty), // one non-BMP code point (😀)
      ("ab", false, Set(("", "", ":char"))),
      ("", false, Set(("", "", ":char")))))
  }

  test("set uniqueness; every bounded checks") {
    check(S.set(S.int), ArrayType(LongType), Seq(
      (Seq(1L, 2L), true, Set.empty),
      (Seq(1L, 1L), false, Set(("", "", ErrorKeys.DuplicateKey)))))
    // :every with limit 2 checks only the first 2 elements
    check(S.every(S.posInt, limit = 2), ArrayType(LongType), Seq(
      (Seq(1L, 2L, -5L), true, Set.empty), // -5 beyond bounded window
      (Seq(-1L, 2L, 3L), false, Set(("0", "0", ":int")))))
    // window widens to max(min, max+1, limit) — core.cljc:745-751:
    // min=4 with limit=2 must still examine the 3rd element
    check(S.every(S.posInt, min = Some(4), limit = 2), ArrayType(LongType), Seq(
      (Seq(1L, 2L, -5L, 3L), false, Set(("0", "2", ":int")))))
    // nil is SEQABLE (seqs empty) — (m/validate [:every :int] nil) is
    // true (core_test.cljc:3512); a :min bound sees size 0
    check(S.every(S.int), ArrayType(LongType), Seq(
      (null, true, Set.empty)))
    check(S.every(S.int, min = Some(1)), ArrayType(LongType), Seq(
      (null, false, Set(("", "", ErrorKeys.Limits)))))
  }

  test(":seqable — nil-tolerant element-checked collection (core_test:3482)") {
    check(S.seqable(S.int), ArrayType(LongType), Seq(
      (null, true, Set.empty), // (m/validate [:seqable :int] nil)
      (Seq(1L, 2L, 3L), true, Set.empty),
      (Seq.empty[Long], true, Set.empty)))
    // elements are FULLY checked (no bounded window — ArrayType is
    // counted, and the reference validates counted colls completely)
    check(S.seqable(S.posInt), ArrayType(LongType), Seq(
      (Seq(1L, 2L, -1L), false, Set(("0", "2", ":int")))))
    // nil seqs empty: :min 1 fails on nil, passes on [x]
    check(S.seqable(S.int, min = Some(1)), ArrayType(LongType), Seq(
      (null, false, Set(("", "", ErrorKeys.Limits))),
      (Seq(5L), true, Set.empty)))
  }

  test("enum against a mismatched column type degrades to false, not a throw") {
    // ANSI would cast the string literals to long and explode at runtime;
    // the :or must simply take the :int branch
    val s = S.or(S.posInt, S.enum_("a", "b"))
    check(s, LongType, Seq(
      (5L, true, Set.empty),
      (-1L, false, Set(("0", "", ":int"), ("1", "", ":enum")))))
  }

  // F13 (bounded tier): seq-regex over arrays
  test("F13 seq-regex bounded: star/cat/catn/alt/repeat") {
    check(S.star(S.int), ArrayType(LongType), Seq(
      (Seq(1L, 2L, 3L), true, Set.empty),
      (Seq.empty[Long], true, Set.empty),
      (Seq(1L, null, 3L), false, Set(("0", "1", ":int")))))
    check(S.cat(S.string, S.string), ArrayType(StringType), Seq(
      (Seq("a", "b"), true, Set.empty),
      (Seq("a"), false, Set(("", "", ErrorKeys.EndOfInput))),
      (Seq("a", "b", "c"), false, Set(("", "", ErrorKeys.InputRemaining)))))
    check(S.catn("prop" -> S.string, "val" -> S.alt(S.string, S.boolean)),
      ArrayType(StringType), Seq(
        (Seq("-p", "x"), true, Set.empty)))
    check(S.repeat(S.int, 1, 2), ArrayType(LongType), Seq(
      (Seq(1L), true, Set.empty),
      (Seq(1L, 2L, 3L), false, Set(("", "", ErrorKeys.Limits)))))
    check(S.plus(S.int), ArrayType(LongType), Seq(
      (Seq.empty[Long], false, Set(("", "", ErrorKeys.Limits)))))
  }

  // random BOUNDED seqex shapes (tier 1/2 — the Column compilation, not
  // the tier-3 UDF) × random arrays: the compiled validator and explain
  // error sets must agree with RowEval on every pair
  test("bounded seq-regex duality fuzz: random shapes x random arrays") {
    val rnd = new scala.util.Random(20260818L)
    def leaf(): SchemaIR = rnd.nextInt(4) match {
      case 0 => S.int
      case 1 => S.int(0L, 4L)
      case 2 => SCompare(">", 2L)
      case _ => SEnum(Seq(1L, 2L, 3L))
    }
    def elem(): SchemaIR =
      if (rnd.nextInt(5) == 0) SAlt(Seq(leaf(), leaf())) else leaf()
    def seqex(): SchemaIR = rnd.nextInt(6) match {
      case 0 | 1 => SCat(Seq.fill(rnd.nextInt(4))(elem()))
      case 2 => SCatn(Seq.tabulate(1 + rnd.nextInt(3))(i => s"t$i" -> elem()))
      case 3 => SStar(leaf())
      case 4 => SPlus(leaf())
      case _ =>
        val mn = rnd.nextInt(3)
        SRepeat(leaf(), mn, mn + 1 + rnd.nextInt(2))
    }
    def arr(): Seq[Any] = Seq.fill(rnd.nextInt(6))(
      if (rnd.nextInt(8) == 0) null else Long.box(rnd.nextInt(6).toLong))
    val at = ArrayType(LongType, containsNull = true)
    (0 until 40).foreach { _ =>
      val sch = seqex()
      // this fuzz targets the BOUNDED compilation specifically
      assert(!SchemaIR.isGeneralRegex(sch), SchemaIR.form(sch))
      val arrays: Seq[Any] = Seq.fill(25)(arr()) :+ null
      val catalyst = runCatalyst(sch, at, arrays)
      arrays.zip(catalyst).foreach { case (v, (ok, errs)) =>
        assert(RowEval.validate(sch, v) === ok,
          s"valid mismatch: ${SchemaIR.form(sch)} on $v (catalyst=$ok)")
        assert(rowEvalErrs(sch, v) === errs,
          s"error mismatch: ${SchemaIR.form(sch)} on $v\n" +
            s"roweval=${rowEvalErrs(sch, v)}\ncatalyst=$errs")
      }
    }
  }

  test(":multi with expression dispatch (arbitrary :dispatch fn parity)") {
    // core.cljc:1876-1890 — dispatch can be ANY fn of the value; here a
    // computed band over a struct field, kept codegen'd as a Column expr
    val st = StructType(Seq(StructField("n", LongType),
      StructField("tag", StringType)))
    val sch = S.multiExpr("band",
      c => F.when(c.getField("n") < 10L, F.lit("small"))
        .otherwise(F.lit("big")),
      { case r: Row => if (r.getAs[Long]("n") < 10L) "small" else "big"
        case _ => null })(
      "small" -> S.mapE(false, S.req("n", S.int),
        S.req("tag", S.enum_("a", "b"))),
      "big" -> S.mapE(false, S.req("n", S.intMin(10L)),
        S.req("tag", S.enum_("z"))))
    check(sch, st, Seq(
      (Row(5L, "a"), true, Set.empty),
      (Row(5L, "z"), false, Set(("small/tag", "tag", ":enum"))),
      (Row(50L, "z"), true, Set.empty),
      (Row(50L, "a"), false, Set(("big/tag", "tag", ":enum"))),
      (null, false, Set(("", "", ErrorKeys.InvalidType)))))
    // default branch on an unmatched dispatch value
    val withDefault = S.multiExpr("band2",
      c => c.getField("tag"),
      { case r: Row => r.getAs[String]("tag"); case _ => null },
      default = Some(S.mapE(false, S.req("n", S.intMin(100L)))))(
      "a" -> S.mapE(false, S.req("n", S.int)))
    check(withDefault, st, Seq(
      (Row(1L, "a"), true, Set.empty),
      (Row(500L, "q"), true, Set.empty),
      (Row(1L, "q"), false,
        Set(("malli.core/default/n", "n", ":int")))))
  }

  test("map with ::m/default rest-entry validates undeclared keys") {
    // core.cljc:586-587, 1237 — open map whose undeclared keys must
    // satisfy a default schema instead of being ignored
    val st = StructType(Seq(StructField("id", LongType),
      StructField("x", StringType), StructField("y", StringType)))
    val sch = S.mapRest(S.string(min = 2), S.req("id", S.int))
    check(sch, st, Seq(
      (Row(1L, "ab", "cde"), true, Set.empty),
      (Row(1L, "a", "cde"), false,
        Set(("malli.core/default/x", "x", ":string"))),
      (Row(1L, null, "cde"), true, Set.empty))) // absent key: no rest check
  }

  test(":time/* family: duration/period/ldt intervals + ISO string kinds") {
    import java.time.{Duration, LocalDateTime, Period}
    // native interval / NTZ types (experimental/time.cljc:85-100)
    check(S.duration(Some("PT10S"), Some("PT100S")), DayTimeIntervalType(),
      Seq(
        (Duration.ofSeconds(50), true, Set.empty),
        (Duration.ofSeconds(5), false, Set(("", "", ":time/duration"))),
        (null, false, Set(("", "", ":time/duration")))))
    check(S.period(Some("P2M"), Some("P2Y")), YearMonthIntervalType(), Seq(
      (Period.ofMonths(13), true, Set.empty),
      (Period.ofMonths(1), false, Set(("", "", ":time/period")))))
    check(S.localDateTime(Some("2024-01-01T00:00:00"), None), TimestampNTZType,
      Seq(
        (LocalDateTime.parse("2024-06-01T12:00:00"), true, Set.empty),
        (LocalDateTime.parse("2023-06-01T12:00:00"), false,
          Set(("", "", ":time/local-date-time")))))
    // canonical ISO string kinds
    check(S.localTime(Some("06:00:00"), Some("18:00:00")), StringType, Seq(
      ("12:30:00", true, Set.empty),
      ("05:59:59", false, Set(("", "", ":time/local-time"))),
      ("25:00:00", false, Set(("", "", ":time/local-time")))))
    check(S.offsetDateTime(Some("2024-01-01T00:00:00Z"), None), StringType,
      Seq(
        ("2024-06-01T12:00:00+02:00", true, Set.empty),
        ("2023-06-01T12:00:00Z", false,
          Set(("", "", ":time/offset-date-time"))),
        ("not a time", false, Set(("", "", ":time/offset-date-time")))))
    check(S.zonedDateTime, StringType, Seq(
      ("2024-06-01T12:00:00+02:00[Europe/Paris]", true, Set.empty),
      ("bogus", false, Set(("", "", ":time/zoned-date-time")))))
    check(S.zoneId, StringType, Seq(
      ("Europe/Paris", true, Set.empty),
      ("UTC", true, Set.empty),
      ("not a zone", false, Set(("", "", ":time/zone-id")))))
    check(S.zoneOffset, StringType, Seq(
      ("+05:30", true, Set.empty),
      ("Z", true, Set.empty),
      ("+19:00", false, Set(("", "", ":time/zone-offset")))))
    check(S.offsetTime, StringType, Seq(
      ("10:15:30+01:00", true, Set.empty),
      ("10:15:30", false, Set(("", "", ":time/offset-time")))))
  }

  test("seq-regex rejects nil: reference parity (sequential? gate)") {
    // malli's regex validator wraps the matcher in `(sequential? coll)`
    // (reference /root/reference/src/malli/impl/regex.cljc:571-583) and
    // `(sequential? nil)` is false — nil is NOT an empty seq for :*/:?/:cat
    // even though :* accepts []. Both engine paths must agree.
    check(S.star(S.int), ArrayType(LongType), Seq(
      (null, false, Set(("", "", ErrorKeys.InvalidType))),
      (Seq.empty[Long], true, Set.empty)))
    check(S.optional(S.int), ArrayType(LongType), Seq(
      (null, false, Set(("", "", ErrorKeys.InvalidType)))))
    check(S.cat(S.int), ArrayType(LongType), Seq(
      (null, false, Set(("", "", ErrorKeys.InvalidType)))))
    // the general (tier-3) matcher too
    assert(!RowEval.validate(S.star(S.cat(S.int, S.int)), null))
  }

  test("custom leaf (-simple-schema extension): codegen Column + RowEval twin") {
    val even = S.custom(":user/even",
      (c, _) => c.cast(LongType) % 2 === 0,
      { case n: Long => n % 2 == 0; case _ => false })
    assert(RowEval.validate(even, 4L) && !RowEval.validate(even, 3L))
    assert(RowEval.explain(even, 3L).map(_.key) === Vector(":user/even"))
    val d = dfOf(LongType, Seq(2L, 3L, 4L))
    val out = d.select(
      SchemaCompiler.valid(even, F.col("v"), LongType).as("ok"),
      F.size(SchemaCompiler.errors(even, F.col("v"), LongType, "p",
        F.lit(""))).as("ne"))
    assert(out.collect().map(r => (r.getBoolean(0), r.getInt(1))).toSeq ===
      Seq((true, 0), (false, 1), (true, 0)))
    // the custom leaf is pure-Column: no UDF in the plan
    assert(!out.queryExecution.executedPlan.toString.contains("ScalaUDF"))
  }

  test(":validate — error-returning fn (experimental/validate.cljc:9-59)") {
    // simple case (validate_test.cljc:8-23): fn returns Nil or errors
    def evenErrs(x: Any): Seq[ValidateErr] = x match {
      case n: Long if n % 2 == 0 => Nil
      case n: Long => Seq(ValidateErr(Nil, ":not-even", n.toString))
      case other => Seq(ValidateErr(Nil, ":not-int", String.valueOf(other)))
    }
    check(S.validate(":user/even")(evenErrs), LongType, Seq(
      (4L, true, Set.empty),
      (3L, false, Set(("", "", ":not-even")))))

    // nested paths (validate_test.cljc:25-78): each returned error
    // splices its own in-suffix after the enclosing in; multiple errors
    // from one fn call all surface
    def bothEven(x: Any): Seq[ValidateErr] = x match {
      case r: Row => Seq(("a", 0), ("b", 1)).flatMap { case (k, i) =>
        if (r.isNullAt(i) || r.getLong(i) % 2 != 0)
          Seq(ValidateErr(Seq(k), ":not-even",
            if (r.isNullAt(i)) "null" else r.getLong(i).toString))
        else Nil
      }
      case other => Seq(ValidateErr(Nil, ":not-map", String.valueOf(other)))
    }
    val schema = S.map("value" -> S.validate(":user/both-even")(bothEven))
    val dt = StructType(Seq(StructField("value", StructType(Seq(
      StructField("a", LongType), StructField("b", LongType))))))
    check(schema, dt, Seq(
      (Row(Row(2L, 4L)), true, Set.empty),
      (Row(Row(3L, 4L)), false, Set(("value", "value/a", ":not-even"))),
      (Row(Row(2L, 3L)), false, Set(("value", "value/b", ":not-even"))),
      (Row(Row(3L, 3L)), false, Set(("value", "value/a", ":not-even"),
        ("value", "value/b", ":not-even")))))

    // -safe-pred: a throwing fn is invalid with one ":validate/error" row
    val boom = S.validate(":user/boom")(_ => throw new RuntimeException("x"))
    check(boom, LongType, Seq((1L, false, Set(("", "", ":validate/error")))))

    // humanize (validate_test.cljc:80-107): custom types are "unknown
    // error" by default, overridable through the message lookup chain
    assert(mallispark.msg.Messages.message(":not-even") === "unknown error")
    assert(mallispark.msg.Messages.message(":not-even",
      Map(":not-even" -> "a can not be!")) === "a can not be!")

    // form + export round-trip carries the name; deserialization without
    // the fn fails FAST at eval (same contract as :custom)
    val even = S.validate(":user/even")(evenErrs)
    assert(SchemaIR.form(even) === "[:validate :user/even]")
    val back = mallispark.ir.Export.fromJson(mallispark.ir.Export.toJson(even))
    assert(SchemaIR.form(back) === "[:validate :user/even]")
    intercept[IllegalArgumentException] { RowEval.validate(back, 4L) }
  }

  test("time edge semantics: unparseable offsets are FALSE, fractional local-time") {
    implicit val ctx: SchemaCompiler.Ctx = SchemaCompiler.Ctx()
    import scala.jdk.CollectionConverters._
    // regex-passing but unparseable offset-date-time (month 13) must be
    // FALSE, never NULL — a null verdict makes coerce rows vanish
    val odt = S.offsetDateTime(
      Some("2020-01-01T00:00:00Z"), Some("2030-01-01T00:00:00Z"))
    val d = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](Seq(
        org.apache.spark.sql.Row("2020-13-45T10:00:00Z"),
        org.apache.spark.sql.Row("2025-06-01T10:00:00Z")).asJava),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType))))
    val got = d.select(SchemaCompiler.valid(odt, F.col("v"),
      org.apache.spark.sql.types.StringType).as("ok")).collect()
    assert(!got(0).isNullAt(0) && !got(0).getBoolean(0)) // false, NOT null
    assert(got(1).getBoolean(0))
    // local-time bounds compare TEMPORALLY: "06:00:00" equals a
    // "06:00:00.0"-style fractional rendering (string compare would
    // order the shorter one below)
    val lt = S.localTime(Some("06:00:00.0"), Some("18:00:00"))
    val d2 = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](Seq(
        org.apache.spark.sql.Row("06:00:00"),
        org.apache.spark.sql.Row("05:59:59.9"),
        org.apache.spark.sql.Row("17:30:00.5")).asJava),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType))))
    val got2 = d2.select(SchemaCompiler.valid(lt, F.col("v"),
      org.apache.spark.sql.types.StringType).as("ok"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(got2 === Seq(true, false, true))
    // required key with a :maybe child is a NULLABLE struct field
    val st = SchemaCompiler.toStructType(
      S.mapE(false, S.req("x", S.maybe(S.int)))
        .asInstanceOf[mallispark.ir.SchemaIR.SMap])
    assert(st("x").nullable)
  }

  test("nested seq-regex auto-falls back to the general matcher") {
    // [:cat [:* int?] int?] — backtracking: star must leave one element
    val s = S.cat(S.star(S.int), S.int)
    val df = dfOf(ArrayType(LongType),
      Seq(Seq(1L, 2L, 3L), Seq(7L), Seq.empty[Long]))
    val got = df.select(
      SchemaCompiler.valid(s, F.col("v"), ArrayType(LongType)).as("ok"),
      F.size(SchemaCompiler.errors(s, F.col("v"), ArrayType(LongType), "",
        F.lit(""))).as("ne")).collect()
    assert(got.map(_.getBoolean(0)).toSeq === Seq(true, true, false))
    assert(got.map(_.getInt(1)).toSeq === Seq(0, 0, 1))
    // RowEval agrees
    assert(RowEval.validate(s, Seq(1L, 2L, 3L)))
    assert(!RowEval.validate(s, Seq.empty[Long]))
  }

  test("tier-3 regex explain: positional error attribution") {
    // [:* [:cat [:re ^k] [:re ^v]]] — mirror of perf_test.cljc:345-349
    // shapes: the failing ELEMENT is named, not one opaque error
    val s = S.star(S.cat(S.re("^k"), S.re("^v")))
    val at = ArrayType(StringType)
    check(s, at, Seq(
      (Seq("k1", "v1", "k2", "v2"), true, Set.empty),
      // element 3 should start with v: leaf error at in=3, path 0/1
      (Seq("k1", "v1", "k2", "x2"), false, Set(("0/1", "3", ":re"))),
      // odd length: the cat needs one more element
      (Seq("k1", "v1", "k2"), false,
        Set(("", "", ErrorKeys.EndOfInput))),
      (null, false, Set(("", "", ErrorKeys.InvalidType)))))
    // deepest-failure attribution through [:cat [:* [:int {:max 5}]] [:= 9]]
    val s2 = S.cat(S.star(S.int(0L, 5L)), S.eq_(9L))
    check(s2, ArrayType(LongType), Seq(
      (Seq(1L, 2L, 9L), true, Set.empty),
      // 7 stops the bounded star AND fails := → first leaf to fail at the
      // deepest position (in=2) is the := (path 1): first-at-depth wins
      (Seq(1L, 2L, 7L), false, Set(("1", "2", ":="))),
      // all elements fit the star, so := runs out of input — the
      // END-OF-INPUT attempt is the deepest parse and wins
      (Seq(1L, 2L, 3L), false, Set(("", "", ErrorKeys.EndOfInput))),
      (Seq.empty[Long], false, Set(("", "", ErrorKeys.EndOfInput)))))
    // [:+ [:int {:max 5}]] — a failure in the 2nd+ iteration must report
    // the SAME single "/0" path segment as the 1st (the SStar continuation
    // appends its own "0"; SPlus must not add another)
    val s3 = S.cat(S.plus(S.int(0L, 5L)), S.eq_(9L))
    check(s3, ArrayType(LongType), Seq(
      (Seq(1L, 9L), true, Set.empty),
      // failure at iteration 1 (first element of the plus)
      (Seq(7L, 9L), false, Set(("0/0", "0", ":int"))),
      // := fails at in=2 — NOT a duplicated 0/0/0 path from the plus tail
      (Seq(1L, 2L, 7L), false, Set(("1", "2", ":=")))))
  }

  test("RowEval general seq-regex: [:* [:catn [:prop string?] [:val ...]]]") {
    // perf_test.cljc:345-349 — the general backtracking case (tier 3):
    // evaluated by the RowEval escape hatch, not the bounded compiler.
    val s = S.star(S.catn("prop" -> S.re("^-"),
      "val" -> S.alt(S.re("^[^-]"), S.boolean)))
    assert(RowEval.validate(s, Seq("-p", "x", "-q", "y")))
    assert(!RowEval.validate(s, Seq("-p", "x", "-q")))
    assert(RowEval.validate(s, Seq.empty[String]))
  }

  test("schema form + getIn + fold") {
    val s = S.map(closed = true)("x" -> S.int, "ys" -> S.vector(S.string))
    assert(SchemaIR.form(s).startsWith("[:map {:closed true}"))
    assert(SchemaIR.getIn(s, Seq("ys", "0")) === Some(SString(None, None)))
    val leafCount = SchemaIR.fold(s, 0) { (n, _) => n + 1 }
    assert(leafCount === 4) // map, int, vector, string
  }

  // seed-sweep regression: acceptsNull must DEREF refs — a required key
  // whose child is [:ref ...→ :maybe] accepts a physical null as a
  // present-nil on BOTH engines (it previously read as missing-key)
  test("acceptsNull derefs refs: required [:ref -> :maybe] key takes null") {
    val viaRef = S.mapE(false, S.req("f",
      S.scoped("t" -> S.maybe(S.enum_("a", "b")))(S.ref("t"))))
      .asInstanceOf[SMap]
    val dt = StructType(Seq(StructField("f", StringType)))
    val rows = Seq(Row("a"), Row(null), Row("zz"))
    val got = runCatalyst2(viaRef, dt, rows)
    assert(got(0)._1 && got(1)._1 && !got(2)._1)
    assert(got(1)._2.isEmpty, s"null-through-ref raised ${got(1)._2}")
    rows.zip(got).foreach { case (r, (ok, _)) =>
      val v = Map("f" -> r.get(0))
      assert(RowEval.validate(viaRef, v) === ok, s"duality at $v")
    }
    // a ref to a NON-null-accepting target still reads null as missing
    val strict = S.mapE(false, S.req("f",
      S.scoped("t" -> S.enum_("a", "b"))(S.ref("t")))).asInstanceOf[SMap]
    val got2 = runCatalyst2(strict, dt, Seq(Row(null)))
    assert(!got2(0)._1)
    assert(got2(0)._2.exists(_._3 == ErrorKeys.MissingKey))
    // direct ref cycle: guarded, conservative false, no stack overflow
    val cyc = S.mapE(false, S.req("f",
      S.scoped("t" -> S.ref("t"))(S.ref("t")))).asInstanceOf[SMap]
    assert(!RowEval.validate(cyc, Map("f" -> null)))
  }

  private def runCatalyst2(sch: SMap, dt: StructType, rows: Seq[Row])
      : Seq[(Boolean, Set[(String, String, String)])] = {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](rows.asJava), dt)
    df.select(
      SchemaCompiler.valid(sch, F.struct(dt.fieldNames.toIndexedSeq
        .map(F.col): _*), dt).as("ok"),
      SchemaCompiler.errors(sch, F.struct(dt.fieldNames.toIndexedSeq
        .map(F.col): _*), dt, "", F.lit("")).as("e"))
      .collect().toSeq.map { r =>
        (r.getBoolean(0), r.getSeq[Row](1).map(e =>
          (e.getString(0), e.getString(1), e.getString(2))).toSet)
      }
  }
}
