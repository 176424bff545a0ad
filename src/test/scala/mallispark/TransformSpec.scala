package mallispark

import org.apache.spark.sql.Row
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._
import mallispark.ir.S
import mallispark.ir.SchemaIR._
import mallispark.compile.Transform

/** Transformer fixtures F11/F12 (FIXTURES.md) — semantics from
  * /root/reference/src/malli/transform.cljc and
  * test/malli/transform_test.cljc:29-139, 540, 958. */
class TransformSpec extends SparkSuite {
  import scala.jdk.CollectionConverters._

  private def df(rows: Seq[Row], schema: StructType) =
    spark.createDataFrame(new java.util.ArrayList[Row](rows.asJava), schema)

  test("F11 string->long: parse or null-on-failure (malli: input unchanged)") {
    val d = df(Seq(Row("1"), Row("abc"), Row("-42"), Row(null)),
      StructType(Seq(StructField("v", StringType))))
    val out = d.select(Transform.decode(SInt(), F.col("v"), StringType,
      Transform.StringMode).as("d")).collect().map(r =>
        if (r.isNullAt(0)) null else r.getLong(0))
    assert(out.toSeq === Seq(1L, null, -42L, null))
  }

  test("F11 json mode does NOT coerce strings to numbers") {
    val d = df(Seq(Row("1")), StructType(Seq(StructField("v", StringType))))
    val out = d.select(Transform.decode(SInt(), F.col("v"), StringType,
      Transform.JsonMode).as("d")).schema
    assert(out.head.dataType === StringType) // elided — stays a string
  }

  // :enum/:= child inference (transform.cljc:236-248;
  // transform_test.cljc:1142-1230 child-inference fixtures)
  test(":enum/:= decode via inferred child type; json moves only keywords") {
    val st = StructType(Seq(StructField("v", StringType)))
    def dec(ir: mallispark.ir.SchemaIR, in: String,
            mode: Transform.Mode): Any = {
      val r = df(Seq(Row(in)), st).select(
        Transform.decode(ir, F.col("v"), StringType, mode).as("d"))
        .collect().head
      if (r.isNullAt(0)) null else r.get(0)
    }
    val kwEnum = SEnum(Seq(":kikka", ":kukka"))
    val intEnum = SEnum(Seq(1L, 2L))
    val dblEnum = SEnum(Seq(1.1, 2.2))
    val strEnum = SEnum(Seq("a", "b"))
    // string mode decodes every inferred kind
    assert(dec(kwEnum, "kikka", Transform.StringMode) === ":kikka")
    assert(dec(intEnum, "1", Transform.StringMode) === 1L)
    assert(dec(dblEnum, "1.1", Transform.StringMode) === 1.1)
    assert(dec(strEnum, "a", Transform.StringMode) === "a")
    assert(dec(SCompare("=", ":kikka"), "kikka",
      Transform.StringMode) === ":kikka")
    assert(dec(SCompare("=", 1L), "1", Transform.StringMode) === 1L)
    // json mode: keywords move, numbers DON'T decode from strings
    assert(dec(kwEnum, "kikka", Transform.JsonMode) === ":kikka")
    assert(dec(intEnum, "1", Transform.JsonMode) === "1")
    assert(dec(dblEnum, "1.1", Transform.JsonMode) === "1.1")
    // already-decoded values pass through (idempotence)
    assert(dec(kwEnum, ":kikka", Transform.JsonMode) === ":kikka")
    // heterogeneous children → no inference, no-op
    assert(dec(SEnum(Seq(":a", 1L)), "x", Transform.StringMode) === "x")
    // encode: keyword enums drop the colon
    val enc = df(Seq(Row(":kikka")), st).select(
      Transform.encode(kwEnum, F.col("v"), StringType,
        Transform.StringMode).as("e")).collect().head.getString(0)
    assert(enc === "kikka")
    // nested in a struct: the container rebuild is NOT elided even
    // though the column type is unchanged (value-changing decoder)
    val inner = StructType(Seq(StructField("k", StringType)))
    val d2 = df(Seq(Row(Row("kikka"))),
      StructType(Seq(StructField("s", inner))))
    val out2 = d2.select(Transform.decode(
      SMap(Seq(Entry("k", kwEnum))), F.col("s"), inner,
      Transform.JsonMode).as("d")).collect().head.getStruct(0)
    assert(out2.getString(0) === ":kikka")
  }

  test("F11 string->boolean: only 'true'/'false' (transform.cljc:108-113)") {
    val d = df(Seq(Row("true"), Row("false"), Row("TRUE"), Row("1")),
      StructType(Seq(StructField("v", StringType))))
    val out = d.select(Transform.decode(SBoolean, F.col("v"), StringType,
      Transform.StringMode).as("d")).collect().map(r =>
        if (r.isNullAt(0)) null else r.getBoolean(0))
    assert(out.toSeq === Seq(true, false, null, null))
  }

  test("F11 empty-string->nil; number->long only for exact integrals") {
    val d = df(Seq(Row("", 1.0), Row("x", 1.5)),
      StructType(Seq(StructField("s", StringType), StructField("n", DoubleType))))
    val out = d.select(
      Transform.emptyStringToNull(F.col("s")).as("s2"),
      Transform.decode(SInt(), F.col("n"), DoubleType,
        Transform.StringMode).as("n2")).collect()
    assert(out(0).isNullAt(0) && out(0).getLong(1) === 1L)
    assert(out(1).getString(0) === "x" && out(1).isNullAt(1))
  }

  test("F11 string->timestamp ISO-8601; encode date->string round-trip") {
    val d = df(Seq(Row("2024-03-01T10:00:00.000+00:00"), Row("2024-03-01"),
      Row("garbage")), StructType(Seq(StructField("v", StringType))))
    val decoded = d.select(Transform.decode(STimestamp(), F.col("v"),
      StringType, Transform.StringMode).as("ts"))
    val vals = decoded.collect()
    assert(!vals(0).isNullAt(0) && !vals(1).isNullAt(0) && vals(2).isNullAt(0))
    val enc = decoded.where(F.col("ts").isNotNull).select(
      Transform.encode(STimestamp(), F.col("ts"), TimestampType).as("s"))
      .collect().map(_.getString(0))
    assert(enc(0).startsWith("2024-03-01T10:00:00.000"))
  }

  test("string->keyword decode prepends ':'; keyword->string encode strips it") {
    val d = df(Seq(Row("abc"), Row(":kw"), Row(null)),
      StructType(Seq(StructField("v", StringType))))
    val dec = d.select(Transform.decode(SIdent("keyword"), F.col("v"),
      StringType, Transform.StringMode).as("d")).collect().map(_.getString(0))
    assert(dec.toSeq === Seq(":abc", ":kw", null))
    val enc = d.select(Transform.encode(SIdent("keyword"), F.col("v"),
      StringType).as("e")).collect().map(_.getString(0))
    assert(enc.toSeq === Seq("abc", "kw", null))
  }

  test(":time decoders: ISO strings -> intervals/NTZ, round-trip via encode") {
    val d = df(Seq(Row("PT1H2M3S"), Row("P2DT1H"), Row("nope"), Row(null),
      Row("P"), Row("PT")),
      StructType(Seq(StructField("v", StringType))))
    val dur = d.select(Transform.decode(STime("duration"), F.col("v"),
      StringType, Transform.StringMode).as("d"))
    assert(dur.schema.head.dataType.isInstanceOf[DayTimeIntervalType])
    val secs = dur.select(F.col("d").cast(LongType)).collect()
      .map(r => if (r.isNullAt(0)) null else r.getLong(0))
    // "P"/"PT" are degenerate (java.time parse throws) → null, not zero
    assert(secs.toSeq === Seq(3723L, 2 * 86400L + 3600L, null, null,
      null, null))
    // encode(decode(s)) parses back to the equal duration
    val enc = dur.select(Transform.encode(STime("duration"), F.col("d"),
      DayTimeIntervalType()).as("e")).collect().map(_.getString(0))
    assert(enc(0) === "PT3723S" && enc(1) === "PT176400S")

    val p = df(Seq(Row("P1Y2M"), Row("P3M"), Row("P1W")),
      StructType(Seq(StructField("v", StringType))))
    val per = p.select(Transform.decode(STime("period"), F.col("v"),
      StringType, Transform.StringMode).as("d"))
    val months = per.select(F.col("d").cast(IntegerType)).collect()
      .map(r => if (r.isNullAt(0)) null else r.getInt(0))
    assert(months.toSeq === Seq(14, 3, null)) // weeks outside the Y/M subset

    val l = df(Seq(Row("2024-03-01T10:30:00"), Row("bad")),
      StructType(Seq(StructField("v", StringType))))
    val ldt = l.select(Transform.decode(STime("local-date-time"), F.col("v"),
      StringType, Transform.StringMode).as("d"))
    assert(ldt.schema.head.dataType === TimestampNTZType)
    val shown = ldt.select(F.date_format(F.col("d"), "yyyy-MM-dd HH:mm:ss"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(shown.toSeq === Seq("2024-03-01 10:30:00", null))
  }

  test("F12 defaults + strip-extra-keys (transform.cljc:460-528)") {
    val schema = SMap(Seq(
      Entry("a", SInt(), optional = true, default = Some(7L)),
      Entry("b", SString())))
    val d = df(Seq(Row(null, "x", "junk"), Row(3L, "y", "junk2")),
      StructType(Seq(StructField("a", LongType), StructField("b", StringType),
        StructField("extra", StringType))))
    val filled = Transform.decodeDF(schema, d, Transform.StringMode)
    assert(filled.collect().map(_.getLong(0)).toSeq === Seq(7L, 3L))
    val stripped = Transform.stripExtraKeys(schema, d)
    assert(stripped.columns.toSeq === Seq("a", "b"))
    val renamed = Transform.renameKeys(d, Map("extra" -> "meta"))
    assert(renamed.columns.contains("meta"))
  }

  test("strip-extra-keys ::m/default + default-value options (transform_test:565-630, 958-1030)") {
    val d = df(Seq(Row(1L, 2L, "zz")),
      StructType(Seq(StructField("x", LongType), StructField("y", LongType),
        StructField("z", StringType))))
    // nested default-map chains flatten; a :string-keyed map-of rest
    // keeps every extra column, an :int-keyed one keeps none
    val nestedKeep = SMap(Seq(Entry("x", SInt())), rest = Some(
      SMap(Seq(Entry("y", SInt())),
        rest = Some(S.mapOf(S.string, S.int)))))
    assert(Transform.stripExtraKeys(nestedKeep, d).columns.toSeq ===
      Seq("x", "y", "z"))
    val nestedDrop = SMap(Seq(Entry("x", SInt())), rest = Some(
      SMap(Seq(Entry("y", SInt())),
        rest = Some(S.mapOf(S.int, S.int)))))
    assert(Transform.stripExtraKeys(nestedDrop, d).columns.toSeq ===
      Seq("x", "y"))
    // key-transformer over names
    assert(Transform.transformKeys(d, _.toUpperCase).columns.toSeq ===
      Seq("X", "Y", "Z"))

    // defaults: child-prop default fills nulls; a required missing
    // column materializes; optional joins only with addOptionalKeys
    val schema = SMap(Seq(
      Entry("x", SInt()),
      Entry("req", SProps(NodeProps(default = Some(42L)), SInt())),
      Entry("opt", SInt(), optional = true, default = Some(0L))))
    val in = df(Seq(Row(5L)), StructType(Seq(StructField("x", LongType))))
    val plain = Transform.fillDefaults(schema, in)
    assert(plain.columns.toSeq === Seq("x", "req"))
    assert(plain.collect().head.getLong(1) === 42L)
    val withOpt = Transform.fillDefaults(schema, in, addOptionalKeys = true)
    assert(withOpt.columns.toSeq === Seq("x", "req", "opt"))
    assert(withOpt.collect().head.getLong(2) === 0L)
    // {:defaults {type fn}} analogue: per-leaf-kind defaults fill nulls
    val typed = SMap(Seq(Entry("name", SString()), Entry("age", SInt())))
    val holes = df(Seq(Row(null, null)),
      StructType(Seq(StructField("name", StringType),
        StructField("age", LongType))))
    val filled = Transform.fillDefaults(typed, holes,
      typeDefaults = Map("string" -> ""))
    val r = filled.collect().head
    assert(r.getString(0) === "" && r.isNullAt(1))
  }

  test("schema-hinted transformation (transform_test.cljc:824-860)") {
    // [:string {:decode/string upper, :encode/string lower}]
    val hinted = SProps(NodeProps(
      decodeHints = Seq("string" -> THint(enter = Some("str/upper-case"))),
      encodeHints = Seq("string" -> THint(enter = Some("str/lower-case")))),
      SString())
    val d = df(Seq(Row("KiKkA")),
      StructType(Seq(StructField("v", StringType))))
    def one(c: org.apache.spark.sql.Column): String =
      d.select(c.as("r")).collect().head.getString(0)
    assert(one(Transform.decode(hinted, F.col("v"), StringType,
      Transform.StringMode)) === "KIKKA")
    assert(one(Transform.encode(hinted, F.col("v"), StringType)) === "kikka")
    // undefined transformations: a :decode/string hint is invisible to
    // the json transformer
    assert(one(Transform.decode(hinted, F.col("v"), StringType,
      Transform.JsonMode)) === "KiKkA")
    // decode∘encode lands on the encoded form
    assert(one(Transform.encode(hinted,
      Transform.decode(hinted, F.col("v"), StringType,
        Transform.StringMode), StringType)) === "kikka")
    // compact and map prop spellings parse to the same IR; the map form
    // masks the compact key for the same name (fixture :870-877)
    import mallispark.ir.Export
    val compact = Export.fromForm(
      """[:string {:decode/string "str/upper-case"}]""")
    val mapForm = Export.fromForm(
      """[:string {:decode {:string "str/upper-case"}}]""")
    assert(compact === mapForm)
    val masked = Export.fromForm(
      """[:string {:decode {:string "str/upper-case"} :decode/string "str/lower-case"}]""")
    assert(masked === compact)
    // form and AST round-trips keep the hints
    assert(Export.fromForm(mallispark.ir.SchemaIR.form(hinted)) === hinted)
    assert(Export.fromJson(Export.toJson(hinted)) === hinted)
  }

  test("hinted :and applies all children in order (transform_test:879-900)") {
    // decode: parent {:enter pad-2-digit :leave *10-if-big}, children
    // int? then [any? {:enter inc :leave (partial * 2)}] — "1"→4, "11"→2220
    val andDecode = SProps(NodeProps(decodeHints = Seq("string" -> THint(
      enter = Some("""(fn [x] (if (re-matches "[0-9]{2}" x) (str x "0") x))"""),
      leave = Some("(fn [x] (if (>= x 100) (* 10 x) x))")))),
      SAnd(Seq(SInt(), SProps(NodeProps(decodeHints = Seq("string" ->
        THint(enter = Some("inc"), leave = Some("(partial * 2)")))),
        SAny))))
    val d = df(Seq(Row("1"), Row("11")),
      StructType(Seq(StructField("v", StringType))))
    val dec = d.select(Transform.decode(andDecode, F.col("v"), StringType,
      Transform.StringMode).as("r"))
    assert(dec.collect().map(_.getLong(0)).toSeq === Seq(4L, 2220L))
    // the static type mirror matches what the plan actually produced
    assert(dec.schema.head.dataType ===
      Transform.decodedType(andDecode, StringType, Transform.StringMode))

    // encode dual (fixture :891-900): 1 → "<<1>>", 11 → "<<<<110>>>>"
    val andEncode = SProps(NodeProps(encodeHints = Seq("string" -> THint(
      enter = Some("(fn [x] (if (> x 10) (* x 10) x))"),
      leave = Some(
        """(fn [x] (if (re-matches "<<[0-9]{3}>>" x) (str "<<" x ">>") x))""")))),
      SAnd(Seq(SAny, SProps(NodeProps(encodeHints = Seq("string" ->
        THint(enter = Some("""(fn [x] (str "<<" x))"""),
          leave = Some("""(fn [x] (str x ">>"))""")))),
        SAny))))
    val n = df(Seq(Row(1L), Row(11L)),
      StructType(Seq(StructField("v", LongType))))
    val enc = n.select(Transform.encode(andEncode, F.col("v"), LongType)
      .as("r")).collect().map(_.getString(0))
    assert(enc.toSeq === Seq("<<1>>", "<<<<110>>>>"))
  }

  test("hinted :or picks the first VALIDATING branch (transform_test:902-927)") {
    // branch 1 doubles after decode but only covers positives; negatives
    // fall through to the plain int branch
    val or = SOr(Seq(
      SProps(NodeProps(decodeHints = Seq("string" ->
        THint(leave = Some("(partial * 2)")))), SInt(Some(1L), None)),
      SInt()))
    val d = df(Seq(Row("3"), Row("-3")),
      StructType(Seq(StructField("v", StringType))))
    val out = d.select(Transform.decode(or, F.col("v"), StringType,
      Transform.StringMode).as("r")).collect().map(_.getLong(0))
    assert(out.toSeq === Seq(6L, -3L))
  }

  test("nested containers decode in place (map/tuple/map-of columns)") {
    // struct column: declared fields decode, undeclared ride along,
    // null structs stay null
    val inner = SMap(Seq(Entry("n", SInt()), Entry("kw", SIdent("keyword"))))
    val st = StructType(Seq(StructField("n", StringType),
      StructField("kw", StringType), StructField("extra", StringType)))
    val d = df(Seq(
      Row(Row("5", "abc", "e1")), Row(Row("bad", ":kw", "e2")), Row(null)),
      StructType(Seq(StructField("m", st))))
    val dec = d.select(Transform.decode(inner, F.col("m"), st,
      Transform.StringMode).as("m"))
    val rows = dec.collect()
    val r0 = rows(0).getStruct(0)
    assert(r0.getLong(0) === 5L && r0.getString(1) === ":abc" &&
      r0.getString(2) === "e1")
    assert(rows(1).getStruct(0).isNullAt(0)) // failed cast -> null field
    assert(rows(2).isNullAt(0))              // null struct stays null

    // struct tuple: positional decode
    val tup = STuple(Seq(SIdent("keyword"), SInt()))
    val tst = StructType(Seq(StructField("_1", StringType),
      StructField("_2", StringType)))
    val td = df(Seq(Row(Row("kikka", "1"))),
      StructType(Seq(StructField("t", tst))))
    val tr = td.select(Transform.decode(tup, F.col("t"), tst,
      Transform.StringMode).as("t")).collect().head.getStruct(0)
    assert(tr.getString(0) === ":kikka" && tr.getLong(1) === 1L)

    // map-of: values decode; entries with undecodable KEYS drop (a typed
    // map cannot keep the original, and null map keys are illegal)
    val mo = S.mapOf(S.int, S.int)
    val mt = MapType(StringType, StringType)
    val md = df(Seq(Row(Map("1" -> "10", "x" -> "20", "3" -> "bad"))),
      StructType(Seq(StructField("kv", mt))))
    val mr = md.select(Transform.decode(mo, F.col("kv"), mt,
      Transform.StringMode).as("kv")).collect().head
      .getMap[Long, Any](0)
    assert(mr.keySet === Set(1L, 3L))
    assert(mr(1L) === 10L && mr(3L) == null)

    // encode dual: struct fields and array elements encode per schema
    val encSchema = SMap(Seq(Entry("ts", STimestamp()),
      Entry("kw", SIdent("keyword"))))
    val est = StructType(Seq(
      StructField("ts", TimestampType), StructField("kw", StringType)))
    val ed = df(Seq(Row(Row(
      java.sql.Timestamp.valueOf("2024-03-01 10:00:00"), ":en"))),
      StructType(Seq(StructField("m", est))))
    val er = ed.select(Transform.encode(encSchema, F.col("m"), est)
      .as("m")).collect().head.getStruct(0)
    assert(er.getString(0).startsWith("2024-03-01T10:00:00"))
    assert(er.getString(1) === "en")
    val vd = df(Seq(Row(Seq(":a", ":b"))),
      StructType(Seq(StructField("xs", ArrayType(StringType)))))
    val vr = vd.select(Transform.encode(
      SVector(SIdent("keyword")), F.col("xs"), ArrayType(StringType))
      .as("xs")).collect().head.getSeq[String](0)
    assert(vr === Seq("a", "b"))

    // elision: an already-typed struct with no hints keeps the SAME
    // column (no struct rebuild in the plan)
    val typedSt = StructType(Seq(StructField("n", LongType)))
    val td2 = df(Seq(Row(Row(4L))),
      StructType(Seq(StructField("m", typedSt))))
    val plan = td2.select(Transform.decode(SMap(Seq(Entry("n", SInt()))),
      F.col("m"), typedSt, Transform.StringMode).as("m"))
      .queryExecution.analyzed.toString
    assert(!plan.contains("struct("))
  }

  test("column decode derefs registry refs (scoped recursive struct)") {
    val node = S.scoped("node" -> SMap(Seq(
      Entry("v", SInt()),
      Entry("kids", SVector(S.ref("node")), optional = true))))(
      S.ref("node"))
    val inner = StructType(Seq(StructField("v", StringType)))
    val outer = StructType(Seq(StructField("v", StringType),
      StructField("kids", ArrayType(inner))))
    val d = df(Seq(Row(Row("1", Seq(Row("2"))))),
      StructType(Seq(StructField("n", outer))))
    val dec = d.select(Transform.decode(node, F.col("n"), outer,
      Transform.StringMode).as("n"))
    val r = dec.collect().head.getStruct(0)
    assert(r.getLong(0) === 1L)
    assert(r.getSeq[Row](1).head.getLong(0) === 2L)
  }

  test("fromJsonLines: parse raw JSON docs, flatten, nulls on malformed") {
    val sch = SMap(Seq(Entry("id", SInt()), Entry("tag", SString())))
    val d = df(Seq(
      Row(1L, """{"id": 7, "tag": "a"}"""),
      Row(2L, """{"id": 8}"""),
      Row(3L, "{broken")),
      StructType(Seq(StructField("k", LongType),
        StructField("raw", StringType))))
    val out = Transform.fromJsonLines(sch, d, "raw")
    assert(out.columns.toSeq === Seq("k", "id", "tag"))
    val rows = out.orderBy("k").collect()
    assert(rows(0).getLong(1) === 7L && rows(0).getString(2) === "a")
    assert(rows(1).getLong(1) === 8L && rows(1).isNullAt(2))
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2)) // malformed
  }

  test("fromCsvLines: delimited lines parse typed, bad fields go null") {
    val sch = SMap(Seq(Entry("id", SInt()), Entry("tag", SString())))
    val d = df(Seq(Row("7,a"), Row("x,b"), Row("9")),
      StructType(Seq(StructField("raw", StringType))))
    val out = Transform.fromCsvLines(sch, d, "raw").collect()
    assert(out(0).getLong(0) === 7L && out(0).getString(1) === "a")
    assert(out(1).isNullAt(0) && out(1).getString(1) === "b")
    assert(out(2).getLong(0) === 9L && out(2).isNullAt(1))
  }

  test("coerce = decode then validate, splitting accepted/rejected") {
    val schema = SMap(Seq(Entry("n", SInt(Some(1L), None))))
    val d = df(Seq(Row("5"), Row("0"), Row("junk")),
      StructType(Seq(StructField("n", StringType))))
    val (ok, bad) = Transform.coerce(schema, d, Transform.StringMode)
    assert(ok.collect().map(_.getLong(0)).toSeq === Seq(5L))
    assert(bad.count() === 2) // 0 fails min, junk fails cast
  }
}
