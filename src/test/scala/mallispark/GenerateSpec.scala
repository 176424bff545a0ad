package mallispark

import org.apache.spark.sql.{functions => F}
import mallispark.ir.S
import mallispark.ir.SchemaIR._
import mallispark.compile.SchemaCompiler
import mallispark.gen.Generate

/** The malli generator law (generator_test.cljc):
  * every generated row validates against its schema. */
class GenerateSpec extends SparkSuite {

  implicit val ctx: SchemaCompiler.Ctx = SchemaCompiler.Ctx()

  private val schemas: Seq[(String, SMap)] = Seq(
    "flat" -> S.mapE(false,
      S.req("a", S.int(0, 100)),
      S.req("b", S.string(min = 2, max = 10)),
      S.opt("c", S.enum_("x", "y", "z")),
      S.req("d", S.boolean)).asInstanceOf[SMap],
    "nested" -> S.mapE(false,
      S.req("xs", S.vector(S.int(-5, 5), min = Some(1), max = Some(4))),
      S.req("t", S.tuple(S.string, S.int(0, 9))),
      S.req("m", S.maybe(S.double(0.0, 1.0))),
      S.req("ts", S.instant(
        min = Some(java.time.Instant.parse("2024-01-01T00:00:00Z")),
        max = Some(java.time.Instant.parse("2024-12-31T00:00:00Z")))),
      S.req("u", S.uuid),
      S.req("set", S.set(S.int(0, 1000000)))).asInstanceOf[SMap],
    "map-of" -> S.mapE(false,
      S.req("kvs", S.mapOf(S.int, S.string, min = Some(1), max = Some(4))),
      S.req("kvs2", S.mapOf(S.string, S.int(0, 9)))).asInstanceOf[SMap],
    "unions" -> S.mapE(false,
      S.req("o", S.or(S.int(0, 10), S.int(50, 60))),
      S.req("orn", S.orn("lo" -> S.intMax(-1L), "hi" -> S.intMin(1L))),
      S.req("cat", S.cat(S.int(0, 5), S.int(10, 15))),
      S.req("star", S.star(S.enum_("a", "b")))).asInstanceOf[SMap],
    "idents" -> S.mapE(false,
      S.req("kw", S.keyword),
      S.req("qkw", S.qualifiedKeyword),
      S.req("sym", S.symbol),
      S.req("qsym", S.qualifiedSymbol),
      S.req("ch", S.char)).asInstanceOf[SMap],
    "time" -> S.mapE(false,
      S.req("dur", S.duration(Some("PT10S"), Some("PT1H"))),
      S.req("per", S.period(Some("P1M"), Some("P2Y"))),
      S.req("ldt", S.localDateTime(Some("2024-01-01T00:00:00"),
        Some("2024-06-01T00:00:00"))),
      S.req("lt", S.localTime(Some("06:00:00"), Some("18:00:00"))),
      S.req("zo", S.zoneOffset),
      S.req("zi", S.zoneId),
      // composite kinds: local-time × offset and instant × offset/zone
      // (experimental/time/generator.cljc -offset-time-gen etc.)
      S.req("ot", S.offsetTime),
      S.req("odt", S.offsetDateTime(Some("2024-01-01T00:00:00Z"),
        Some("2024-06-01T00:00:00Z"))),
      S.req("zdt", S.zonedDateTime)).asInstanceOf[SMap])

  test("validate(generate(schema)) holds for every schema") {
    schemas.foreach { case (name, s) =>
      val df = Generate.dfFromSchema(spark, s, 2000, seed = 7)
      val flagged = SchemaCompiler.validateDF(s, df, "ok")
      val bad = flagged.where(!F.col("ok"))
      val badCount = bad.count()
      if (badCount > 0) bad.show(5, truncate = false)
      assert(badCount === 0L, s"schema $name generated invalid rows")
    }
  }

  // regex-validity alone could hide nonsense like a +09:00 label on a
  // Phoenix instant — the composite kinds must survive java.time parsing
  // and their declared bounds, like the reference's part-composed gens
  test("composite time kinds: draws parse in java.time and hit bounds") {
    val df = Generate.dfFromSchema(spark,
      schemas.collectFirst { case ("time", s) => s }.get, 500, seed = 11)
    val rows = df.select("ot", "odt", "zdt").collect()
    val lo = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val hi = java.time.Instant.parse("2024-06-01T00:00:00Z")
    rows.foreach { r =>
      java.time.OffsetTime.parse(r.getString(0))
      val odt = java.time.OffsetDateTime.parse(r.getString(1))
      assert(!odt.toInstant.isBefore(lo) && !odt.toInstant.isAfter(hi),
        s"odt out of bounds: ${r.getString(1)}")
      val zdt = java.time.ZonedDateTime.parse(r.getString(2))
      assert(zdt.getOffset == zdt.getZone.getRules.getOffset(zdt.toInstant),
        s"zone/offset mismatch: ${r.getString(2)}")
    }
    assert(rows.map(_.getString(0).replaceAll("^[0-9:.]+", ""))
      .distinct.length == 4, "all four offsets should appear in ot draws")
  }

  test("portable Rng: the law holds and output differs from the native Rng") {
    schemas.foreach { case (name, s) =>
      val df = Generate.dfFromSchema(spark, s, 500, seed = 7,
        rng = Generate.PortableRng)
      val bad = SchemaCompiler.validateDF(s, df, "ok").where(!F.col("ok"))
      assert(bad.count() === 0L, s"schema $name (portable rng) invalid rows")
    }
    // same seed, different rng → different draws (the portable mode is a
    // real alternative stream, not an alias)
    val s0 = schemas.head._2
    def fp(rng: Generate.Rng) =
      Generate.dfFromSchema(spark, s0, 500, seed = 7, rng = rng)
        .agg(F.sum(F.pmod(F.xxhash64(F.col("a"), F.col("b")),
          F.lit(1000003L)))).collect()(0).getLong(0)
    assert(fp(Generate.PortableRng) !== fp(Generate.XxRng))
  }

  test("generation is deterministic in seed and independent of partitioning") {
    val s = schemas.head._2
    def fingerprint(parts: Int) =
      Generate.dfFromSchema(spark, s, 5000, seed = 11, partitions = parts)
        .agg(F.sum(F.pmod(F.xxhash64(F.col("a"), F.col("b")),
          F.lit(1000003L)))).collect()(0).getLong(0)
    assert(fingerprint(2) === fingerprint(16))
    val other = Generate.dfFromSchema(spark, s, 5000, seed = 12)
      .agg(F.sum(F.pmod(F.xxhash64(F.col("a"), F.col("b")),
        F.lit(1000003L)))).collect()(0).getLong(0)
    assert(other !== fingerprint(2)) // different seed → different data
  }

  test("generator-ast: the generator as data (generator_ast_test.clj:6-43)") {
    import mallispark.gen.GeneratorAst.generatorAst
    import mallispark.ir.SchemaIR.{SProps, NodeProps}
    // the reference's ::formula fixture: recursive boolean-formula trees
    val formula = S.scoped(
      "formula" -> S.or(
        S.boolean,
        S.tuple(S.enum_(":not"), S.boolean),
        S.tuple(S.enum_(":and"), S.star(S.ref("formula"))),
        S.tuple(S.enum_(":or"), S.star(S.ref("formula")))))(S.ref("formula"))
    val rec = "{:op :recur, :target :recur0}"
    assert(generatorAst(formula) ===
      "{:op :recursive-gen, :target :recur0, :max-depth 3, " +
      ":rec-gen {:op :one-of, :generators [" +
      "{:op :boolean} " +
      "{:op :tuple, :generators [{:op :return, :value :not} {:op :boolean}]} " +
      "{:op :tuple, :generators [{:op :return, :value :and} " +
      s"{:op :vector, :generator $rec, :max-elements 8}]} " +
      "{:op :tuple, :generators [{:op :return, :value :or} " +
      s"{:op :vector, :generator $rec, :max-elements 8}]}]}, " +
      ":scalar-gen {:op :one-of, :generators [" +
      "{:op :boolean} " +
      "{:op :tuple, :generators [{:op :return, :value :not} {:op :boolean}]}]}}")
    // :gen/* property precedence shows up as data
    assert(generatorAst(SProps(NodeProps(genReturn = Some(42L)), S.int)) ===
      "{:op :return, :value 42}")
    assert(generatorAst(SProps(NodeProps(
      genElements = Some(Seq(":a", ":b"))), S.string)) ===
      "{:op :elements, :values [:a :b]}")
    assert(generatorAst(SProps(NodeProps(genFmap = Some("str"),
      genElements = Some(Seq(1L, 2L))), S.int)) ===
      "{:op :fmap, :f \"str\", :generator {:op :elements, :values [1 2]}}")
    // :maybe is one-of [nil child]; bounds ride the ops
    assert(generatorAst(S.maybe(S.int(0L, 9L))) ===
      "{:op :one-of, :generators [{:op :return, :value nil} " +
      "{:op :large-integer, :min 0, :max 9}]}")
    // un-generatable schemas fail fast like Generate.gen
    intercept[IllegalArgumentException](
      generatorAst(S.fn("f")(_ => true)))
  }

  // :-> sugar + m/-function-info (core.cljc:2382-2391, 2211-2218;
  // core_test.cljc fn-schema-info fixtures)
  test(":-> arrow sugar agrees with :=> under function-info") {
    import mallispark.gen.FnSchemas
    import mallispark.gen.FnSchemas.{FnSchema, FnInfo}
    // [:-> :int :int :int] == [:=> [:cat :int :int] :int]
    val viaArrow = FnSchemas.arrow(Seq(S.int, S.int, S.int))
    val viaFn = FnSchema(Seq(S.int, S.int), S.int)
    assert(FnSchemas.functionInfo(viaArrow) ===
      FnSchemas.functionInfo(viaFn))
    assert(FnSchemas.functionInfo(viaArrow) === FnInfo(
      min = 2, max = Some(2), arity = "2",
      input = "[:cat :int :int]", output = ":int", guard = None))
    // varargs arity renders the rest as [:* rest] with open max
    assert(FnSchemas.functionInfo(
      FnSchema(Seq(S.int), S.int, rest = Some(S.string))) === FnInfo(
      min = 1, max = None, arity = ":varargs",
      input = "[:cat :int [:* :string]]", output = ":int", guard = None))
    // {:guard f} prop appends [:fn guard] over the [args ret] pair
    // (core_test.cljc:2723: guard (fn [[[arg] ret]] ...))
    val guarded = FnSchemas.arrow(Seq(S.int, S.int),
      guard = Some { case Seq(args: Seq[_], ret) => args.head != ret })
    val f = FnSchemas.wrap(guarded, "f")(_.head)
    val e = intercept[FnSchemas.InstrumentException](f(Seq(7L)))
    assert(e.kind === FnSchemas.Kind.InvalidGuard)
    val g = FnSchemas.wrap(guarded, "g")(
      args => args.head.asInstanceOf[Long] + 1L)
    assert(g(Seq(7L)) === 8L)
  }

  test("function schemas: wrap validates args+return; check finds violations") {
    import mallispark.gen.FnSchemas
    import mallispark.gen.FnSchemas.FnSchema
    val sch = FnSchema(Seq(S.int(0, 100), S.int(0, 100)), S.int(0, 200))
    // a conforming function passes wrap and check
    val add = FnSchemas.wrap(sch, "add") { args =>
      args(0).asInstanceOf[Long] + args(1).asInstanceOf[Long]
    }
    assert(add(Seq(2L, 3L)) === 5L)
    assert(FnSchemas.check(spark, sch, args =>
      args(0).asInstanceOf[Long] + args(1).asInstanceOf[Long]).isEmpty)
    // bad argument / bad return / arity all throw TYPED reports — the
    // `(:type (ex-data e))` dispatch of always_test.cljc:44-55
    val e1 = intercept[FnSchemas.InstrumentException](add(Seq(-1L, 3L)))
    assert(e1.kind === FnSchemas.Kind.InvalidInput)
    assert(e1.getMessage.contains("invalid argument 0"))
    val e2 = intercept[FnSchemas.InstrumentException](add(Seq(2L)))
    assert(e2.kind === FnSchemas.Kind.InvalidArity)
    assert(e2.getMessage.contains("expected 2 arguments"))
    val bad = FnSchemas.wrap(sch, "bad")(_ => 999L)
    val e3 = intercept[FnSchemas.InstrumentException](bad(Seq(1L, 2L)))
    assert(e3.kind === FnSchemas.Kind.InvalidOutput)
    assert(e3.getMessage.contains("invalid return value"))
    // :scope limits which sides are validated (instrument {:scope ...});
    // a non-throwing report collects instead of failing the call
    val inputOnly = FnSchemas.wrap(sch, "bad", scope = Set("input"))(_ => 999L)
    assert(inputOnly(Seq(1L, 2L)) === 999L)
    val seen = scala.collection.mutable.Buffer.empty[String]
    val collecting = FnSchemas.wrap(sch, "add", report = e => seen += e.kind) {
      args => args(0).asInstanceOf[Long] + args(1).asInstanceOf[Long]
    }
    assert(collecting(Seq(-1L, 3L)) === 2L)
    assert(seen.toSeq === Seq(FnSchemas.Kind.InvalidInput))
    // generative check catches a function that violates only sometimes:
    // a0 * a1 exceeds 200 for many generated pairs
    val cex = FnSchemas.check(spark, sch, args =>
      args(0).asInstanceOf[Long] * args(1).asInstanceOf[Long])
    assert(cex.isDefined)
    // and one that throws on a rare input
    val cex2 = FnSchemas.check(spark, sch, args =>
      if (args(0).asInstanceOf[Long] % 17 == 3)
        throw new IllegalStateException("boom")
      else 1L)
    assert(cex2.exists(_._2.isInstanceOf[IllegalStateException]))
    // reference describe wording (describe_test.cljc:16-19)
    assert(FnSchemas.describe(FnSchema(Seq(S.int), S.int)) ===
      "function that takes input: [integer] and returns integer")
  }

  test("varargs :=> — [:cat fixed [:* rest]] input (always_test varargs)") {
    import mallispark.gen.FnSchemas
    import mallispark.gen.FnSchemas.FnSchema
    // (mx/defn addition-varargs [& xs :- [:cat [:int {:min 0}] [:* :int]]])
    val sch = FnSchema(Seq(S.intMin(0L)), S.intMin(0L), rest = Some(S.int))
    def sum(args: Seq[Any]): Any = args.map(_.asInstanceOf[Long]).sum
    val f = FnSchemas.wrap(sch, "add")(sum)
    assert(f(Seq(1L, 2L)) === 3L)
    assert(f(Seq(5L)) === 5L)                     // min arity alone
    assert(f(Seq(1L, 2L, 3L, 4L)) === 10L)        // deep tail
    // invalid-arity (below min), invalid-input (fixed and tail),
    // invalid-output — the reference's three report kinds
    assert(intercept[FnSchemas.InstrumentException](f(Seq.empty))
      .kind === FnSchemas.Kind.InvalidArity)
    assert(intercept[FnSchemas.InstrumentException](f(Seq(-2L, 1L)))
      .kind === FnSchemas.Kind.InvalidInput)
    val eTail = intercept[FnSchemas.InstrumentException](f(Seq(1L, "x")))
    assert(eTail.getMessage.contains("invalid argument 1"))
    assert(intercept[FnSchemas.InstrumentException](f(Seq(2L, -3L)))
      .kind === FnSchemas.Kind.InvalidOutput)
    // generative check exercises tail arities 0-3 and finds the
    // negative-sum law violation; shrink drops tail args first
    val cex = FnSchemas.check(spark, sch, sum, shrink = true)
    assert(cex.isDefined)
    val (args, _) = cex.get
    assert(args.map(_.asInstanceOf[Long]).sum < 0L)
    assert(args.length <= 2, s"shrink should drop tail args: $args")
    // describe renders the star tail
    assert(FnSchemas.describe(sch).contains("zero or more integer"))
  }

  test(":function multi-arity dispatch (always_test addition-multiarity)") {
    import mallispark.gen.FnSchemas
    import mallispark.gen.FnSchemas.{FnSchema, FunctionSchema}
    // ([x :- [:int {:min 0}], y :- :int] (+ x y))
    // ([x :- [:int {:min 2}]] x)
    val sch = FunctionSchema(Seq(
      FnSchema(Seq(S.intMin(0L), S.int), S.intMin(0L)),
      FnSchema(Seq(S.intMin(2L)), S.intMin(0L))))
    val f = FnSchemas.wrapMulti(sch, "addm") {
      args => args.map(_.asInstanceOf[Long]).sum
    }
    assert(f(Seq(1L, 2L)) === 3L)
    assert(f(Seq(3L)) === 3L) // other arity
    assert(intercept[FnSchemas.InstrumentException](f(Seq(-2L, 1L)))
      .kind === FnSchemas.Kind.InvalidInput)
    assert(intercept[FnSchemas.InstrumentException](f(Seq(2L, -3L)))
      .kind === FnSchemas.Kind.InvalidOutput)
    assert(intercept[FnSchemas.InstrumentException](f(Seq(1L)))
      .kind === FnSchemas.Kind.InvalidInput) // 1-arity needs ≥ 2
    assert(intercept[FnSchemas.InstrumentException](f(Seq(1L, 2L, 3L)))
      .kind === FnSchemas.Kind.InvalidArity)
    // exact arity beats a varargs arity that also covers the count
    val mixed = FunctionSchema(Seq(
      FnSchema(Seq(S.int), S.enum_("fixed")),
      FnSchema(Seq.empty, S.enum_("var"), rest = Some(S.int))))
    val g = FnSchemas.wrapMulti(mixed, "mix") {
      args => if (args.length == 1) "fixed" else "var"
    }
    assert(g(Seq(7L)) === "fixed")
    assert(g(Seq(7L, 8L)) === "var")
    assert(g(Seq.empty) === "var")
    // distinct-arity construction rules (core.cljc -group-by-arity!)
    intercept[IllegalArgumentException](FunctionSchema(Seq(
      FnSchema(Seq(S.int), S.int), FnSchema(Seq(S.string), S.int))))
    intercept[IllegalArgumentException](FunctionSchema(Seq(
      FnSchema(Seq.empty, S.int, rest = Some(S.int)),
      FnSchema(Seq(S.int), S.int, rest = Some(S.int)))))
    // checkMulti: the 1-arity law (identity ≥ 0 given min 2) holds,
    // the 2-arity law fails on a negative y
    val cex = FnSchemas.checkMulti(spark, sch,
      args => args.map(_.asInstanceOf[Long]).sum)
    assert(cex.isDefined)
    assert(cex.get._1.input.length === 2)
  }

  test("function guard validates the [args ret] pair (::m/invalid-guard)") {
    import mallispark.gen.FnSchemas
    import mallispark.gen.FnSchemas.FnSchema
    // guard: the return value must be >= the first argument
    // (the reference's :=> third child, core.cljc:2158-2196)
    val guard = S.fn("ret-ge-first-arg") { v =>
      val pair = v.asInstanceOf[Seq[Any]]
      val args = pair(0).asInstanceOf[Seq[Any]]
      pair(1).asInstanceOf[Long] >= args(0).asInstanceOf[Long]
    }
    val sch = FnSchema(Seq(S.int(0, 100), S.int(0, 100)), S.int(0, 200),
      Some(guard))
    val add = FnSchemas.wrap(sch, "add") { args =>
      args(0).asInstanceOf[Long] + args(1).asInstanceOf[Long]
    }
    assert(add(Seq(2L, 3L)) === 5L) // output AND guard pass
    // a function whose OUTPUT is in-schema but violates the guard
    val zero = FnSchemas.wrap(sch, "zero")(_ => 0L)
    assert(zero(Seq(0L, 7L)) === 0L) // guard holds at a0 = 0
    val e = intercept[FnSchemas.InstrumentException](zero(Seq(5L, 1L)))
    assert(e.kind === FnSchemas.Kind.InvalidGuard)
    assert(e.getMessage.contains("guard violated"))
    // generative check catches guard-only violations too
    assert(FnSchemas.check(spark, sch, _ => 0L).isDefined)
    assert(FnSchemas.check(spark, sch, args =>
      100L + args(0).asInstanceOf[Long]).isEmpty)
    // the pretty ::m/invalid-guard report renders the [args ret] pair
    val report = mallispark.dev.Pretty.invalidGuard(
      guard, Seq(5L, 1L), 0L, Some("graft/zero"))
    assert(report.contains("-- Function Guard Error "))
    assert(report.contains("Guard arguments\n\n  [[5 1] 0]"))
    assert(report.contains("Guard Schema\n\n  [:fn ret-ge-first-arg]"))
  }

  test("check shrinks counterexamples to local minima (test.check law)") {
    import mallispark.gen.FnSchemas
    import mallispark.gen.FnSchemas.FnSchema
    // law = f returns true ([:enum true] output); f fails iff a0 > 100:
    // shrinking must land on exactly 101
    val sch = FnSchema(Seq(S.int(0, 10000)), S.enum_(true))
    val f: Seq[Any] => Any = args => args(0).asInstanceOf[Long] <= 100L
    val cex = FnSchemas.check(spark, sch, f, n = 200, shrink = true)
    assert(cex.isDefined)
    assert(cex.get._1 === Seq(101L))
    // string law: fails iff length > 5 — shrinks to length 6, and never
    // below the schema's min length
    val schS = FnSchema(Seq(S.string(2, 40)), S.enum_(true))
    val fS: Seq[Any] => Any = args =>
      args(0).asInstanceOf[String].length <= 5
    val cexS = FnSchemas.check(spark, schS, fS, n = 200, shrink = true)
    assert(cexS.isDefined)
    assert(cexS.get._1.head.asInstanceOf[String].length === 6)
    // shrunk args still satisfy the INPUT schema
    assert(mallispark.eval.RowEval.validate(schS.input.head,
      cexS.get._1.head))
    // non-BMP shrinking: candidates are CODE-POINT prefixes — never a
    // split surrogate pair, and the code-point min is respected exactly
    val supp = new String(Character.toChars(0x1F600)) // 😀, 2 code units
    val start = supp * 8 // 8 code points, 16 code units
    val schU = FnSchema(Seq(S.string(2, 40)), S.enum_(true))
    val fU: Seq[Any] => Any = args => {
      val s0 = args(0).asInstanceOf[String]
      // a split surrogate pair would not survive a UTF-8 round-trip
      require(new String(s0.getBytes("UTF-8"), "UTF-8") == s0,
        "malformed candidate")
      s0.codePointCount(0, s0.length) <= 2 // fails above 2 code points
    }
    val shrunk = FnSchemas.shrinkArgs(schU, fU, Seq(start))
      .head.asInstanceOf[String]
    assert(shrunk.codePointCount(0, shrunk.length) === 3) // local minimum
    assert(shrunk === supp * 3) // well-formed pairs, no lone surrogates
  }

  test("optional fields actually vary (nulls present but not universal)") {
    val s = schemas.head._2
    val df = Generate.dfFromSchema(spark, s, 2000, seed = 3)
    val nulls = df.where(F.col("c").isNull).count()
    assert(nulls > 0 && nulls < 2000)
  }

  // ---- :gen/... property overrides (generator.cljc:455-476 -create;
  //      fixtures: generator_test.cljc:237-253, 140-144, 212) -------------

  /** Distinct values gen() emits for a standalone schema over n rows. */
  private def draws(ir: mallispark.ir.SchemaIR, n: Int = 400): Set[Any] = {
    val col = Generate.gen(ir, F.col("id"), 1)
    spark.range(n).select(col.as("v")).collect().map(_.get(0)).toSet
  }

  // nested-registry SHADOWING (generator_test.cljc:725-766): an outer
  // name must not shadow the inner registry's binding for the same name
  test("recursive-ref shadowing: inner registries win") {
    import mallispark.ir.Export
    val g1 = Export.fromForm(
      "[:schema {:registry {:a [:schema {:registry {:a [:= 42]}} " +
        "[:ref :a]]}} [:ref :a]]")
    assert(draws(g1) === Set(42L))
    // a chain through a sibling name re-scoped inside
    val g2 = Export.fromForm(
      "[:schema {:registry {:a [:ref :b] " +
        ":b [:schema {:registry {:b [:= 42]}} [:ref :b]]}} [:ref :a]]")
    assert(draws(g2) === Set(42L))
    // outer-shadowing of [:maybe [:ref :a]] would collapse to all-nil
    val g3 = Export.fromForm(
      "[:schema {:registry {:a [:schema {:registry {:a :int}} " +
        "[:maybe [:ref :a]]]}} [:ref :a]]")
    assert(draws(g3).exists(_ != null))
    val g4 = Export.fromForm(
      "[:schema {:registry {:outer [:schema {:registry {:outer :int " +
        ":inner [:ref :outer]}} [:ref :inner]]}} [:ref :outer]]")
    assert(draws(g4, 50).forall(_.isInstanceOf[Long]))
  }

  test(":gen/return wins over everything but fmap (generator_test:237-240)") {
    // (mg/sample [:and {:gen/return 1} int?]) => all 1
    assert(draws(SProps(NodeProps(genReturn = Some(1L)), S.int)) === Set(1L))
    // {:gen/return nil} => all nil
    assert(draws(SProps(NodeProps(genReturn = Some(null)), S.int))
      === Set(null))
    // {:gen/return 1, :gen/fmap 'str} => all "1"
    assert(draws(SProps(NodeProps(genReturn = Some(1L),
      genFmap = Some("str")), S.int)) === Set("1"))
  }

  test(":gen/elements draws from the set; fmap maps it (gen_test:242-244)") {
    assert(draws(SProps(NodeProps(genElements = Some(Seq(1L, 2L))), S.int))
      === Set(1L, 2L))
    assert(draws(SProps(NodeProps(genElements = Some(Seq(1L, 2L)),
      genFmap = Some("str")), S.int)) === Set("1", "2"))
  }

  test(":gen/schema delegates; nested fmaps compose (gen_test:246-249)") {
    // [:int {:gen/schema [:int {:gen/elements [1 2]}]}] => #{1 2}
    val inner = SProps(NodeProps(genElements = Some(Seq(1L, 2L))), S.int)
    assert(draws(SProps(NodeProps(genSchema = Some(inner)), S.int))
      === Set(1L, 2L))
    // inner fmap str, outer fmap (partial str "+") => #{"+1" "+2"}
    val innerF = SProps(NodeProps(genElements = Some(Seq(1L, 2L)),
      genFmap = Some("str")), S.int)
    assert(draws(SProps(NodeProps(genSchema = Some(innerF),
      genFmap = Some("(partial str \"+\")")), S.int)) === Set("+1", "+2"))
  }

  test(":gen/fmap over the child generator (gen_test:212 kikka_)") {
    val vals = draws(SProps(NodeProps(
      genFmap = Some("(partial str \"kikka_\")")), S.string(1, 4)))
    assert(vals.nonEmpty)
    assert(vals.forall(_.asInstanceOf[String].startsWith("kikka_")))
    // full (fn [x] ...) sources compile too
    val v2 = draws(SProps(NodeProps(
      genFmap = Some("(fn [x] (str x \"!\"))")), S.enum_("a", "b")))
    assert(v2 === Set("a!", "b!"))
  }

  test(":gen/min and :gen/max narrow bounds; invalid gen bounds throw") {
    val vals = draws(SProps(NodeProps(genMin = Some(10.0),
      genMax = Some(20.0)), S.int(0, 100))).map(_.asInstanceOf[Long])
    assert(vals.forall(v => v >= 10L && v <= 20L))
    assert(vals.size > 5) // actually draws a range, not one value
    // gen/min BELOW :min is ::invalid-property (generator.cljc:79-83)
    intercept[IllegalArgumentException] {
      Generate.gen(SProps(NodeProps(genMin = Some(-5.0)), S.int(0, 100)),
        F.col("id"), 1)
    }
    // string/vector length narrowing rides the same -min-max
    val lens = draws(SProps(NodeProps(genMin = Some(3.0)),
      S.string(1, 8))).map(_.asInstanceOf[String].length)
    assert(lens.forall(_ >= 3))
  }

  test(":gen/infinite? and :gen/NaN? surface double specials (gen_test:70-73)") {
    val vals = draws(SProps(NodeProps(genInfinite = true, genNaN = true),
      S.double(0.0, 1.0)), n = 2000).map(_.asInstanceOf[Double])
    assert(vals.exists(_.isPosInfinity))
    assert(vals.exists(_.isNegInfinity))
    assert(vals.exists(_.isNaN))
    assert(vals.exists(v => !v.isInfinity && !v.isNaN)) // plus normal draws
    // without the flags the same schema NEVER emits specials
    val plain = draws(S.double(0.0, 1.0), n = 2000)
      .map(_.asInstanceOf[Double])
    assert(!plain.exists(v => v.isInfinity || v.isNaN))
  }

  test("SProps is transparent to validation (props never affect validity)") {
    val wrapped = S.mapE(false,
      S.req("a", SProps(NodeProps(genElements = Some(Seq(1L, 2L))),
        S.int(0, 100)))).asInstanceOf[SMap]
    val df = Generate.dfFromSchema(spark, wrapped, 500, seed = 7)
    assert(SchemaCompiler.validateDF(wrapped, df, "ok")
      .where(!F.col("ok")).count() === 0L)
    // a :gen/return OUTSIDE the child's domain generates values the
    // validator correctly REJECTS (malli parity: gen props can lie)
    val lying = S.mapE(false,
      S.req("a", SProps(NodeProps(genReturn = Some(999L)),
        S.int(0, 100)))).asInstanceOf[SMap]
    val df2 = Generate.dfFromSchema(spark, lying, 50, seed = 7)
    assert(SchemaCompiler.validateDF(lying, df2, "ok")
      .where(F.col("ok")).count() === 0L)
  }

  test(":re generation — validate∘generate over the anchored subset") {
    // reverse AnchoredScan (ReGen): full matches of the anchored pattern,
    // pinned against java.util.regex FIND (malli's re-find semantics)
    val patterns = Seq(
      "^https?://[^\\s]+$", // the flagship url shape (GroupOpt-free)
      "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
      "^[a-z]{2,5}:[0-9]+$",
      "^:[^\\s/:]+(/[^\\s/:]+)?$", // keyword shape incl. optional group
      "^ab\\.c[d-f]*$",
      "[a-z]{3}") // unanchored: generation anchors, re-find still matches
    patterns.foreach { p =>
      val col = Generate.gen(S.re(p), F.col("id"), 1)
      val vals = spark.range(300).select(col.as("v")).collect()
        .map(_.getString(0))
      val rx = java.util.regex.Pattern.compile(p)
      vals.foreach(v => assert(rx.matcher(v).find(), s"'$v' !~ $p"))
      // RowEval twin agrees (the duality interpreter)
      vals.take(20).foreach(v =>
        assert(mallispark.eval.RowEval.validate(S.re(p), v)))
    }
    // variable patterns actually vary
    val vs = spark.range(300).select(
      Generate.gen(S.re("^[a-z]{2,8}$"), F.col("id"), 1).as("v"))
      .collect().map(_.getString(0)).toSet
    assert(vs.size > 50)
    // outside the anchored subset → fail-fast contract unchanged
    intercept[IllegalArgumentException](
      Generate.gen(S.re("^(a|b)+$"), F.col("id"), 1))
    intercept[IllegalArgumentException](
      Generate.gen(S.re("^a.*b$"), F.col("id"), 1))
  }

  test("recursive :ref generation (unrollRefs with recursion decay)") {
    import mallispark.ir.SchemaIR.{SNil, SRef, SVector}
    val node = S.scoped("node" -> S.mapE(false,
      S.req("v", S.intMin(0L)),
      S.opt("kids", S.vector(S.ref("node")))))(S.ref("node"))
    val col = Generate.gen(node, F.col("id"), 1)
    val df = spark.range(500).select(col.as("n"))
    // every generated tree validates against the RECURSIVE schema
    val okCol = SchemaCompiler.valid(node, F.col("n"),
      df.schema("n").dataType)
    assert(df.where(!okCol).count() === 0L)
    // recursion actually happens: some rows carry grandchildren
    val gkid = F.get(F.get(F.col("n.kids"), F.lit(0)).getField("kids"),
      F.lit(0)).getField("v")
    assert(df.where(gkid.isNotNull).count() > 0L)
    // :maybe-shaped recursion terminates to nil at the bottom
    val lst = S.scoped("l" -> S.mapE(false,
      S.req("h", S.int(0, 9)),
      S.req("t", S.maybe(S.ref("l")))))(S.ref("l"))
    val df2 = spark.range(300).select(Generate.gen(lst, F.col("id"), 1).as("n"))
    assert(df2.where(!SchemaCompiler.valid(lst, F.col("n"),
      df2.schema("n").dataType)).count() === 0L)
    // a REQUIRED unguarded recursion admits no finite value → fail fast
    val bad = S.scoped("x" -> S.mapE(false,
      S.req("next", S.ref("x"))))(S.ref("x"))
    intercept[IllegalArgumentException](
      Generate.gen(bad, F.col("id"), 1))
    // the unrolled schema is ref-free and bottom-pruned
    val un = Generate.unrollRefs(node)
    def refs(s: mallispark.ir.SchemaIR): Boolean = s match {
      case _: SRef => true
      case other => mallispark.ir.SchemaIR.childrenWithPath(other)
        .exists { case (_, c) => refs(c) }
    }
    assert(!refs(un))
  }

  test("portable Rng draws of :gen/elements replay exactly (oracle arith)") {
    // the gen_roundtrip gate depends on element_at draws being pure
    // h32-arithmetic: recompute one here driver-side
    import mallispark.text.TextOps
    implicit val rng: Generate.Rng = Generate.PortableRng
    val ir = SProps(NodeProps(genElements = Some(Seq("x", "y", "z"))),
      S.string)
    val col = Generate.gen(ir, F.col("id"), 5)
    val got = spark.range(10).select(F.col("id"), col.as("v")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val twin = spark.range(10).select(F.col("id"),
      F.element_at(F.array(F.lit("x"), F.lit("y"), F.lit("z")),
        (F.pmod(TextOps.h32(F.concat(F.col("id").cast(
          org.apache.spark.sql.types.StringType), F.lit(":5"))), F.lit(3L))
          + 1).cast(org.apache.spark.sql.types.IntegerType)).as("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === twin)
  }
}
