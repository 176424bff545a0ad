package mallispark

import org.scalatest.funsuite.AnyFunSuite
import mallispark.ir.{Export, S, SchemaIR}
import mallispark.ir.SchemaIR._
import mallispark.run.WebPages

/** m/ast round-trip + JSON-Schema export (SURVEY §2.2). Pure-JVM. */
class ExportSpec extends AnyFunSuite {

  private val samples: Seq[(String, mallispark.ir.SchemaIR)] = Seq(
    "flagship" -> WebPages.schema,
    "composite" -> S.and(S.int, S.or(S.posInt, S.negInt)),
    "orn" -> S.orn("pos" -> S.posInt, "neg" -> S.negInt),
    "nested" -> S.mapE(true,
      S.req("xs", S.vector(S.maybe(S.enum_("a", "b")), max = Some(3))),
      S.opt("t", S.tuple(S.string, S.int)),
      S.req("kv", S.mapOf(S.string, S.double, min = Some(1)))),
    "regex-ops" -> S.star(S.catn("p" -> S.re("^-"),
      "v" -> S.alt(S.string, S.boolean))),
    "multi" -> S.multi("kind", default = Some(S.any))(
      "a" -> S.mapE(false, S.req("kind", S.string))),
    "every-repeat" -> S.cat(S.every(S.int, limit = 7),
      S.repeat(S.string, 1, 3), S.ref("other")),
    "seqable" -> S.mapE(false,
      S.req("xs", S.seqable(S.int)),
      S.opt("bounded", S.seqable(S.string, min = Some(1), max = Some(5)))),
    "idents" -> S.mapE(false,
      S.req("kw", S.keyword), S.req("qkw", S.qualifiedKeyword),
      S.req("sym", S.symbol), S.req("qsym", S.qualifiedSymbol),
      S.req("ch", S.char)),
    "scoped-recursive" -> S.scoped("node" -> S.mapE(false,
      S.req("v", S.intMin(0L)),
      S.opt("kids", S.vector(S.ref("node")))))(S.ref("node")),
    "and-transforming" -> S.mapE(false,
      S.req("none", SProps(NodeProps(parseTransformingChild = Some(":none")),
        S.and(S.int, S.orn("l" -> S.int)))),
      S.req("picked", SProps(NodeProps(parseTransformingChild = Some(0L)),
        S.and(S.orn("l" -> S.int), S.orn("r" -> S.int))))),
    "node-props" -> S.mapE(false,
      S.req("a", SProps(NodeProps(genReturn = Some(1L)), S.int)),
      S.req("b", SProps(NodeProps(genElements = Some(Seq("x", "y")),
        genFmap = Some("(partial str \"p_\")")), S.string)),
      S.req("c", SProps(NodeProps(genMin = Some(2.0), genMax = Some(5.0),
        title = Some("c title"), description = Some("desc"),
        default = Some(3L), jsonSchema = Seq("example" -> 42L)),
        S.int(0, 10))),
      S.req("d", SProps(NodeProps(
        genSchema = Some(SProps(NodeProps(
          genElements = Some(Seq(1L, 2L))), S.int)),
        genNaN = true, errorPath = Some(Seq("a"))),
        S.double(0.0, 1.0)))),
    // arbitrary entry-level and node-level props (util_test.cljc:1081)
    // must round-trip in POSITION: [:me {:a 1} :int] stays entry-level,
    // [:int {:a 1}] stays on the child
    "entry-props" -> Export.fromForm(
      "[:map [:me {:optional true :a 1} :int] [:you {:b [:x 2]} :string]]"),
    "orn-entry-props" -> Export.fromForm(
      "[:orn [:me {:a 1} :int] [:alt {:c \"s\"} :string]]"),
    "extra-node-props" -> Export.fromForm(
      "[:map [:k [:int {:min 1 :a {:b 1}}]]]"))

  test("ast JSON round-trips structurally (m/ast / m/from-ast)") {
    samples.foreach { case (name, s) =>
      val json = Export.toJson(s)
      val back = Export.fromJson(json)
      assert(SchemaIR.form(back) === SchemaIR.form(s), s"round-trip $name")
      // second round-trip is a fixpoint
      assert(Export.toJson(back) === json, s"fixpoint $name")
    }
  }

  test("vector-syntax form round-trips via fromForm (malli.edn dual)") {
    samples.foreach { case (name, s) =>
      val f = SchemaIR.form(s)
      val back = Export.fromForm(f)
      assert(SchemaIR.form(back) === f, s"form round-trip $name")
    }
    // literals keep their types through the text form
    val e = Export.fromForm("[:enum 1 2 3]")
    assert(e === SEnum(Seq(1L, 2L, 3L)))
    assert(Export.fromForm("[:enum \"a b\" \"c]d\"]") ===
      SEnum(Seq("a b", "c]d")))
    assert(Export.fromForm("[:re \"^https?://[^\\\\s]+$\"]") ===
      SRegex("^https?://[^\\s]+$"))
    assert(Export.fromForm("[:int {:min 3}]") === SInt(Some(3L), None))
    assert(Export.fromForm("[:time/duration {:min \"PT10S\"}]") ===
      SchemaIR.STime("duration", Some("PT10S"), None))
  }

  test("error-value masking (error.cljc:232-244, 397-408)") {
    import mallispark.msg.Messages
    val row = Map("a" -> 1L, "b" -> "bad", "c" -> true)
    // default: only failing parts survive
    assert(Messages.errorValue(row, Set(Seq("b"))) === Map("b" -> "bad"))
    // mask-valid-values: valid leaves become the mask
    assert(Messages.errorValue(row, Set(Seq("b")), Some("...")) ===
      Map("a" -> "...", "b" -> "bad", "c" -> "..."))
    // nested in paths
    val nested = Map("m" -> Map("x" -> 1L, "y" -> 2L))
    assert(Messages.errorValue(nested, Set(Seq("m", "y"))) ===
      Map("m" -> Map("y" -> 2L)))
  }

  test("declarative :merge/:union/:select-keys round-trip and expand") {
    // util.cljc:394-418 proxy schemas: serializable AND compilable
    val base = S.mapE(false, S.req("a", S.int), S.req("b", S.string))
    val extra = S.mapE(false, S.req("b", S.string(min = 2)),
      S.req("c", S.boolean))
    val merged = SMergeOf(Seq(base, extra))
    val back = Export.fromJson(Export.toJson(merged))
    assert(SchemaIR.form(back) === SchemaIR.form(merged))
    // expansion: right-biased entries
    val expanded = mallispark.ir.SchemaOps.expand(back).asInstanceOf[SMap]
    assert(expanded.entries.map(_.key) === Seq("a", "b", "c"))
    assert(expanded.entries.find(_.key == "b").get.child === SString(Some(2)))
    // select-keys + union also round-trip
    val sel = SSelectKeysOf(merged, Seq("a", "c"))
    val selBack = Export.fromJson(Export.toJson(sel))
    assert(mallispark.ir.SchemaOps.expand(selBack).asInstanceOf[SMap]
      .entries.map(_.key) === Seq("a", "c"))
    val uni = SUnionOf(Seq(base, extra))
    assert(SchemaIR.form(Export.fromJson(Export.toJson(uni))) ===
      SchemaIR.form(uni))
    // refs inside :merge deref through the registry at expand time
    val reg = Registry(Map("base" -> base))
    val withRef = SMergeOf(Seq(SRef("base"), extra))
    val exp2 = mallispark.ir.SchemaOps.expand(withRef, reg).asInstanceOf[SMap]
    assert(exp2.entries.map(_.key) === Seq("a", "b", "c"))
  }

  test("mutable and lazy registries resolve refs at compile time") {
    val mut = new SchemaIR.MutableRegistry()
    mut.register("page", S.mapE(false, S.req("x", S.int)))
    assert(SchemaIR.form(mut.snapshot("page")) === "[:map [:x :int]]")
    var calls = 0
    val lz = new SchemaIR.LazyRegistry(n => { calls += 1
      if (n == "lazy1") Some(S.int) else None })
    val reg = lz.force("lazy1")
    lz.force("lazy1") // memoized — provider not called again
    assert(calls === 1)
    assert(reg("lazy1") === SInt())
    intercept[IllegalArgumentException](lz.resolve("missing"))
  }

  test("typed defaults survive the ast round-trip") {
    val s = SMap(Seq(
      Entry("a", SInt(), optional = true, default = Some(7L)),
      Entry("b", SDouble(), optional = true, default = Some(0.5)),
      Entry("c", SBoolean, optional = true, default = Some(true)),
      Entry("d", SString(), optional = true, default = Some("x"))))
    val back = Export.fromJson(Export.toJson(s)).asInstanceOf[SMap]
    assert(back.entries.map(_.default) ===
      Seq(Some(7L), Some(0.5), Some(true), Some("x")))
  }

  test("json-schema export: object shape for the flagship schema") {
    val js = Export.toJsonSchema(WebPages.schema)
    assert(js.contains("\"type\": \"object\""))
    assert(js.contains("\"required\": [\"url\", \"warc_ts\", \"html\", \"text\", \"lang\"]"))
    assert(js.contains("\"additionalProperties\": false")) // closed map
    assert(js.contains("\"pattern\": \"^https?://[^\\\\s]+$\"") ||
      js.contains("pattern"))
    assert(js.contains("\"enum\": [\"en\", \"de\", \"fr\", \"es\", \"zh\"]"))
  }

  test("deserialized :custom fails fast instead of validating everything") {
    val json = Export.toJson(mallispark.ir.S.custom("even64",
      (c, _) => org.apache.spark.sql.functions.pmod(c, org.apache.spark.sql.functions.lit(2)) === 0,
      _ => true))
    val back = Export.fromJson(json)
    val e = intercept[IllegalArgumentException] {
      back match {
        case c: mallispark.ir.SchemaIR.SCustom =>
          c.colPred(org.apache.spark.sql.functions.lit(2), org.apache.spark.sql.types.LongType)
        case other => fail(s"expected SCustom, got $other")
      }
    }
    assert(e.getMessage.contains("even64"))
  }

  test("lite DSL builds the same schemas as the full syntax (lite_test.cljc)") {
    import mallispark.ir.Lite
    val l = Lite.obj(
      "int" -> ":int",
      "opt" -> Lite.optional(Lite.obj("a" -> ":int")),
      "maybe" -> Lite.maybe(Lite.obj("a" -> ":int")),
      "set" -> Lite.set(Lite.obj("a" -> ":int")),
      "vector" -> Lite.vector(Lite.obj("a" -> ":int")),
      "nested" -> Lite.obj(
        "int" -> ":int",
        "map_of" -> Lite.mapOf(":int", Lite.obj("a" -> ":int")),
        "tuple" -> Lite.tuple(":int", Lite.obj("a" -> ":int")),
        "and" -> Lite.and(Lite.obj("a" -> ":int"), ":any"),
        "or" -> Lite.or(Lite.obj("a" -> ":int"), Lite.obj("b" -> ":int"))))
    val full = S.mapE(false,
      S.req("int", S.int),
      S.opt("opt", S.mapE(false, S.req("a", S.int))),
      S.req("maybe", S.maybe(S.mapE(false, S.req("a", S.int)))),
      S.req("set", S.set(S.mapE(false, S.req("a", S.int)))),
      S.req("vector", S.vector(S.mapE(false, S.req("a", S.int)))),
      S.req("nested", S.mapE(false,
        S.req("int", S.int),
        S.req("map_of", S.mapOf(S.int, S.mapE(false, S.req("a", S.int)))),
        S.req("tuple", S.tuple(S.int, S.mapE(false, S.req("a", S.int)))),
        S.req("and", S.and(S.mapE(false, S.req("a", S.int)), S.any)),
        S.req("or", S.or(S.mapE(false, S.req("a", S.int)),
          S.mapE(false, S.req("b", S.int)))))))
    assert(SchemaIR.form(l) === SchemaIR.form(full))
    // form strings parse through the same reader as the EDN dual
    assert(SchemaIR.form(Lite.schema("[:string {:min 2}]")) ===
      "[:string {:min 2}]")
    intercept[IllegalArgumentException](Lite.schema(Lite.optional(":int")))
  }

  test("json-schema property passthrough (json_schema_test:183-204)") {
    // [:and {:title "age" :description "blabla" :default 42} int?]
    val s1 = SProps(NodeProps(title = Some("age"),
      description = Some("blabla"), default = Some(42L)), S.and(S.int))
    assert(Export.toJsonSchema(s1) ===
      """{"title": "age", "description": "blabla", "default": 42, "allOf": [{"type": "integer"}]}""")
    // :json-schema/... keys override the select keys (merge, later wins)
    val s2 = SProps(NodeProps(title = Some("age"),
      description = Some("blabla"), default = Some(42L),
      jsonSchema = Seq("default" -> 422L, "description" -> "blabla2",
        "example" -> 422L, "title" -> "age2")), S.and(S.int))
    assert(Export.toJsonSchema(s2) ===
      """{"title": "age2", "description": "blabla2", "default": 422, "allOf": [{"type": "integer"}], "example": 422}""")
    // whole :json-schema prop REPLACES the output (json_schema_test:151-154)
    val s3 = SProps(NodeProps(jsonSchemaFull = Some(Map(
      ":type" -> "string", ":format" -> "custom-file-format"))),
      S.mapE(false, S.req("file", S.any)))
    assert(Export.toJsonSchema(s3) ===
      """{"format": "custom-file-format", "type": "string"}""")
  }

  test("json-schema map-entry overrides (json_schema_test:167-181)") {
    val ir = Export.fromForm(
      "[:map " +
        "[:x1 {:json-schema/title \"x\"} :string] " +
        "[:x2 {:json-schema {:title \"x\"}} " +
          "[:string {:json-schema/default \"x\"}]] " +
        "[:x3 {:json-schema/title \"x\"} " +
          "[:string {:json-schema/default \"x\"}]] " +
        "[:x5 {:json-schema {:type \"number\"}} " +
          "[:string {:json-schema {:default 3}}]]]")
    val js = Export.toJsonSchema(ir)
    // entry-level props wrap OUTSIDE the child's own:
    assert(js.contains(""""x1": {"type": "string", "title": "x"}"""))
    // entry-level full :json-schema replaces the child output entirely
    assert(js.contains(""""x2": {"title": "x"}"""))
    assert(js.contains(
      """"x3": {"type": "string", "default": "x", "title": "x"}"""))
    // entry full replacement beats child full replacement
    assert(js.contains(""""x5": {"type": "number"}"""))
  }

  test("json-schema fixture parity (json_schema_test.cljc expectations)") {
    def js(s: mallispark.ir.SchemaIR) = Export.toJsonSchema(s)
    // enum type inference (fixtures :99-104): homogeneous sets carry the
    // inferred base type, mixed sets stay bare
    assert(js(SEnum(Seq(1L, 2L, 3L))) ===
      """{"type": "integer", "enum": [1, 2, 3]}""")
    assert(js(SEnum(Seq(1.1, 2.2, 3.3))) ===
      """{"type": "number", "enum": [1.1, 2.2, 3.3]}""")
    assert(js(SEnum(Seq("kikka", "kukka"))) ===
      """{"type": "string", "enum": ["kikka", "kukka"]}""")
    assert(js(SEnum(Seq(1L, 2L, "3"))) === """{"enum": [1, 2, "3"]}""")
    // tuple → prefixItems + items:false (fixture :106-108)
    assert(js(S.tuple(S.string, S.string)) ===
      """{"type": "array", "prefixItems": [{"type": "string"}, {"type": "string"}], "items": false}""")
    // bare idents are plain strings (fixtures :118-121); char too (:78)
    assert(js(S.keyword) === """{"type": "string"}""")
    assert(js(S.qualifiedSymbol) === """{"type": "string"}""")
    assert(js(S.char) === """{"type": "string"}""")
    // all-optional maps emit NO required key at all (fixture :156-165)
    assert(js(S.mapE(false, S.opt("s", S.string), S.opt("i", S.int))) ===
      """{"type": "object", "properties": {"s": {"type": "string"}, "i": {"type": "integer"}}}""")
    // open maps carry no additionalProperties; closed maps say false
    // (fixtures :39-47, :339-344)
    assert(js(S.mapE(false, S.req("a", S.string), S.opt("b", S.string))) ===
      """{"type": "object", "properties": {"a": {"type": "string"}, "b": {"type": "string"}}, "required": ["a"]}""")
    assert(js(S.mapE(true, S.req("name", S.string))) ===
      """{"type": "object", "properties": {"name": {"type": "string"}}, "required": ["name"], "additionalProperties": false}""")
    // ::m/default rest: map-of rest → additionalProperties (fixture
    // :48-54); NESTED default-map chains flatten properties/required up
    // and hoist the innermost rest (fixture :62-74)
    assert(js(SMap(Seq(Entry("x", SInt())),
      rest = Some(S.mapOf(S.int, S.int)))) ===
      """{"type": "object", "properties": {"x": {"type": "integer"}}, "required": ["x"], "additionalProperties": {"type": "integer"}}""")
    assert(js(SMap(Seq(Entry("x", SInt())), rest = Some(
      SMap(Seq(Entry("y", SInt())), rest = Some(
        SMap(Seq(Entry("z", SInt())),
          rest = Some(S.mapOf(S.int, S.int)))))))) ===
      """{"type": "object", "properties": {"x": {"type": "integer"}, "y": {"type": "integer"}, "z": {"type": "integer"}}, "required": ["x", "y", "z"], "additionalProperties": {"type": "integer"}}""")
    // a rest :fn whose passthrough default rides to the top (fixture
    // :55-61) — :fn itself renders {} (fixture :110)
    assert(js(SMap(Seq(Entry("x", SInt())), rest = Some(
      SProps(NodeProps(jsonSchema = Seq("default" -> Map(":x" -> 1L))),
        S.fn("map?")(_ => true))))) ===
      """{"default": {"x": 1}, "type": "object", "properties": {"x": {"type": "integer"}}, "required": ["x"]}""")
    assert(js(S.fn("int?")(_ => true)) === "{}")
    // :multi → oneOf over branches, ::m/default last (fixture :75-91)
    assert(js(S.multi("type", default = Some(S.string))(
      "sized" -> S.mapE(false, S.req("type", S.keyword),
        S.req("size", S.int)))) ===
      """{"oneOf": [{"type": "object", "properties": {"type": {"type": "string"}, "size": {"type": "integer"}}, "required": ["type", "size"]}, {"type": "string"}]}""")
    // :map-of :min/:max → minProperties/maxProperties (json_schema.cljc
    // minmax-properties)
    assert(js(S.mapOf(S.string, S.int, min = Some(1), max = Some(4))) ===
      """{"type": "object", "additionalProperties": {"type": "integer"}, "minProperties": 1, "maxProperties": 4}""")
    // util proxies render their expansion (fixtures :206-243)
    val base = S.mapE(false, S.req("x", S.int), S.req("y", S.int))
    assert(js(SMergeOf(Seq(base, S.mapE(false, S.req("z", S.int))))) ===
      """{"type": "object", "properties": {"x": {"type": "integer"}, "y": {"type": "integer"}, "z": {"type": "integer"}}, "required": ["x", "y", "z"]}""")
    assert(js(SSelectKeysOf(base, Seq("x"))) ===
      """{"type": "object", "properties": {"x": {"type": "integer"}}, "required": ["x"]}""")
    assert(js(SUnionOf(Seq(base, S.mapE(false, S.req("x", S.string)))))
      .startsWith("""{"type": "object", "properties": {"x": {"anyOf": [{"type": "integer"}, {"type": "string"}]}"""))
  }

  test("registry refs render as #/definitions pointers (json_schema.cljc:17-37)") {
    // circular definitions are not created (fixture :299-305)
    val foo = S.scoped("Foo" -> S.int)(S.ref("Foo"))
    assert(Export.toJsonSchema(foo) ===
      """{"$ref": "#/definitions/Foo", "definitions": {"Foo": {"type": "integer"}}}""")
    // ::definitions-path override (fixture :306-314) — pointer moves,
    // the root key stays "definitions"
    assert(Export.toJsonSchema(foo, "#/foo/bar/") ===
      """{"$ref": "#/foo/bar/Foo", "definitions": {"Foo": {"type": "integer"}}}""")
    // mutual recursion terminates via the recursion stopper
    // (fixture :316-331 Foo ↔ Bar)
    val fooBar = S.scoped(
      "Foo" -> S.vector(S.ref("Bar")),
      "Bar" -> S.ref("Foo"))(S.ref("Foo"))
    assert(Export.toJsonSchema(fooBar) ===
      """{"$ref": "#/definitions/Foo", "definitions": {"Foo": {"type": "array", "items": {"$ref": "#/definitions/Bar"}}, "Bar": {"$ref": "#/definitions/Foo"}}}""")
    // the self-recursive node schema, in both dialects (swagger ints
    // keep their int64 format inside definitions)
    val node = S.scoped("node" -> S.mapE(false,
      S.req("v", S.intMin(0L)),
      S.opt("kids", S.vector(S.ref("node")))))(S.ref("node"))
    assert(Export.toJsonSchema(node) ===
      """{"$ref": "#/definitions/node", "definitions": {"node": {"type": "object", "properties": {"v": {"type": "integer", "minimum": 0}, "kids": {"type": "array", "items": {"$ref": "#/definitions/node"}}}, "required": ["v"]}}}""")
    assert(Export.toSwagger(node) ===
      """{"$ref": "#/definitions/node", "definitions": {"node": {"type": "object", "properties": {"v": {"type": "integer", "format": "int64", "minimum": 0}, "kids": {"type": "array", "items": {"$ref": "#/definitions/node"}}}, "required": ["v"]}}}""")
    // swagger :maybe of a ref: x-nullable rides on the pointer object
    // (swagger references-test :origin)
    val withMaybe = S.scoped("C" -> S.string)(S.maybe(S.ref("C")))
    assert(Export.toSwagger(withMaybe) ===
      """{"$ref": "#/definitions/C", "x-nullable": true, "definitions": {"C": {"type": "string"}}}""")
  }

  test("swagger top-level null base throws (swagger_test null-base-test)") {
    intercept[IllegalArgumentException](Export.toSwagger(S.nil))
    intercept[IllegalArgumentException](Export.toSwagger(S.maybe(S.nil)))
    intercept[IllegalArgumentException](Export.toSwagger(S.or(S.nil, S.nil)))
  }

  test("swagger-spec assembles parameters/responses (swagger_test.cljc:334-445)") {
    // basic: body wraps whole, query/header flatten per property
    val spec = Export.swaggerSpec(
      parameters = Seq(
        "body" -> S.mapE(false, S.req("foo", S.string)),
        "query" -> S.mapE(false, S.req("a", S.string), S.req("b", S.string)),
        "header" -> S.mapE(false, S.req("c", S.string))),
      responses = Seq(
        (200, Some(S.mapE(false, S.req("bar", S.keyword))), None)))
    assert(spec ===
      """{"parameters": [""" +
      """{"in": "body", "name": "body", "description": "", "required": true, "schema": {"type": "object", "properties": {"foo": {"type": "string"}}, "required": ["foo"]}}, """ +
      """{"in": "query", "name": "a", "description": "", "required": true, "type": "string"}, """ +
      """{"in": "query", "name": "b", "description": "", "required": true, "type": "string"}, """ +
      """{"in": "header", "name": "c", "description": "", "required": true, "type": "string"}], """ +
      """"responses": {"200": {"description": "", "schema": {"type": "object", "properties": {"bar": {"type": "string"}}, "required": ["bar"]}}}}""")
    // registry body: schema stays a $ref, definitions hoist to the root
    val regBody = S.scoped("req-body" -> S.mapOf(S.keyword, S.any))(
      S.ref("req-body"))
    assert(Export.swaggerSpec(Seq("body" -> regBody), Seq.empty) ===
      """{"parameters": [{"in": "body", "name": "body", "description": "", "required": true, "schema": {"$ref": "#/definitions/req-body"}}], """ +
      """"definitions": {"req-body": {"type": "object", "additionalProperties": {}}}}""")
    // recursive registries collect transitively
    val recSpec = Export.swaggerSpec(
      Seq("body" -> S.scoped(
        "a" -> S.or(S.string, S.vector(S.ref("b"))),
        "b" -> S.or(S.keyword, S.vector(S.ref("c"))),
        "c" -> S.or(S.symbol, S.vector(S.ref("a"))))(
        S.mapE(false, S.req("a", S.ref("a"))))), Seq.empty)
    assert(recSpec.contains(""""definitions": {"a": {"type": "string", "x-anyOf": [{"type": "string"}, {"type": "array", "items": {"$ref": "#/definitions/b"}}]}, "b": """))
    assert(recSpec.contains(""""c": {"type": "string", "x-anyOf": [{"type": "string"}, {"type": "array", "items": {"$ref": "#/definitions/a"}}]}"""))
    // non-body refs inline (deref-recursive) instead of $ref-ing; later
    // duplicate (in, name) wins (regression #1002 ordering semantics)
    val q = S.scoped("qb" -> S.string(min = 10))(
      S.mapE(false, S.req("a", S.int), S.req("b", S.ref("qb"))))
    val inlined = Export.swaggerSpec(Seq("query" -> q), Seq.empty)
    assert(inlined ===
      """{"parameters": [""" +
      """{"in": "query", "name": "a", "description": "", "required": true, "type": "integer", "format": "int64"}, """ +
      """{"in": "query", "name": "b", "description": "", "required": true, "type": "string", "minLength": 10}]}""")
    val dedup = Export.swaggerSpec(Seq(
      "query" -> S.mapE(false, S.req("q", S.string)),
      "query" -> S.mapE(false, S.req("q", S.int))), Seq.empty)
    assert(dedup ===
      """{"parameters": [{"in": "query", "name": "q", "description": "", "required": true, "type": "integer", "format": "int64"}]}""")
    // response without schema keeps its description only
    assert(Export.swaggerSpec(Seq.empty,
      Seq((500, None, Some("fail")), (200, Some(S.string), None))) ===
      """{"responses": {"500": {"description": "fail"}, "200": {"description": "", "schema": {"type": "string"}}}}""")
  }

  test("swagger property passthrough (swagger.cljc:74-81)") {
    // :swagger/... keys merge on top (vendor extensions)
    val s1 = SProps(NodeProps(title = Some("kind"),
      swagger = Seq("x-ms-enum" -> Map(":modelAsString" -> false,
        ":name" -> "Kind"))), S.enum_("a", "b"))
    assert(Export.toSwagger(s1) ===
      """{"title": "kind", "type": "string", "enum": ["a", "b"], "x-ms-enum": {"modelAsString": false, "name": "Kind"}}""")
    // whole :swagger prop replaces
    val s2 = SProps(NodeProps(swaggerFull = Some(Map(":type" -> "file"))),
      S.string)
    assert(Export.toSwagger(s2) === """{"type": "file"}""")
    // :json-schema/... applies to swagger too, :swagger/... wins last
    val s3 = SProps(NodeProps(
      jsonSchema = Seq("example" -> 1L),
      swagger = Seq("example" -> 2L)), S.int)
    assert(Export.toSwagger(s3) ===
      """{"type": "integer", "format": "int64", "example": 2}""")
  }

  test("swagger transform: base + x-allOf/x-anyOf/x-nullable (swagger_test.cljc)") {
    def sw(s: mallispark.ir.SchemaIR) = Export.toSwagger(s)
    // formats (swagger_test.cljc:10-16)
    assert(sw(S.posInt) ===
      """{"type": "integer", "format": "int64", "minimum": 1}""")
    assert(sw(S.gt(6L)) === """{"type": "number", "exclusiveMinimum": 6}""")
    assert(sw(S.lte(6L)) === """{"type": "number", "maximum": 6}""")
    // base selection skips null-typed children but keeps them in x-anyOf
    // (swagger_test.cljc:27-34)
    assert(sw(S.or(S.nil, S.int)) ===
      """{"type": "integer", "format": "int64", "x-anyOf": [{"type": "null"}, {"type": "integer", "format": "int64"}]}""")
    assert(sw(S.and(S.int, S.posInt)) ===
      """{"type": "integer", "format": "int64", "x-allOf": [{"type": "integer", "format": "int64"}, {"type": "integer", "format": "int64", "minimum": 1}]}""")
    // :not → x-not; :maybe → base + x-nullable; tuple → x-items
    assert(sw(S.not(S.string)) === """{"x-not": {"type": "string"}}""")
    assert(sw(S.maybe(S.string)) ===
      """{"type": "string", "x-nullable": true}""")
    assert(sw(S.tuple(S.int, S.string)) ===
      """{"type": "array", "items": {}, "x-items": [{"type": "integer", "format": "int64"}, {"type": "string"}]}""")
    // containers recurse in swagger dialect (int keeps its format)
    assert(sw(S.mapE(false, S.req("a", S.int), S.opt("b", S.string)))
      .contains(""""a": {"type": "integer", "format": "int64"}"""))
    // all-null alternatives have no legal swagger base
    intercept[IllegalArgumentException](sw(S.or(S.nil, S.nil)))
    // a child CONTAINING a null-typed descendant is still a valid base
    // (only top-level {"type": "null"} children are skipped)
    assert(sw(S.maybe(S.vector(S.nil))) ===
      """{"type": "array", "items": {"type": "null"}, "x-nullable": true}""")
  }

  test("DOT emitter: entity extraction, labels, ref edges (dot_test.cljc shape)") {
    import mallispark.ir.Dot
    val order = S.scoped(
      "Country" -> S.mapE(false,
        S.req("name", S.enum_("FI", "PO")),
        S.req("neighbors", S.vector(S.ref("Country")))),
      "Burger" -> S.mapE(false,
        S.req("name", S.string),
        S.opt("description", S.string),
        S.req("origin", S.maybe(S.ref("Country"))),
        S.req("price", S.posInt)),
      "OrderLine" -> S.mapE(false,
        S.req("burger", S.ref("Burger")),
        S.req("amount", S.int)),
      "Order" -> S.mapE(false,
        S.req("lines", S.vector(S.ref("OrderLine"))),
        S.req("delivery", S.mapE(false,
          S.req("delivered", S.boolean),
          S.req("address", S.mapE(false,
            S.req("street", S.string),
            S.req("zip", S.int),
            S.req("country", S.ref("Country"))))))))(S.ref("Order"))
    val dot = Dot.transform(order)
    // header
    assert(dot.startsWith("digraph {\n  node [shape=\"record\""))
    // nested maps extracted into $-named ENTITY nodes (filled dark)
    assert(dot.contains(
      "\"Order$Delivery\" [label=\"{Order$Delivery|:delivered :boolean\\l" +
        ":address Order$Delivery$Address\\l}\", fillcolor=\"#e6caab\"]"))
    // refs print bare in this engine's form syntax ([:ref Country] —
    // same convention as the scoped_form golden)
    assert(dot.contains(
      "\"Order$Delivery$Address\" [label=\"{Order$Delivery$Address|" +
        ":street :string\\l:zip :int\\l:country [:ref Country]\\l}\"" +
        ", fillcolor=\"#e6caab\"]"))
    // explicit registry members stay light-filled with form-per-entry
    assert(dot.contains(
      "\"Country\" [label=\"{Country|:name [:enum \\\"FI\\\" \\\"PO\\\"]\\l" +
        ":neighbors [:vector [:ref Country]]\\l}\", " +
        "fillcolor=\"#fff0cd\"]"))
    // composition edges (extracted entity) vs aggregation edges
    assert(dot.contains("\"Order\" -> \"Order$Delivery\" [arrowtail=\"diamond\"]"))
    assert(dot.contains(
      "\"Order$Delivery\" -> \"Order$Delivery$Address\" [arrowtail=\"diamond\"]"))
    assert(dot.contains("\"OrderLine\" -> \"Burger\" [arrowtail=\"odiamond\"]"))
    assert(dot.contains("\"Country\" -> \"Country\" [arrowtail=\"odiamond\"]"))
    assert(dot.contains(
      "\"Order$Delivery$Address\" -> \"Country\" [arrowtail=\"odiamond\"]"))
    assert(dot.trim.endsWith("}"))
    // anonymous schemas lift into the one-node form (dot_test.cljc:36-43)
    val anon = Dot.transform(S.enum_("S", "M", "L"))
    assert(anon.contains(
      "\":mallispark.dot/schema\" [label=\"{:mallispark.dot/schema|" +
        "[:enum \\\"S\\\" \\\"M\\\" \\\"L\\\"]\\l}\", fillcolor=\"#fff0cd\"]"))

    // PlantUML from the same normalize pipeline (plantuml_test.cljc):
    // explicit members are `entity`, extracted nested maps `abstract`;
    // o-- aggregation vs *-- composition
    val uml = Dot.plantuml(order)
    assert(uml.startsWith("@startuml\n") && uml.trim.endsWith("@enduml"))
    assert(uml.contains(
      "entity Country {\n :name [:enum \"FI\" \"PO\"]\n" +
        " :neighbors [:vector [:ref Country]]\n}"))
    assert(uml.contains(
      "abstract Order$Delivery {\n :delivered :boolean\n" +
        " :address Order$Delivery$Address\n}"))
    assert(uml.contains("Order *-- Order$Delivery"))
    assert(uml.contains("OrderLine o-- Burger"))
    assert(Dot.plantuml(S.and(S.int, S.lt(100L))).contains(
      "entity :mallispark.dot/schema {\n [:and :int [:< 100]]\n}"))
    // nested maps inside :multi branches are extracted too (the
    // dispatch-heavy schemas diagrams are most useful for)
    val pet = Dot.transform(S.scoped(
      "Pet" -> S.multi("type")(
        "dog" -> S.mapE(false, S.req("bark", S.boolean)),
        "cat" -> S.any))(S.ref("Pet")))
    assert(pet.contains("\"Pet$Type\"") || pet.contains("\"Pet$Dog\""),
      s"no extracted multi-branch entity in:\n$pet")
    assert(pet.contains("arrowtail=\"diamond\""))
  }

  test("structtype DDL dual") {
    val st = mallispark.compile.SchemaCompiler.toStructType(
      WebPages.schema.asInstanceOf[SMap])
    assert(st.fieldNames.toSeq ===
      Seq("doc_id", "url", "warc_ts", "html", "text", "lang"))
    assert(st("html").dataType.typeName === "binary")
  }

  // seed-sweep regression: STACKED SProps wrappers once rendered their
  // props maps CONCATENATED — duplicate keys EDN cannot round-trip
  test("nested props wrappers render as one merged map (outer wins)") {
    val inner = SProps(NodeProps(extra = Seq(":user/tag" -> 1L)),
      S.int(0L, 100L))
    val same = SProps(NodeProps(extra = Seq(":user/tag" -> 1L)), inner)
    val f = SchemaIR.form(same)
    assert(f === "[:int {:user/tag 1 :min 0 :max 100}]")
    assert(SchemaIR.form(Export.fromForm(f)) === f) // fixpoint
    // conflicting values: the OUTER wrapper wins
    val conflict = SProps(NodeProps(extra = Seq(":user/tag" -> 2L)), inner)
    assert(SchemaIR.form(conflict) === "[:int {:user/tag 2 :min 0 :max 100}]")
    // distinct keys: both survive, outer first
    val both = SProps(NodeProps(title = Some("t")), inner)
    val fb = SchemaIR.form(both)
    assert(fb.contains(":title") && fb.contains(":user/tag 1"))
    assert(SchemaIR.form(Export.fromForm(fb)) === fb)
  }
}
