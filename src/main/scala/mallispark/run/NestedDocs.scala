package mallispark.run

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Derived NESTED columns (arrays / maps / tuples / regex sequences) over
  * the driver `documents` table, in exact lockstep with `OracleCte` — the
  * same construction the flat `WebPages.derive` uses, extended to
  * collection types so the driver's DuckDB gate can exercise the
  * collection/nested compiler paths (`:vector` `:set` `:tuple` `:map-of`
  * `:every` and the seq-regex tiers — reference fixtures
  * test/malli/core_test.cljc:3113 map-of, 3164 tuple, 3511 every).
  *
  * Violations are injected by doc_id arithmetic — identical rows on both
  * engines. The Scala Columns and the SQL CTE must stay in lockstep
  * (CLAUDE.md invariant).
  *
  * Injection map (d = doc_id):
  *  - d % 13 = 4  → `nums` empty            (vector :min 1 → ::limits)
  *  - d % 11 = 3  → `nums[0]` = -5          (element :int {:min 0} error)
  *  - d % 17 = 6  → `tags[2]` = tags[0]     (set duplicate → ::duplicate-keys)
  *  - d % 19 = 8  → `tags[1]` = ""          (element :string {:min 1} error)
  *  - d % 23 = 9  → `pair` gets 3rd element (tuple → ::tuple-size)
  *  - d % 21 = 5  → `pair[1]` = "xx"        (element :enum error)
  *  - d % 31 = 12 → `kvs` empty             (map-of :min 1 → ::limits)
  *  - d % 29 = 10 → `kvs['k1']` = 99        (value :int {:max 50} error)
  *  - d % 43 = 16 → `nums2[1]` = -1         (within :every window → reported)
  *  - d % 47 = 18 → `nums2[3]` = -1         (beyond :every limit 2 → NOT reported)
  *  - d % 37 = 14 → `seq1` size 2           (tier-1 :cat size mismatch)
  *  - d % 53 = 20 → `seq1[1]` = "xx"        (tier-1 :cat element enum miss)
  *  - d % 41 = 15 → `seq3` odd length       (tier-3 [:* [:cat ..]] mismatch)
  *  - d % 59 = 21 → `toks[0]` = "Bad1"      (tier-2 [:* re] miss)
  */
object NestedDocs {

  val Langs: Seq[String] = WebPages.Langs

  def derive(docs: DataFrame): DataFrame = {
    val id = F.col("doc_id")

    // nums: 1..5 longs in [0,99], injected out-of-range / empty
    val numsN = (id % 5 + 1).cast(IntegerType)
    val nums = F.when(id % 13 === 4, F.array().cast(ArrayType(LongType)))
      .otherwise(F.transform(F.sequence(F.lit(1), numsN), i =>
        F.when(id % 11 === 3 && i === 1, F.lit(-5L))
          .otherwise((id * 7 + i.cast(LongType)) % 100)))

    // tags: 3 distinct short strings, injected duplicate / empty element
    val t0 = F.concat(F.lit("t"), (id % 7).cast(StringType))
    val t1 = F.when(id % 19 === 8, F.lit(""))
      .otherwise(F.concat(F.lit("t"), ((id + 1) % 7).cast(StringType)))
    val t2 = F.when(id % 17 === 6, t0)
      .otherwise(F.concat(F.lit("t"), ((id + 2) % 7).cast(StringType)))
    val tags = F.array(t0, t1, t2)

    // pair: [word, lang] tuple, injected enum miss / extra element
    val plang = F.when(id % 21 === 5, F.lit("xx")).otherwise(F.col("lang"))
    val pairBase = F.array(
      F.concat(F.lit("w"), (id % 10).cast(StringType)), plang)
    val pair = F.when(id % 23 === 9,
      F.concat(pairBase, F.array(F.lit("extra")))).otherwise(pairBase)

    // kvs: {'k0'..'k2' -> long in [0,50)}, injected over-max value / empty
    def kv(i: Int): org.apache.spark.sql.Column = (id * 13 + i) % 50
    val v1 = F.when(id % 29 === 10, F.lit(99L)).otherwise(kv(1))
    val kvs = F.when(id % 31 === 12,
      F.map_from_arrays(F.array().cast(ArrayType(StringType, false)),
        F.array().cast(ArrayType(LongType))))
      .otherwise(F.map_from_arrays(
        F.array(F.lit("k0"), F.lit("k1"), F.lit("k2")),
        F.array(kv(0), v1, kv(2))))

    // nums2: exactly 4 longs for the bounded :every window demo
    val nums2 = F.transform(F.sequence(F.lit(1), F.lit(4)), i =>
      F.when(id % 43 === 16 && i === 2, F.lit(-1L))
        .when(id % 47 === 18 && i === 4, F.lit(-1L))
        .otherwise((id * 3 + i.cast(LongType)) % 50))

    // seq1: tier-1 [:cat re enum =] input, injected short / enum miss
    val slang = F.when(id % 53 === 20, F.lit("xx")).otherwise(F.col("lang"))
    val seq1Base = F.array(
      F.concat(F.lit("a"), (id % 3).cast(StringType)), slang, F.lit("z"))
    val seq1 = F.when(id % 37 === 14, F.slice(seq1Base, 1, 2))
      .otherwise(seq1Base)

    // toks: first 6 whitespace tokens — tier-2 [:* re] input; injected
    // non-lowercase token so the tier-2 verdict actually varies
    val toksBase = mallispark.text.TextOps.tokens(F.col("text"))
    val toks = F.when(id % 59 === 21,
      F.concat(F.array(F.lit("Bad1")), F.slice(toksBase, 2, 5)))
      .otherwise(F.slice(toksBase, 1, 6))

    // seq3: alternating k…/v… pairs — tier-3 [:* [:cat re re]] input
    val pairsN = ((id % 3 + 1) * 2).cast(IntegerType)
    val seq3Base = F.transform(F.sequence(F.lit(1), pairsN), i =>
      F.when(i % 2 === 1, F.concat(F.lit("k"), i.cast(StringType)))
        .otherwise(F.concat(F.lit("v"), i.cast(StringType))))
    val seq3 = F.when(id % 41 === 15,
      F.concat(seq3Base, F.array(F.lit("k9")))).otherwise(seq3Base)

    docs.select(id.as("doc_id"), nums.as("nums"), tags.as("tags"),
      pair.as("pair"), kvs.as("kvs"), nums2.as("nums2"),
      seq1.as("seq1"), toks.as("toks"), seq3.as("seq3"))
  }

  /** Fixed-depth comment TREE per doc for the recursive `:ref` gate
    * (reference knot-tying semantics core.cljc:1994-2008): physical shape
    * struct(v, kids: array<struct(v, kids: array<struct(v)>)>> — three
    * levels, validated through depth-bounded SRef expansion of
    * `node = [:map [:v [:int {:min 0}]] [:kids {:optional true}
    * [:vector [:ref node]]]]`. Injections (d = doc_id):
    *  - d % 9  = 2  → top v = -1
    *  - d % 15 = 7  → kids[0].v = -2
    *  - d % 27 = 13 → kids[0].kids[0].v = -3 */
  def deriveTree(docs: DataFrame): DataFrame = {
    val id = F.col("doc_id")
    def leafV(i: Int) =
      F.when(id % 27 === 13 && F.lit(i) === 1, F.lit(-3L))
        .otherwise((id * 5 + i) % 50)
    def midV(i: Int) =
      F.when(id % 15 === 7 && F.lit(i) === 1, F.lit(-2L))
        .otherwise((id * 3 + i) % 50)
    val topV = F.when(id % 9 === 2, F.lit(-1L)).otherwise(id % 50)
    def leaf(i: Int) = F.struct(leafV(i).as("v"))
    def mid(i: Int) = F.struct(midV(i).as("v"), F.array(leaf(i)).as("kids"))
    val tree = F.struct(topV.as("v"),
      F.array(mid(1), mid(2)).as("kids"))
    docs.select(id.as("doc_id"), tree.as("tree"))
  }

  /** The DuckDB-equivalent of `deriveTree` — the tree flattened to the
    * per-site scalar columns the violation oracle needs (injections only
    * ever fire on i = 1 sites; non-injected values are ≥ 0 by
    * construction, doc_id ≥ 0). */
  val TreeOracleCte: String =
    """WITH tr AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 9 = 2 THEN -1 ELSE doc_id % 50 END AS top_v,
      |    CASE WHEN doc_id % 15 = 7 THEN -2
      |         ELSE (doc_id * 3 + 1) % 50 END AS mid1_v,
      |    CASE WHEN doc_id % 27 = 13 THEN -3
      |         ELSE (doc_id * 5 + 1) % 50 END AS leaf1_v
      |  FROM documents)""".stripMargin

  /** The DuckDB-equivalent CTE of `derive`. kvs is carried as scalar
    * (kv_empty, v0, v1, v2) columns — the oracle derives map violations
    * from them without building a map value. Prepend as the query's WITH. */
  val OracleCte: String =
    """WITH pre AS (
      |  SELECT doc_id, lang, text,
      |    list_transform(range(1, (doc_id % 3 + 1) * 2 + 1),
      |      i -> CASE WHEN i % 2 = 1 THEN 'k' || CAST(i AS VARCHAR)
      |                ELSE 'v' || CAST(i AS VARCHAR) END) AS seq3_base
      |  FROM documents),
      |nested AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 13 = 4 THEN CAST([] AS BIGINT[])
      |         ELSE list_transform(range(1, doc_id % 5 + 2),
      |           i -> CASE WHEN doc_id % 11 = 3 AND i = 1 THEN CAST(-5 AS BIGINT)
      |                     ELSE (doc_id * 7 + i) % 100 END) END AS nums,
      |    ['t' || CAST(doc_id % 7 AS VARCHAR),
      |     CASE WHEN doc_id % 19 = 8 THEN ''
      |          ELSE 't' || CAST((doc_id + 1) % 7 AS VARCHAR) END,
      |     CASE WHEN doc_id % 17 = 6 THEN 't' || CAST(doc_id % 7 AS VARCHAR)
      |          ELSE 't' || CAST((doc_id + 2) % 7 AS VARCHAR) END] AS tags,
      |    CASE WHEN doc_id % 23 = 9
      |         THEN ['w' || CAST(doc_id % 10 AS VARCHAR),
      |               CASE WHEN doc_id % 21 = 5 THEN 'xx' ELSE lang END, 'extra']
      |         ELSE ['w' || CAST(doc_id % 10 AS VARCHAR),
      |               CASE WHEN doc_id % 21 = 5 THEN 'xx' ELSE lang END] END AS pair,
      |    (doc_id % 31 = 12) AS kv_empty,
      |    (doc_id * 13) % 50 AS v0,
      |    CASE WHEN doc_id % 29 = 10 THEN CAST(99 AS BIGINT)
      |         ELSE (doc_id * 13 + 1) % 50 END AS v1,
      |    (doc_id * 13 + 2) % 50 AS v2,
      |    list_transform(range(1, 5),
      |      i -> CASE WHEN doc_id % 43 = 16 AND i = 2 THEN CAST(-1 AS BIGINT)
      |                WHEN doc_id % 47 = 18 AND i = 4 THEN CAST(-1 AS BIGINT)
      |                ELSE (doc_id * 3 + i) % 50 END) AS nums2,
      |    CASE WHEN doc_id % 37 = 14
      |         THEN ['a' || CAST(doc_id % 3 AS VARCHAR),
      |               CASE WHEN doc_id % 53 = 20 THEN 'xx' ELSE lang END]
      |         ELSE ['a' || CAST(doc_id % 3 AS VARCHAR),
      |               CASE WHEN doc_id % 53 = 20 THEN 'xx' ELSE lang END,
      |               'z'] END AS seq1,
      |    CASE WHEN doc_id % 59 = 21
      |         THEN ['Bad1'] || regexp_split_to_array(lower(text), '\s+')[2:6]
      |         ELSE regexp_split_to_array(lower(text), '\s+')[1:6] END AS toks,
      |    CASE WHEN doc_id % 41 = 15 THEN seq3_base || ['k9']
      |         ELSE seq3_base END AS seq3
      |  FROM pre)""".stripMargin
}
