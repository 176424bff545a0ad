package mallispark.run

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._
import mallispark.ir.S
import mallispark.ir.SchemaIR

/** The Common-Crawl-style web-pages table (BASELINE.json input_hint):
  * (url string, warc_ts timestamp, html binary, text string, lang string).
  *
  * Two deterministic constructions, no external data:
  *  - `derive(documents)` — a pure-Column derivation from the driver's
  *    `documents` parquet, expressible 1:1 in ANSI SQL (see `ORACLE_CTE`)
  *    so every validation query over it has a DuckDB oracle. Violations
  *    (malformed urls, out-of-range timestamps, empty text, off-enum langs,
  *    duplicate urls) are injected by doc_id arithmetic — same rows in both
  *    engines.
  *  - `synthesize(spark, n)` — spark.range-based generator for bench/scale
  *    runs (millions of rows), with Zipf-ish host/lang skew driven by
  *    deterministic hashing (no Random, no wall clock).
  */
object WebPages {

  val Langs: Seq[String] = Seq("en", "de", "fr", "es", "zh")

  /** Validity window for warc_ts (epoch seconds, UTC):
    * [2025-01-01, 2026-05-01]. */
  val TsMinEpoch = 1735689600L
  val TsMaxEpoch = 1777593600L

  /** Flagship schema (FIXTURES.md §1; SURVEY §7 M1):
    * [:map {:closed true}
    *  [:url [:re "^https?://[^\\s]+$"]]
    *  [:warc_ts [:time/instant {:min .. :max ..}]]
    *  [:html bytes?] [:text [:string {:min 1}]] [:lang [:enum ...]]] */
  val schema: SchemaIR = S.mapE(true,
    S.opt("doc_id", S.int), // bookkeeping key carried alongside the page
    S.req("url", S.re("^https?://[^\\s]+$")),
    S.req("warc_ts", S.instant(
      min = Some(java.time.Instant.ofEpochSecond(TsMinEpoch)),
      max = Some(java.time.Instant.ofEpochSecond(TsMaxEpoch)))),
    S.req("html", S.bytes),
    S.req("text", S.string(min = 1)),
    S.req("lang", S.enum_(Langs: _*)))

  /** Deterministic pages from the driver `documents` table. Injections:
    *  - doc_id % 2000 = 13  → malformed url (no scheme)
    *  - doc_id % 1000 = 17  → warc_ts outside [min,max]
    *  - doc_id %  500 = 23  → empty text
    *  - doc_id %  400 = 31  → lang outside the enum
    *  - doc_id %  100 =  7  → url duplicated (second row, doc_id+10^7)
    */
  def derive(docs: DataFrame): DataFrame = {
    val id = F.col("doc_id")
    val base = docs.select(
      id.as("doc_id"),
      F.when(id % 2000 === 13,
        F.concat(F.lit("notaurl-"), id.cast(StringType)))
        .otherwise(F.concat(F.lit("https://"), F.col("source"),
          F.lit(".example.org/doc/"), id.cast(StringType))).as("url"),
      F.timestamp_micros(
        (F.when(id % 1000 === 17, F.lit(1800000000L))
          .otherwise(F.lit(TsMinEpoch) + (id * 37) % 40000000L)) * 1000000L)
        .as("warc_ts"),
      F.when(id % 500 === 23, F.lit("")).otherwise(F.col("text")).as("text"),
      F.when(id % 400 === 31, F.lit("xx")).otherwise(F.col("lang")).as("lang"))
    val dups = base.where(id % 100 === 7).select(
      (id + 10000000L).as("doc_id"), F.col("url"),
      F.timestamp_micros(F.unix_micros(F.col("warc_ts")) + 3600000000L)
        .as("warc_ts"),
      F.col("text"), F.col("lang"))
    base.unionAll(dups)
      .withColumn("html", F.encode(F.col("text"), "UTF-8"))
      .select("doc_id", "url", "warc_ts", "html", "text", "lang")
  }

  /** The DuckDB-equivalent CTE of `derive` (minus `html`, which DuckDB's
    * encode() also supports but no oracle query needs). Prepend to oracle
    * SQL as `WITH pages AS (...)`. */
  val OracleCte: String =
    """WITH base AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 2000 = 13 THEN 'notaurl-' || CAST(doc_id AS VARCHAR)
      |         ELSE 'https://' || source || '.example.org/doc/' || CAST(doc_id AS VARCHAR) END AS url,
      |    CASE WHEN doc_id % 1000 = 17 THEN make_timestamp(1800000000000000)
      |         ELSE make_timestamp((1735689600 + (doc_id * 37) % 40000000) * CAST(1000000 AS BIGINT)) END AS warc_ts,
      |    CASE WHEN doc_id % 500 = 23 THEN '' ELSE text END AS text,
      |    CASE WHEN doc_id % 400 = 31 THEN 'xx' ELSE lang END AS lang
      |  FROM documents),
      |pages AS (
      |  SELECT * FROM base
      |  UNION ALL
      |  SELECT doc_id + 10000000, url, warc_ts + INTERVAL 1 HOUR, text, lang
      |  FROM base WHERE doc_id % 100 = 7)""".stripMargin

  /** Bench-scale deterministic generator: n rows, Zipf-skewed hosts and
    * langs (hot-key skew for the salting path), same violation injections.
    * Pure Column arithmetic over spark.range — scales linearly with
    * parallelism, no data movement. */
  def synthesize(spark: SparkSession, n: Long,
                 partitions: Int = 0): DataFrame = {
    val base0 = if (partitions > 0) spark.range(0L, n, 1L, partitions)
                else spark.range(n)
    val id = F.col("id")
    // deterministic pseudo-random in [0,1): xxhash64 of id, normalized
    def rnd(salt: Int) =
      (F.abs(F.xxhash64(id + F.lit(salt.toLong * 1000000007L))) % 1000000L)
        .cast(DoubleType) / 1000000.0
    // Zipf-ish rank: small ranks much more likely (pow-law via pow of rnd)
    val hostRank = F.floor(F.pow(rnd(1), 4.0) * 1000).cast(LongType)
    val langIdx = F.when(rnd(2) < 0.55, 0).when(rnd(2) < 0.75, 1)
      .when(rnd(2) < 0.87, 2).when(rnd(2) < 0.95, 3).otherwise(4)
    val langArr = F.array(Langs.map(F.lit): _*)
    val words = F.array(Seq("spark", "data", "table", "row", "join", "scan",
      "merge", "sort", "key", "value", "batch", "stream", "query", "filter")
      .map(F.lit): _*)
    // deterministic text: 8-40 words keyed by id
    val textCol = F.array_join(
      F.transform(F.sequence(F.lit(0), (F.abs(F.xxhash64(id)) % 32 + 8).cast(IntegerType)),
        i => F.element_at(words, (F.abs(F.xxhash64(id * 131 + i.cast(LongType))) % 14 + 1).cast(IntegerType))),
      " ")
    base0.select(
      id.as("doc_id"),
      F.when(id % 2000 === 13, F.concat(F.lit("notaurl-"), id.cast(StringType)))
        .otherwise(F.concat(F.lit("https://host"), hostRank.cast(StringType),
          F.lit(".example.org/p/"), id.cast(StringType))).as("url"),
      F.timestamp_micros(
        (F.when(id % 1000 === 17, F.lit(1800000000L))
          .otherwise(F.lit(TsMinEpoch) + (id * 37) % 40000000L)) * 1000000L)
        .as("warc_ts"),
      F.when(id % 500 === 23, F.lit("")).otherwise(textCol).as("text"),
      F.when(id % 400 === 31, F.lit("xx"))
        .otherwise(F.element_at(langArr, langIdx + 1)).as("lang"))
      .withColumn("html", F.encode(F.col("text"), "UTF-8"))
      .select("doc_id", "url", "warc_ts", "html", "text", "lang")
  }
}
