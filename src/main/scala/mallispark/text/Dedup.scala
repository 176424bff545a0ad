package mallispark.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._
import TextOps._

/** Deduplication operators for web-scale corpora.
  *
  * Scale design (10^12 docs):
  *  - `exactDupGroups` shuffles only (hash, id) pairs — never text bodies.
  *  - MinHash/SimHash signatures are computed scan-side (one pass, pure
  *    Column codegen); candidate generation shuffles (band_key, id) pairs,
  *    so the join fan-out is bounded by bucket sizes, not corpus size².
  *  - n-gram Jaccard self-join is quadratic per token bucket — kept for
  *    oracle-verifiable exact semantics at small scale and as the in-bucket
  *    refinement step after LSH at large scale.
  * All hashes are md5-derived (portable to the DuckDB oracle). */
object Dedup {

  /** Exact duplicate groups by md5(text): (text_hash, dup_cnt, doc_ids). */
  def exactDupGroups(df: DataFrame, id: String, text: String): DataFrame =
    df.select(F.col(id), F.md5(F.col(text)).as("text_hash"))
      .groupBy("text_hash")
      .agg(F.count(F.lit(1)).as("dup_cnt"),
        F.sort_array(F.collect_list(F.col(id))).as("doc_ids"))
      .where(F.col("dup_cnt") > 1)

  /** MinHash signature: k seeded min-hashes over word `n`-gram shingles.
    * Null/short docs → empty shingles → hash of empty set = max long. */
  def minhashSignature(text: Column, k: Int, n: Int = 3): Column = {
    val sh = F.array_distinct(shingles(text, n))
    F.transform(F.sequence(F.lit(0), F.lit(k - 1)), seed =>
      F.coalesce(
        F.array_min(F.transform(sh, s => h32(seed, s))),
        F.lit(Long.MaxValue)))
  }

  /** MinHash+LSH candidate pairs: signature → `bands` bands of `k/bands`
    * rows each → band bucket key → ids sharing a bucket.
    * Returns (band, band_key, dup_cnt, doc_ids) for buckets with >1 doc.
    * One shuffle of (band_key, id); text never moves. */
  def minhashLSH(df: DataFrame, id: String, text: String,
                 k: Int = 16, bands: Int = 4, n: Int = 3): DataFrame = {
    val rows = k / bands
    val sig = df.select(F.col(id),
      minhashSignature(F.col(text), k, n).as("sig"))
    val banded = sig.select(F.col(id), F.explode(
      F.transform(F.sequence(F.lit(0), F.lit(bands - 1)), b =>
        F.struct(b.as("band"),
          F.array_join(F.transform(
            F.slice(F.col("sig"), b * rows + 1, F.lit(rows)),
            x => x.cast(StringType)), "_").as("band_key")))).as("bk"))
      .select(F.col(id), F.col("bk.band").as("band"),
        F.col("bk.band_key").as("band_key"))
    banded.groupBy("band", "band_key")
      .agg(F.count(F.lit(1)).as("dup_cnt"),
        F.sort_array(F.collect_list(F.col(id))).as("doc_ids"))
      .where(F.col("dup_cnt") > 1)
  }

  /** 64-bit SimHash as two portable 32-bit halves (hi, lo). Each token
    * votes ±1 on 32 bits of each half; bit i set iff the vote sum > 0. */
  def simhash(text: Column): Column = {
    val toks = F.array_distinct(tokens(text))
    def half(tag: String): Column = {
      // per-bit vote sums folded over tokens; bit extraction via
      // floor(h / 2^i) % 2 (shift functions need static shift amounts,
      // but i is a lambda variable — 2^i ≤ 2^31 is exact in double)
      val votes = F.aggregate(
        toks,
        F.array_repeat(F.lit(0L), 32),
        (acc, t) => {
          val h = h32(F.lit(tag), t)
          F.zip_with(acc, F.sequence(F.lit(0), F.lit(31)), (a, i) =>
            a + F.when(
              F.floor(h.cast(DoubleType) /
                F.pow(F.lit(2.0), i.cast(DoubleType))).cast(LongType) % 2 === 1,
              1L).otherwise(-1L))
        })
      F.aggregate(
        F.zip_with(votes, F.sequence(F.lit(0), F.lit(31)), (v, i) =>
          F.when(v > 0,
            F.pow(F.lit(2.0), i.cast(DoubleType)).cast(LongType))
            .otherwise(F.lit(0L))),
        F.lit(0L), (acc, x) => acc + x)
    }
    F.struct(half("hi").as("hi"), half("lo").as("lo"))
  }

  /** SimHash near-dup candidates: exact match on either 32-bit half
    * (standard block-permutation trick — a ≤32-bit-different pair shares a
    * half with high probability for small hamming distances). */
  def simhashCandidates(df: DataFrame, id: String, text: String): DataFrame = {
    val withSig = df.select(F.col(id), simhash(F.col(text)).as("sh"))
      .select(F.col(id), F.col("sh.hi").as("hi"), F.col("sh.lo").as("lo"))
    val byHalf = (half: String) => withSig.groupBy(F.col(half).as("half_key"))
      .agg(F.count(F.lit(1)).as("dup_cnt"),
        F.sort_array(F.collect_list(F.col(id))).as("doc_ids"))
      .where(F.col("dup_cnt") > 1)
      .withColumn("half", F.lit(half))
    byHalf("hi").unionAll(byHalf("lo"))
      .select("half", "half_key", "dup_cnt", "doc_ids")
  }

  /** Exact n-gram (word) Jaccard similarity for candidate pairs: distinct
    * shingles exploded, self-joined on shingle, |A∩B| counted, Jaccard =
    * inter / (|A|+|B|-inter). Quadratic within shingle buckets — use after
    * LSH at scale; exact and oracle-checkable at test scale.
    * Returns pairs with jaccard ≥ threshold (id_a < id_b). */
  def ngramJaccardPairs(df: DataFrame, id: String, text: String,
                        n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sh = df.select(F.col(id).as("doc"),
      F.explode(F.array_distinct(shingles(F.col(text), n))).as("shingle"))
    val sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).as("sz"))
    val pairs = sh.as("a").join(sh.as("b"),
        F.col("a.shingle") === F.col("b.shingle") &&
          F.col("a.doc") < F.col("b.doc"))
      .groupBy(F.col("a.doc").as("id_a"), F.col("b.doc").as("id_b"))
      .agg(F.count(F.lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnRenamed("doc", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("doc", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard",
        F.col("inter").cast(DoubleType) /
          (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
      .where(F.col("jaccard") >= threshold)
      .select("id_a", "id_b", "inter", "sz_a", "sz_b", "jaccard")
  }
}
