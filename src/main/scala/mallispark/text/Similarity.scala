package mallispark.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._
import TextOps.h32

/** Approximate-nearest-neighbor search over embedding columns
  * (Array[Float]).
  *
  * Baseline: brute-force cosine top-k (exact; broadcast the query side).
  * Scale path: random-hyperplane LSH bucketing — signatures are pure
  * Column expressions with md5-derived pseudo-random hyperplane signs, so
  * buckets are deterministic and portable; the exact cosine runs only
  * within buckets. At 10^12 vectors the bucket join shuffles (bucket, id)
  * pairs; the embedding column moves only for in-bucket refinement. */
object Similarity {

  /** Cosine similarity between two array<float/double> columns (summed in
    * DOUBLE, left-to-right, for cross-engine determinism). */
  def cosine(a: Column, b: Column): Column = {
    val dot = F.aggregate(
      F.zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      F.lit(0.0), (acc, x) => acc + x)
    val na = F.sqrt(F.aggregate(a, F.lit(0.0),
      (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType)))
    val nb = F.sqrt(F.aggregate(b, F.lit(0.0),
      (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType)))
    dot / (na * nb)
  }

  /** Exact brute-force top-k: broadcast the (small) query set against the
    * corpus, window top-k per query. One corpus scan, no corpus shuffle
    * beyond the top-k aggregation. */
  def bruteForceTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
                     queries: DataFrame, queryId: String, queryVec: String,
                     k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = corpus.crossJoin(F.broadcast(queries))
      .withColumn("cos", cosine(F.col(corpusVec), F.col(queryVec)))
    val w = Window.partitionBy(F.col(queryId))
      .orderBy(F.col("cos").desc, F.col(corpusId).asc)
    joined.withColumn("rank", F.row_number().over(w))
      .where(F.col("rank") <= k)
      .select(F.col(queryId), F.col(corpusId), F.col("cos"), F.col("rank"))
  }

  /** Deterministic pseudo-random hyperplane sign for (plane p, dim i):
    * ±1 from the portable hash parity. */
  private def planeSign(p: Column, i: Column): Column =
    F.when(h32(F.concat(p.cast(StringType), F.lit("_"), i.cast(StringType)))
      % 2 === 0, 1.0).otherwise(-1.0)

  /** Random-hyperplane LSH signature: `planes` sign bits packed into one
    * BIGINT bucket key. sign(dot(v, r_p)) with r_p ∈ {±1}^d. */
  def lshBucket(vec: Column, planes: Int): Column = {
    val bits = F.transform(F.sequence(F.lit(0), F.lit(planes - 1)), p => {
      val dot = F.aggregate(
        F.zip_with(vec,
          F.sequence(F.lit(0), F.size(vec) - 1),
          (x, i) => x.cast(DoubleType) * planeSign(p, i)),
        F.lit(0.0), (acc, x) => acc + x)
      F.when(dot >= 0, F.pow(F.lit(2.0), p.cast(DoubleType)).cast(LongType))
        .otherwise(F.lit(0L))
    })
    F.aggregate(bits, F.lit(0L), (acc, x) => acc + x)
  }

  /** ANN top-k via LSH buckets: corpus and queries bucketed by the same
    * hyperplanes; candidates = same-bucket pairs; exact cosine + window
    * top-k within candidates. Recall grows with fewer planes (bigger
    * buckets); `planes`=8 → 256 buckets. */
  def annTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
              queries: DataFrame, queryId: String, queryVec: String,
              k: Int, planes: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cb = corpus.withColumn("bucket", lshBucket(F.col(corpusVec), planes))
    val qb = queries.withColumn("bucket", lshBucket(F.col(queryVec), planes))
    val cand = cb.join(F.broadcast(qb), "bucket")
      .withColumn("cos", cosine(F.col(corpusVec), F.col(queryVec)))
    val w = Window.partitionBy(F.col(queryId))
      .orderBy(F.col("cos").desc, F.col(corpusId).asc)
    cand.withColumn("rank", F.row_number().over(w))
      .where(F.col("rank") <= k)
      .select(F.col(queryId), F.col(corpusId), F.col("cos"), F.col("rank"))
  }
}
