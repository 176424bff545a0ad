package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.{DoubleType, FloatType, LongType}
import mallispark.run.WebPages
import mallispark.text.{Dedup, Similarity}

/** Scale diagnostic for the dedup family (not part of the driver
  * contract): synthesizes an N-doc corpus with a 5× exact-duplication
  * factor (each distinct body appears ~5 times — the boilerplate-heavy
  * shape of a web crawl), then times the scale-path operators
  * end-to-end at local[cpus]:
  *
  *  1. exact dedup (md5 groupBy through the bounded member collect);
  *  2. native MinHash LSH candidate buckets (`minhashLSHFast`);
  *  3. LSH-gated exact-Jaccard pair verification + min-label clustering
  *     (`ngramJaccardWithinBuckets` → `dupClusters`);
  *  4. embedding near-dup pairs (`nearDupPairs`, hyperplane LSH);
  *  5. ANN top-k wall + recall@5 at this corpus size: brute-force exact
  *     baseline vs hyperplane-LSH (`annTopK`) vs IVF (`ivfTopK`) — run
  *     at two N to evidence near-linear per-doc cost with flat recall.
  *
  * Prints ONE JSON line with per-stage seconds and docs/sec. Knobs:
  * SPARK_GRAFT_SCALE_N (docs, default 1e6), SPARK_GRAFT_CPUS (32). */
object DedupScale {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "1000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // experiment knob for the TypedImperativeAggregate paths
      // (BoundedCollectMin et al. run under ObjectHashAggregate, which
      // falls back to SORT-based aggregation past this many in-memory
      // groups per partition). MEASURED at 1M docs / 200k clusters:
      // raising it to 500k made clustering 2.3× SLOWER (46 s vs 20 s) —
      // holding deserialized heap buffers for every group loses to the
      // sort-spill path, so the Spark default (128) stands everywhere.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OHA_THRESHOLD", "128"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 5× duplication: text keyed by id/5 instead of id. Vocabulary is
    // 50k distinct tokens — realistic shingle diversity (a toy 14-word
    // vocab makes EVERY 3-gram ubiquitous: all shingles df-capped away
    // and LSH buckets merging unrelated docs — an adversarial corpus,
    // not a representative one; the hot-bucket caps are what keep that
    // case survivable, see TextOpsSpec)
    val base = WebPages.synthesize(spark, n, partitions = cpus * 4)
      .select("doc_id")
    val grp = F.floor(F.col("doc_id") / 5)
    val text = F.array_join(
      F.transform(F.sequence(F.lit(0),
          (F.abs(F.xxhash64(grp)) % 24 + 8).cast("int")),
        i => F.concat(F.lit("w"),
          (F.abs(F.xxhash64(grp * 131 + i.cast("long"))) % 50000)
            .cast("string"))), " ")
    val corpus = base.select(F.col("doc_id"), text.as("text"))
      .localCheckpoint(true) // input materialized: stages time THEMSELVES

    def timed(run: () => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val out = run()
      ((System.nanoTime() - t0) / 1e9, out)
    }

    val (tExact, nExact) = timed(() =>
      Dedup.exactDupGroups(corpus, "doc_id", "text").count())
    val (tLsh, nLsh) = timed(() =>
      Dedup.minhashLSHFast(corpus, "doc_id", "text").count())
    // pair generation and clustering timed separately (the two scale
    // differently: pairs with corpus shingle volume, clustering with
    // the near-dup pair count)
    val (tPairs, pairsDf) = {
      val t0 = System.nanoTime()
      val out = Dedup.ngramJaccardWithinBuckets(corpus, "doc_id", "text",
        threshold = 0.9, maxShingleDf = 1000).localCheckpoint(true)
      ((System.nanoTime() - t0) / 1e9, out)
    }
    val (tClusterOnly, nCluster) = timed(() =>
      Dedup.dupClusters(pairsDf, "id_a", "id_b").count())
    val tCluster = tPairs + tClusterOnly

    // ---- ANN families over N synthetic embeddings (64-dim float) ----
    // Same 5× duplication shape: each group of 5 shares a base direction
    // with a 1% per-member perturbation (pairwise cosine ≈ 0.9999 inside
    // a group, ≈ 0 across groups). Hyperplane count scales with the
    // corpus — planes ≈ log2(n) keeps expected bucket size O(1), so the
    // random-collision candidate count n²/2^planes stays O(n); the
    // in-group candidates are ~2n by construction. This is the knob a
    // 100 TB deployment turns with corpus size, like maxShingleDf above.
    val dims = 64
    val gidE = F.floor(F.col("doc_id") / 5)
    def u(seed: Column, j: Column) =
      (F.pmod(F.xxhash64(seed, j), F.lit(2000L)).cast(DoubleType)
        - 1000.0) / 1000.0
    val vec = F.transform(F.sequence(F.lit(0), F.lit(dims - 1)), j =>
      (u(gidE, j.cast(LongType))
        + u(F.col("doc_id"), j.cast(LongType) + 1000000L) * 0.01)
        .cast(FloatType))
    val emb = base.select(F.col("doc_id").as("vec_id"), vec.as("embedding"))
      .localCheckpoint(true)
    val planes = (math.log(n.toDouble) / math.log(2.0)).ceil.toInt
    val (tNear, nNear) = timed(() =>
      Similarity.nearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.99, planes = planes, tables = 2, dims = dims).count())
    val expectedPairs = (n / 5) * 10 // C(5,2) per group

    // ---- ANN top-k: wall AND recall at this corpus size --------------
    // 100 queries, k = 5: the ground-truth top-5 per query is exactly its
    // duplication group (pairwise cosine ≈ 0.9999 inside, ≈ 0 across), so
    // recall@5 measures whether the index actually finds the neighbors —
    // ranks past the group are ~0-cosine noise that no ANN index should
    // be graded on. Brute force is the exact baseline the indexes must
    // beat on wall while holding recall as N grows.
    val kTop = 5
    val qs = emb.where(F.col("vec_id") < 100)
      .select(F.col("vec_id").as("query_id"), F.col("embedding").as("qe"))
      .localCheckpoint(true)
    val nQ = qs.count()
    def topk(run: () => org.apache.spark.sql.DataFrame)
        : (Double, org.apache.spark.sql.DataFrame) = {
      val t0 = System.nanoTime()
      val out = run().select(F.col("query_id"), F.col("vec_id"))
        .localCheckpoint(true) // eager: the wall includes the full job
      ((System.nanoTime() - t0) / 1e9, out)
    }
    val (tBrute, gt) = topk(() =>
      Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        qs, "query_id", "qe", k = kTop))
    // planes sized to the corpus (bucket ≈ 16 expected random members);
    // tables add recall. IVF keeps FIXED 64 cells at both sizes — cells
    // grow with N (the nprobe-scan cost line below shows it) while the
    // group always lands in ONE cell, so recall must hold flat.
    val searchPlanes = (math.log(n / 16.0) / math.log(2.0)).ceil.toInt
    val (tLshQ, lshRes) = topk(() =>
      Similarity.annTopK(emb, "vec_id", "embedding", qs, "query_id", "qe",
        k = kTop, planes = searchPlanes, tables = 4, dims = dims))
    val (tIvf, ivfRes) = topk(() =>
      Similarity.ivfTopK(emb, "vec_id", "embedding", qs, "query_id", "qe",
        k = kTop, nCentroids = 64, nprobe = 8, trainIters = 2))
    def recall(res: org.apache.spark.sql.DataFrame): Double =
      res.join(gt, Seq("query_id", "vec_id")).count().toDouble /
        (nQ * kTop)
    val (lshRecall, ivfRecall) = (recall(lshRes), recall(ivfRes))

    println(f"""{"metric":"dedup_scale","docs":$n,"cpus":$cpus,"exact_sec":$tExact%.2f,"exact_groups":$nExact,"exact_docs_per_sec":${n / tExact}%.0f,"lsh_sec":$tLsh%.2f,"lsh_buckets":$nLsh,"lsh_docs_per_sec":${n / tLsh}%.0f,"cluster_sec":$tCluster%.2f,"pairs_sec":$tPairs%.2f,"cluster_only_sec":$tClusterOnly%.2f,"clusters":$nCluster,"cluster_docs_per_sec":${n / tCluster}%.0f,"neardup_sec":$tNear%.2f,"neardup_pairs":$nNear,"neardup_pairs_expected":$expectedPairs,"neardup_planes":$planes,"neardup_docs_per_sec":${n / tNear}%.0f,"ann_queries":$nQ,"ann_k":$kTop,"brute_sec":$tBrute%.2f,"ann_lsh_sec":$tLshQ%.2f,"ann_lsh_recall":$lshRecall%.3f,"ann_lsh_planes":$searchPlanes,"ann_ivf_sec":$tIvf%.2f,"ann_ivf_recall":$ivfRecall%.3f}""")
    spark.stop()
  }
}
