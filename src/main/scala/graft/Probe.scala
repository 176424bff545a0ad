package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import mallispark.text.{Dedup, TextOps}

/** Scratch profiling main (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val pages = mallispark.run.WebPages.derive(
      s.read.parquet("/root/testdata/sf0.1/documents.parquet"))
      .where(F.length(F.col("text")) > 0)
    def time(name: String)(f: => Long): Unit = {
      f
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    val sh = F.array_distinct(TextOps.shingles(F.col("text"), 3))
    time("tokens only")(
      pages.select(F.size(TextOps.tokens(F.col("text"))).as("n"))
        .agg(F.sum("n")).collect()(0).getLong(0))
    time("shingles construct")(
      pages.select(F.size(sh).as("n")).agg(F.sum("n")).collect()(0).getLong(0))
    time("shingles + md5/h32 per shingle")(
      pages.select(F.aggregate(F.transform(sh, x => TextOps.h32(x)),
          F.lit(0L), (a, b) => a + b).as("n"))
        .agg(F.sum("n")).collect()(0).getLong(0))
    time("full portable signature k=8")(
      pages.select(F.col("doc_id"),
        F.transform(sh, x => TextOps.h32(x)).as("hs"))
        .select(F.aggregate(F.transform(F.col("hs"), h => h), F.lit(0L),
          (a, b) => a + b)).count())
    time("dedup_minhash_lsh full")(
      Dedup.minhashLSH(pages, "doc_id", "text", 8, 4, 3).count())
    time("dedup_minhash_fast full")(
      Dedup.minhashLSHFast(pages, "doc_id", "text", 64, 16, 3).count())
    s.stop()
  }
}
