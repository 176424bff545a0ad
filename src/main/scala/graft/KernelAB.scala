package graft

import org.apache.spark.sql.{SparkSession, functions => F}

object KernelAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .appName("kernel-ab")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val pat = "^https?://[^\\s]+$"
    val df = spark.range(8L * 1000 * 1000).select(
      F.concat(F.lit("http://host"), F.pmod(F.col("id"), F.lit(97)),
        F.lit("/p/"), F.col("id"),
        F.when(F.pmod(F.col("id"), F.lit(13)) === 0, F.lit(" bad"))
          .otherwise(F.lit(""))).as("url")).cache()
    df.count()
    def time(name: String, c: org.apache.spark.sql.Column): Unit = {
      // warm
      df.select(F.count(F.when(c, 1))).collect()
      val t0 = System.nanoTime()
      var k = 0
      var matched = 0L
      while (k < 3) {
        matched = df.select(F.count(F.when(c, 1))).collect()(0).getLong(0)
        k += 1
      }
      val dt = (System.nanoTime() - t0) / 1e9 / 3
      println(f"AB $name: $dt%.3f s/pass  (${8.0e6 / dt / 1e6}%.1f M rows/s) matched=$matched")
    }
    time("floor len>7", F.length(F.col("url")) > 7)
    time("rlike      ", F.col("url").rlike(pat))
    time("anchored   ", mallispark.expressions.AnchoredScan.column(F.col("url"), pat).get)
    val uuidPat = "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\\z"
    val dfu = spark.range(8L * 1000 * 1000).select(
      F.concat(F.lit("550e8400-e29b-41d4-a716-4466554400"),
        F.lpad(F.pmod(F.col("id"), F.lit(100)).cast("string"), 2, "0")).as("u")).cache()
    dfu.count()
    def timeU(name: String, c: org.apache.spark.sql.Column): Unit = {
      dfu.select(F.count(F.when(c, 1))).collect()
      val t0 = System.nanoTime()
      var k = 0
      while (k < 3) { dfu.select(F.count(F.when(c, 1))).collect(); k += 1 }
      val dt = (System.nanoTime() - t0) / 1e9 / 3
      println(f"AB $name: $dt%.3f s/pass  (${8.0e6 / dt / 1e6}%.1f M rows/s)")
    }
    timeU("uuid rlike ", F.col("u").rlike(uuidPat))
    timeU("uuid kernel", mallispark.expressions.AnchoredScan.column(F.col("u"), uuidPat).get)
    spark.stop()
  }
}
