package graft
import org.apache.spark.sql.SparkSession

/** Local diagnostic: cold+warm wall time of named SparkEntry queries at
  * sf0.1 on local[32] (not part of the driver contract — Bench is the
  * recorded artifact). Usage: `runMain graft.TimeQ q1 q2 ...`. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    // warm
    spark.range(1000000).count()
    spark.read.parquet(s"$sf/documents.parquet").count()
    for (q <- args) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sf).count()
      println(f"[timeq] $q ${(System.nanoTime()-t0)/1e9}%.2f s")
      val t1 = System.nanoTime()
      SparkEntry.queries(q)(spark, sf).count()
      println(f"[timeq] $q warm ${(System.nanoTime()-t1)/1e9}%.2f s")
    }
    spark.stop()
  }
}
