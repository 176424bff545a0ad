package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}

/** Machine-ceiling probe: times the trivial pure-codegen job
  * (range → xxhash64 → sum) at N and 4N local cores and prints one JSON
  * line with the scaling efficiency. Used to find a quiet window on the
  * shared VM BEFORE recording Bench — gating on the MACHINE's own
  * ceiling (not on the benchmark's result) is not result-conditioned
  * stopping. */
object Probe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_PROBE_N", "8").toInt
    val n4 = n * 4
    def rate(cores: Int): Double = {
      val s = SparkSession.builder()
        .master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      try {
        val rows = 50000000L * cores
        def run(): Unit = s.range(0, rows, 1, cores * 4)
          .select(F.sum(F.pmod(F.xxhash64(F.col("id")), F.lit(1000L))))
          .collect()
        run() // warm
        val t0 = System.nanoTime(); run()
        rows / ((System.nanoTime() - t0) / 1e9)
      } finally s.stop()
    }
    val (rn, r4) = (rate(n), rate(n4))
    val eff = r4 / (rn * (n4.toDouble / n))
    println(f"""{"metric":"ceiling_probe","cores_n":$n,"rate_n":$rn%.0f,"cores_4n":$n4,"rate_4n":$r4%.0f,"efficiency":$eff%.3f}""")
  }
}
