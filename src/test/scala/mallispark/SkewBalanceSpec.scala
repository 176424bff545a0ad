package mallispark

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, functions => F}
import mallispark.run.WebPages

/** Skew-balance evidence (SURVEY §7 hard part 5): on the Zipf-skewed
  * lang distribution WebPages synthesizes (hottest lang ≈ 55% of rows),
  * a lang-keyed exchange concentrates most rows in a handful of reduce
  * tasks, while the salted exchange spreads them evenly.
  *
  * Measured from a SparkListener on per-task SHUFFLE-READ RECORD counts
  * (records are deterministic; wall-clock task durations on a shared VM
  * are not — same imbalance, noise-free). The plain repartition is used
  * rather than groupBy().count() because partial aggregation already
  * collapses a count's skew map-side; the skew that hurts at 100 TB is
  * in combiner-less shuffles (wide rows, collect-like aggs, joins),
  * which is what a raw hash exchange models. */
class SkewBalanceSpec extends SparkSuite {

  private val Rows = 200000L

  private final class TaskRecords extends SparkListener {
    val recs = new ConcurrentHashMap[(Int, Long), Long]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null)
        recs.put((t.stageId, t.taskInfo.taskId),
          m.shuffleReadMetrics.recordsRead)
    }
  }

  /** Runs the job under a fresh listener; returns per-task shuffle-read
    * records of the reduce stage (identified as the stage whose tasks
    * read exactly `Rows` records in total). */
  private def reduceTaskRecords(df: DataFrame): Seq[Long] = {
    val l = new TaskRecords
    spark.sparkContext.addSparkListener(l)
    try {
      df.write.format("noop").mode("overwrite").save()
      // the listener bus is async — wait for the event backlog to settle
      var last = -1
      var spins = 0
      while (spins < 100 && l.recs.size != last) {
        last = l.recs.size
        Thread.sleep(100)
        spins += 1
      }
      val byStage = l.recs.asScala.toSeq
        .groupBy(_._1._1).view.mapValues(_.map(_._2)).toMap
      val reduce = byStage.filter(_._2.sum == Rows)
      assert(reduce.nonEmpty,
        s"no stage read $Rows shuffle records: ${byStage.view.mapValues(_.sum).toMap}")
      reduce.maxBy(_._1)._2.toSeq
    } finally spark.sparkContext.removeSparkListener(l)
  }

  private def median(xs: Seq[Long]): Long = xs.sorted.apply(xs.size / 2)

  test("AQE splits the skewed side of a lang join (runtime re-plan)") {
    // salting handles skewed AGGREGATIONS; for skewed sort-merge JOINS
    // the engine leans on AQE's OptimizeSkewedJoin — verify it actually
    // fires on the Zipf lang distribution when a partition exceeds the
    // (test-lowered) skew thresholds
    val prev = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      // production defaults (256MB / 5× median) scaled to test data:
      // the hot lang's partition must exceed BOTH thresholds
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "64KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "64KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val skewed = WebPages.synthesize(spark, Rows, partitions = 8)
        .select("doc_id", "lang", "url")
      val dim = WebPages.synthesize(spark, 200, partitions = 2)
        .select(F.col("lang"), F.col("doc_id").as("dim_id"))
      val joined = skewed.join(dim, "lang")
      // drive THIS DataFrame's own adaptive execution (count() would
      // plan a separate aggregate query and leave this plan unexecuted)
      assert(joined.queryExecution.toRdd.count() > 0)
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("skew=true"),
        s"AQE skew-join did not fire:\n${plan.take(4000)}")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("salting bounds reduce-task imbalance on Zipf-skewed lang keys") {
    val skewed = WebPages.synthesize(spark, Rows, partitions = 8)
      .select("doc_id", "lang")

    val unsalted = reduceTaskRecords(skewed.repartition(32, F.col("lang")))
    // salt cardinality ≫ reducer count (256 vs 32): with only ~32 salt
    // values the hot lang's cells collide on reducers (measured 2.5×);
    // finer salt smooths cell-placement variance to ≲1.5×
    val salted = reduceTaskRecords(skewed.repartition(32, F.col("lang"),
      F.pmod(F.xxhash64(F.col("doc_id")), F.lit(256L))))

    assert(unsalted.size === 32 && salted.size === 32)
    // unsalted: ≤5 distinct lang keys land on 32 reducers — most tasks
    // read NOTHING, one owns the 55% lang
    val unsaltedRatio =
      unsalted.max.toDouble / math.max(median(unsalted), 1L)
    assert(median(unsalted) === 0L, s"unexpected spread: $unsalted")
    assert(unsaltedRatio > 10.0,
      s"skew fixture lost its skew: max=${unsalted.max} ratio=$unsaltedRatio")
    // salted: every reducer gets ≈ Rows/32; max ≤ 2× median documents
    // the bound the 100-TB salting path is designed to hold
    val saltedRatio = salted.max.toDouble / math.max(median(salted), 1L)
    assert(saltedRatio <= 2.0,
      s"salted path imbalanced: max=${salted.max} med=${median(salted)}")
  }
}
