package mallispark.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import mallispark.ir.SchemaIR
import mallispark.compile.SchemaCompiler

/** Streaming execution mode (SURVEY §2.11).
  *
  * The reference has no streaming surface; the north rule requires
  * RESUMABILITY, which the batch path covers with the partition manifest
  * (mallispark.run.ValidationJob). This module is the optional Structured
  * Streaming mode: the SAME compiled Column expressions over readStream,
  * with `Trigger.AvailableNow` for incremental catch-up runs and Spark's
  * checkpoint for exactly-once sink writes. New files since the last
  * checkpoint are the stream — Iceberg-snapshot-tailing maps onto this
  * directly at deployment.
  */
object StreamingValidator {

  /** Streaming frame of per-row verdicts over a parquet directory. */
  def validateStream(spark: SparkSession, ir: SchemaIR,
                     sourceDir: String, sourceSchema: StructType)(
      implicit ctx: SchemaCompiler.Ctx = SchemaCompiler.Ctx()): DataFrame = {
    val in = spark.readStream.schema(sourceSchema).parquet(sourceDir)
    SchemaCompiler.validateDF(ir, in, "valid")
  }

  /** Streaming JSONL ingestion: tail a directory of raw JSON-document
    * text files, parse each line with the schema's StructType through
    * [[mallispark.compile.Transform.fromJsonLines]], and validate — the
    * streaming shape of the crawl-dump entry path. Malformed documents
    * arrive as null-field rows with `valid = false`. */
  def validateJsonStream(spark: SparkSession, ir: SchemaIR.SMap,
                         sourceDir: String)(
      implicit ctx: SchemaCompiler.Ctx = SchemaCompiler.Ctx()): DataFrame = {
    val in = spark.readStream.text(sourceDir)
    val parsed = mallispark.compile.Transform.fromJsonLines(ir, in, "value")
    SchemaCompiler.validateDF(ir, parsed, "valid")
  }

  /** One catch-up pass: validate everything new since the checkpoint,
    * append violation rows to `violationsDir`, return the query after it
    * drains. Exactly-once via the checkpoint; rerunning validates only
    * new files (the streaming analogue of manifest resume). */
  def runAvailableNow(spark: SparkSession, ir: SchemaIR, sourceDir: String,
                      sourceSchema: StructType, keyCols: Seq[String],
                      violationsDir: String, checkpointDir: String)(
      implicit ctx: SchemaCompiler.Ctx = SchemaCompiler.Ctx()): StreamingQuery = {
    val in = spark.readStream.schema(sourceSchema).parquet(sourceDir)
    val violations = SchemaCompiler.violationsDF(ir, in, keyCols)
    val q = violations.writeStream
      .format("parquet")
      .option("path", violationsDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Windowed per-interval verdict counts with a watermark — the
    * streaming shape of the per-partition verdict aggregation. */
  def windowedVerdicts(validated: DataFrame, tsCol: String,
                       window: String = "1 hour",
                       watermark: String = "2 hours"): DataFrame =
    validated
      .withWatermark(tsCol, watermark)
      .groupBy(F.window(F.col(tsCol), window))
      .agg(F.count(F.lit(1)).as("rows"),
        F.sum(F.when(F.col("valid"), 1L).otherwise(0L)).as("valid_rows"))

  /** STATEFUL streaming exact-dedup: emit each key's first sighting and
    * suppress every later one — per-key state via flatMapGroupsWithState
    * (the custom-state primitive; windowed aggs can't express "seen ever").
    *
    * Within one micro-batch a key's winner is its MIN id (deterministic at
    * any parallelism — iterator order is not); across batches the
    * checkpointed boolean state suppresses re-emission, so a catch-up run
    * over new files emits only never-seen keys. State is one boolean per
    * distinct key, hash-partitioned with the groupBy — at 10^12 rows the
    * working set is bounded by distinct keys, not rows, and the state
    * store scales with executors. */
  def dedupStream(spark: SparkSession, sourceDir: String,
                  sourceSchema: StructType, keyCol: String,
                  idCol: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    // the emitted first_id is the min id WITHIN the micro-batch where the
    // key first appears; pin the whole catch-up backlog into one batch
    // (the file source otherwise chunks >1000-file backlogs) so a
    // catch-up run emits the min over the entire backlog — the semantics
    // the oracle asserts. Steady-state micro-batches are unaffected.
    // fail FAST when the backlog cannot fit one micro-batch: beyond
    // maxFilesPerTrigger the source chunks the catch-up, and a key's
    // first batch may not contain its global min id — silently weaker
    // semantics than the oracle asserts. (Local-path check; remote URIs
    // skip it and rely on the documented contract.)
    val BacklogLimit = 1000000L
    scala.util.Try {
      val st = java.nio.file.Files.list(java.nio.file.Paths.get(sourceDir))
      try st.limit(BacklogLimit + 1).count() finally st.close()
    }.foreach(n => require(n <= BacklogLimit,
      s"dedupStream: backlog exceeds $BacklogLimit files — the " +
        "first-sighting min-id guarantee holds only when catch-up fits " +
        "one micro-batch; compact the input or run incremental catch-ups"))
    val in = spark.readStream.schema(sourceSchema)
      .option("maxFilesPerTrigger", BacklogLimit)
      .parquet(sourceDir)
    in.select(F.col(keyCol).cast(org.apache.spark.sql.types.StringType),
        F.col(idCol).cast(org.apache.spark.sql.types.LongType))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator((key, rows.map(_._2).min))
          }
      }
      .toDF(keyCol, "first_id")
  }
}
