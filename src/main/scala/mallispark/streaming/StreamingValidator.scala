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
}
