package mallispark.run

import org.apache.spark.sql.SparkSession

/** spark-submit entry point for the validation job (SURVEY §7 M4).
  *
  * Usage:
  *   spark-submit --class mallispark.run.Main <jar> \
  *     <inputParquet> <outDir> <runId> [nParts] [schemaJson]
  *
  * Validates the input against the web-pages schema (or a schema loaded
  * from a JSON AST file — see mallispark.ir.Export), writing:
  *   <outDir>/manifest/    per-partition verdicts + lineage (append)
  *   <outDir>/violations/  exploded violation rows (append)
  * Re-running with the same runId resumes: only partitions missing from
  * the manifest are validated. Iceberg note: the sandbox has no Iceberg
  * runtime on the classpath; `spark.read.parquet` stands in for the
  * catalog read — swap the reader line for `spark.read.format("iceberg")`
  * at deployment, nothing else changes (the manifest keys on a
  * data-derived logical partition, not on file layout). */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: <inputParquet> <outDir> <runId> [nParts] [schemaJsonFile]")
    val Array(input, outDir, runId) = args.take(3)
    val nParts = if (args.length > 3) args(3).toInt else 256
    val schema = if (args.length > 4)
      mallispark.ir.Export.fromJson(
        java.nio.file.Files.readString(java.nio.file.Paths.get(args(4))))
    else WebPages.schema

    val spark = SparkSession.builder()
      .appName("mallispark-validate")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    try {
      val df = spark.read.parquet(input)
      val manifest = ValidationJob.runResumable(
        spark, df, schema, Seq(df.columns.head), outDir, runId, nParts)
      val totals = manifest.groupBy("run_id").sum("rows", "valid_rows")
        .collect()(0)
      // scalastyle:off println — operator-facing summary
      println(s"run=$runId partitions=${manifest.count()} " +
        s"rows=${totals.getLong(1)} valid=${totals.getLong(2)}")
      // scalastyle:on
    } finally spark.stop()
  }
}
