package mallispark

import org.apache.spark.sql.{functions => F}
import mallispark.expressions.{MallisparkExtensions, ShingleMinHash,
  ShingleH60Set, SimHashPortable}

/** SQL surface for the custom kernels: after registration the functions
  * are callable from spark.sql and agree exactly with the Column API. */
class ExtensionsSpec extends SparkSuite {

  test("registered SQL functions equal the Column-API kernels") {
    MallisparkExtensions.register(spark)
    val pages = mallispark.run.WebPages.derive(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
      .where(F.length(F.col("text")) > 0)
      .select("doc_id", "text")
    pages.createOrReplaceTempView("ext_pages")
    val viaSql = spark.sql(
      """SELECT doc_id, shingle_minhash(text, 3, 8) AS mh,
        |  shingle_h60set(text, 3) AS hs, simhash_portable(text) AS sh,
        |  minhash_from_text(text, 3, 8) AS mhn
        |FROM ext_pages""".stripMargin)
    val viaCol = pages.select(F.col("doc_id"),
      ShingleMinHash(F.col("text"), 3, 8).as("mh"),
      ShingleH60Set(F.col("text"), 3).as("hs"),
      SimHashPortable(F.col("text")).as("sh"),
      mallispark.expressions.MinHashFromText(F.col("text"), 3, 8).as("mhn"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
  }

  test("non-literal kernel parameter is rejected with a clear error") {
    MallisparkExtensions.register(spark)
    spark.range(3).selectExpr("CAST(id AS STRING) AS text", "CAST(id AS INT) AS n")
      .createOrReplaceTempView("ext_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT shingle_minhash(text, n, 8) FROM ext_bad").collect()
    }
    assert(e.getMessage.contains("literal"),
      s"unexpected error: ${e.getMessage}")
  }
}
