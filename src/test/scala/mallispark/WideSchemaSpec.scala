package mallispark

import org.apache.spark.sql.{functions => F, Row}
import org.apache.spark.sql.types._
import mallispark.ir.S
import mallispark.ir.SchemaIR._
import mallispark.compile.SchemaCompiler

/** Wide-table scale guard: a 250-key closed map must validate correctly
  * AND build an O(width) expression tree. The naive route (every check
  * extracting from one rebuilt row-struct) is O(width²) pre-optimization
  * — measured ~8 s of driver planning per action at 250 columns before
  * the direct-column fast path in validateDF/explainDF. */
class WideSchemaSpec extends SparkSuite {
  implicit val ctx: SchemaCompiler.Ctx = SchemaCompiler.Ctx()

  test("250-key closed map: correct, and the plan stays O(width)") {
    import scala.jdk.CollectionConverters._
    val n = 250
    val entries = (0 until n).map { i =>
      if (i % 3 == 0) S.req(s"c$i", S.int(0L, 1000000L))
      else if (i % 3 == 1) S.req(s"c$i", S.string(min = 1, max = 40))
      else S.opt(s"c$i", S.boolean)
    }
    val sch = S.mapE(true, entries: _*).asInstanceOf[SMap]
    val st = StructType((0 until n).map { i =>
      if (i % 3 == 0) StructField(s"c$i", LongType)
      else if (i % 3 == 1) StructField(s"c$i", StringType)
      else StructField(s"c$i", BooleanType)
    })
    val rows = (0 until 500).map { r =>
      Row.fromSeq((0 until n).map { i =>
        if (i % 3 == 0) (r * 31 + i).toLong % 1000000L
        else if (i % 3 == 1) s"v$r-$i"
        else (r + i) % 2 == 0
      })
    }
    val tmp = java.nio.file.Files.createTempDirectory("wide").toString
    spark.createDataFrame(new java.util.ArrayList[Row](rows.asJava), st)
      .write.mode("overwrite").parquet(tmp)
    val df = spark.read.parquet(tmp)
    val flagged = SchemaCompiler.validateDF(sch, df, "ok")
    // structural O(width) guard: the ANALYZED tree must not embed a
    // row-struct copy per field check (that shape is ~125k+ nodes at
    // width 250; the direct-column build is a few thousand)
    val nodes = flagged.queryExecution.analyzed.expressions
      .map(e => { var c = 0; e.foreach(_ => c += 1); c }).sum
    assert(nodes < 20000, s"analyzed expression tree has $nodes nodes")
    assert(flagged.where(!F.col("ok")).count() === 0L)
    // poison one column -> exactly those rows flagged, violation keyed
    val poisoned = rows.take(10).map(r => Row.fromSeq(r.toSeq.updated(0, -5L)))
    val ptmp = java.nio.file.Files.createTempDirectory("wide_p").toString
    spark.createDataFrame(
      new java.util.ArrayList[Row](poisoned.asJava), st)
      .write.mode("overwrite").parquet(ptmp)
    val pdf = spark.read.parquet(ptmp)
    assert(SchemaCompiler.validateDF(sch, pdf, "ok")
      .where(!F.col("ok")).count() === 10L)
    val v = SchemaCompiler.violationsDF(sch, pdf, Seq("c1"))
    assert(v.count() === 10L)
    assert(v.select("schema_path").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("c0"))
    // extra physical column on a CLOSED map still reports ::extra-key
    // through the fast path
    val extra = pdf.withColumn("zz", F.lit("stray"))
    val ev = SchemaCompiler.violationsDF(sch, extra, Seq("c1"))
    assert(ev.where(F.col("error_key") === ErrorKeys.ExtraKey).count() === 10L)
    rmTree(tmp); rmTree(ptmp)
  }
}
