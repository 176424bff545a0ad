package mallispark

import org.apache.spark.sql.{functions => F, Row}
import org.apache.spark.sql.types._
import mallispark.ir.{S, SchemaIR}
import mallispark.ir.SchemaIR._
import mallispark.compile.SchemaCompiler

class DeepNestSpec extends SparkSuite {
  implicit val ctx: SchemaCompiler.Ctx = SchemaCompiler.Ctx()
  test("30-level nested struct validates via the interpreter escape hatch") {
    import scala.jdk.CollectionConverters._
    def sch(d: Int): SchemaIR =
      if (d == 0) S.int(0L, 100L)
      else S.mapE(false, S.req("leaf", S.int(0L, 100L)), S.req("kid", sch(d - 1)))
    def dt(d: Int): DataType =
      if (d == 0) LongType
      else StructType(Seq(StructField("leaf", LongType), StructField("kid", dt(d - 1))))
    def v(d: Int, x: Long): Any = if (d == 0) x else Row(x, v(d - 1, x))
    val D = Integer.parseInt(sys.env.getOrElse("PROBE_DEPTH", "30"))
    val top = S.mapE(false, S.req("root", sch(D))).asInstanceOf[SMap]
    val st = StructType(Seq(StructField("root", dt(D))))
    val rows = (0 until 200).map(i => Row(v(D, i % 120).asInstanceOf[Row]))
    val tmp = java.nio.file.Files.createTempDirectory("deep").toString
    spark.createDataFrame(new java.util.ArrayList[Row](rows.asJava), st)
      .write.mode("overwrite").parquet(tmp)
    val df = spark.read.parquet(tmp)
    val t0 = System.nanoTime()
    val flagged = SchemaCompiler.validateDF(top, df, "ok")
    val built = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val bad = flagged.where(!F.col("ok")).collect().length
    val first = (System.nanoTime() - t1) / 1e9
    println(s"[probe] build ${built}s first ${first}s bad=$bad")
    val t2 = System.nanoTime()
    val nv = SchemaCompiler.violationsDF(top, df, Seq.empty).count()
    println(s"[probe] violations ${(System.nanoTime() - t2) / 1e9}s nv=$nv")
    assert(nv === bad.toLong * (D + 1)) // every level flags the bad leaf
    // leaf values cycle i % 120; values 101..119 are invalid -> for 200
    // rows that is the count of i with (i % 120) > 100
    val expectBad = (0 until 200).count(i => i % 120 > 100)
    assert(bad === expectBad)

  }
}
