package mallispark.infer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._
import mallispark.ir.SchemaIR
import mallispark.ir.SchemaIR._

/** Schema inference from data — the `malli.provider` analogue
  * (reference: /root/reference/src/malli/provider.cljc:14-111).
  *
  * malli folds a stats accumulator over sample values row-at-a-time
  * (`-inferrer`, provider.cljc:14-36); we run ONE distributed aggregation
  * over the DataFrame (count, null count, approx distinct per column) and
  * derive:
  *  - leaf type from the physical Spark type (malli's type preference
  *    order, provider.cljc:5-6, is subsumed — parquet already types it)
  *  - `{:optional true}` / `:maybe` when nulls observed (the per-key
  *    count vs total heuristic, provider.cljc:61-68)
  *  - `:enum` for low-cardinality strings (the value-frequency map,
  *    provider.cljc:33), threshold like the `:map-of` key-cardinality
  *    heuristic (provider.cljc:57-58)
  *  - observed min/max attached as bounds for numeric/timestamp columns
  *    (the observed duals of `:min`/`:max` props). */
object Infer {

  final case class Options(enumMaxCard: Int = 16, enumMaxRatio: Double = 0.1,
                           withBounds: Boolean = false)

  def infer(df: DataFrame, opts: Options = Options()): SMap = {
    val cols = df.schema.fields.toSeq
    val aggs = cols.flatMap { f =>
      Seq(F.count(F.col(f.name)).as(s"${f.name}__cnt"),
        F.approx_count_distinct(F.col(f.name)).as(s"${f.name}__dist")) ++
        (if (isOrdered(f.dataType))
           Seq(F.min(F.col(f.name)).cast(StringType).as(s"${f.name}__min"),
             F.max(F.col(f.name)).cast(StringType).as(s"${f.name}__max"))
         else Seq.empty)
    }
    val stats = df.agg(F.count(F.lit(1)).as("__total"), aggs: _*).collect()(0)
    val total = stats.getAs[Long]("__total")

    val entries = cols.map { f =>
      val cnt = stats.getAs[Long](s"${f.name}__cnt")
      val dist = stats.getAs[Long](s"${f.name}__dist")
      val optional = cnt < total
      val child = f.dataType match {
        case StringType
            if dist <= opts.enumMaxCard &&
              total > 0 && dist.toDouble / math.max(cnt, 1) <= opts.enumMaxRatio =>
          // the HLL estimate gates this branch but can UNDERestimate —
          // hard-limit the collect so a pathological column can never
          // flood the driver, and fall back to :string on overflow
          val values = df.select(f.name).where(F.col(f.name).isNotNull)
            .distinct().limit(opts.enumMaxCard + 1)
            .collect().map(_.getString(0)).sorted.toSeq
          if (values.size > opts.enumMaxCard) SString() else SEnum(values)
        case other => leafFor(other, f.name, stats, opts)
      }
      Entry(f.name, child, optional = optional)
    }
    SMap(entries)
  }

  private def isOrdered(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType | TimestampType | DateType => true
    case _ => false
  }

  private def leafFor(dt: DataType, name: String,
                      stats: org.apache.spark.sql.Row,
                      opts: Options): SchemaIR = {
    def minS = Option(stats.getAs[String](s"${name}__min"))
    def maxS = Option(stats.getAs[String](s"${name}__max"))
    dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        if (opts.withBounds) SInt(minS.map(_.toLong), maxS.map(_.toLong))
        else SInt()
      case FloatType | DoubleType =>
        if (opts.withBounds) SDouble(minS.map(_.toDouble), maxS.map(_.toDouble))
        else SDouble()
      case BooleanType => SBoolean
      case BinaryType => SBinary
      case TimestampType =>
        if (opts.withBounds)
          STimestamp(
            minS.map(s => java.sql.Timestamp.valueOf(s).toInstant),
            maxS.map(s => java.sql.Timestamp.valueOf(s).toInstant))
        else STimestamp()
      case DateType => SDate()
      case StringType => SString()
      case ArrayType(et, _) =>
        SVector(leafFor(et, name, stats, Options(withBounds = false)))
      case MapType(kt, vt, _) =>
        SMapOf(leafFor(kt, name, stats, Options(withBounds = false)),
          leafFor(vt, name, stats, Options(withBounds = false)))
      case st: StructType =>
        SMap(st.fields.toSeq.map(f =>
          Entry(f.name, leafFor(f.dataType, name, stats,
            Options(withBounds = false)), optional = f.nullable)))
      case _ => SAny
    }
  }
}
