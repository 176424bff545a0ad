package mallispark.compile

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._
import mallispark.ir.SchemaIR
import mallispark.ir.SchemaIR._

/** `m/parse` / `m/unparse` (reference: /root/reference/src/malli/core.cljc
  * 2684-2714; Tag/Tags records 164-183).
  *
  * malli's parse is identity for most schemas ("simple parser",
  * core.cljc:99-100) and only materializes structure for tagged unions:
  *  - `:orn`  → Tag(name, value)       → struct(tag, value)
  *  - `:catn` → Tags({name → value})   → named struct from positions
  *  - `:multi`→ dispatch-tagged value  → struct(tag, value)
  * Invalid input parses to ::m/invalid — represented as NULL here (pair
  * with the validator when the distinction from a null field matters). */
object Parse {

  def parse(ir: SchemaIR, col: Column, dt: DataType)(
      implicit ctx: SchemaCompiler.Ctx = SchemaCompiler.Ctx()): Column =
    ir match {
      case SOrn(branches) =>
        val out = StructType(Seq(StructField("tag", StringType),
          StructField("value", dt)))
        branches.foldRight(F.lit(null).cast(out)) { case ((tag, c), acc) =>
          F.when(SchemaCompiler.valid(c, col, dt),
            F.struct(F.lit(tag).as("tag"), col.as("value"))).otherwise(acc)
        }

      case SCatn(entries) =>
        dt match {
          case ArrayType(et, _) =>
            val fields = entries.zipWithIndex.map { case ((tag, _), i) =>
              F.get(col, F.lit(i)).as(tag)
            }
            F.when(SchemaCompiler.valid(ir, col, dt), F.struct(fields: _*))
              .otherwise(F.lit(null).cast(StructType(
                entries.map(e => StructField(e._1, et)))))
          case _ => F.lit(null)
        }

      case SMulti(dk, branches, _) =>
        dt match {
          case _: StructType =>
            val dv = col.getField(dk)
            val out = StructType(Seq(StructField("tag", StringType),
              StructField("value", dt)))
            branches.foldRight(F.lit(null).cast(out)) { case ((tag, c), acc) =>
              F.when(dv === F.lit(tag) && SchemaCompiler.valid(c, col, dt),
                F.struct(F.lit(tag).as("tag"), col.as("value"))).otherwise(acc)
            }
          case _ => F.lit(null)
        }

      case SMaybe(c) =>
        F.when(col.isNull, col).otherwise(parse(c, col, dt))

      // identity-preserving parser (core.cljc:99-100): parse == input
      case _ =>
        F.when(SchemaCompiler.valid(ir, col, dt), col)
          .otherwise(F.lit(null).cast(dt))
    }

  /** Inverse of parse (core.cljc:2700-2714). */
  def unparse(ir: SchemaIR, parsed: Column, dt: DataType): Column = ir match {
    case _: SOrn | _: SMulti => parsed.getField("value")
    case SCatn(entries) =>
      F.array(entries.map { case (tag, _) => parsed.getField(tag) }: _*)
    case SMaybe(c) => F.when(parsed.isNull, parsed)
      .otherwise(unparse(c, parsed, dt))
    case _ => parsed
  }
}
