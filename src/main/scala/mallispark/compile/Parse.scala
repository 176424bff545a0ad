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

      // :andn parses x against EVERY branch → Tags({tag → x}); any branch
      // failing ⇒ ::m/invalid (core.cljc:954-965)
      case SAndn(branches) =>
        val out = StructType(branches.map(b => StructField(b._1, dt)))
        F.when(SchemaCompiler.valid(ir, col, dt),
            F.struct(branches.map { case (tag, _) => col.as(tag) }: _*))
          .otherwise(F.lit(null).cast(out))

      case SCatn(entries) =>
        dt match {
          case ArrayType(et, _) =>
            val fields = entries.zipWithIndex.map { case ((tag, c), i) =>
              val elem = F.get(col, F.lit(i))
              c match {
                // an :altn entry parses its element to Tag(tag, value) —
                // the winning (first-matching) branch names the tag
                case SAltn(bs) =>
                  val tagT = StructType(Seq(StructField("tag", StringType),
                    StructField("value", et)))
                  bs.foldRight(F.lit(null).cast(tagT)) { case ((t2, c2), acc) =>
                    F.when(SchemaCompiler.valid(c2, elem, et),
                      F.struct(F.lit(t2).as("tag"), elem.as("value")))
                      .otherwise(acc)
                  }.as(tag)
                case _ => elem.as(tag)
              }
            }
            val outFields = entries.map {
              case (tag, SAltn(_)) => StructField(tag, StructType(Seq(
                StructField("tag", StringType), StructField("value", et))))
              case (tag, _) => StructField(tag, et)
            }
            F.when(SchemaCompiler.valid(ir, col, dt), F.struct(fields: _*))
              .otherwise(F.lit(null).cast(StructType(outFields)))
          case _ => F.lit(null)
        }

      case SMulti(dk, branches, default) =>
        dt match {
          case _: StructType =>
            val dv = col.getField(dk)
            val out = StructType(Seq(StructField("tag", StringType),
              StructField("value", dt)))
            // the ::m/default branch PARTICIPATES in parsing (a valid
            // default-branch row must not parse to ::m/invalid when the
            // validator accepts it) — tagged with the reserved segment,
            // matching explain's path convention
            val fallback = default match {
              case Some(d) =>
                F.when(SchemaCompiler.valid(d, col, dt),
                  F.struct(F.lit("malli.core/default").as("tag"),
                    col.as("value"))).otherwise(F.lit(null).cast(out))
              case None => F.lit(null).cast(out)
            }
            branches.foldRight(fallback) { case ((tag, c), acc) =>
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
    // :andn unparses the LEFT-MOST branch's value (core.cljc:967-979)
    case SAndn(branches) => parsed.getField(branches.head._1)
    case SCatn(entries) =>
      F.array(entries.map {
        case (tag, SAltn(_)) => parsed.getField(tag).getField("value")
        case (tag, _) => parsed.getField(tag)
      }: _*)
    case SMaybe(c) => F.when(parsed.isNull, parsed)
      .otherwise(unparse(c, parsed, dt))
    case _ => parsed
  }
}
