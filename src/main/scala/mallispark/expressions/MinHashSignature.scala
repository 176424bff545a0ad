package mallispark.expressions

import org.apache.spark.sql.{Column, MallisparkBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native MinHash signature: k minima of xxhash64(shingle, seed) over an
  * array<string> column, in ONE pass per row with whole-stage codegen.
  *
  * This is the SCALE path for MinHash dedup (SURVEY §2 training-data
  * additions): the oracle-checked portable path (Dedup.minhashLSH) pays
  * one md5 per shingle plus k affine mixes through interpreted
  * higher-order functions so DuckDB can reproduce it bit-for-bit; this
  * expression trades that portability for a tight generated loop —
  * at 10^12 documents the signature scan dominates the dedup job, so the
  * custom Expression is the standard-extension-point answer (custom
  * `Expression` with doGenCode, preference order (b) — no planner rule
  * needed). Same LSH banding applies downstream. */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0 && k <= 512, s"k out of range: $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_signature needs array<string>, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        var seed = 0
        while (seed < k) {
          val h = XXH64.hashUnsafeBytes(
            s.getBaseObject, s.getBaseOffset, s.numBytes, seed.toLong)
          if (h < mins(seed)) mins(seed) = h
          seed += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val seed = ctx.freshName("seed")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  if (!$c.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $s = $c.getUTF8String($i);
         |    for (int $seed = 0; $seed < $k; $seed++) {
         |      long $h = $xxh.hashUnsafeBytes(
         |        $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), (long) $seed);
         |      if ($h < $mins[$seed]) $mins[$seed] = $h;
         |    }
         |  }
         |}
         |${ev.value} = new $gad($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  /** Column wrapper. */
  def apply(shingles: Column, k: Int): Column =
    MallisparkBridge.column(
      new MinHashSignature(MallisparkBridge.expression(shingles), k))
}
