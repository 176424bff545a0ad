package mallispark.expressions

import org.apache.spark.sql.{Column, MallisparkBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded DISTINCT-string-set aggregate: the k smallest distinct
  * strings, emitted sorted ascending. When the group's true distinct
  * count is ≤ k the result is the COMPLETE distinct set — which is how a
  * single stats pass can make an exact "is this column an enum of ≤ N
  * values" decision (ask for N+1: an N+1-sized result proves
  * non-enum-hood, a smaller one IS the value set) without a per-column
  * distinct job and without unbounded collect_set state. Buffer is a
  * TreeSet capped at k elements; partial-merge-able. */
case class BoundedStringSet(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[UTF8String]]
  with UnaryLike[Expression] {

  require(k > 0, "bounded_string_set needs k > 0")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bounded_string_set needs string, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_string_set"

  override def createAggregationBuffer(): java.util.TreeSet[UTF8String] =
    new java.util.TreeSet[UTF8String]()

  // caller must pass an OWNED UTF8String (update clones — values read
  // off an InternalRow alias a reused unsafe buffer)
  private def insert(buf: java.util.TreeSet[UTF8String],
                     v: UTF8String): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v.compareTo(buf.last) < 0) {
      if (buf.add(v)) buf.pollLast()
      ()
    }

  override def update(buf: java.util.TreeSet[UTF8String],
                      input: InternalRow): java.util.TreeSet[UTF8String] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[UTF8String].clone())
    buf
  }

  override def merge(buf: java.util.TreeSet[UTF8String],
                     other: java.util.TreeSet[UTF8String]): java.util.TreeSet[UTF8String] = {
    other.forEach(v => insert(buf, v))
    buf
  }

  override def eval(buf: java.util.TreeSet[UTF8String]): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    buf.forEach { v => out(i) = v; i += 1 }
    new GenericArrayData(out)
  }

  // length-prefixed UTF-8 (NOT writeUTF — that caps strings at 64 KB,
  // and an enum-candidate column's values can be arbitrary documents)
  override def serialize(buf: java.util.TreeSet[UTF8String]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach { v =>
      val b = v.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[UTF8String] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val s = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      s.add(UTF8String.fromBytes(b))
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedStringSet =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedStringSet =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      newChild: Expression): BoundedStringSet = copy(child = newChild)
}

object BoundedStringSet {
  def apply(c: Column, k: Int): Column =
    MallisparkBridge.column(
      new BoundedStringSet(MallisparkBridge.expression(c), k)
        .toAggregateExpression())
}
