package mallispark.expressions

import org.apache.spark.sql.{Column, MallisparkBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-state "k smallest" collect aggregate.
  *
  * Semantically `slice(sort_array(collect_list(child)), 1, k)` — but the
  * aggregation buffer NEVER holds more than `k` longs (a size-capped
  * max-heap), where collect_list materializes the ENTIRE group in the
  * buffer before any slice can run. A degenerate group (10^8 copies of
  * one boilerplate page hashing to a single text_hash / LSH bucket)
  * costs O(k) executor memory here instead of one multi-GB row.
  *
  * Partial-aggregable: map-side combine merges two heaps, so per-task
  * state is ≤ k longs per group at every stage. Deterministic: the k
  * smallest values (duplicates kept, like collect_list), emitted sorted
  * ascending — the DuckDB mirror is
  * `list_slice(list_sort(list(x)), 1, k)`.
  *
  * Output completeness is detectable by the caller: pair it with
  * `count(*)` — `cnt > size(result)` marks a truncated group. When the
  * true group size is ≤ k the output is EXACTLY the full sorted member
  * list, which is how the small-scale oracle gates stay byte-identical
  * while the 100-TB shape is bounded. */
case class BoundedCollectMin(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedCollectMin.Heap]
  with UnaryLike[Expression] {

  require(k > 0, "bounded_collect_min needs k > 0")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bounded_collect_min needs bigint, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_collect_min"

  override def createAggregationBuffer(): BoundedCollectMin.Heap =
    new BoundedCollectMin.Heap(k)

  override def update(buf: BoundedCollectMin.Heap,
                      input: InternalRow): BoundedCollectMin.Heap = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BoundedCollectMin.Heap,
                     other: BoundedCollectMin.Heap): BoundedCollectMin.Heap = {
    var i = 0
    while (i < other.size) { buf.insert(other.arr(i)); i += 1 }
    buf
  }

  override def eval(buf: BoundedCollectMin.Heap): Any = {
    val out = java.util.Arrays.copyOf(buf.arr, buf.size)
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  override def serialize(buf: BoundedCollectMin.Heap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedCollectMin.Heap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new BoundedCollectMin.Heap(k)
    if (n > h.arr.length) h.arr = new Array[Long](n)
    var i = 0
    // serialized values are already a valid heap layout of size ≤ k
    while (i < n) { h.arr(i) = bb.getLong; i += 1 }
    h.size = n
    h
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedCollectMin =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedCollectMin =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      newChild: Expression): BoundedCollectMin = copy(child = newChild)
}

object BoundedCollectMin {

  /** Size-capped max-heap over a flat long array: insert keeps the k
    * smallest values seen (replace-root when full and v < max). The
    * backing array grows GEOMETRICALLY toward k — a hash-aggregation
    * over millions of small groups must cost O(group size) per buffer,
    * not an eager 8·k bytes each (k defaults to 10⁴: preallocation
    * would turn many-small-groups workloads into 80 KB × groups). */
  final class Heap(val k: Int) {
    var size: Int = 0
    var arr: Array[Long] = new Array[Long](math.min(k, 8))

    private def ensure(): Unit =
      if (size == arr.length && arr.length < k)
        arr = java.util.Arrays.copyOf(arr,
          math.min(k, math.max(arr.length * 2, 8)))

    def insert(v: Long): Unit =
      if (size < k) {
        ensure()
        arr(size) = v
        size += 1
        var i = size - 1
        while (i > 0 && arr((i - 1) / 2) < arr(i)) {
          val p = (i - 1) / 2
          val t = arr(p); arr(p) = arr(i); arr(i) = t
          i = p
        }
      } else if (v < arr(0)) {
        arr(0) = v
        var i = 0
        var cont = true
        while (cont) {
          val l = 2 * i + 1
          val r = 2 * i + 2
          var m = i
          if (l < size && arr(l) > arr(m)) m = l
          if (r < size && arr(r) > arr(m)) m = r
          if (m == i) cont = false
          else {
            val t = arr(m); arr(m) = arr(i); arr(i) = t
            i = m
          }
        }
      }
  }

  /** `id` must be BIGINT (cast at the call site for narrower ids). */
  def apply(id: Column, k: Int): Column =
    MallisparkBridge.column(
      new BoundedCollectMin(MallisparkBridge.expression(id), k)
        .toAggregateExpression())
}
