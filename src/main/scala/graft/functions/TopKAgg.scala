package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.GraftShims
import org.apache.spark.sql.types._

/** Bounded top-k aggregation state: a k-capped min-heap whose head is
  * the current WORST kept entry (smallest ord; ties prefer evicting
  * the larger id, so the kept set is exactly the first k of the
  * (ord desc, id asc) order). O(k) memory per group per task.
  */
final class TopKBuffer(val k: Int) {
  val heap: scala.collection.mutable.PriorityQueue[(Long, Long)] =
    scala.collection.mutable.PriorityQueue.empty[(Long, Long)](
      TopKBuffer.bestFirst)
  def add(o: Long, i: Long): Unit = {
    if (heap.size < k) heap.enqueue((o, i))
    else {
      val w = heap.head
      if (o > w._1 || (o == w._1 && i < w._2)) {
        heap.dequeue(); heap.enqueue((o, i))
      }
    }
  }
}

object TopKBuffer {
  /** As an ascending sort this is (ord desc, id asc) — best first; as
    * the priority-queue ordering its maximum (the heap head) is the
    * worst kept entry. One explicit comparator for both — keying on
    * `(-ord, id)` would break at ord = Long.MinValue, where arithmetic
    * negation is the identity and the heap invariant inverts.
    */
  val bestFirst: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
    def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val c = java.lang.Long.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }
}

/** Native per-group top-k: `graft_topk(ord, id, k)` keeps the k
  * largest (ord, id) pairs per group — ord descending, ties broken by
  * the SMALLEST id — and evaluates to the sorted
  * array<struct<ord, id>>.
  *
  * The point versus the window formulation
  * (`row_number() OVER (PARTITION BY g ORDER BY ord DESC) <= k`): a
  * window must shuffle EVERY row to its group's partition and sort
  * the whole group; an aggregate is PARTIAL — each map task reduces
  * its slice to ≤ k entries per group before the exchange, so the
  * shuffle carries O(groups·k) per task no matter how hot a group is,
  * and no per-group full sort ever happens. That is the difference
  * between a skew-prone sort and a scan at 100 TB.
  *
  * State is a k-capped heap (TypedImperativeAggregate —
  * ObjectHashAggregate at execution); both inputs must be BIGINT (the
  * library's integer-quantization convention: money in cents, sims in
  * micro-units).
  */
case class TopKPairsAgg(ord: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(ord, id)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKPairsAgg.OutType
  override def nodeName: String = "graft_topk"

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1) TypeCheckResult.TypeCheckFailure(s"k must be >= 1, got $k")
    else if (ord.dataType != LongType || id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk expects (BIGINT, BIGINT), got " +
          s"(${ord.dataType.simpleString}, ${id.dataType.simpleString})")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, row: InternalRow): TopKBuffer = {
    val o = ord.eval(row)
    val i = id.eval(row)
    if (o != null && i != null)
      b.add(o.asInstanceOf[Long], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.heap.foreach(e => b.add(e._1, e._2))
    b
  }

  override def eval(b: TopKBuffer): Any = {
    val sorted = b.heap.toArray.sorted(TopKBuffer.bestFirst)
    new GenericArrayData(sorted.map(e => InternalRow(e._1, e._2)))
  }

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val arr = b.heap.toArray
    val buf = ByteBuffer.allocate(8 + 16 * arr.length)
    buf.putInt(b.k)
    buf.putInt(arr.length)
    arr.foreach { e => buf.putLong(e._1); buf.putLong(e._2) }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val buf = ByteBuffer.wrap(bytes)
    val b = new TopKBuffer(buf.getInt)
    val n = buf.getInt
    (0 until n).foreach(_ => b.add(buf.getLong, buf.getLong))
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairsAgg =
    copy(ord = newChildren(0), id = newChildren(1))
}

object TopKPairsAgg {
  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("ord", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  /** Column API: use inside `.agg(...)` like any aggregate. */
  def topkPairs(ord: Column, id: Column, k: Int): Column =
    GraftShims.column(TopKPairsAgg(
      GraftShims.expression(ord), GraftShims.expression(id), k)
      .toAggregateExpression())
}
