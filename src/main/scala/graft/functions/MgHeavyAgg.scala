package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.GraftShims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter summary state: at most `cap` keyed
  * counters plus the accumulated decrement total `err`. The classic
  * invariant: for every key, residual ≤ true count ≤ residual + err,
  * and any key whose true count exceeds `err` IS in the summary —
  * `err` only grows by 1 per full-summary eviction sweep (amortized
  * O(1) per row) and by the subtraction threshold per merge shrink
  * (Agarwal et al. 2012, "Mergeable Summaries").
  */
final class MgBuffer(val cap: Int) {
  val m: scala.collection.mutable.HashMap[String, Long] =
    scala.collection.mutable.HashMap.empty
  var err: Long = 0L

  def add(k: String, w: Long): Unit = {
    val cur = m.getOrElse(k, 0L)
    if (cur > 0L || m.size < cap) m.update(k, cur + w)
    else {
      // full and key absent: one eviction sweep pays for `cap`
      // arrivals — decrement everything, drop zeros, count the loss
      val dec = math.min(w, m.values.min)
      err += dec
      val it = m.iterator.toArray
      it.foreach { case (kk, c) =>
        if (c - dec <= 0L) m.remove(kk) else m.update(kk, c - dec)
      }
      val rest = w - dec
      if (rest > 0L) add(k, rest)
    }
  }

  /** Shrink after a merge: subtract the (cap+1)-th largest residual
    * from every counter, dropping non-positives — the mergeable-MG
    * step, error grows by exactly the subtracted threshold.
    */
  def shrink(): Unit = if (m.size > cap) {
    val t = m.values.toArray.sorted(Ordering[Long].reverse).apply(cap)
    err += t
    val it = m.iterator.toArray
    it.foreach { case (kk, c) =>
      if (c - t <= 0L) m.remove(kk) else m.update(kk, c - t)
    }
  }
}

/** Native mergeable heavy-hitter aggregate:
  * `graft_heavy(key, cap)` reduces a STRING key stream to at most
  * `cap` candidate counters per task before the exchange — the
  * shuffle carries O(cap) per task no matter how many distinct keys
  * the corpus holds, which is the difference between a bounded
  * summary and shuffling a TB-scale key space.
  *
  * Evaluates to struct(err, items: array<struct<key, cnt>>): `cnt`
  * is the RESIDUAL (candidacy evidence, not an exact count; true
  * count ∈ [cnt, cnt + err]), and every key with true count > err is
  * guaranteed present. [[graft.ops.Sketch.heavyHittersExact]] turns
  * the candidates into exact guaranteed top-k with one more scan.
  */
case class MgHeavyAgg(key: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] {

  override def children: Seq[Expression] = Seq(key)
  override def nullable: Boolean = false
  override def dataType: DataType = MgHeavyAgg.OutType
  override def nodeName: String = "graft_heavy"

  override def checkInputDataTypes(): TypeCheckResult =
    if (cap < 1) TypeCheckResult.TypeCheckFailure(s"cap must be >= 1, got $cap")
    else if (key.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_heavy expects a STRING key, got ${key.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(cap)

  override def update(b: MgBuffer, row: InternalRow): MgBuffer = {
    val k = key.eval(row)
    if (k != null) b.add(k.asInstanceOf[UTF8String].toString, 1L)
    b
  }

  override def merge(b: MgBuffer, other: MgBuffer): MgBuffer = {
    other.m.foreach { case (k, c) =>
      b.m.update(k, b.m.getOrElse(k, 0L) + c)
    }
    b.err += other.err
    b.shrink()
    b
  }

  override def eval(b: MgBuffer): Any = {
    val items = b.m.toArray.sortBy { case (k, c) => (-c, k) }
      .map { case (k, c) =>
        InternalRow(UTF8String.fromString(k), c)
      }
    InternalRow(b.err, new GenericArrayData(items))
  }

  override def serialize(b: MgBuffer): Array[Byte] = {
    val entries = b.m.toArray.map { case (k, c) =>
      (k.getBytes(StandardCharsets.UTF_8), c)
    }
    val size = 8 + 4 + 4 + entries.map(e => 4 + e._1.length + 8).sum
    val buf = ByteBuffer.allocate(size)
    buf.putLong(b.err)
    buf.putInt(b.cap)
    buf.putInt(entries.length)
    entries.foreach { case (kb, c) =>
      buf.putInt(kb.length); buf.put(kb); buf.putLong(c)
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val buf = ByteBuffer.wrap(bytes)
    val err = buf.getLong
    val b = new MgBuffer(buf.getInt)
    b.err = err
    val n = buf.getInt
    (0 until n).foreach { _ =>
      val kb = new Array[Byte](buf.getInt)
      buf.get(kb)
      b.m.update(new String(kb, StandardCharsets.UTF_8), buf.getLong)
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): MgHeavyAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MgHeavyAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MgHeavyAgg =
    copy(key = newChildren(0))
}

object MgHeavyAgg {
  val OutType: DataType = StructType(Seq(
    StructField("err", LongType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
      containsNull = false), nullable = false)))

  /** Column API: use inside `.agg(...)` like any aggregate. */
  def mgSummary(key: Column, cap: Int): Column =
    GraftShims.column(MgHeavyAgg(GraftShims.expression(key), cap)
      .toAggregateExpression())
}
