package graft.merge

import graft.model.{ChangeRecord, Op, Position}
import graft.functions.GraftFunctions.ux
import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-key last-write-wins merge with column overlay.
  *
  * Semantics re-expressed from the reference's update folding
  * (dst_table/gen_query.go:378-427):
  *  - events for one key are folded in global merge order
  *    (step, txId, arrival);
  *  - an erase clears every previously accumulated column;
  *  - an update overlays its columns onto the accumulated set;
  *  - the final operation (the op of the last event) decides UPSERT vs
  *    DELETE — an update after a delete cancels the delete and vice
  *    versa.
  *
  * The DataFrame implementation is a SINGLE shuffle: one
  * groupBy(key).collect_list, an in-group sort by position (array_sort
  * with an explicit comparator — the event struct carries a map and is
  * therefore not naturally orderable), and a fold over the sorted
  * events with higher-order functions. All of it stays in codegen; no
  * UDFs. At scale the per-key event list is bounded by the micro-batch
  * size, not the table size.
  */
object LwwMerge {

  /** changes: (tableId, partitionId, offset, keyJson, columns, step,
    * txId, op) → one row per (tableId, keyJson) with the merged state:
    * finalOp, step/txId of the last event, merged `columns`, nChanges.
    */
  def merge(changes: DataFrame): DataFrame = {
    val p = struct(
      ux(col("step")).as("s"), ux(col("txId")).as("t"),
      col("partitionId").as("pp"), col("offset").as("oo"))
    val ev = struct(p.as("p"), col("op").as("op"),
      col("columns").as("columns"), col("step").as("step"), col("txId").as("txId"))

    val grouped = changes
      .groupBy(col("tableId"), col("keyJson"))
      .agg(collect_list(ev).as("evs"), count(lit(1)).as("nChanges"))
      .withColumn("evs", array_sort(col("evs"),
        (l, r) => when(l.getField("p") < r.getField("p"), -1)
          .when(l.getField("p") > r.getField("p"), 1).otherwise(0)))

    // Fold: erase resets; update overlays (later values win per column).
    val empty = map().cast("map<string,string>")
    val folded = aggregate(
      col("evs"),
      struct(lit(Op.Unknown).as("op"), empty.as("cols")),
      (acc, e) => struct(
        e.getField("op").as("op"),
        when(e.getField("op") === Op.Erase, empty)
          .otherwise(map_concat(
            map_filter(acc.getField("cols"),
              (k, _) => !map_contains_key(e.getField("columns"), k)),
            e.getField("columns"))).as("cols")))

    grouped
      .withColumn("m", folded)
      .withColumn("lastEv", element_at(col("evs"), size(col("evs"))))
      .select(
        col("tableId"), col("keyJson"),
        col("m.op").as("op"),
        col("lastEv.step").as("step"),
        col("lastEv.txId").as("txId"),
        col("m.cols").as("columns"),
        // an erase occurred during the batch: even when a later update
        // wins, the destination row's PRE-BATCH columns are dead — the
        // apply must replace, not overlay (log-replay semantics)
        exists(col("evs"), e => e.getField("op") === Op.Erase).as("erased"),
        col("nChanges"))
  }

  /** Typed-path merge: one shuffle via groupByKey + the order-free
    * [[KeyedLwwAggregator]] — a plain JVM fold per key, no HOF
    * interpretation. Output schema matches [[merge]].
    */
  def mergeTyped(changes: DataFrame): DataFrame = {
    val spark = changes.sparkSession
    import spark.implicits._
    val agg = new KeyedLwwAggregator
    changes.select("tableId", "partitionId", "offset", "keyJson",
        "columns", "step", "txId", "op")
      .as[ChangeRecord]
      .groupByKey(c => (c.tableId, c.keyJson))
      .agg(agg.toColumn.name("m"))
      .map { case ((tid, key), m) =>
        Merged(tid, key, m.op, m.step, m.txId, m.columns, m.erased, m.nChanges)
      }
      .toDF()
      .select("tableId", "keyJson", "op", "step", "txId", "columns",
        "erased", "nChanges")
  }

  final case class MergedVals(op: Int, step: Long, txId: Long,
      columns: Map[String, String], erased: Boolean, nChanges: Long)

  /** Key-agnostic form of the LWW buffer fold (see [[LwwAggregator]]
    * for the order-free construction proof obligations).
    */
  final class KeyedLwwAggregator
      extends Aggregator[ChangeRecord, MergeBuf, MergedVals] {
    private val inner = new LwwAggregator(0, Nil)
    def zero: MergeBuf = inner.zero
    def reduce(b: MergeBuf, c: ChangeRecord): MergeBuf = inner.reduce(b, c)
    def merge(a: MergeBuf, b: MergeBuf): MergeBuf = inner.merge(a, b)
    def finish(b: MergeBuf): MergedVals = {
      val m = inner.finish(b)
      MergedVals(m.op, m.step, m.txId, m.columns, m.erased, m.nChanges)
    }
    def bufferEncoder: Encoder[MergeBuf] = Encoders.product[MergeBuf]
    def outputEncoder: Encoder[MergedVals] = Encoders.product[MergedVals]
  }

  // ----- typed Aggregator form (for Dataset / streaming state use) -----

  /** Mergeable buffer: order-free formulation of the same fold.
    * Let E = max position of any erase. A column survives iff its max
    * update position exceeds E; the final op is the op at the overall
    * max position. Buffers combine by taking per-field maxima, so the
    * aggregation is associative and works under Spark's partial
    * aggregation.
    */
  final case class MergeBuf(
      maxPos: (Long, Long, Long, Long),
      maxOp: Int,
      lastStep: Long, lastTxId: Long,
      erasePos: Option[(Long, Long, Long, Long)],
      cols: Map[String, ((Long, Long, Long, Long), String)],
      n: Long)

  final case class Merged(
      tableId: Int, keyJson: Seq[String], op: Int,
      step: Long, txId: Long, columns: Map[String, String],
      erased: Boolean, nChanges: Long)

  private val minP = (Long.MinValue, Long.MinValue, Long.MinValue, Long.MinValue)
  private def posOf(c: ChangeRecord): (Long, Long, Long, Long) =
    (Position.ux(c.step), Position.ux(c.txId), c.partitionId, c.offset)
  private implicit val pOrd: Ordering[(Long, Long, Long, Long)] =
    Ordering.Tuple4(Ordering.Long, Ordering.Long, Ordering.Long, Ordering.Long)

  class LwwAggregator(tableId: Int, keyJson: Seq[String])
      extends Aggregator[ChangeRecord, MergeBuf, Merged] {
    def zero: MergeBuf = MergeBuf(minP, Op.Unknown, 0L, 0L, None, Map.empty, 0L)
    def reduce(b: MergeBuf, c: ChangeRecord): MergeBuf = {
      val p = posOf(c)
      val (mp, mo, ls, lt) =
        if (pOrd.gteq(p, b.maxPos)) (p, c.op, c.step, c.txId)
        else (b.maxPos, b.maxOp, b.lastStep, b.lastTxId)
      val ep = if (c.op == Op.Erase)
        Some(b.erasePos.fold(p)(e => pOrd.max(e, p))) else b.erasePos
      val cols = if (c.op == Op.Update)
        c.columns.foldLeft(b.cols) { case (m, (k, v)) =>
          m.get(k) match {
            case Some((op0, _)) if pOrd.gt(op0, p) => m
            case _ => m.updated(k, (p, v))
          }
        }
      else b.cols
      MergeBuf(mp, mo, ls, lt, ep, cols, b.n + 1)
    }
    def merge(a: MergeBuf, b: MergeBuf): MergeBuf = {
      val (mp, mo, ls, lt) =
        if (pOrd.gteq(a.maxPos, b.maxPos)) (a.maxPos, a.maxOp, a.lastStep, a.lastTxId)
        else (b.maxPos, b.maxOp, b.lastStep, b.lastTxId)
      val ep = (a.erasePos, b.erasePos) match {
        case (Some(x), Some(y)) => Some(pOrd.max(x, y))
        case (x, y) => x.orElse(y)
      }
      val cols = b.cols.foldLeft(a.cols) { case (m, (k, pv)) =>
        m.get(k) match {
          case Some((op0, _)) if pOrd.gteq(op0, pv._1) => m
          case _ => m.updated(k, pv)
        }
      }
      MergeBuf(mp, mo, ls, lt, ep, cols, a.n + b.n)
    }
    def finish(b: MergeBuf): Merged = {
      val e = b.erasePos.getOrElse(minP)
      val cols =
        if (b.maxOp == Op.Erase) Map.empty[String, String]
        else b.cols.collect { case (k, (p, v)) if pOrd.gt(p, e) => k -> v }
      Merged(tableId, keyJson, b.maxOp, b.lastStep, b.lastTxId, cols,
        b.erasePos.nonEmpty, b.n)
    }
    def bufferEncoder: Encoder[MergeBuf] = Encoders.product[MergeBuf]
    def outputEncoder: Encoder[Merged] = Encoders.product[Merged]
  }
}
