package graft.order

import graft.model.Position
import graft.functions.GraftFunctions.ux
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column-level ordering and gating primitives for the batch former.
  *
  * The reference keeps a driver-side min-heap ordered by
  * (step, txId, arrivalOrder) and pops everything strictly below the
  * quorum (tx_queue/priority_queue.go, tx_queue.go). In Spark the heap
  * disappears: ordering is declared per micro-batch with orderBy and the
  * pops become filters, so the sort runs distributed and only once, at
  * emission.
  */
object BatchOrder {

  /** position(step,txId) < lit(p), unsigned-correct. Strictly-less is
    * the quorum-cut semantic (tx_queue.go:26-33).
    */
  def posLt(step: Column, txId: Column, p: Position): Column = {
    val s = Position.ux(p.step); val t = Position.ux(p.txId)
    (ux(step) < s) || (ux(step) === s && ux(txId) < t)
  }

  /** position > lit(p) — checkpoint filter (skip already-applied;
    * processor.go:428-445).
    */
  def posGt(step: Column, txId: Column, p: Position): Column = {
    val s = Position.ux(p.step); val t = Position.ux(p.txId)
    (ux(step) > s) || (ux(step) === s && ux(txId) > t)
  }

  /** Global merge order: (step, txId) unsigned, then per-partition
    * arrival (source offset) as the stable tie-break
    * (priority_queue.go:11-15 — the arrival counter).
    */
  def mergeOrder(df: DataFrame): DataFrame =
    df.orderBy(ux(col("step")), ux(col("txId")), col("partitionId"), col("offset"))

  /** Tag changes that violate per-partition order: a change whose
    * position is <= the latest heartbeat previously seen on its own
    * partition (stream order = offset). `carried` is the tracker's
    * last-hb snapshot entering the batch, broadcast-joined; the running
    * max within the batch is a window over arrival order.
    * (reference: reader.go:150-207 — protocol-violation detection.)
    */
  def tagLate(changes: DataFrame, hbs: DataFrame, carried: DataFrame): DataFrame = {
    // Interleave changes and heartbeats per partition by arrival order,
    // carry a running max of heartbeat positions (struct max over a
    // window), then flag changes at/below that running max. The change
    // payload rides THROUGH the union (heartbeat rows carry nulls), so
    // tagging is one window shuffle — no join back on the 3-column
    // source coordinate.
    val hbPos = hbs.select(
      col("tableId"), col("partitionId"), col("offset"),
      struct(ux(col("step")).as("s"), ux(col("txId")).as("t")).as("hb"))
      .withColumn("isHb", lit(true))
    val chg = changes
      .withColumn("hb", lit(null).cast("struct<s:bigint,t:bigint>"))
      .withColumn("isHb", lit(false))
    val w = Window.partitionBy("tableId", "partitionId").orderBy("offset")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carriedHb = carried.select(
      col("tableId").as("ctable"), col("partitionId").as("cpart"),
      struct(ux(col("step")).as("s"), ux(col("txId")).as("t")).as("chb"))
    val last = when(col("runHb").isNull, col("chb"))
      .when(col("chb").isNull, col("runHb"))
      .when(col("runHb") >= col("chb"), col("runHb"))
      .otherwise(col("chb"))
    chg.unionByName(hbPos, allowMissingColumns = true)
      .withColumn("runHb", max(col("hb")).over(w))
      .filter(!col("isHb"))
      .join(broadcast(carriedHb),
        col("tableId") === col("ctable") && col("partitionId") === col("cpart"), "left")
      .withColumn("lastHb", last)
      .withColumn("isLate", col("lastHb").isNotNull &&
        struct(ux(col("step")).as("s"), ux(col("txId")).as("t")) <= col("lastHb"))
      .drop("hb", "isHb", "ctable", "cpart", "chb", "runHb", "lastHb")
  }

  /** Per-partition maxima of a heartbeat frame — the distributed input
    * to the driver-side tracker. Rows: (tableId, partitionId, step, txId).
    */
  def partitionMaxima(hbs: DataFrame): DataFrame =
    hbs.groupBy(col("tableId"), col("partitionId"))
      .agg(max(struct(ux(col("step")).as("us"), ux(col("txId")).as("ut"),
        col("step"), col("txId"))).as("m"))
      .select(col("tableId"), col("partitionId"),
        col("m.step").as("step"), col("m.txId").as("txId"))
}
