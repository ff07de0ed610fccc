package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The standing-state conventions shared by every streaming gate
  * ([[IngestGate]], [[SpanGate]], [[SentenceGate]]) — extracted once
  * so the next filesystem or commit-protocol edge case (like the
  * java.io.File probe caught in round 6) gets fixed in one place:
  *
  *   - `<data>/batch=<n>/` overwrite-idempotent Hive partitions: a
  *     replayed batch OVERWRITES its own directory, and every
  *     standing-state read filters `batch < n`, so a half-written
  *     previous attempt is neither probed nor double-counted —
  *     effectively-once without a manifest.
  *   - `base/gen=<g>/` + `base/META` ("<gen> <upTo>"): the compacted
  *     base, BUCKETED by the probe key and registered in the session
  *     catalog so the big side of every probe join scans with NO
  *     Exchange; the META rename is the commit point (atomic on
  *     HDFS/local; an object store swaps it for a conditional put).
  *   - compaction folds every batch partition strictly below
  *     `min(max id present, currentBatchId)` — the newest partition
  *     never folds (it is the only one a stream restart can replay),
  *     and the caller's committed position keeps an orphaned
  *     future-id dir from inflating the watermark. Idempotent and
  *     crash-safe: a crash before the META rename leaves the old
  *     generation live, a crash after leaves folded dirs the reads
  *     ignore and [[vacuum]] reclaims.
  *   - vacuum removes folded data dirs, data/verdict dirs beyond the
  *     committed high-water mark, and superseded generations (their
  *     catalog entries too).
  *
  * `dataSchema` lists the gate's state columns WITHOUT the `batch`
  * partition column; `foldMerge` is the gate's fold semantics over
  * (dataSchema ++ batch) rows — identity for an append-only index,
  * a per-key sum/min re-aggregation for counting state.
  */
private[streaming] final class GateStateStore(spark: SparkSession,
    stateDir: String, dataSubdir: String, tablePrefix: String,
    dataSchema: StructType, bucketCol: String, numBuckets: Int,
    foldMerge: DataFrame => DataFrame = identity) {

  val dataDir = s"$stateDir/$dataSubdir"
  val verdictsDir = s"$stateDir/verdicts"
  private val baseDir = s"$stateDir/base"
  private val metaPath = s"$baseDir/META"

  private val dataCols: Seq[String] = dataSchema.fields.map(_.name).toSeq

  private def fs(dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def listIds(dir: String, prefix: String): Seq[Long] = {
    val (f, p) = fs(dir)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(prefix))
      .map(_.stripPrefix(prefix).toLong)
  }

  def dataBatchIds(): Seq[Long] = listIds(dataDir, "batch=")

  /** (generation, upTo): the compacted base covers batches < upTo.
    * (0, 0) before the first compaction.
    */
  def readMeta(): (Long, Long) = {
    val (f, _) = fs(baseDir)
    val mp = new org.apache.hadoop.fs.Path(metaPath)
    if (!f.exists(mp)) (0L, 0L)
    else {
      val in = f.open(mp)
      val txt = try scala.io.Source.fromInputStream(in).mkString.trim
      finally in.close()
      // a truncated/empty META is possible on stores without the
      // rename-swap's atomicity (object stores before the documented
      // conditional-put substitution) — that is state CORRUPTION an
      // operator must see by name, not an opaque MatchError that
      // reads as a code bug (round-16 fix)
      def corrupt() = throw new IllegalStateException(
        s"corrupt gate-state META at $metaPath: expected " +
          s"'<generation> <upTo>', got '${txt.take(80)}' — the " +
          "state dir needs operator repair (restore META from the " +
          "latest gen=<g> directory present)")
      txt.split(" ") match {
        case Array(g, u) =>
          // toLong guarded too: a torn/duplicated write can produce
          // an all-digit string LONGER than a Long, which must fail
          // by the same name, not a raw NumberFormatException
          def num(s: String): Long =
            scala.util.Try(s.toLong).filter(_ >= 0L)
              .getOrElse(corrupt())
          (num(g), num(u))
        case _ => corrupt()
      }
    }
  }

  private def writeMeta(gen: Long, upTo: Long): Unit = {
    val (f, _) = fs(baseDir)
    val tmp = new org.apache.hadoop.fs.Path(s"$metaPath.tmp")
    val out = f.create(tmp, true)
    try out.write(s"$gen $upTo".getBytes("UTF-8")) finally out.close()
    // rename-swap commit (atomic on HDFS/local; an object-store
    // deployment swaps this for a conditional put, like the CDC
    // manifest head)
    val mp = new org.apache.hadoop.fs.Path(metaPath)
    if (f.exists(mp)) f.delete(mp, false)
    require(f.rename(tmp, mp), s"could not commit $metaPath")
  }

  /** Catalog name of a base generation's bucketed table — derived
    * from the state dir so two gates in one session never collide.
    */
  private def baseTableName(gen: Long): String =
    s"${tablePrefix}_${math.abs(stateDir.hashCode.toLong)}_g$gen"

  private def genPath(gen: Long): String = s"$baseDir/gen=$gen"

  /** The base generation's DataFrame, (re-)registering the external
    * bucketed table if this session's catalog has not seen it (a
    * fresh session reading existing state).
    */
  def baseTable(gen: Long): DataFrame = {
    val tbl = baseTableName(gen)
    if (!spark.catalog.tableExists(tbl)) {
      val cols = (dataSchema.fields.map(f =>
        s"${f.name} ${f.dataType.sql}") :+ "batch BIGINT").mkString(", ")
      spark.sql(
        s"""CREATE TABLE $tbl ($cols)
           |USING PARQUET
           |CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol)
           |  INTO $numBuckets BUCKETS
           |LOCATION '${genPath(gen)}'""".stripMargin)
    }
    spark.table(tbl)
  }

  /** The committed base, if any compaction has committed — the
    * bucketed big side of the probe join.
    */
  def baseIndex(): Option[DataFrame] = {
    val (gen, _) = readMeta()
    if (gen > 0L) Some(baseTable(gen)) else None
  }

  /** Fold every data partition strictly below min(max id present,
    * currentBatchId) into the next bucketed base generation through
    * `foldMerge`. Returns the new watermark (exclusive).
    */
  def compact(currentBatchId: Long = Long.MaxValue): Long = {
    val ids = dataBatchIds()
    val (gen, upTo) = readMeta()
    if (ids.isEmpty) return upTo
    val newUpTo = math.min(ids.max, currentBatchId)
    val fold = ids.filter(i => i >= upTo && i < newUpTo).sorted
    if (fold.isEmpty) return upTo
    val foldDf = spark.read.option("basePath", dataDir)
      .parquet(fold.map(i => s"$dataDir/batch=$i"): _*)
      .select((dataCols.map(col) :+
        col("batch").cast("long").as("batch")): _*)
    val all = if (gen > 0L) baseTable(gen).unionByName(foldDf) else foldDf
    val newGen = gen + 1
    val tbl = baseTableName(newGen)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val (f, _) = fs(baseDir)
    f.delete(new org.apache.hadoop.fs.Path(genPath(newGen)), true)
    foldMerge(all).write.format("parquet")
      .bucketBy(numBuckets, bucketCol).sortBy(bucketCol)
      .option("path", genPath(newGen))
      .saveAsTable(tbl)
    writeMeta(newGen, newUpTo)
    newUpTo
  }

  /** Reclaim state no probe can reach: data dirs already folded into
    * the base, data AND verdict dirs beyond the committed high-water
    * mark (crashed attempts of a rolled-back stream), and superseded
    * base generations. Returns the number of directories removed.
    */
  def vacuum(currentBatchId: Long): Int = {
    val (gen, upTo) = readMeta()
    var removed = 0
    def rm(dir: String): Unit = {
      val (f, p) = fs(dir)
      if (f.exists(p)) { f.delete(p, true); removed += 1 }
    }
    dataBatchIds()
      .filter(i => i < upTo || i > currentBatchId)
      .foreach(i => rm(s"$dataDir/batch=$i"))
    listIds(verdictsDir, "batch=")
      .filter(_ > currentBatchId)
      .foreach(i => rm(s"$verdictsDir/batch=$i"))
    listIds(baseDir, "gen=").filter(_ != gen).foreach { g =>
      spark.sql(s"DROP TABLE IF EXISTS ${baseTableName(g)}")
      rm(genPath(g))
    }
    removed
  }

  /** The standing-state sides batch `batchId` must probe, as
    * SEPARATE frames: the committed base (bucketed — joins against
    * it need no Exchange) filtered to `batch < batchId`, and the
    * not-yet-folded recent batch partitions. Probing them separately
    * keeps the bucketed side's scan-without-shuffle property — a
    * union would erase the bucketing for the whole join. Both frames
    * project exactly `dataSchema`'s columns. Empty before the first
    * admitted batch.
    */
  def sources(batchId: Long): Seq[DataFrame] = {
    val (gen, upTo) = readMeta()
    val base =
      if (gen > 0L)
        Some(baseTable(gen).filter(col("batch") < batchId)
          .select(dataCols.map(col): _*))
      else None
    val recentIds = dataBatchIds().filter(i => i >= upTo && i < batchId)
    val recent =
      if (recentIds.nonEmpty)
        Some(spark.read.option("basePath", dataDir).parquet(dataDir)
          .filter(col("batch") >= upTo && col("batch") < batchId)
          .select(dataCols.map(col): _*))
      else None
    base.toSeq ++ recent.toSeq
  }

  /** [[sources]] as one frame (an empty dataSchema frame when there
    * is no standing state yet) — for gates whose probe is a
    * semi-join, where the union still prunes bucket-side scans.
    */
  def sourcesUnion(batchId: Long): DataFrame =
    sources(batchId) match {
      case Nil => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], dataSchema)
      case srcs => srcs.reduce(_ unionByName _)
    }

  /** The shared foreachBatch wiring: run the gate's `apply` for each
    * micro-batch, then (optionally, every n batches) the maintenance
    * pass AFTER the batch's own writes with `currentBatchId = id` —
    * the newest batch dir always survives for replay, and a restart
    * that re-runs a batch re-runs an idempotent compaction.
    */
  def start(docs: DataFrame, checkpointDir: String, compactEvery: Int)(
      apply: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        apply(b, id)
        if (compactEvery > 0 && id > 0 && id % compactEvery == 0) {
          compact(currentBatchId = id)
          vacuum(currentBatchId = id)
        }
        ()
      }
      .start()
}
