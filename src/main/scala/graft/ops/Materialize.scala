package graft.ops

import org.apache.spark.sql.DataFrame

/** The one materialization seam for operators that must hand back a
  * frame which OWNS its rows (lineage cut, upstream pins releasable)
  * without funneling anything through the driver.
  *
  * Three config-selected routes, all returning the same rows:
  *
  *   - `local` (default): `localCheckpoint(eager)` — fastest, blocks
  *     live in executor storage. The right call on a stable cluster
  *     (and in local mode), but the blocks DIE WITH THEIR EXECUTOR:
  *     under aggressive dynamic allocation or preemption, an executor
  *     loss after the cut makes downstream actions fail
  *     unrecoverably (no lineage left to recompute).
  *   - `reliable`: `checkpoint(eager)` to the SparkContext checkpoint
  *     directory (HDFS/object store) — survives executor loss;
  *     requires `sparkContext.setCheckpointDir` (fails loudly if
  *     unset).
  *   - `parquet`: stage to `spark.graft.materialize.dir` as parquet
  *     and read back — survives executor AND driver loss, and the
  *     staged copy is a plain table other tools can inspect. Column
  *     nullability widens to parquet's (data identical); staged
  *     subdirectories are scratch state the deployment's retention
  *     job clears.
  *
  * Every route is selected at CALL time from the session conf
  * `spark.graft.materialize` — one deployment-level switch flips all
  * of the library's cut points (DSIR weights, BM25 posting lists, the
  * two-level rank, PageRank's return path) from speed to resilience
  * with zero code change. The lineage SHAPE upstream of the cut is
  * identical on every route.
  */
object Materialize {

  /** Session conf key: `local` (default) | `reliable` | `parquet`. */
  val ModeKey = "spark.graft.materialize"

  /** Staging root for `parquet` mode (required when selected). */
  val DirKey = "spark.graft.materialize.dir"

  private val counter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Every staged cut dir this JVM created, newest last — the
    * session-scoped manifest [[vacuum]] sweeps. (Dirs from crashed
    * sessions are swept by the same vacuum via their filesystem
    * modification time.)
    */
  private val staged =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** Materialize `df` eagerly through the configured route and return
    * a frame that owns its rows.
    */
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.get(ModeKey, "local") match {
      case "local" => df.localCheckpoint(true)
      case "reliable" =>
        require(spark.sparkContext.getCheckpointDir.isDefined,
          s"$ModeKey=reliable needs sparkContext.setCheckpointDir " +
            "(an HDFS/object-store path every executor can reach)")
        df.checkpoint(true)
      case "parquet" =>
        val root = spark.conf.getOption(DirKey).getOrElse(
          throw new IllegalArgumentException(
            s"$ModeKey=parquet needs $DirKey (a staging root every " +
              "executor can reach)"))
        // unique per cut: JVM-wide counter + a UUID so two sessions
        // sharing a staging root can never collide
        val dir = s"$root/stage-${counter.incrementAndGet()}-" +
          java.util.UUID.randomUUID().toString
        df.write.parquet(dir)
        staged.add(dir)
        // read back under the PINNED schema: inference would fail
        // outright on an empty frame (zero part files) and could
        // widen types; with the schema pinned the cut round-trips
        // every frame. One residue remains: file sources force user
        // schemas nullable (and `.to` refuses to narrow), so the
        // parquet route widens nullability to df.schema.asNullable —
        // rows identical, spec-asserted in MaterializeSpec
        spark.read.schema(df.schema).parquet(dir)
      case other => throw new IllegalArgumentException(
        s"$ModeKey must be local|reliable|parquet, got '$other'")
    }
  }

  /** Garbage-collect parquet-route staging dirs older than
    * `olderThanMs` (by filesystem modification time) under this
    * session's current staging root — both dirs registered by this
    * JVM and `stage-*` leftovers from crashed sessions. The same
    * retention contract as [[graft.sink.TransactionalStore.vacuum]]:
    * callers pick a window longer than any job still reading a cut
    * (a cut's frame reads its staged files lazily — vacuuming a LIVE
    * cut's dir breaks that frame, exactly like vacuuming a snapshot a
    * reader still holds). Returns the number of dirs removed.
    */
  def vacuum(spark: org.apache.spark.sql.SparkSession,
      olderThanMs: Long): Int = {
    require(olderThanMs >= 0, s"need olderThanMs >= 0, got $olderThanMs")
    val root = spark.conf.getOption(DirKey).getOrElse(
      throw new IllegalArgumentException(
        s"Materialize.vacuum needs $DirKey set (the staging root to sweep)"))
    val cutoff = System.currentTimeMillis() - olderThanMs
    val hconf = spark.sparkContext.hadoopConfiguration
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(hconf)
    if (!fs.exists(rootPath)) return 0
    var removed = 0
    fs.listStatus(rootPath).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && name.startsWith("stage-") &&
          st.getModificationTime < cutoff) {
        if (fs.delete(st.getPath, true)) {
          removed += 1
          staged.remove(st.getPath.toUri.getPath)
          staged.remove(root + "/" + name) // registered-form path
        }
      }
    }
    removed
  }

  /** The staged dirs this JVM has created and not yet vacuumed —
    * observability for deployments wiring [[vacuum]] into a
    * maintenance job.
    */
  def stagedDirs: Seq[String] = {
    import scala.jdk.CollectionConverters._
    staged.iterator().asScala.toSeq
  }
}
