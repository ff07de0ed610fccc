package graft

/** Dev utility: time named queries at an sf dir.
  * sbt "runMain graft.TimeQ [sfDir] q1 q2 ..."
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val (dir, names) =
      if (args.nonEmpty && args.head.startsWith("/")) (args.head, args.tail)
      else ("/root/testdata/sf0.1", args)
    val spark = GraftSession.get("32")
    // SPARK_GRAFT_TIMEQ_JOBS=1: print every job's wall time + trigger
    // site, to attribute a query's cost to its constituent jobs
    // SPARK_GRAFT_TIMEQ_STAGES=1: per-stage wall time, task count and
    // shuffle bytes — the job view hides where a multi-stage AQE job
    // spends its time
    if (sys.env.contains("SPARK_GRAFT_TIMEQ_STAGES")) {
      import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val ms = for {
            s <- si.submissionTime; c <- si.completionTime
          } yield c - s
          val m = si.taskMetrics
          val site = si.details.linesIterator.map(_.trim)
            .find(l => l.startsWith("graft.") && !l.startsWith("graft.TimeQ"))
            .getOrElse("")
          if (ms.exists(_ >= 100)) {
            println(f"[timeq.stage] id=${si.stageId}%-4d ${ms.get / 1e3}%6.2f s" +
              f" tasks=${si.numTasks}%-3d in=${m.inputMetrics.bytesRead / 1048576}%4dM" +
              f" sr=${m.shuffleReadMetrics.totalBytesRead / 1048576}%4dM" +
              f" sw=${m.shuffleWriteMetrics.bytesWritten / 1048576}%4dM" +
              f" cpu=${m.executorCpuTime / 1e9}%7.1f  ${si.name.take(40)} $site")
            if (sys.env.contains("SPARK_GRAFT_TIMEQ_STAGES_FULL") &&
                ms.exists(_ >= 1000))
              println(si.details.linesIterator.take(14)
                .map("[timeq.detail]   " + _).mkString("\n"))
          }
        }
      })
    }
    if (sys.env.contains("SPARK_GRAFT_TIMEQ_JOBS")) {
      import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
      spark.sparkContext.addSparkListener(new SparkListener {
        private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
        override def onJobStart(js: SparkListenerJobStart): Unit = {
          // first graft frame across the job's stages — names the
          // operator that triggered the job, which callSite.short
          // (absent under the noop sink) does not
          val site = js.stageInfos.iterator
            .flatMap(_.details.linesIterator)
            .map(_.trim)
            .find(l => l.startsWith("graft.") && !l.startsWith("graft.TimeQ"))
            .getOrElse(Option(js.properties)
              .flatMap(p => Option(p.getProperty("callSite.short")))
              .getOrElse("?"))
          starts.put(js.jobId, (System.nanoTime(), site))
        }
        override def onJobEnd(je: SparkListenerJobEnd): Unit = {
          Option(starts.remove(je.jobId)).foreach { case (t0, site) =>
            println(f"[timeq.job] id=${je.jobId}%-4d ${(System.nanoTime() - t0) / 1e9}%6.2f s  $site")
          }
        }
      })
    }
    for (q <- names) {
      val t0 = System.nanoTime()
      // noop sink, not count(): count() lets Catalyst prune
      // row-preserving joins and final projections (Bench.scala's
      // rationale) — TimeQ must time what the bench times
      SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[timeq] $q%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
