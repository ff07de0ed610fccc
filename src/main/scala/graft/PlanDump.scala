package graft

/** Dev utility: write each named query's full explain("formatted")
  * to <outDir>/<query>_<tag>.txt — the before/after plan evidence the
  * optimization rounds commit under plans/rNN/.
  *
  * sbt "runMain graft.PlanDump <outDir> <tag> [sfDir] q1 q2 ..."
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> [sfDir] q...")
    val outDir = args(0)
    val tag = args(1)
    val (dir, names) =
      if (args(2).startsWith("/")) (args(2), args.drop(3).toSeq)
      else ("/root/testdata/sf0.1", args.drop(2).toSeq)
    val spark = GraftSession.get()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${n}_$tag.txt"), plan)
      println(s"[plandump] wrote $outDir/${n}_$tag.txt")
    }
    spark.stop()
  }
}
