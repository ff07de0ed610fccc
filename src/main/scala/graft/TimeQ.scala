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
    for (q <- names) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, dir).count()
      println(f"[timeq] $q%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    spark.stop()
  }
}
