package graft

/** Dev utility: interleaved A/B of one session conf over named
  * queries, in ONE JVM so window drift and JIT state cancel out.
  * Each rep times the noop sink (the bench's methodology); reported
  * value = min over reps, alternating A,B,A,B,... per query.
  *
  * tools/run_graft.sh graft.AbConf <confKey> <valA> <valB> <reps> \
  *   <sfDir> q1 q2 ...
  */
object AbConf {
  def main(args: Array[String]): Unit = {
    require(args.length >= 6, "usage: AbConf key valA valB reps sfDir q...")
    val (key, valA, valB) = (args(0), args(1), args(2))
    val reps = args(3).toInt
    val dir = args(4)
    val names = args.drop(5).toSeq
    val spark = GraftSession.get()
    spark.range(2000000L).selectExpr("sum(id)").collect()
    def once(name: String, v: String): Double = {
      spark.conf.set(key, v)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val el = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      el
    }
    for (q <- names) {
      var (a, b) = (Double.MaxValue, Double.MaxValue)
      (1 to reps).foreach { _ =>
        a = math.min(a, once(q, valA))
        b = math.min(b, once(q, valB))
      }
      println(f"[ab] $q%-34s A=$a%7.2f B=$b%7.2f B/A=${b / a}%5.2f")
    }
    spark.stop()
  }
}
