package graft

import graft.functions.GraftFunctions
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Native codegen'd expressions must agree exactly with their
  * built-in higher-order-function formulations (which in turn match
  * the DuckDB oracles).
  */
class NativeExprSpec extends SparkSpec {
  import spark.implicits._

  test("native portable hash == HOF portable hash (incl edge cases)") {
    val samples = Seq("", "a", "hello world", "the quick brown fox 123",
      "x" * 500, "punct!@# and spaces  ", "MiXeD Case") ++
      (0 until 200).map(i => new scala.util.Random(i).alphanumeric.take(i % 40).mkString)
    val df = samples.toDF("s")
      .select(col("s"), GraftFunctions.portableHash(col("s")).as("native"),
        GraftFunctions.portableHashHof(col("s")).as("hof"))
    val bad = df.filter(col("native") =!= col("hof")).collect()
    assert(bad.isEmpty, bad.take(3).mkString(","))
  }

  test("native dot == HOF dot, and both survive codegen pipelines") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 100).map { _ =>
      (Seq.fill(64)(rnd.nextLong() % 1000), Seq.fill(64)(rnd.nextLong() % 1000))
    }
    val df = rows.toDF("a", "b")
      .select(Similarity.dotI(col("a"), col("b")).as("native"),
        Similarity.dotIHof(col("a"), col("b")).as("hof"))
    assert(df.filter(col("native") =!= col("hof")).isEmpty)
  }

  test("null propagation") {
    val df = Seq(Option.empty[String], Some("x")).toDF("s")
      .select(GraftFunctions.portableHash(col("s")).as("h"))
    val got = df.collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    assert(got(0) == null && got(1) == 120L % GraftFunctions.PhMod)
  }
}
