package graft

import graft.merge.LwwMerge
import graft.model.{ChangeRecord, Op}
import org.apache.spark.sql.functions._

/** LWW merge semantics ported from the reference's update-folding
  * golden tests (dst_table/gen_query_test.go): same-key merge keeps the
  * later column values, erase clears accumulated columns, update after
  * erase cancels the delete, the last op decides upsert vs delete, and
  * the arrival tie-break resolves equal positions.
  */
class LwwMergeSpec extends SparkSpec {
  import spark.implicits._

  private def chg(key: String, step: Long, tx: Long, op: Int,
      cols: Map[String, String], part: Long = 0, off: Long = 0) =
    ChangeRecord(0, part, off, Seq(key), cols, step, tx, op)

  private def mergeOf(cs: ChangeRecord*): Map[String, (Int, Map[String, String])] =
    LwwMerge.merge(cs.toSeq.toDF())
      .collect()
      .map(r => r.getAs[Seq[String]]("keyJson").head ->
        (r.getAs[Int]("op"), Option(r.getAs[Map[String, String]]("columns"))
          .getOrElse(Map.empty)))
      .toMap

  test("later update overlays columns; untouched columns survive") {
    val m = mergeOf(
      chg("1", 1, 1, Op.Update, Map("a" -> "1", "b" -> "x"), off = 0),
      chg("1", 2, 1, Op.Update, Map("b" -> "y"), off = 1))
    assert(m("1") == (Op.Update, Map("a" -> "1", "b" -> "y")))
  }

  test("erase clears previous columns and wins as final op") {
    val m = mergeOf(
      chg("1", 1, 1, Op.Update, Map("a" -> "1"), off = 0),
      chg("1", 2, 1, Op.Erase, Map.empty, off = 1))
    assert(m("1") == (Op.Erase, Map.empty[String, String]))
  }

  test("update after erase cancels the delete, drops pre-erase columns") {
    val m = mergeOf(
      chg("1", 1, 1, Op.Update, Map("a" -> "1", "b" -> "x"), off = 0),
      chg("1", 2, 1, Op.Erase, Map.empty, off = 1),
      chg("1", 3, 1, Op.Update, Map("b" -> "z"), off = 2))
    assert(m("1") == (Op.Update, Map("b" -> "z")))
  }

  test("arrival order breaks ties at equal (step, txId)") {
    val m = mergeOf(
      chg("1", 5, 5, Op.Update, Map("a" -> "first"), part = 0, off = 3),
      chg("1", 5, 5, Op.Update, Map("a" -> "second"), part = 0, off = 7))
    assert(m("1") == (Op.Update, Map("a" -> "second")))
  }

  test("unsigned 64-bit steps: uint64 max beats small steps") {
    val m = mergeOf(
      chg("1", -1L /* 2^64-1 */, 1, Op.Update, Map("a" -> "huge"), off = 0),
      chg("1", 3, 1, Op.Update, Map("a" -> "small"), off = 1))
    assert(m("1") == (Op.Update, Map("a" -> "huge")))
  }

  test("keys are independent; counts preserved") {
    val out = LwwMerge.merge(Seq(
      chg("1", 1, 1, Op.Update, Map("a" -> "1")),
      chg("2", 1, 2, Op.Erase, Map.empty),
      chg("1", 2, 1, Op.Update, Map("a" -> "2"))).toDF())
    assert(out.count() == 2)
    val n = out.filter(array_contains(col("keyJson"), "1"))
      .select("nChanges").head().getLong(0)
    assert(n == 2)
  }

  test("mergeTyped produces the same result as the DataFrame fold") {
    val events = Seq(
      chg("1", 1, 1, Op.Update, Map("a" -> "1", "b" -> "x"), off = 0),
      chg("1", 2, 1, Op.Erase, Map.empty, off = 1),
      chg("1", 3, 1, Op.Update, Map("b" -> "z"), off = 2),
      chg("2", 5, 5, Op.Update, Map("a" -> "q"), part = 1, off = 0),
      chg("3", 1, 1, Op.Erase, Map.empty, off = 3))
    val df = events.toDF()
    def normalize(out: org.apache.spark.sql.DataFrame) =
      out.collect().map(r => (
        r.getAs[scala.collection.Seq[String]]("keyJson").head,
        r.getAs[Int]("op"), r.getAs[Long]("step"), r.getAs[Long]("txId"),
        Option(r.getAs[Map[String, String]]("columns")).getOrElse(Map.empty),
        r.getAs[Long]("nChanges"))).toSet
    assert(normalize(LwwMerge.merge(df)) == normalize(LwwMerge.mergeTyped(df)))
  }

  test("typed Aggregator agrees with the DataFrame fold") {
    val events = Seq(
      chg("1", 1, 1, Op.Update, Map("a" -> "1", "b" -> "x"), off = 0),
      chg("1", 2, 1, Op.Erase, Map.empty, off = 1),
      chg("1", 3, 1, Op.Update, Map("b" -> "z"), off = 2),
      chg("1", 3, 1, Op.Update, Map("c" -> "w"), off = 3))
    val agg = new LwwMerge.LwwAggregator(0, Seq("1"))
    // fold in a scrambled order — the buffer must be order-free
    val scrambled = Seq(events(2), events(0), events(3), events(1))
    val buf = scrambled.foldLeft(agg.zero)(agg.reduce)
    val fin = agg.finish(buf)
    assert(fin.op == Op.Update)
    assert(fin.columns == Map("b" -> "z", "c" -> "w"))
    // and split-merge agrees
    val (l, r) = scrambled.splitAt(2)
    val fin2 = agg.finish(agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
    assert(fin2.columns == fin.columns && fin2.op == fin.op)
  }
}
