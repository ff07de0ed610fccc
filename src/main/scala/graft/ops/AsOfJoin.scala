package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join as a reusable two-table operator.
  *
  * For every left row, attach the value columns of the LATEST right
  * row with `rightTime <= leftTime` within the same key group
  * (backward mode; a kdb/Pandas `merge_asof`, DuckDB `ASOF JOIN`).
  *
  * Spark has no native as-of join; a naive formulation
  * (`right.t <= left.t` join + max per left row) is a range join that
  * plans as BroadcastNestedLoopJoin and produces O(|L|·|R|/keys)
  * intermediate rows. The scalable shape is UNION + WINDOW:
  *
  *  - tag right rows side=0, left rows side=1, union on
  *    (keys…, time, side, value…);
  *  - one window over `PARTITION BY keys ORDER BY time, side` carries
  *    the last non-null right value forward (`last(value,
  *    ignoreNulls)` over an unbounded-preceding frame);
  *  - keep side=1 rows.
  *
  * ONE shuffle on the keys, intermediate size |L| + |R|, and ties
  * (right.t == left.t) resolve to "right row counts" because side 0
  * sorts before side 1 at equal time — the `<=` contract.
  *
  * Right rows must be unique per (keys…, time) for the result to be
  * well-defined; pre-aggregate the right side otherwise (equal-time
  * right rows would make every engine's "latest" arbitrary).
  *
  * NULL keys follow SQL join semantics: a null-keyed right row never
  * matches anything (they are dropped before the union — the window
  * would otherwise group NULLs together and hand them to null-keyed
  * left rows, diverging from DuckDB ASOF JOIN). Null-keyed LEFT rows
  * are preserved with null `asof_*` columns, like a left join.
  *
  * The composed single-table form of the same idiom is
  * `cdc_asof_join` (CdcQueries); this operator generalizes it to two
  * inputs with payload columns.
  */
object AsOfJoin {

  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    require(tolerance.forall(_ >= 0), "tolerance must be non-negative")
    val leftCols = left.columns.toSeq
    val asofNames = valueCols.map(v => s"asof_$v")

    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__vals", lit(null).cast(
        // same struct type the right side carries (match time first)
        org.apache.spark.sql.types.StructType(
          org.apache.spark.sql.types.StructField("__rt",
            right.schema(rightTime).dataType) +:
          valueCols.map(v => org.apache.spark.sql.types.StructField(v,
            right.schema(v).dataType)))))
      .select((keys ++ leftCols.filterNot(keys.contains)).map(col) ++
        Seq(col("__t"), col("__side"), col("__vals")): _*)

    val r = right
      .filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__vals",
        struct(col(rightTime).as("__rt") +: valueCols.map(col): _*))
      .select(keys.map(col) ++
        leftCols.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__t"), col("__side"), col("__vals")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)

    val carried0 = l.unionByName(r)
      .withColumn("__asof", last(col("__vals"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    // a match staler than the tolerance is no match at all
    val carried = tolerance match {
      case Some(tol) => carried0.withColumn("__asof",
        when(col("__t") - col("__asof").getField("__rt") <= tol,
          col("__asof")))
      case None => carried0
    }

    valueCols.zip(asofNames).foldLeft(carried) { case (d, (v, out)) =>
        d.withColumn(out, col("__asof").getField(v))
      }
      .select((leftCols ++ asofNames).map(col): _*)
  }

  /** Forward as-of join: the EARLIEST right row with `rightTime >=
    * leftTime` per key (optionally within `tolerance`). Runs
    * [[backward]] on negated times — same one-shuffle plan.
    * Time columns must be numeric (negatable); Long.MinValue inputs
    * are out of contract.
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val negL = left.withColumn(leftTime, -col(leftTime))
    val negR = right.withColumn(rightTime, -col(rightTime))
    backward(negL, negR, keys, leftTime, rightTime, valueCols, tolerance)
      // restore the caller's time column; asof_* values were never negated
      .withColumn(leftTime, -col(leftTime))
      .select((leftCols ++ valueCols.map(v => s"asof_$v")).map(col): _*)
  }

  /** Brute-force twin (inequality join + argmax) — spec oracle only. */
  def backwardBrute(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lk = left.withColumn("__rowid", monotonically_increasing_id())
    val cond = keys.map(k => lk(k) === right(k))
      .reduce(_ && _) && right(rightTime) <= lk(leftTime)
    val joined = lk.join(right, cond, "left")
    val pick = struct(right(rightTime) +: valueCols.map(right(_)): _*)
    joined.groupBy(lk("__rowid"))
      .agg(first(struct(leftCols.map(lk(_)): _*)).as("__l"),
        max(pick).as("__best"))
      .select(leftCols.map(c => col(s"__l.$c")) ++
        valueCols.map(v => col(s"__best.$v").as(s"asof_$v")): _*)
  }
}
