package graft.sink

import graft.model.Op
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Destination table metadata — the analog of the reference's cached
  * DescribeTable result (dst_table/dst_table.go:20-24): authoritative
  * schema + positional primary key. Incoming columns that don't exist
  * in this schema are a hard error, mirroring gen_query.go:323-326.
  */
final case class TableMeta(name: String, schema: StructType, primaryKey: Seq[String]) {
  require(primaryKey.forall(k => schema.fieldNames.contains(k)),
    s"primary key $primaryKey not in schema of $name")
  def nonKeyColumns: Seq[String] =
    schema.fieldNames.toSeq.filterNot(primaryKey.contains)
}

/** Bucketed copy-on-write apply of a merged change patch.
  *
  * UPSERT semantics follow the reference's generated statements
  * (gen_query.go:342-376): an upsert sets exactly the columns present
  * in the change and preserves the rest; a delete removes the row by
  * key. Rather than generating SQL, we merge declaratively: full outer
  * join of the current bucket contents with the patch on the primary
  * key, per-column coalesce guided by the change's present-column mask.
  *
  * Only buckets named by the patch are read and rewritten; everything
  * else is carried forward by manifest pointer. The join shuffles only
  * the affected buckets' rows.
  */
object DstTable {

  val BucketCol = "__bucket"

  def bucketOf(meta: TableMeta, buckets: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(meta.primaryKey.map(col): _*), lit(buckets)).cast("int")

  def readCurrent(spark: SparkSession, meta: TableMeta,
      tv: TransactionalStore.TableVersion,
      onlyBuckets: Option[Set[Int]] = None): DataFrame = {
    val files = tv.bucketFiles
      .filter { case (b, _) => onlyBuckets.forall(_.contains(b)) }
      .values.flatten.toSeq
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], meta.schema)
    else spark.read.schema(meta.schema).parquet(files: _*)
  }

  /** Apply `patch` (merged rows: keyJson, op, columns) to the table and
    * write the new bucket files under
    * `root/tables/<name>/c{commitVersion}/`. Returns the updated
    * per-bucket file pointers plus the patch row count (piggybacked on
    * the metadata aggregation so the caller's modification metric costs
    * no extra job).
    */
  def applyPatch(spark: SparkSession, root: String, meta: TableMeta,
      buckets: Int, current: TransactionalStore.TableVersion,
      patch: DataFrame, commitVersion: Long): (TransactionalStore.TableVersion, Long) = {

    // Typed projection of the patch + present-column mask + bucket.
    val typedPatch = patch.select(
      (TypeConversion.project(meta.schema, meta.primaryKey,
        col("columns"), col("keyJson")) ++ Seq(
        col("op"),
        coalesce(col("erased"), lit(false)).as("__erased"),
        TypeConversion.presentColumns(meta.schema, meta.primaryKey,
          col("columns")).as("__present"),
        // columns the destination schema doesn't know — hard error
        filter(map_keys(col("columns")),
          c => !c.isin(meta.schema.fieldNames.toSeq.map(lit): _*))
          .as("__unknown"))): _*)
      .withColumn(BucketCol, bucketOf(meta, buckets))

    // ONE pass collects the affected buckets, any unknown columns, AND
    // the patch cardinality (driver round-trips saved per table per
    // commit)
    val metaRow = typedPatch.agg(
      collect_set(col(BucketCol)).as("buckets"),
      array_distinct(flatten(collect_list(col("__unknown")))).as("bad"),
      count(lit(1)).as("n")).head()
    val bad = metaRow.getAs[scala.collection.Seq[String]]("bad")
    if (bad.nonEmpty)
      throw new IllegalArgumentException(
        s"unknown destination columns for table ${meta.name}: ${bad.mkString(",")}")
    val affected = metaRow.getAs[scala.collection.Seq[Int]]("buckets").toSet
    val nRows = metaRow.getAs[Long]("n")
    if (affected.isEmpty) return (current, nRows)

    val old = readCurrent(spark, meta, current, Some(affected))
      .withColumn(BucketCol, bucketOf(meta, buckets))

    val pk = meta.primaryKey
    val oldK = old.select(
      (pk.map(k => col(k).as(s"__k_$k")) ++
        meta.nonKeyColumns.map(c => col(c).as(s"__o_$c")) :+
        col(BucketCol).as("__ob")): _*)
    val patK = typedPatch.drop("__unknown").select(
      (pk.map(k => col(k).as(s"__pk_$k")) ++
        meta.nonKeyColumns.map(c => col(c).as(s"__p_$c")) :+
        col("op") :+ col("__erased") :+ col("__present") :+
        col(BucketCol).as("__pb")): _*)

    val joined = oldK.join(patK,
      pk.map(k => oldK(s"__k_$k") <=> patK(s"__pk_$k")).reduce(_ && _),
      "full_outer")

    val merged = joined
      // delete drops matched rows; unmatched deletes are no-ops
      .filter(col("op").isNull || col("op") =!= Op.Erase)
      .select(
        (pk.map(k => coalesce(col(s"__k_$k"), col(s"__pk_$k")).as(k)) ++
          meta.nonKeyColumns.map { c =>
            val dt = meta.schema(c).dataType
            val present =
              array_contains(coalesce(col("__present"), array()), c)
            // an in-batch erase kills the pre-batch row: the surviving
            // update REPLACES (absent columns become NULL, not the old
            // values) — log-replay semantics, checked by the
            // incremental-vs-one-shot oracle
            when(col("op").isNotNull && col("__erased"),
              when(present, col(s"__p_$c")).otherwise(lit(null).cast(dt)))
              .when(col("op").isNotNull && present, col(s"__p_$c"))
              .otherwise(col(s"__o_$c")).as(c)
          } :+
          coalesce(col("__ob"), col("__pb")).as(BucketCol)): _*)

    val outDir = s"$root/tables/${meta.name}/c$commitVersion"
    // co-locate each bucket before the write: without this every
    // merge-partitioned task writes into every touched bucket dir
    // (tasks × buckets files per commit — file-open overhead locally,
    // manifest and read fan-out at scale); after it, a bucket's rows
    // land in ~one file
    merged.repartition(col(BucketCol))
      .write.mode("overwrite").partitionBy(BucketCol).parquet(outDir)

    val newFiles = affected.map { b =>
      b -> TransactionalStore.partFiles(s"$outDir/$BucketCol=$b")
    }.toMap
    (TransactionalStore.TableVersion(current.bucketFiles ++ newFiles), nRows)
  }
}
