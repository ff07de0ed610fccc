package graft

import graft.ops.{GraphOps, Materialize, Ranks, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Materialize.cut — the deployment-routed lineage-cut seam. Pins all
  * three routes (local blocks / reliable checkpoint / staged parquet)
  * frame-identical on one operator per family that rides the seam
  * (the two-level rank, DSIR weights, PageRank), plus the loud
  * refusals when a route's prerequisite conf is missing.
  */
class MaterializeSpec extends SparkSpec {
  import spark.implicits._

  private def withMode[A](mode: Option[String])(body: => A): A = {
    val prev = spark.conf.getOption(Materialize.ModeKey)
    mode match {
      case Some(m) => spark.conf.set(Materialize.ModeKey, m)
      case None => spark.conf.unset(Materialize.ModeKey)
    }
    try body
    finally prev match {
      case Some(p) => spark.conf.set(Materialize.ModeKey, p)
      case None => spark.conf.unset(Materialize.ModeKey)
    }
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** StructType.asNullable is private[sql] — same meaning. */
  private def nullableOf(s: org.apache.spark.sql.types.StructType) =
    org.apache.spark.sql.types.StructType(
      s.fields.map(_.copy(nullable = true)))

  private def onAllRoutes(op: => DataFrame): Seq[(String, Seq[String])] = {
    val local = withMode(Some("local"))(sortedRows(op))
    val defaulted = withMode(None)(sortedRows(op))
    spark.sparkContext.setCheckpointDir(tmp("graft-reliable"))
    val reliable = withMode(Some("reliable"))(sortedRows(op))
    val stage = tmp("graft-stage")
    spark.conf.set(Materialize.DirKey, stage)
    val parquet =
      try withMode(Some("parquet"))(sortedRows(op))
      finally spark.conf.unset(Materialize.DirKey)
    Seq("local" -> local, "default" -> defaulted,
      "reliable" -> reliable, "parquet" -> parquet)
  }

  test("two-level rank: all three routes return the identical frame") {
    val rnd = new scala.util.Random(11)
    val ids = rnd.shuffle((0L until 400L).toList)
    val rows = onAllRoutes(
      Ranks.globalRowNumber(ids.toDF("id"), Seq(col("id")), "rk"))
    val want = rows.head._2
    assert(want.nonEmpty)
    rows.tail.foreach { case (m, got) => assert(got == want, s"route=$m") }
  }

  test("dsirWeights: all three routes return the identical frame") {
    val docs = (0L until 60L).map(i =>
      (i, s"alpha beta w$i gamma ${if (i % 3 == 0) "target words" else "crawl noise"}",
        i % 3 == 0)).toDF("doc_id", "text", "is_t")
    val rows = onAllRoutes(
      TextOps.dsirWeights(docs, col("doc_id"), col("text"), col("is_t"), 32))
    val want = rows.head._2
    assert(want.size == 60)
    rows.tail.foreach { case (m, got) => assert(got == want, s"route=$m") }
  }

  test("pageRank: all three routes return the identical frame") {
    val edges = Seq((1L, 2L, 3L), (2L, 3L, 1L), (1L, 3L, 2L), (3L, 4L, 5L))
      .toDF("s_a", "s_b", "w")
    val rows = onAllRoutes(GraphOps.pageRank(edges, iters = 4))
    val want = rows.head._2
    assert(want.size == 4)
    rows.tail.foreach { case (m, got) => assert(got == want, s"route=$m") }
  }

  test("parquet route refuses loudly without a staging dir") {
    withMode(Some("parquet")) {
      val e = intercept[IllegalArgumentException] {
        Materialize.cut(Seq(1L).toDF("x"))
      }
      assert(e.getMessage.contains(Materialize.DirKey))
    }
  }

  test("unknown mode refuses loudly") {
    withMode(Some("ramdisk")) {
      val e = intercept[IllegalArgumentException] {
        Materialize.cut(Seq(1L).toDF("x"))
      }
      assert(e.getMessage.contains("local|reliable|parquet"))
    }
  }

  test("parquet route pins names+types; nullability widens to asNullable") {
    val stage = tmp("graft-stage-schema")
    spark.conf.set(Materialize.DirKey, stage)
    try withMode(Some("parquet")) {
      val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      val back = Materialize.cut(df)
      // file sources force user schemas nullable (and .to refuses to
      // narrow) — the documented residue is EXACTLY asNullable, with
      // names, types and rows identical
      assert(back.schema == nullableOf(df.schema),
        s"got ${back.schema.toDDL}, want ${nullableOf(df.schema).toDDL}")
      assert(sortedRows(back) == sortedRows(df))
    } finally spark.conf.unset(Materialize.DirKey)
  }

  test("parquet route round-trips an EMPTY frame") {
    val stage = tmp("graft-stage-empty")
    spark.conf.set(Materialize.DirKey, stage)
    try withMode(Some("parquet")) {
      val df = Seq((1L, "a")).toDF("id", "s").filter(col("id") < 0L)
      // zero part files on disk — schema inference would throw here;
      // the pinned schema makes this behave like the other two routes
      val back = Materialize.cut(df)
      assert(back.count() == 0L)
      assert(back.schema == nullableOf(df.schema))
    } finally spark.conf.unset(Materialize.DirKey)
  }

  test("vacuum sweeps stale staging dirs and spares live ones") {
    val stage = tmp("graft-stage-vacuum")
    spark.conf.set(Materialize.DirKey, stage)
    try withMode(Some("parquet")) {
      val before = Materialize.stagedDirs.toSet
      val old = Materialize.cut(Seq(1L, 2L).toDF("x"))
      assert(old.count() == 2L)
      val oldDir = (Materialize.stagedDirs.toSet -- before)
        .find(_.startsWith(stage)).get
      // backdate the old cut's dir a day (vacuum keys on FS mtime —
      // the crash-leftover path needs no in-memory registry)
      java.nio.file.Files.setLastModifiedTime(
        java.nio.file.Paths.get(oldDir),
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 86400000L))
      val live = Materialize.cut(Seq(3L, 4L, 5L).toDF("x"))
      val removed = Materialize.vacuum(spark, olderThanMs = 3600000L)
      assert(removed == 1, s"removed $removed dirs")
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(oldDir)))
      // the live (recent) cut's staged files survive and still read
      assert(live.count() == 3L)
      assert(Materialize.stagedDirs.forall(_ != oldDir))
      // an unregistered leftover (a crashed session's dir) is swept too
      val orphan = java.nio.file.Paths.get(stage, "stage-9999-orphan")
      java.nio.file.Files.createDirectories(orphan)
      java.nio.file.Files.setLastModifiedTime(orphan,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 86400000L))
      assert(Materialize.vacuum(spark, olderThanMs = 3600000L) == 1)
      assert(!java.nio.file.Files.exists(orphan))
    } finally spark.conf.unset(Materialize.DirKey)
  }

  test("vacuum refuses without a staging root") {
    spark.conf.unset(Materialize.DirKey)
    val e = intercept[IllegalArgumentException] {
      Materialize.vacuum(spark, 1000L)
    }
    assert(e.getMessage.contains(Materialize.DirKey))
  }
}
