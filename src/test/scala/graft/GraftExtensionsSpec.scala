package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions hook: every native expression must be
  * reachable from plain SQL text in a session built with the
  * extension (the deployment shape for spark-sql / thrift users).
  * Uses its own session (newSession shares the extension-loaded
  * registry) rather than the suite-shared one.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  /** getOrCreate would silently reuse a pre-existing suite session —
    * WITHOUT the extension — so the builder must run with the active/
    * default session cleared (the underlying SparkContext is still
    * shared); both are restored afterward.
    */
  private def withExtensionSession[A](f: SparkSession => A): A = {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = GraftSession.builder("2")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      f(s)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("native functions resolve and compute from SQL text") {
    withExtensionSession { spark =>
    spark.sparkContext.setLogLevel("WARN")
    val r = spark.sql(
      """SELECT
        |  graft_phash('hello world') AS h,
        |  graft_dot(array(1L,2L,3L), array(4L,5L,6L)) AS d,
        |  graft_sorted_intersect_size(array(1L,3L,5L), array(3L,5L,9L)) AS i,
        |  size(graft_token_hash_set('a b a c')) AS t,
        |  graft_cdc_envelope('{"resolved":[42,7]}').resolved[0] AS hb,
        |  size(graft_minhash_sigs(graft_token_hash_set('a b c'), 16)) AS m
        |""".stripMargin).head()
    assert(r.getLong(0) == graft.functions.NativeImpl.portableHash(
      org.apache.spark.unsafe.types.UTF8String.fromString("hello world")))
    assert(r.getLong(1) == 4 + 10 + 18)
    assert(r.getLong(2) == 2L)
    assert(r.getInt(3) == 3)
    assert(r.getLong(4) == 42L)
    assert(r.getInt(5) == 16)
    // window hashes: position i = phash of the space-joined w-window
    val wh = spark.sql(
      "SELECT graft_window_hashes('a b c d', 3) AS w").head()
      .getSeq[Long](0)
    assert(wh == Seq("a b c", "b c d").map(s =>
      graft.functions.NativeImpl.portableHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))))
    // the normalizer family resolves from SQL text: decomposed
    // e+U+0301 re-composes (NFC), the fi ligature folds (NFKC only),
    // accents strip to plain letters (unicode via escapes so source
    // re-encoding can't corrupt the fixtures)
    val nz = spark.sql(
      "SELECT graft_nfc('cafe\u0301') AS a, " +
        "graft_nfkc('\ufb01le') AS b, " +
        "graft_strip_accents('caf\u00e9') AS c").head()
    assert(nz.getString(0) == "caf\u00e9")
    assert(nz.getString(1) == "file")
    assert(nz.getString(2) == "cafe")
    // non-literal k is a plan-time error, not a runtime surprise
    intercept[Exception] {
      spark.sql("SELECT graft_minhash_sigs(array(1L), CAST(id AS INT)) " +
        "FROM range(1)").head()
    }
    intercept[Exception] {
      spark.sql("SELECT graft_window_hashes('a b', CAST(id AS INT)) " +
        "FROM range(1)").head()
    }
    }
  }

  test("graft_topk aggregates from SQL text with partial combine") {
    withExtensionSession { spark =>
      spark.sparkContext.setLogLevel("WARN")
      val df = spark.sql(
        """SELECT g, graft_topk(v, i, 2) AS top FROM (
          |  SELECT id % 2 AS g, id * 10 AS v, id AS i FROM range(10))
          |GROUP BY g ORDER BY g""".stripMargin)
      val rows = df.collect().map { r =>
        r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(e => (e.getLong(0), e.getLong(1)))
      }.toMap
      assert(rows(0L) === Seq((80L, 8L), (60L, 6L)))
      assert(rows(1L) === Seq((90L, 9L), (70L, 7L)))
      // the scale claim: the plan aggregates PARTIALLY before the
      // exchange (ObjectHashAggregate partial_graft_topk), never a
      // window sort of the whole group
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("partial_graft_topk"), plan.take(2000))
    }
  }
}
