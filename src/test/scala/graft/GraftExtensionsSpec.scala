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
    // non-literal k is a plan-time error, not a runtime surprise
    intercept[Exception] {
      spark.sql("SELECT graft_minhash_sigs(array(1L), CAST(id AS INT)) " +
        "FROM range(1)").head()
    }
    }
  }
}
