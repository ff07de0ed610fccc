package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** Blocked-key serialization layout + injectivity.
  *
  * Ports the intent of the reference's byte-layout test
  * (internal/util/key_serializer/key_serializer_test.go:9-31: format
  * tag first, then table path, then key parts) and adds the collision
  * cases the reference's raw concatenation would fail — our layout is
  * JSON-delimited specifically to make these distinct.
  */
class KeySerializerSpec extends SparkSpec {
  import spark.implicits._

  private def ser(table: String, parts: Seq[String]): String =
    Seq((table, parts)).toDF("t", "k")
      .select(GraftFunctions.serializeKey(col("t"), col("k")).as("sk"))
      .head().getString(0)

  test("layout: format tag 0x01 first, then table path and parts in order") {
    val s = ser("t1", Seq("k1", "k2"))
    assert(s.charAt(0) == '\u0001')
    assert(s == "\u0001" + """{"t":"t1","k":["k1","k2"]}""")
  }

  test("layout: empty key parts still carry tag + table") {
    val s = ser("t1", Seq.empty)
    assert(s.charAt(0) == '\u0001')
    assert(s.contains("t1"))
  }

  test("injective: part-boundary shifts do not collide") {
    assert(ser("t", Seq("ab", "c")) != ser("t", Seq("a", "bc")))
    assert(ser("t", Seq("12", "3")) != ser("t", Seq("1", "23")))
  }

  test("injective: table/part boundary does not collide") {
    assert(ser("t1", Seq("x")) != ser("t1x", Seq.empty))
    assert(ser("t1", Seq("x")) != ser("t1x", Seq("")))
    assert(ser("t", Seq("1x")) != ser("t1", Seq("x")))
  }

  test("injective: parts containing quotes/delimiters escape cleanly") {
    assert(ser("t", Seq("""a","b""")) != ser("t", Seq("a", "b")))
    assert(ser("""t","x""", Seq.empty) != ser("t", Seq("x")))
  }

  test("determinism: same input same bytes") {
    assert(ser("users", Seq("42", "abc")) == ser("users", Seq("42", "abc")))
  }
}
