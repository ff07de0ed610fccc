package graft

import graft.streaming.{EngineMetrics, PmonServer}
import org.scalatest.funsuite.AnyFunSuite
import java.net.{HttpURLConnection, URL}
import scala.io.Source

/** pmon analog: /metrics exposition, /readyz gating, /livez. */
class PmonServerSpec extends AnyFunSuite {

  private def get(port: Int, path: String): (Int, String) = {
    val conn = new URL(s"http://127.0.0.1:$port$path")
      .openConnection().asInstanceOf[HttpURLConnection]
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = Source.fromInputStream(is).mkString
    (code, body)
  }

  test("metrics exposition, readiness flip, liveness") {
    val m = new EngineMetrics
    m.addMods(3, 42L)
    m.lastQuorumWaitMs.set(7)
    @volatile var ready = false
    val srv = PmonServer.start(0, m, () => ready)
    try {
      val (mc, mb) = get(srv.boundPort, "/metrics")
      assert(mc == 200)
      assert(mb.contains("graft_modifications_count 42"))
      assert(mb.contains("graft_quorum_waiting_latency_ms 7"))
      assert(mb.contains("graft_stream_3_modifications 42"))
      assert(mb.contains("graft_mps"))

      assert(get(srv.boundPort, "/readyz")._1 == 503)
      ready = true
      assert(get(srv.boundPort, "/readyz") == ((200, "ok\n")))
      assert(get(srv.boundPort, "/livez")._1 == 200)
    } finally srv.stop()
  }

  test("engine bootstrap starts the server when mon_port configured") {
    import graft.model._
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft-pmon").toString
    val cfg = EngineConfig("inst1",
      Seq(StreamConfig(0, s"$root/src", "users", partitions = 1)),
      s"$root/dst", buckets = 4, monPort = Some(0))
    val meta = graft.sink.TableMeta("users", StructType(Seq(
      StructField("id", LongType))), Seq("id"))
    val e = new graft.streaming.CdcEngine(GraftSession.get("4"), cfg, Map(0 -> meta))
    e.bootstrap()
    try {
      val port = e.monServer.get.boundPort
      // lease held + state Ok => ready
      assert(get(port, "/readyz")._1 == 200)
      assert(get(port, "/metrics")._1 == 200)
    } finally e.monServer.foreach(_.stop())
  }
}
