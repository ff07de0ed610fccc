package graft.streaming

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** Monitoring endpoint — the reference's pmon server
  * (internal/pmon/pmon.go:143-183) re-expressed on the JDK's built-in
  * HTTP server (no extra dependency):
  *
  *   GET /metrics — Prometheus text exposition of [[EngineMetrics]]
  *                  (counter/gauge names mirror the reference's set);
  *   GET /readyz  — 200 "ok" while `ready()` holds (lease held, state
  *                  Ok), 503 otherwise;
  *   GET /livez   — 200 while the process serves.
  *
  * Start with `PmonServer.start(port, metrics, ready)`; port 0 picks a
  * free port (see `boundPort`). The handler reads atomic counters
  * only — no Spark driver work — so scrapes never contend with the
  * micro-batch loop.
  */
final class PmonServer private (server: HttpServer) {
  def boundPort: Int = server.getAddress.getPort
  def stop(): Unit = server.stop(0)
}

object PmonServer {

  def start(port: Int, metrics: EngineMetrics,
      ready: () => Boolean): PmonServer = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    // small dedicated pool: `ready()` may touch the store (manifest
    // read, lock listing), and on the default single dispatcher
    // thread a stalled store would also freeze /livez — failing an
    // orchestrator's liveness probe on a healthy process
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(2,
      (r: Runnable) => {
        val t = new Thread(r, "graft-pmon")
        t.setDaemon(true)
        t
      }))

    def respond(ex: HttpExchange, code: Int, body: String,
        contentType: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", contentType)
      ex.sendResponseHeaders(code, bytes.length)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }

    server.createContext("/metrics", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = exposition(metrics)
        respond(ex, 200, body, "text/plain; version=0.0.4")
      }
    })
    server.createContext("/readyz", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        if (ready()) respond(ex, 200, "ok\n", "text/plain")
        else respond(ex, 503, "not ready\n", "text/plain")
    })
    server.createContext("/livez", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        respond(ex, 200, "ok\n", "text/plain")
    })
    server.start()
    new PmonServer(server)
  }

  /** Prometheus text format: every snapshot entry as an untyped
    * gauge plus the derived mps, prefixed like the reference's
    * metric names (pmon.go / README.md:466-478).
    */
  def exposition(metrics: EngineMetrics): String = {
    val sb = new StringBuilder
    metrics.snapshot.toSeq.sortBy(_._1).foreach { case (k, v) =>
      sb.append(s"graft_$k $v\n")
    }
    sb.append(f"graft_mps ${metrics.mps}%.3f\n")
    sb.toString
  }
}
