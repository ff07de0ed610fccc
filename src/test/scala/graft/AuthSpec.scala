package graft

import graft.auth._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Token plumbing (auth.go:69-89 semantics): static wins, oauth2
  * exchanges lazily and caches until the refresh margin.
  */
class AuthSpec extends AnyFunSuite {

  test("static token wins over oauth2 file") {
    val p = Auth.fromConfig(Some("tok"), Some("/nope"), None,
      (_, _) => fail("must not exchange"))
    assert(p.get.token() == "tok")
  }

  test("oauth2: lazy exchange, cached until margin, rotated key picked up") {
    val keyFile = Files.createTempFile("key", ".json")
    Files.writeString(keyFile, "key-v1")
    var now = 0L
    var calls = 0
    var seenCreds = ""
    val provider = new OAuth2FileProvider(keyFile.toString, "https://tokens",
      exchange = (ep, creds) => {
        assert(ep == "https://tokens")
        calls += 1; seenCreds = creds; (s"t$calls", 100L) // expires in 100s
      },
      refreshMarginSeconds = 10L, clock = () => now)

    assert(provider.token() == "t1" && calls == 1 && seenCreds == "key-v1")
    now = 89000L // still inside (100-10)s
    assert(provider.token() == "t1" && calls == 1)
    now = 90001L // past the margin: refresh, re-reading the key file
    Files.writeString(keyFile, "key-v2")
    assert(provider.token() == "t2" && calls == 2 && seenCreds == "key-v2")
  }

  test("default HTTP exchange POSTs the credentials and parses the token") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var seenMethod = ""
    @volatile var seenBody = ""
    @volatile var seenCt = ""
    server.createContext("/token", (ex: com.sun.net.httpserver.HttpExchange) => {
      seenMethod = ex.getRequestMethod
      seenCt = ex.getRequestHeaders.getFirst("Content-Type")
      seenBody = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val resp = """{"access_token":"tok-http","expires_in":120}"""
        .getBytes("UTF-8")
      ex.sendResponseHeaders(200, resp.length)
      ex.getResponseBody.write(resp)
      ex.close()
    })
    server.start()
    try {
      val ep = s"http://127.0.0.1:${server.getAddress.getPort}/token"
      assert(Auth.httpExchange(ep, """{"key":"creds-1"}""") == ("tok-http", 120L))
      assert(seenMethod == "POST")
      assert(seenCt == "application/json")
      assert(seenBody == """{"key":"creds-1"}""")
      // expires_in missing → the 3600s default
      server.removeContext("/token")
      server.createContext("/token", (ex: com.sun.net.httpserver.HttpExchange) => {
        val resp = """{"access_token":"tok2"}""".getBytes("UTF-8")
        ex.sendResponseHeaders(200, resp.length)
        ex.getResponseBody.write(resp)
        ex.close()
      })
      assert(Auth.httpExchange(ep, "c") == ("tok2", 3600L))
      // server error → exception, not a bogus token
      server.removeContext("/token")
      server.createContext("/token", (ex: com.sun.net.httpserver.HttpExchange) => {
        ex.sendResponseHeaders(500, -1); ex.close()
      })
      intercept[Exception](Auth.httpExchange(ep, "c"))
    } finally server.stop(0)
  }

  test("httpExchange plugs into OAuth2FileProvider end to end") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/t", (ex: com.sun.net.httpserver.HttpExchange) => {
      val n = calls.incrementAndGet()
      val resp = s"""{"access_token":"t$n","expires_in":100}""".getBytes("UTF-8")
      ex.sendResponseHeaders(200, resp.length)
      ex.getResponseBody.write(resp)
      ex.close()
    })
    server.start()
    try {
      val keyFile = Files.createTempFile("keyh", ".json")
      Files.writeString(keyFile, "creds")
      var now = 0L
      val p = new OAuth2FileProvider(keyFile.toString,
        s"http://127.0.0.1:${server.getAddress.getPort}/t",
        exchange = Auth.httpExchange,
        refreshMarginSeconds = 10L, clock = () => now)
      assert(p.token() == "t1" && calls.get() == 1)
      assert(p.token() == "t1" && calls.get() == 1) // cached
      now = 90001L
      assert(p.token() == "t2" && calls.get() == 2) // refreshed over the wire
    } finally server.stop(0)
  }

  test("fromConfig: no sources = no provider; endpoint override wires in") {
    assert(Auth.fromConfig(None, None, None, (_, _) => ("", 0L)).isEmpty)
    val keyFile = Files.createTempFile("key2", ".json")
    Files.writeString(keyFile, "k")
    val p = Auth.fromConfig(None, Some(keyFile.toString), Some("https://o"),
      (ep, _) => { assert(ep == "https://o"); ("ok", 60L) })
    assert(p.get.token() == "ok")
  }
}
