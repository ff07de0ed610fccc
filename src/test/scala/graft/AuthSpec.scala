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

  test("fromConfig: no sources = no provider; endpoint override wires in") {
    assert(Auth.fromConfig(None, None, None, (_, _) => ("", 0L)).isEmpty)
    val keyFile = Files.createTempFile("key2", ".json")
    Files.writeString(keyFile, "k")
    val p = Auth.fromConfig(None, Some(keyFile.toString), Some("https://o"),
      (ep, _) => { assert(ep == "https://o"); ("ok", 60L) })
    assert(p.get.token() == "ok")
  }
}
