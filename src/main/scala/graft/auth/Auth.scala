package graft.auth

import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.file.{Files, Paths}

/** Source/destination credentials — the reference's token plumbing
  * (internal/auth/auth.go:69-89): either a static token or an OAuth2
  * token-exchange keyed by a credentials file, with the exchanged
  * token cached until shortly before expiry.
  */
trait TokenProvider {
  /** A currently-valid bearer token. */
  def token(): String
}

/** Fixed token (src_static_token / dst_static_token). */
final case class StaticToken(value: String) extends TokenProvider {
  override def token(): String = value
}

/** OAuth2 token exchange (src_oauth2_file + optional endpoint
  * override). The exchange call itself is injected — an HTTP POST in
  * production, a stub in tests — because its wire format is
  * deployment-specific; THIS class owns the reference's caching
  * semantics: exchange once, reuse until `expiresInSeconds` minus the
  * refresh margin has passed, then exchange again.
  *
  * @param credentialsPath file whose contents are the subject
  *        credentials (e.g. a service-account key); re-read on every
  *        exchange so rotated keys are picked up
  * @param endpoint        token-exchange endpoint (config override
  *        wins over whatever the credentials file embeds)
  * @param exchange        (endpoint, credentials) => (token, expiresInSeconds)
  */
final class OAuth2FileProvider(
    val credentialsPath: String,
    val endpoint: String,
    exchange: (String, String) => (String, Long),
    refreshMarginSeconds: Long = 60L,
    clock: () => Long = () => System.currentTimeMillis()) extends TokenProvider {

  @volatile private var cached: Option[(String, Long)] = None // (token, deadlineMs)

  override def token(): String = {
    cached match {
      case Some((t, deadline)) if deadline > clock() => t
      case _ =>
        val creds = Files.readString(Paths.get(credentialsPath))
        val (t, expiresIn) = exchange(endpoint, creds)
        val deadline =
          clock() + math.max(0L, expiresIn - refreshMarginSeconds) * 1000L
        cached = Some((t, deadline))
        t
    }
  }
}

object Auth {
  /** Pick the provider the way the reference config does: a static
    * token wins when present, otherwise an OAuth2 file; neither =
    * no auth.
    */
  def fromConfig(staticToken: Option[String], oauthFile: Option[String],
      oauthEndpoint: Option[String],
      exchange: (String, String) => (String, Long) = httpExchange)
      : Option[TokenProvider] =
    staticToken.map(StaticToken(_)).orElse(
      oauthFile.map(f =>
        new OAuth2FileProvider(f, oauthEndpoint.getOrElse(""), exchange)))

  /** Default HTTP exchange: POST the credentials to the endpoint,
    * expect {"access_token": ..., "expires_in": N}. Matches the
    * common RFC 8693 token-exchange response shape.
    */
  def httpExchange(endpoint: String, credentials: String): (String, Long) = {
    val conn = new java.net.URL(endpoint).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    // a blackholed endpoint must fail the exchange, not hang the
    // stream-construction path that calls token() synchronously
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(30000)
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "application/json")
    val os = conn.getOutputStream
    try os.write(credentials.getBytes("UTF-8")) finally os.close()
    val body = scala.io.Source.fromInputStream(conn.getInputStream).mkString
    val n = new ObjectMapper().readTree(body)
    (n.get("access_token").asText(),
      if (n.has("expires_in")) n.get("expires_in").asLong() else 3600L)
  }
}
