package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Production transport for [[RpcClient]]: plain HTTP GET over the JDK's
  * `java.net.http` client (no extra dependency).
  *
  * The reference fetches each height's `/block` + `/block_results` over
  * HTTP from a rotating endpoint list (`/root/reference/src/core/worker.js:21-45`);
  * here the same fetch runs inside Spark tasks, so the transport function is
  * shipped to executors. `HttpClient` is not serializable — it lives in this
  * object as a per-JVM lazy singleton (one connection pool per executor JVM,
  * shared by all tasks), and the `(base, path) => body` closure only captures
  * the timeout, which is.
  *
  * Usage: `new RpcClient(cfg, HttpTransport.transport())` — one constructor
  * away from production; tests use the same seam with a fixture lookup or a
  * localhost `HttpServer` (see `HttpTransportSpec`).
  */
object HttpTransport {

  /** One client per JVM: connection pooling across tasks, never serialized. */
  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(10))
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()

  /** Single GET; non-2xx is a failure so RpcClient's retry/rotation engages
    * (the reference treats any non-OK response as a retryable fetch error). */
  def fetch(base: String, path: String, requestTimeoutMs: Long): String = {
    val req = HttpRequest.newBuilder(URI.create(base + path))
      .timeout(Duration.ofMillis(requestTimeoutMs))
      .GET()
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(
        s"HTTP ${resp.statusCode()} from $base$path")
    resp.body()
  }

  /** The `(baseUrl, path) => body` function RpcClient expects. Serializable:
    * captures only the timeout; the client is resolved per-JVM on first use. */
  def transport(requestTimeoutMs: Long = 30000): (String, String) => String = {
    val t = requestTimeoutMs
    (base, path) => fetch(base, path, t)
  }
}
