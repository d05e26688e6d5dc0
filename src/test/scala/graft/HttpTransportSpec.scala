package graft

import java.net.InetSocketAddress
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sources.{HttpTransport, RpcClient, RpcConfig, RpcSource}

/** The production `java.net.http` transport against a real localhost HTTP
  * server (JDK built-in — no egress): S1–S3 end-to-end over the wire,
  * including endpoint rotation away from a dead port and 5xx retry. */
class HttpTransportSpec extends SparkTestBase {

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  /** Serve the three RPC paths the source layer uses; returns (server, base). */
  private def startServer(): (HttpServer, String) = {
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/status", (ex: HttpExchange) =>
      respond(ex, 200,
        """{"result":{"sync_info":{"latest_block_height":"42"}}}"""))
    srv.createContext("/block_results", (ex: HttpExchange) =>
      respond(ex, 200,
        """{"result":{"txs_results":[],"finalize_block_events":[]}}"""))
    srv.createContext("/block", (ex: HttpExchange) => {
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val h = q.stripPrefix("height=")
      respond(ex, 200,
        s"""{"result":{"block":{"header":{"time":"2025-06-01T12:00:00Z","app_hash":"AH$h"},"data":{"txs":[]}}}}""")
    })
    srv.createContext("/flaky", new com.sun.net.httpserver.HttpHandler {
      private val hits = new java.util.concurrent.atomic.AtomicInteger(0)
      def handle(ex: HttpExchange): Unit =
        if (hits.incrementAndGet() == 1) respond(ex, 503, "busy")
        else respond(ex, 200, """{"ok":true}""")
    })
    srv.start()
    (srv, s"http://127.0.0.1:${srv.getAddress.getPort}")
  }

  test("HttpTransport: tip discovery and distributed fetch over real HTTP") {
    val (srv, base) = startServer()
    try {
      val client = new RpcClient(
        RpcConfig(Seq(base), retriesPerEndpoint = 2, sleeper = _ => ()),
        HttpTransport.transport())
      assert(client.latestHeight() === 42L)
      // executors (local threads) open their own per-JVM HttpClient lazily
      val rows = RpcSource.fetchEnvelopes(spark, client, 1, 4, parallelism = 2)
        .orderBy("height").collect()
      assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
      assert(rows.map(_.getAs[String]("app_hash")).toSeq ===
        Seq("AH1", "AH2", "AH3", "AH4"))
    } finally srv.stop(0)
  }

  test("HttpTransport: rotation away from a dead endpoint (connection refused)") {
    val (srv, base) = startServer()
    // a port with nothing listening: bind+close to reserve a dead one
    val dead = {
      val s = new java.net.ServerSocket(0, 1, java.net.InetAddress.getByName("127.0.0.1"))
      val p = s.getLocalPort; s.close(); s"http://127.0.0.1:$p"
    }
    try {
      val client = new RpcClient(
        RpcConfig(Seq(dead, base), retriesPerEndpoint = 2, sleeper = _ => ()),
        HttpTransport.transport())
      assert(client.latestHeight() === 42L) // survives ECONNREFUSED via rotation
    } finally srv.stop(0)
  }

  test("HttpTransport: non-2xx raises and the retry loop recovers") {
    val (srv, base) = startServer()
    try {
      val client = new RpcClient(
        RpcConfig(Seq(base), retriesPerEndpoint = 3, sleeper = _ => ()),
        HttpTransport.transport())
      assert(client.get("/flaky") === """{"ok":true}""") // 503 then 200
      val e = intercept[RuntimeException](HttpTransport.fetch(base, "/nope", 5000))
      assert(e.getMessage.contains("404"))
    } finally srv.stop(0)
  }
}
