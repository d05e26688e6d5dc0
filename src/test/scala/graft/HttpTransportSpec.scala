package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{HttpTransport, RpcClient, RpcConfig}

/** S1–S3 over REAL HTTP: a localhost `com.sun.net.httpserver.HttpServer`
  * (JDK-only, no egress) stands in for a Tendermint RPC node, so the full
  * production path — HttpTransport → RpcClient retry/rotation → JSON
  * extraction — is exercised end-to-end, not just with fixture lambdas. */
class HttpTransportSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var good: HttpServer = _
  private var flaky: HttpServer = _
  private val flakyHits = new AtomicInteger(0)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  override def beforeAll(): Unit = {
    good = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    good.createContext("/status", (ex: HttpExchange) =>
      respond(ex, 200, """{"result":{"sync_info":{"latest_block_height":"12345"}}}"""))
    good.createContext("/block", (ex: HttpExchange) => {
      val h = ex.getRequestURI.getQuery.stripPrefix("height=")
      respond(ex, 200,
        s"""{"result":{"block":{"header":{"time":"2025-06-01T12:00:00Z","app_hash":"AH$h"},"data":{"txs":[]}}}}""")
    })
    good.createContext("/block_results", (ex: HttpExchange) =>
      respond(ex, 200, """{"result":{"txs_results":[],"finalize_block_events":[]}}"""))
    good.createContext("/teapot", (ex: HttpExchange) => respond(ex, 418, "short and stout"))
    good.start()

    flaky = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    flaky.createContext("/", (ex: HttpExchange) => {
      flakyHits.incrementAndGet()
      respond(ex, 500, "boom")
    })
    flaky.start()
  }

  override def afterAll(): Unit = {
    good.stop(0)
    flaky.stop(0)
  }

  private def base(s: HttpServer) = s"http://127.0.0.1:${s.getAddress.getPort}"

  test("GET body round-trips; query strings reach the server") {
    val t = HttpTransport.transport()
    assert(t(base(good), "/block?height=7").contains(""""app_hash":"AH7""""))
  }

  test("non-2xx surfaces as an exception naming the status") {
    val e = intercept[RuntimeException](HttpTransport.fetch(base(good), "/teapot", 5000))
    assert(e.getMessage.contains("418"))
  }

  test("tip discovery over real HTTP") {
    val client = new RpcClient(
      RpcConfig(Seq(base(good)), sleeper = _ => ()), HttpTransport.transport())
    assert(client.latestHeight() == 12345L)
  }

  test("rotation: 500s on the first endpoint fail over to the second") {
    flakyHits.set(0)
    val client = new RpcClient(
      RpcConfig(Seq(base(flaky), base(good)), retriesPerEndpoint = 2, sleeper = _ => ()),
      HttpTransport.transport())
    assert(client.latestHeight() == 12345L)
    assert(flakyHits.get() == 2) // exhausted retriesPerEndpoint before rotating
  }

  test("connection refused rotates to a live endpoint") {
    // grab a port that nothing listens on
    val sock = new java.net.ServerSocket(0)
    val deadPort = sock.getLocalPort
    sock.close()
    val client = new RpcClient(
      RpcConfig(Seq(s"http://127.0.0.1:$deadPort", base(good)),
        retriesPerEndpoint = 1, sleeper = _ => ()),
      HttpTransport.transport(requestTimeoutMs = 2000))
    assert(client.latestHeight() == 12345L)
  }

  test("all endpoints down: bounded attempts then a terminal failure") {
    val client = new RpcClient(
      RpcConfig(Seq(base(flaky)), retriesPerEndpoint = 3, sleeper = _ => ()),
      HttpTransport.transport())
    flakyHits.set(0)
    val e = intercept[RuntimeException](client.get("/status"))
    assert(e.getMessage.contains("All RPC endpoints failed"))
    assert(flakyHits.get() == 3)
  }

  test("distributed fetchEnvelopes: executors fetch over real HTTP") {
    // each local executor thread resolves its own per-JVM HttpClient lazily;
    // the transport closure ships with only the timeout captured
    val client = new RpcClient(
      RpcConfig(Seq(base(good)), sleeper = _ => ()), HttpTransport.transport())
    val rows = graft.sources.RpcSource
      .fetchEnvelopes(SparkTestBase.session, client, 1, 4, parallelism = 2)
      .orderBy("height").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(rows.map(_.getAs[String]("app_hash")).toSeq ==
      Seq("AH1", "AH2", "AH3", "AH4"))
  }
}
