package graft

import java.net.InetSocketAddress
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.sources.HttpFetch
import graft.sources.HttpFetch.FetchConfig

/** Spec for the HTTP-CSV staging fetch against a local in-process HTTP stub,
  * covering the reference's contract: 200 → staged file, non-200 → None
  * (the latent "no data for this day" edge case), Bearer auth header, and
  * transport-level retry.
  */
class HttpFetchSpec extends SparkTestBase with org.scalatest.BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  private val flakyHits = new AtomicInteger(0)
  @volatile private var seenAuth: Option[String] = None
  @volatile private var seenBody: Option[String] = None

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/day1.csv", (ex: HttpExchange) => {
      seenAuth = Option(ex.getRequestHeaders.getFirst("Authorization"))
      respond(ex, 200, "id,value\n1,10.5\n2,20.5\n")
    })
    server.createContext("/day2.csv", (ex: HttpExchange) =>
      respond(ex, 200, "id,value\n3,30.5\n"))
    server.createContext("/missing.csv", (ex: HttpExchange) =>
      respond(ex, 404, "not found"))
    server.createContext("/flaky.csv", (ex: HttpExchange) => {
      if (flakyHits.incrementAndGet() <= 2) respond(ex, 500, "boom")
      else respond(ex, 200, "id,value\n9,90.0\n")
    })
    server.createContext("/callback", (ex: HttpExchange) => {
      seenBody = Some(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
      respond(ex, 200, "ok")
    })
    server.start()
    base = s"http://localhost:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = {
    server.stop(0)
    super.afterAll()
  }

  private def freshDir() = Files.createTempDirectory("graft_staging").toString

  test("200 stages the file; Bearer token rides the Authorization header") {
    val dir = freshDir()
    val p = HttpFetch.fetchToStaging(s"$base/day1.csv", dir, "day1.csv",
      FetchConfig(bearerToken = Some("sekret")))
    assert(p.isDefined)
    assert(new String(Files.readAllBytes(p.get), "UTF-8").startsWith("id,value"))
    assert(seenAuth.contains("Bearer sekret"))
  }

  test("non-200 returns None and stages nothing (reference's no-data contract)") {
    val dir = freshDir()
    val p = HttpFetch.fetchToStaging(s"$base/missing.csv", dir, "missing.csv")
    assert(p.isEmpty)
    assert(!Files.exists(java.nio.file.Paths.get(dir, "missing.csv")))
  }

  test("5xx retries until success") {
    flakyHits.set(0)
    val p = HttpFetch.fetchToStaging(s"$base/flaky.csv", freshDir(), "flaky.csv",
      FetchConfig(maxRetries = 3, retryBackoffMs = 10))
    assert(p.isDefined)
    assert(flakyHits.get() == 3) // two 500s then the 200
  }

  test("connection refused exhausts retries to None") {
    val p = HttpFetch.fetchToStaging("http://localhost:1/never.csv", freshDir(), "never.csv",
      FetchConfig(maxRetries = 1, retryBackoffMs = 10))
    assert(p.isEmpty)
  }

  test("fetchCsvBatch lands multiple windows, skips missing days, unions at scan level") {
    val dir = freshDir()
    val df = HttpFetch.fetchCsvBatch(spark,
      Seq(s"$base/day1.csv" -> "d1.csv",
          s"$base/missing.csv" -> "d2.csv", // the reference's None day
          s"$base/day2.csv" -> "d3.csv"),
      dir).get
    assert(df.columns.toSeq == Seq("id", "value"))
    assert(df.count() == 3) // 2 rows from day1 + 1 from day2; missing day skipped
  }

  test("fetchCsvBatch with all days missing is None, not an empty scan") {
    assert(HttpFetch.fetchCsvBatch(spark,
      Seq(s"$base/missing.csv" -> "x.csv"), freshDir()).isEmpty)
  }

  test("postJson delivers the summary payload (K3 response surface)") {
    val payload = """{"rows_loaded":2878,"from":"1998-06-01","to":"1998-09-01"}"""
    assert(HttpFetch.postJson(s"$base/callback", payload).contains(200))
    assert(seenBody.contains(payload))
  }

  test("postJson: unreachable endpoint is None after retries") {
    assert(HttpFetch.postJson("http://localhost:1/cb", "{}",
      FetchConfig(maxRetries = 1, retryBackoffMs = 10)).isEmpty)
  }
}
