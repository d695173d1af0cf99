package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}

/** HTTP-CSV ingestion (SURVEY.md §2.1 S1): the reference's staging fetch —
  * GET with a Bearer token, treat any non-2xx as "no data for this window"
  * ([function_app.py:56-73]: `if resp.status_code != 200: return None`),
  * optionally pause between calls (the reference's rate limiting,
  * [function_app.py:111-112]).
  *
  * Architecture note for 100 TB: the HTTP hop is an EDGE concern — a
  * single-writer staging step that lands files once, after which everything
  * is a declarative scan ([[Tables.csv]]) with Catalyst pruning. Keeping the
  * fetch out of executors is deliberate: an HTTP call per partition would
  * hammer the upstream API from a thousand workers and make retries
  * non-idempotent. Fetch-to-staging once; scan forever.
  */
object HttpFetch {

  final case class FetchConfig(
      bearerToken: Option[String] = None,
      maxRetries: Int = 3,
      retryBackoffMs: Long = 200,
      requestTimeout: Duration = Duration.ofSeconds(30),
      /** reference-style politeness delay between consecutive fetches */
      interRequestDelayMs: Long = 0)

  private def client(cfg: FetchConfig): HttpClient =
    HttpClient.newBuilder().connectTimeout(cfg.requestTimeout).build()

  private def request(url: String, cfg: FetchConfig): HttpRequest.Builder = {
    val b = HttpRequest.newBuilder(URI.create(url)).timeout(cfg.requestTimeout)
    cfg.bearerToken.foreach(t => b.header("Authorization", s"Bearer $t"))
    b
  }

  // One retry state machine for every HTTP interaction: 2xx → Done, 4xx →
  // NoData (deterministic "no data", the reference contract — never
  // retried), 5xx/transport error → Retry with linear backoff.
  private sealed trait Attempt[+T]
  private final case class Done[T](value: T) extends Attempt[T]
  private case object NoData extends Attempt[Nothing]
  private case object Retry extends Attempt[Nothing]

  private def withRetries[T](cfg: FetchConfig)(op: () => Attempt[T]): Option[T] = {
    var attempt = 0
    while (attempt <= cfg.maxRetries) {
      if (attempt > 0) Thread.sleep(cfg.retryBackoffMs * attempt)
      op() match {
        case Done(v) => return Some(v)
        case NoData  => return None
        case Retry   => ()
      }
      attempt += 1
    }
    None
  }

  /** Fetch one URL into `stagingDir/fileName`.
    *
    * Returns Some(path) on 2xx; None on 4xx; retries connect/transport
    * errors and 5xx up to `maxRetries` times, then None. The write is
    * atomic (temp file + ATOMIC_MOVE rename) wherever the staging
    * filesystem supports atomic rename, best-effort (plain move) elsewhere,
    * so a concurrent [[Tables.csv]] scan never sees a half-written file;
    * failed attempts delete their temp file.
    */
  def fetchToStaging(url: String, stagingDir: String, fileName: String,
      cfg: FetchConfig = FetchConfig()): Option[Path] =
    fetchToStaging(url, stagingDir, fileName, cfg, client(cfg))

  private def fetchToStaging(url: String, stagingDir: String, fileName: String,
      cfg: FetchConfig, http: HttpClient): Option[Path] = {
    val dir = Paths.get(stagingDir)
    Files.createDirectories(dir)
    val target = dir.resolve(fileName)
    withRetries(cfg) { () =>
      // temp-file creation stays inside the retry scope: a transient
      // staging-volume error (ENOSPC, concurrent cleanup) retries then
      // yields None like any transport error — it must not crash the batch
      var tmp: Path = null
      try {
        tmp = Files.createTempFile(dir, s".$fileName", ".part")
        val resp = http.send(request(url, cfg).GET().build(),
          HttpResponse.BodyHandlers.ofFile(tmp))
        val code = resp.statusCode()
        if (code >= 200 && code < 300) {
          // publish via atomic rename where the filesystem supports it so a
          // concurrent Tables.csv scan never observes a half-written target;
          // fall back to a plain (best-effort) move elsewhere. The fallback
          // catches ANY IOException, not just AtomicMoveNotSupportedException:
          // with ATOMIC_MOVE + an existing target, replace-vs-throw is
          // implementation-specific (Files.move javadoc), and a thrown
          // FileAlreadyExistsException must not read as a transport error.
          // If the plain move also fails, the outer retry handles it.
          try Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING,
            StandardCopyOption.ATOMIC_MOVE)
          catch {
            case _: java.io.IOException =>
              Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING)
          }
          Done(target)
        } else {
          Files.deleteIfExists(tmp)
          if (code < 500) NoData else Retry
        }
      } catch {
        case _: java.io.IOException =>
          if (tmp != null) Files.deleteIfExists(tmp)
          Retry
      }
    }
  }

  /** K3 — the reference's HTTP response surface ([function_app.py:397-402]:
    * the pipeline answers with a small JSON summary of what it loaded).
    * Driver-side POST of a summary payload to a callback endpoint; the
    * payload is summary-scale BY CONTRACT (row counts, window bounds) —
    * results themselves stay in the sinks, never on the wire.
    *
    * Returns Some(status) on 2xx; retries transport errors/5xx like
    * [[fetchToStaging]]; None when the endpoint never accepted it.
    */
  def postJson(url: String, json: String, cfg: FetchConfig = FetchConfig()): Option[Int] = {
    val http = client(cfg)
    val req = request(url, cfg)
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(json))
      .build()
    withRetries(cfg) { () =>
      try {
        val code = http.send(req, HttpResponse.BodyHandlers.discarding()).statusCode()
        if (code >= 200 && code < 300) Done(code)
        else if (code < 500) NoData
        else Retry
      } catch {
        case _: java.io.IOException => Retry
      }
    }
  }

  /** The reference's multi-fetch loop ([function_app.py:95-112]): fetch each
    * (url, fileName) into the staging dir — skipping windows that returned
    * no data, like the reference's `if df is not None` guard — then hand the
    * landed files to [[Tables.csv]] as ONE DataFrame (union happens at scan
    * level; Spark lists the files, not the driver).
    *
    * Returns None when every fetch came back empty (so callers can
    * distinguish "no files at all" from an empty CSV).
    */
  def fetchCsvBatch(spark: SparkSession, fetches: Seq[(String, String)], stagingDir: String,
      cfg: FetchConfig = FetchConfig()): Option[DataFrame] = {
    val http = client(cfg) // ONE client (selector thread + pool) for the whole batch
    val landed = fetches.zipWithIndex.flatMap { case ((url, name), i) =>
      if (i > 0 && cfg.interRequestDelayMs > 0) Thread.sleep(cfg.interRequestDelayMs)
      fetchToStaging(url, stagingDir, name, cfg, http)
    }
    if (landed.isEmpty) None
    else Some(Tables.csv(spark, landed.map(_.toString): _*))
  }
}
