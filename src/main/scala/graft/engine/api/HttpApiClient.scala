package graft.engine.api

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Production HTTP implementation of [[ApiClient]] (reference
  * `api/client.py:65-215` transport behavior, `:217-505` endpoints):
  *
  *  - **Retry**: up to `maxAttempts` (reference: 5) total attempts per
  *    request on HTTP 500/502/503/504 and on connect/IO errors, with
  *    exponential backoff 1s, 2s, 4s, 8s (`backoff_factor=1`,
  *    `status_forcelist=[500,502,503,504]`, `client.py:69-74`).
  *  - **One 401 refresh**: a 401 after retries triggers ONE token
  *    re-resolution via `tokenProvider` and one full retried re-send;
  *    if the provider returns the same token the original 401 is
  *    surfaced unchanged (`client.py:174-215` + `_refresh_token`
  *    `:133-172` — "same value → treat the next 401 as terminal").
  *  - **Endpoints** (wire-compatible with the reference, including its
  *    `injestor_id` field spelling): batch POST `global_meta/{table}/`,
  *    global-meta POST `global_meta/global_metadata/`, edge-label GET
  *    `global_meta/generate-edge-labels-meta/`, prepare GET
  *    `global_meta/prepare/`, create POST `dataset/`.
  *  - **Fail-loud contract**: every method returns `Left(message)` on
  *    a final non-2xx — `registerDataset` (trait) then stops at the
  *    first failure, never leaving silent committed-but-unregistered
  *    rows (`base.py:858-918`).
  *
  * `sleep` is injectable so the retry schedule is unit-testable without
  * wall-clock waits; production uses `Thread.sleep`.
  */
object HttpApiClient {

  final case class Config(
      endpoint: String,
      tokenProvider: () => String,
      ingestorId: String,
      dataIntent: String = "train",
      category: String = "tabular_classification",
      dataFormat: String = "csv",
      title: Option[String] = None,
      timeoutMs: Long = 30000,
      maxAttempts: Int = 5,
      backoffBaseMs: Long = 1000,
      sleep: Long => Unit = Thread.sleep)

  private val RetryStatuses = Set(500, 502, 503, 504)

  /** Minimal JSON string escape (no JSON library on the classpath). */
  private[api] def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Query-string encoding (form style: space → '+'). */
  private[api] def urlEnc(s: String): String =
    java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)

  /** Path-segment encoding per RFC 3986: servers decode '+' as a
    * literal plus in paths (only query strings treat it as space), so a
    * space must become %20 here or the batch registers under the wrong
    * table name.
    */
  private[api] def pathEnc(s: String): String = urlEnc(s).replace("+", "%20")
}

final class HttpApiClient(cfg: HttpApiClient.Config) extends ApiClient {
  import HttpApiClient._

  @transient private lazy val http: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(cfg.timeoutMs))
    .build()

  @volatile private var token: String = cfg.tokenProvider()

  private def base: String = cfg.endpoint.stripSuffix("/")

  private def request(method: String, url: String, body: Option[String],
                      tok: String): HttpRequest = {
    val b = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(cfg.timeoutMs))
      .header("Authorization", s"TOKEN $tok")
    val withBody = body match {
      case Some(json) => b.header("Content-Type", "application/json")
        .method(method, HttpRequest.BodyPublishers.ofString(json))
      case None => b.method(method, HttpRequest.BodyPublishers.noBody())
    }
    withBody.build()
  }

  /** One request with the 5xx/IO retry schedule. Returns the FINAL
    * response (any status) or Left on exhausted IO errors.
    */
  private def sendWithRetry(method: String, url: String, body: Option[String],
                            tok: String): Either[String, HttpResponse[String]] = {
    var attempt = 0
    var last: Either[String, HttpResponse[String]] =
      Left("no attempt made")
    while (attempt < cfg.maxAttempts) {
      if (attempt > 0) cfg.sleep(cfg.backoffBaseMs << (attempt - 1))
      last =
        try {
          val r = http.send(request(method, url, body, tok),
            HttpResponse.BodyHandlers.ofString())
          Right(r)
        } catch {
          case e: java.io.IOException => Left(s"IO error: ${e.getMessage}")
          case e: InterruptedException =>
            Thread.currentThread().interrupt()
            return Left(s"interrupted: ${e.getMessage}")
        }
      attempt += 1
      last match {
        case Right(r) if !RetryStatuses.contains(r.statusCode()) => return Right(r)
        case _ => () // retryable status or IO error — loop
      }
    }
    last
  }

  /** Retried request + single 401-refresh (reference `_authed_request`). */
  private def authed(method: String, url: String,
                     body: Option[String]): Either[String, HttpResponse[String]] =
    sendWithRetry(method, url, body, token).flatMap { r =>
      if (r.statusCode() != 401) Right(r)
      else {
        val fresh = cfg.tokenProvider()
        if (fresh == null || fresh == token) Right(r) // terminal: surface the 401
        else {
          token = fresh
          sendWithRetry(method, url, body, token)
        }
      }
    }

  /** Strictly 2xx → Right(response); anything else → Left with status +
    * body. 3xx counts as failure: the client is built with the default
    * Redirect.NEVER policy, so a redirect means the metadata never
    * reached the backend — treating it as delivered would silently break
    * the committed-but-registered invariant.
    */
  private def expectOk(what: String, r: Either[String, HttpResponse[String]])
      : Either[String, HttpResponse[String]] =
    r.flatMap { resp =>
      if (resp.statusCode() >= 200 && resp.statusCode() < 300) Right(resp)
      else Left(s"$what failed: HTTP ${resp.statusCode()}: " +
        Option(resp.body()).getOrElse("").take(2000))
    }.left.map(msg => if (msg.startsWith(what)) msg else s"$what failed: $msg")

  def sendBatch(table: String, batch: Seq[MetaRecord]): Either[String, Int] = {
    // Null-tolerant defaults match the reference payload builder
    // (client.py:240-249: label defaults "", intent defaults "train") —
    // a null label row must not escape the Either contract as an NPE
    // after the DB sink already committed it.
    val payload = batch.map { m =>
      s"""{"data_id":${jstr(Option(m.dataId).getOrElse(""))},""" +
        s""""data_intent":${jstr(Option(m.dataIntent).getOrElse("train"))},""" +
        s""""label":${jstr(Option(m.label).getOrElse(""))},""" +
        s""""is_sample":${m.isSample},""" +
        s""""injestor_id":${jstr(Option(m.ingestorId).getOrElse(""))}}"""
    }.mkString("[", ",", "]")
    expectOk("send_batch",
      authed("POST", s"$base/global_meta/${pathEnc(table)}/", Some(payload)))
      .map(_ => batch.size)
  }

  def sendGenerateEdgeLabelMeta(table: String): Either[String, Unit] =
    expectOk("generate_edge_label_meta",
      authed("GET", s"$base/global_meta/generate-edge-labels-meta/" +
        s"?table_name=${urlEnc(table)}&injestor_id=${urlEnc(cfg.ingestorId)}" +
        s"&data_intent=${urlEnc(cfg.dataIntent)}", None))
      .map(_ => ())

  def sendGlobalMeta(table: String, schemaJson: String): Either[String, Unit] =
    expectOk("global_meta",
      authed("POST", s"$base/global_meta/global_metadata/",
        Some(s"""{"table_name":${jstr(table)},"schema":$schemaJson,""" +
          s""""meta_data":{}}""")))
      .map(_ => ())

  def prepareDataset(table: String): Either[String, Unit] =
    expectOk("prepare",
      authed("GET", s"$base/global_meta/prepare/" +
        s"?category=${urlEnc(cfg.category)}&injestor_id=${urlEnc(cfg.ingestorId)}" +
        s"&data_format=${urlEnc(cfg.dataFormat)}&data_intent=${urlEnc(cfg.dataIntent)}",
        None))
      .map(_ => ())

  def createDataset(table: String): Either[String, Unit] = {
    val title = cfg.title.getOrElse(s"${cfg.category}_${cfg.ingestorId}")
    // Feature modification is a tabular-only affordance (client.py:468-471).
    val allowMod = cfg.category == "tabular_classification"
    expectOk("create_dataset",
      authed("POST", s"$base/dataset/",
        Some(s"""{"title":${jstr(title)},"allow_feature_modification":$allowMod}""")))
      .map(_ => ())
  }
}
