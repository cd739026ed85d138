package graft.engine

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.api.{HttpApiClient, MetaRecord}

/** Exercises the production HTTP client's transport contract against an
  * in-process stub server: 5xx retry schedule, retry exhaustion, the
  * single 401-refresh, payload shapes, and the 4-call registration
  * sequence (reference `api/client.py:65-215`, `base.py:858-918`).
  */
class HttpApiClientSpec extends AnyFunSuite {

  /** Start a stub server; `handler` returns (status, body) per request. */
  private def withServer(handler: (String, String, String) => (Int, String))
                        (body: (String, () => List[(String, String)]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    server.createContext("/", (ex: HttpExchange) => {
      val reqBody = new String(ex.getRequestBody.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      val path = ex.getRequestURI.toString
      seen.add((s"${ex.getRequestMethod} ${path.takeWhile(_ != '?')}", reqBody))
      val auth = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      val (status, resp) = handler(path, reqBody, auth)
      val bytes = resp.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}",
      () => { val b = List.newBuilder[(String, String)]; seen.forEach(b += _); b.result() })
    finally server.stop(0)
  }

  private def cfg(endpoint: String, tokens: Iterator[String] = Iterator.continually("tok1"),
                  sleeps: scala.collection.mutable.Buffer[Long] =
                    scala.collection.mutable.Buffer.empty) = {
    val last = new java.util.concurrent.atomic.AtomicReference[String]("tok1")
    HttpApiClient.Config(
      endpoint = endpoint,
      tokenProvider = () => { if (tokens.hasNext) last.set(tokens.next()); last.get() },
      ingestorId = "ing-1",
      sleep = sleeps.append(_))
  }

  test("client survives a Java serialization round-trip (executor shipping)") {
    // The metadata send runs in foreachPartition tasks, so the client
    // rides the task closure: a non-serializable capture (the lazy
    // HttpClient must stay @transient) would only surface at runtime
    // on the cluster. CLI-style config: env-reading lambdas, default
    // Thread.sleep.
    withServer((_, _, _) => (200, "{}")) { (url, _) =>
      val original = new HttpApiClient(HttpApiClient.Config(
        endpoint = url,
        tokenProvider = () => sys.env.getOrElse("GRAFT_BACKEND_TOKEN", "t0"),
        ingestorId = "ing-ser"))
      val bos = new java.io.ByteArrayOutputStream()
      new java.io.ObjectOutputStream(bos).writeObject(original)
      val copy = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray))
        .readObject().asInstanceOf[HttpApiClient]
      assert(copy.sendBatch("t", Seq(MetaRecord("d1", "train", "l", false, "ing-ser")))
        == Right(1))
    }
  }

  test("5xx retried with exponential backoff until success") {
    val n = new AtomicInteger(0)
    val sleeps = scala.collection.mutable.Buffer.empty[Long]
    withServer((_, _, _) =>
      if (n.incrementAndGet() <= 2) (503, "unavailable") else (200, "{}")) {
      (url, _) =>
        val c = new HttpApiClient(cfg(url, sleeps = sleeps))
        assert(c.prepareDataset("t").isRight)
        assert(n.get() == 3)
        assert(sleeps.toList == List(1000L, 2000L)) // backoff 1s then 2s
    }
  }

  test("persistent 5xx exhausts 5 attempts and fails loud") {
    val n = new AtomicInteger(0)
    val sleeps = scala.collection.mutable.Buffer.empty[Long]
    withServer((_, _, _) => { n.incrementAndGet(); (500, "boom") }) { (url, _) =>
      val c = new HttpApiClient(cfg(url, sleeps = sleeps))
      val r = c.sendGlobalMeta("t", "{}")
      assert(r.left.exists(_.contains("HTTP 500")))
      assert(n.get() == 5)
      assert(sleeps.toList == List(1000L, 2000L, 4000L, 8000L))
    }
  }

  test("401 triggers one token refresh and a retried re-send") {
    withServer((_, _, auth) =>
      if (auth == "TOKEN tok1") (401, "expired")
      else if (auth == "TOKEN tok2") (200, "{}")
      else (403, "bad")) { (url, _) =>
      val c = new HttpApiClient(cfg(url, tokens = Iterator("tok1", "tok2")))
      assert(c.prepareDataset("t").isRight)
    }
  }

  test("401 with an unchanged token is terminal — no second attempt") {
    val n = new AtomicInteger(0)
    withServer((_, _, _) => { n.incrementAndGet(); (401, "expired") }) { (url, _) =>
      val c = new HttpApiClient(cfg(url, tokens = Iterator.continually("tok1")))
      val r = c.prepareDataset("t")
      assert(r.left.exists(_.contains("HTTP 401")))
      assert(n.get() == 1) // refresh returned the same token: no re-send
    }
  }

  test("sendBatch posts the wire-compatible record array") {
    withServer((_, _, _) => (200, "{}")) { (url, seen) =>
      val c = new HttpApiClient(cfg(url))
      val r = c.sendBatch("tbl x", Seq(
        MetaRecord("id\"1", "train", "cat", isSample = false, "ing-1"),
        MetaRecord("id2", "test", null, isSample = true, "ing-1"))) // null label must not NPE
      assert(r == Right(2))
      val (line, body) = seen().head
      // RFC 3986 path segment: space is %20, never '+' (servers treat
      // '+' in a path as a literal plus).
      assert(line == "POST /global_meta/tbl%20x/")
      assert(body.contains(""""data_id":"id\"1""""))
      assert(body.contains(""""injestor_id":"ing-1""""))
      assert(body.contains(""""is_sample":true"""))
      assert(body.contains(""""label":""""")) // null label → empty string, reference default
    }
  }

  test("request timeout is retried as an IO error, then fails loud") {
    withServer((_, _, _) => { Thread.sleep(600); (200, "{}") }) { (url, _) =>
      val sleeps = scala.collection.mutable.Buffer.empty[Long]
      val c = new HttpApiClient(cfg(url, sleeps = sleeps)
        .copy(timeoutMs = 150, maxAttempts = 2))
      val r = c.prepareDataset("t")
      assert(r.left.exists(_.contains("IO error")))
      // the timed-out attempt was retried once (one backoff sleep
      // between the two attempts) before failing loud
      assert(sleeps.toList == List(1000L))
    }
  }

  test("3xx is a failure, not silent success (redirects are never followed)") {
    withServer((_, _, _) => (301, "")) { (url, _) =>
      val c = new HttpApiClient(cfg(url))
      assert(c.prepareDataset("t").left.exists(_.contains("HTTP 301")))
    }
  }

  test("registerDataset runs the 4-call sequence in order and stops at first failure") {
    withServer((path, _, _) =>
      if (path.contains("/dataset/")) (500, "boom") else (200, "{}")) {
      (url, seen) =>
        val c = new HttpApiClient(cfg(url))
        val r = c.registerDataset("t1", """{"a":"INT"}""", selfSupervised = false)
        assert(r.left.exists(_.contains("create_dataset")))
        val paths = seen().map(_._1).distinct
        assert(paths == List(
          "GET /global_meta/generate-edge-labels-meta/",
          "POST /global_meta/global_metadata/",
          "GET /global_meta/prepare/",
          "POST /dataset/"))
    }
  }

  test("registerDataset skips edge-label meta when self-supervised") {
    withServer((_, _, _) => (200, "{}")) { (url, seen) =>
      val c = new HttpApiClient(cfg(url))
      assert(c.registerDataset("t1", "{}", selfSupervised = true).isRight)
      assert(!seen().exists(_._1.contains("generate-edge-labels-meta")))
      assert(seen().map(_._1).count(_ == "POST /dataset/") == 1)
    }
  }
}
