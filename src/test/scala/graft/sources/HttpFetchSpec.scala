package graft.sources

import java.io.File
import java.net.InetSocketAddress
import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.TestSpark
import graft.extract.NportKernel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S2 online-mode contract, proven with NO egress: a loopback fixture
  * server serves the staged one-file-per-doc corpus; the executor-side
  * `mapPartitions` fetch + NportKernel extraction must be row-identical
  * to the offline `x_doc_source` scan of the same files, and poisoned
  * URLs (404s, refused connections) must degrade to null-body ROWS —
  * never task failures — matching the reference's per-filing
  * error-to-None behavior (ETFQuarterlyHoldingsExtractor.py:61-63). */
class HttpFetchSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  private val outCols = Seq("reporting_date", "issuer", "shares", "value_usd", "pct_net_assets")

  /** Serves GET /<filename> from the staged doc dir; anything else 404s. */
  private def withFixtureServer[A](dir: String)(f: Int => A): A = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val name = ex.getRequestURI.getPath.stripPrefix("/")
        val file = new File(dir, name)
        if (name.contains("/") || !file.isFile) {
          ex.sendResponseHeaders(404, -1)
        } else {
          val bytes = Files.readAllBytes(file.toPath)
          ex.sendResponseHeaders(200, bytes.length.toLong)
          ex.getResponseBody.write(bytes)
        }
        ex.close()
      }
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
    try f(server.getAddress.getPort)
    finally server.stop(0)
  }

  test("fetch+extract over loopback HTTP ≡ the offline doc-source rows") {
    import s.implicits._
    val dir = DocStage.ensureStaged(s, sf)
    val files = Option(new File(dir).listFiles).getOrElse(Array.empty)
      .filter(_.getName.startsWith("doc_")).map(_.getName).sorted.toSeq
    assert(files.nonEmpty, "staged corpus must exist")
    withFixtureServer(dir) { port =>
      val urls = files.zipWithIndex.map { case (name, i) =>
        (i.toLong, s"http://127.0.0.1:$port/$name")
      }
      val fetched = HttpFetch.fetch(s.createDataset(urls).repartition(4))
      val got = fetched
        .filter(col("status") === 200)
        .select(col("body").as[String])
        .flatMap(NportKernel.extractRows _)
        .toDF()
        .select(outCols.map(col): _*)
        .orderBy(outCols.map(col): _*)
        .collect()
        .toSeq
      val want = graft.operators.Extraction.docSourceHoldings(s, sf).collect().toSeq
      assert(got == want,
        s"HTTP fetch+extract diverged from the offline scan: got ${got.size} rows, want ${want.size}")
      assert(got.nonEmpty, "fixture corpus must yield holdings")
    }
  }

  test("S1 online: index fetch + parse ≡ the offline filing-index rows; dead funds vanish") {
    import s.implicits._
    val dir = FilingIndex.ensureStaged(s, sf)
    // re-serve the staged JSON-lines fixture the way EDGAR serves it: one
    // JSON document per fund at CIK{cik}.json
    val perFund = Files.createTempDirectory("s1_online").toFile
    val cikRe = """"cik":(\d+)""".r
    val ciks = Option(new File(dir).listFiles).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith("part-")).sortBy(_.getName)
      .flatMap(f => Files.readAllLines(f.toPath).toArray(Array.empty[String]))
      .map { line =>
        val cik = cikRe.findFirstMatchIn(line).get.group(1).toLong
        Files.write(new File(perFund, s"CIK$cik.json").toPath, line.getBytes("UTF-8"))
        cik
      }.toSeq
    assert(ciks.nonEmpty, "staged index fixture must exist")
    val ordered = Seq("cik", "accession_number", "filing_date", "form_type",
      "primary_document", "doc_url")
    withFixtureServer(perFund.getPath) { port =>
      // every live fund, plus a dead one (404) and a refused port: the
      // dead funds must contribute zero rows, not failures (ref :36-38)
      val urls = ciks.map(c => (c, s"http://127.0.0.1:$port/CIK$c.json")) ++
        Seq((-1L, s"http://127.0.0.1:$port/CIK_no_such_fund.json"),
          (-2L, "http://127.0.0.1:1/CIK0.json"))
      val got = FilingIndex.fromFetched(
          HttpFetch.fetch(s.createDataset(urls).repartition(4)))
        .select(ordered.map(col): _*).orderBy(ordered.map(col): _*).collect().toSeq
      val want = FilingIndex.filingIndex(s, sf)
        .select(ordered.map(col): _*).orderBy(ordered.map(col): _*).collect().toSeq
      assert(got == want,
        s"online index diverged from offline: got ${got.size} rows, want ${want.size}")
      assert(got.nonEmpty, "fixture must yield NPORT-P filings")
    }
    // every fund unreachable (refused port + malformed URL): an EMPTY
    // index, not a job failure
    val empty = FilingIndex.fromFetched(HttpFetch.fetch(s.createDataset(
      Seq((1L, "http://127.0.0.1:1/CIK1.json"), (2L, "not a url at all")))))
    assert(empty.count() == 0, "unreachable funds must yield an empty index")
  }

  test("flagship pipeline over loopback HTTP ≡ the offline corpus scan") {
    import s.implicits._
    val dir = DocStage.ensureStaged(s, sf)
    val files = Option(new File(dir).listFiles).getOrElse(Array.empty)
      .filter(_.getName.startsWith("doc_")).map(_.getName).sorted.toSeq
    assert(files.nonEmpty, "staged corpus must exist")
    withFixtureServer(dir) { port =>
      val idRe = """doc_(\d+)\.html""".r
      val urls = files.map { name =>
        val idRe(id) = name: @unchecked
        (id.toLong, s"http://127.0.0.1:$port/$name")
      }
      val docs = HttpFetch.fetch(s.createDataset(urls).repartition(4))
        .filter(col("status") === 200)
        .select(col("doc_id"), col("body").as("value"))
      val online = graft.operators.Extraction
        .pipelineE2eFromDocs(s, sf, docs).collect().toSeq
      val offline = graft.operators.Extraction
        .queries("x_pipeline_e2e")(s, sf).collect().toSeq
      assert(online == offline,
        s"online flagship diverged: ${online.size} vs ${offline.size} rows")
      assert(online.nonEmpty, "flagship must produce chunks")
    }
  }

  test("transient 5xx recovers via bounded backoff; permanent failures still degrade per-row") {
    import s.implicits._
    // counts per path, so the retry discipline is observable: how many
    // times did the fetcher actually ask?
    val hits = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicInteger]()
    def hit(path: String): Int =
      hits.computeIfAbsent(path, _ => new java.util.concurrent.atomic.AtomicInteger(0))
        .incrementAndGet()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val path = ex.getRequestURI.getPath
        val n = hit(path)
        path match {
          case "/flaky" if n <= 2 => ex.sendResponseHeaders(503, -1) // then 200
          case "/flaky" =>
            val b = "recovered".getBytes("UTF-8")
            ex.sendResponseHeaders(200, b.length.toLong); ex.getResponseBody.write(b)
          case "/always500" => ex.sendResponseHeaders(500, -1)
          case _ => ex.sendResponseHeaders(404, -1)
        }
        ex.close()
      }
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    try {
      val port = server.getAddress.getPort
      val rows = HttpFetch.fetch(
        s.createDataset(Seq(
          (1L, s"http://127.0.0.1:$port/flaky"),
          (2L, s"http://127.0.0.1:$port/always500"),
          (3L, s"http://127.0.0.1:$port/gone"))),
        maxRetries = 2, backoffBaseMs = 10L)
        .collect().sortBy(_.doc_id)
      assert(rows.length == 3, "every input row must yield exactly one output row")
      // flaky: 503, 503, 200 — the transient failure RECOVERED
      assert(rows(0).status == 200 && rows(0).body == "recovered",
        s"flaky endpoint must recover via retry, got ${rows(0)}")
      assert(hits.get("/flaky").get() == 3, "flaky: 2 failed attempts + 1 success")
      // permanent 5xx: retries exhausted, degrades to data
      assert(rows(1).status == 500 && rows(1).body == null)
      assert(hits.get("/always500").get() == 3, "permanent 5xx retried exactly maxRetries times")
      // 404 is PERMANENT: the origin answered — never re-asked
      assert(rows(2).status == 404 && rows(2).body == null)
      assert(hits.get("/gone").get() == 1, "4xx must not be retried")
    } finally server.stop(0)
  }

  test("non-200 and transport failures degrade to null-body rows, never task failures") {
    import s.implicits._
    val dir = DocStage.ensureStaged(s, sf)
    val files = Option(new File(dir).listFiles).getOrElse(Array.empty)
      .filter(_.getName.startsWith("doc_")).map(_.getName).sorted.toSeq
    withFixtureServer(dir) { port =>
      val good = (1L, s"http://127.0.0.1:$port/${files.head}")
      val missing = (2L, s"http://127.0.0.1:$port/no_such_doc.html")
      // a port nothing listens on: transport-level failure, not a status
      val refused = (3L, "http://127.0.0.1:1/doc.html")
      val rows = HttpFetch.fetch(s.createDataset(Seq(good, missing, refused)))
        .collect().sortBy(_.doc_id)
      assert(rows.length == 3, "every input row must yield exactly one output row")
      assert(rows(0).status == 200 && rows(0).body != null)
      assert(rows(1).status == 404 && rows(1).body == null)
      assert(rows(2).status == -1 && rows(2).body == null)
    }
  }
}
