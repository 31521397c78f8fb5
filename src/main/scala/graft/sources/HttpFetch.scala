package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.Dataset

/** One fetched document: `body` is null whenever the server did not
  * answer 200 (the reference's per-filing degradation — a bad fetch
  * nulls that filing's output and the run continues,
  * ETFQuarterlyHoldingsExtractor.py:61-63). `status` keeps the observed
  * code (-1 = transport error) so a pipeline can report fetch health as
  * data instead of logs. */
final case class Fetched(doc_id: Long, status: Int, body: String)

/** S2 ONLINE MODE — the per-document HTTP fetch as a distributed source
  * stage: `Dataset[(id, url)].mapPartitions`, one connection-pooling
  * client PER PARTITION (not per row — connection/TLS reuse is the whole
  * point of partition-grain clients), each row fetched executor-side with
  * per-row error degradation: non-200 or transport failure → null body,
  * never a task failure. The reference does this sequentially on one
  * machine with one `requests` session (ETFQuarterlyHoldingsExtractor.py
  * :30-39,58-63); here the same semantics are a narrow map stage — at
  * 100 TB the fetch list is just more partitions, and politeness is
  * enforced per-partition via `perRequestDelayMs` (partitions × rate =
  * the global request budget, the knob a crawl sizes against the origin).
  *
  * This sandbox has no egress, so the contract is proven against a
  * loopback fixture server in HttpFetchSpec: fetch→extract over HTTP is
  * row-identical to the offline `x_doc_source` corpus scan, and poisoned
  * URLs degrade to null-body rows without failing the job.
  */
object HttpFetch {

  /** Fetch every (doc_id, url) row, executor-side. Returns one row per
    * input row — fetch failures are DATA (null body + status), so the
    * output cardinality is exactly the input's and downstream joins
    * against the fetch list stay key-complete. */
  def fetch(
      urls: Dataset[(Long, String)],
      connectTimeoutMs: Int = 5000,
      readTimeoutMs: Int = 30000,
      perRequestDelayMs: Long = 0L,
      userAgent: String = "graft-engine/1.0"): Dataset[Fetched] = {
    import urls.sparkSession.implicits._
    urls.mapPartitions { it =>
      // one client per partition: pooled keep-alive connections across
      // all rows of the task; never serialized (built inside the task)
      val client = HttpClient.newBuilder()
        .connectTimeout(Duration.ofMillis(connectTimeoutMs.toLong))
        .followRedirects(HttpClient.Redirect.NORMAL)
        .build()
      it.map { case (id, url) =>
        if (perRequestDelayMs > 0) Thread.sleep(perRequestDelayMs)
        try {
          val req = HttpRequest.newBuilder(URI.create(url))
            .timeout(Duration.ofMillis(readTimeoutMs.toLong))
            .header("User-Agent", userAgent)
            .GET().build()
          val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
          if (resp.statusCode() == 200) Fetched(id, 200, resp.body())
          else Fetched(id, resp.statusCode(), null)
        } catch {
          // per-row failures are DATA, whatever the failure plane:
          // transport (refused, DNS, timeout → IOException) and
          // REQUEST-BUILD failures (a malformed URL in the fetch list —
          // URI.create/newBuilder throw IllegalArgumentException) both
          // degrade to a null-body row. One poisoned row must never
          // fail the task ("output cardinality ≡ input" above); only
          // interruption (cancellation) stays fatal.
          case e: InterruptedException => throw e
          case _: java.io.IOException | _: IllegalArgumentException |
               _: SecurityException => Fetched(id, -1, null)
        }
      }
    }
  }
}
