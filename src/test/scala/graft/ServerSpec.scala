package graft

import graft.server.QueryServer
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** Drive the HTTP face end-to-end on an ephemeral port. */
class ServerSpec extends SparkSpec {

  private def get(port: Int, path: String): (Int, String) = {
    val rsp = HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (rsp.statusCode(), rsp.body())
  }

  test("query server serves health, listing, queries, and errors") {
    val srv = new QueryServer(spark, sf)
    srv.start()
    try {
      val port = srv.boundPort
      assert(get(port, "/health") == (200, """{"status":"ok"}"""))

      val (lc, listing) = get(port, "/queries")
      assert(lc == 200 && listing.contains("crunch_global") && listing.contains("ann_topk"))

      val (qc, body) = get(port, "/query/crunch_phases?limit=5")
      assert(qc == 200 && body.startsWith("[{") && body.contains("\"phase\""))

      val (nc, _) = get(port, "/query/nope")
      assert(nc == 404)

      val (sc, sfBody) = get(port, s"/query/dedup_exact?sf=$sf&limit=2")
      assert(sc == 200 && sfBody.contains("content_hash"))

      // sf whitelist: only sibling sf* dirs of the default are servable
      val (fc, _) = get(port, "/query/dedup_exact?sf=/etc")
      assert(fc == 403)
      val (tc, _) = get(port, s"/query/dedup_exact?sf=${sf}/../../etc")
      assert(tc == 403)

      // limit is clamped, not trusted: a huge/negative limit still answers
      val (hc, hugeBody) = get(port, "/query/crunch_phases?limit=2000000000")
      assert(hc == 200 && hugeBody.startsWith("[{"))
      val (negc, negBody) = get(port, "/query/crunch_phases?limit=-5")
      assert(negc == 200 && negBody.startsWith("[{"))
      val (badc, _) = get(port, "/query/crunch_phases?limit=abc")
      assert(badc == 400)
    } finally srv.stop()
  }
}
