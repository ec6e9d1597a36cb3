package graft.server

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** Thin HTTP wrapper over the registered query surface — the microservice
  * face of the engine (the reference is a queue-worker microservice; its
  * query semantics are the SparkEntry registry, its transport is
  * environment — this is the REST flavor).
  *
  * Routes:
  *   GET /health                     → {"status":"ok"}
  *   GET /queries                    → registered query names
  *   GET /query/<name>?sf=DIR&limit=N → run query, JSON rows (default
  *                                      limit 1000; collect is bounded)
  *   GET /explain/<name>?sf=DIR      → formatted physical plan, text/plain
  *   GET /version?store=<name>       → content version of a point store
  *                                      under `storeRoot` — the web
  *                                      tier's "did anything change?"
  *                                      poll that pairs with the
  *                                      crunch_update notify hook
  *                                      (worker.js:184-190)
  *
  * The server holds ONE SparkSession; queries are declarative DataFrames,
  * so concurrent requests are just concurrent Spark jobs under the
  * session's scheduler. Row payloads go through df.limit(n).toJSON on the
  * executors — the driver only concatenates bounded output.
  */
final class QueryServer(spark: SparkSession, defaultSf: String, port: Int = 0,
                        storeRoot: Option[String] = None) {

  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  /** Max rows a single request may collect onto the driver. */
  val MaxLimit = 10000

  /** The `sf` query param is a filesystem path; unvalidated it lets any
    * HTTP client point the parquet loaders at an arbitrary directory.
    * Whitelist: only sibling `sf*` scale dirs of the configured default
    * (canonicalized, so `..` traversal can't escape). */
  private val sfRoot =
    new java.io.File(defaultSf).getCanonicalFile.getParentFile

  private def resolveSf(requested: Option[String]): Option[String] =
    requested match {
      case None => Some(defaultSf)
      case Some(p) =>
        val f = new java.io.File(p).getCanonicalFile
        if (f.getParentFile == sfRoot && f.getName.startsWith("sf")) Some(f.getPath)
        else None
    }

  def boundPort: Int = server.getAddress.getPort

  private def respond(ex: HttpExchange, code: Int, body: String,
                      ctype: String = "application/json"): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", ctype)
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def param(ex: HttpExchange, key: String): Option[String] =
    Option(ex.getRequestURI.getQuery).toSeq
      .flatMap(_.split("&"))
      .collectFirst { case kv if kv.startsWith(key + "=") =>
        java.net.URLDecoder.decode(kv.drop(key.length + 1), "UTF-8") }

  def start(): Unit = {
    server.createContext("/health", (ex: HttpExchange) =>
      respond(ex, 200, """{"status":"ok"}"""))
    server.createContext("/queries", (ex: HttpExchange) =>
      respond(ex, 200,
        SparkEntry.queries.keys.toSeq.sorted.mkString("[\"", "\",\"", "\"]")))
    server.createContext("/version", (ex: HttpExchange) => {
      (storeRoot, param(ex, "store")) match {
        case (None, _) =>
          respond(ex, 404, """{"error":"no store root configured"}""")
        case (_, None) =>
          respond(ex, 400, """{"error":"store param required"}""")
        case (Some(root), Some(name)) =>
          // same canonicalize-under-root discipline as the sf whitelist:
          // the store param is a directory NAME, never a path (and it is
          // echoed into JSON, so the charset is clamped too)
          val rootDir = new java.io.File(root).getCanonicalFile
          val dir = new java.io.File(rootDir, name).getCanonicalFile
          if (!name.matches("[A-Za-z0-9._-]+") || dir.getParentFile != rootDir)
            respond(ex, 403, """{"error":"store not under the store root"}""")
          else graft.sources.PointStore.versionOf(dir.getPath) match {
            case None =>
              respond(ex, 404, s"""{"error":"no store named '$name'"}""")
            case Some(v) =>
              respond(ex, 200, s"""{"store":"$name","version":$v}""")
          }
      }
    })
    // plan visibility without execution cost: the FORMATTED physical
    // plan of a registered query — what an operator pastes into a scale
    // review (note: queries that drive on-disk lifecycles run their
    // writes during planning, same cost class as /query on them)
    server.createContext("/explain/", (ex: HttpExchange) => {
      val name = ex.getRequestURI.getPath.stripPrefix("/explain/")
      SparkEntry.queries.get(name) match {
        case None => respond(ex, 404, s"""{"error":"unknown query '$name'"}""")
        case Some(fn) =>
          try resolveSf(param(ex, "sf")) match {
            case None =>
              respond(ex, 403, """{"error":"sf not in the allowed scale dirs"}""")
            case Some(sf) =>
              val plan = fn(spark, sf).queryExecution.explainString(
                org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
              respond(ex, 200, plan, ctype = "text/plain; charset=utf-8")
          } catch { case e: Throwable =>
            respond(ex, 500, s"""{"error":"${e.getClass.getSimpleName}"}""")
          }
      }
    })
    server.createContext("/query/", (ex: HttpExchange) => {
      val name = ex.getRequestURI.getPath.stripPrefix("/query/")
      SparkEntry.queries.get(name) match {
        case None => respond(ex, 404, s"""{"error":"unknown query '$name'"}""")
        case Some(fn) =>
          try {
            val limitParam = param(ex, "limit")
            val parsedLimit = limitParam.map(p => scala.util.Try(p.toInt).toOption)
            (resolveSf(param(ex, "sf")), parsedLimit) match {
              case (None, _) =>
                respond(ex, 403, """{"error":"sf not in the allowed scale dirs"}""")
              case (_, Some(None)) =>
                respond(ex, 400, """{"error":"limit must be an integer"}""")
              case (Some(sf), lim) =>
                val limit = lim.flatten.getOrElse(1000).max(1).min(MaxLimit)
                val rows = fn(spark, sf).limit(limit).toJSON.collect()
                respond(ex, 200, rows.mkString("[", ",", "]"))
            }
          } catch { case e: Throwable =>
            respond(ex, 500, s"""{"error":"${e.getClass.getSimpleName}"}""")
          }
      }
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
  }

  def stop(): Unit = server.stop(0)
}

object QueryServer {
  def main(args: Array[String]): Unit = {
    val port = sys.env.getOrElse("GRAFT_PORT", "8080").toInt
    val sf = sys.env.getOrElse("GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val srv = new QueryServer(spark, sf, port)
    srv.start()
    println(s"[graft] query server on :${srv.boundPort}")
    Thread.currentThread.join()
  }
}
