package graft.cli

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors

import org.apache.spark.sql.SparkSession

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** The serving layer the reference delegates to Kibana (its
  * `README.md:187-195` points users at Kibana dashboards over the ES
  * indices): a minimal HTTP query endpoint over the catalog, so the
  * dashboard tiles the reference renders in Kibana are answerable with
  * one GET against this engine.
  *
  *  - `GET /queries`               → JSON list of every catalog query name
  *  - `GET /query/<name>?limit=N`  → run `SparkEntry.queries(name)` on the
  *                                   configured sf dir, return up to N rows
  *                                   as a JSON array of objects (default
  *                                   100, capped at 10 000)
  *  - `GET /health`                → `{"status":"ok"}` (the K5 preflight
  *                                   this engine asks of ITS sinks,
  *                                   answered for its own consumers)
  *
  * Scale note: a serving endpoint returns dashboard tiles, not exports —
  * the `limit` cap bounds the driver-side collect to tile-sized results
  * (`toJSON.take(n)` limits BEFORE collecting). Heavy queries still run
  * distributed; only the final ≤10k rows funnel to the endpoint. This is
  * a dashboard stand-in, not a concurrency-hardened gateway: requests
  * serialize through one SparkSession the way one Kibana panel refresh
  * does.
  */
final class QueryServer(spark: SparkSession, sfDir: String, bindPort: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", bindPort), 0)
  private val pool = Executors.newFixedThreadPool(4, r => {
    val t = new Thread(r, "graft-serve")
    t.setDaemon(true)
    t
  })
  server.setExecutor(pool)

  def port: Int = server.getAddress.getPort
  def baseUrl: String = s"http://127.0.0.1:$port"

  def start(): Unit = server.start()
  def stop(): Unit = { server.stop(0); pool.shutdown() }

  private val MaxLimit = 10000

  server.createContext("/", (ex: HttpExchange) => {
    try handle(ex)
    catch {
      case e: Exception =>
        respond(ex, 500,
          s"""{"error":${jsonString(s"${e.getClass.getSimpleName}: ${e.getMessage}")}}""")
    } finally ex.close()
  })

  private def handle(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath.stripPrefix("/").stripSuffix("/")
    (ex.getRequestMethod, path) match {
      case ("GET", "health") => respond(ex, 200, """{"status":"ok"}""")
      case ("GET", "queries") =>
        val names = graft.SparkEntry.queries.keys.toSeq.sorted
        respond(ex, 200, names.map(jsonString).mkString("[", ",", "]"))
      case ("GET", p) if p.startsWith("query/") =>
        val name = p.stripPrefix("query/")
        graft.SparkEntry.queries.get(name) match {
          case None =>
            respond(ex, 404, s"""{"error":"unknown query","name":${jsonString(name)}}""")
          case Some(build) =>
            val limit = Option(ex.getRequestURI.getQuery)
              .flatMap(_.split('&').collectFirst {
                case kv if kv.startsWith("limit=") =>
                  kv.stripPrefix("limit=").toInt
              })
              .getOrElse(100).max(1).min(MaxLimit)
            // toJSON.take(n): the limit applies before rows reach the
            // driver; each row arrives as a JSON object string
            val rows = build(spark, sfDir).toJSON.take(limit)
            respond(ex, 200, rows.mkString("[", ",", "]"))
        }
      case (m, p) => respond(ex, 404, s"""{"error":"no route $m /$p"}""")
    }
  }

  private def jsonString(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\x00-\\x1f]", " ") + "\""

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
  }
}

/** `ServeMain <sfDir> [port]` — start the query endpoint and block.
  * (The catalog is served from the driver; a production deployment puts
  * a real gateway in front, this is the Kibana-tile stand-in.)
  */
object ServeMain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ServeMain <sfDir> [port]")
    Mains.withSession("graft-serve") { spark =>
      val srv = new QueryServer(spark, args(0),
        if (args.length > 1) args(1).toInt else 0)
      srv.start()
      println(s"graft query endpoint: ${srv.baseUrl} (queries: /queries)")
      Thread.currentThread().join() // serve until killed
    }
  }
}
