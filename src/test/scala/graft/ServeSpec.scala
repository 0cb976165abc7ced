package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.funsuite.AnyFunSuite

import graft.cli.QueryServer

/** The HTTP serving layer (the reference's Kibana-dashboard role): the
  * catalog answers dashboard GETs with tile-sized JSON.
  */
class ServeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val http = HttpClient.newHttpClient()

  private def get(url: String): (Int, String) = {
    val r = http.send(HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def withServer(f: QueryServer => Unit): Unit = {
    val srv = new QueryServer(spark, "/root/testdata/sf0.001")
    srv.start()
    try f(srv) finally srv.stop()
  }

  test("health, query list, and a dashboard tile round-trip") {
    withServer { srv =>
      assert(get(s"${srv.baseUrl}/health") == (200, """{"status":"ok"}"""))

      val (ls, names) = get(s"${srv.baseUrl}/queries")
      assert(ls == 200)
      assert(names.contains("\"q_hourly_stats\"") && names.contains("\"q_dashboard_tiles\""))

      val (qs, body) = get(s"${srv.baseUrl}/query/q_hourly_stats?limit=3")
      assert(qs == 200)
      // three JSON objects with the query's columns
      assert(body.startsWith("[{") && body.endsWith("}]"))
      assert(body.contains("\"hour_epoch\"") && body.contains("\"event_type\""))
      assert(body.split("\\},\\{").length == 3)
    }
  }

  test("unknown query is a 404, not an exception") {
    withServer { srv =>
      val (st, body) = get(s"${srv.baseUrl}/query/q_nope")
      assert(st == 404 && body.contains("unknown query"))
    }
  }
}
