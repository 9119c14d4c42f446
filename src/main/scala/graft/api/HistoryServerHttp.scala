package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Minimal HTTP binding over [[HistoryServerApi]]: serves the
 * reference's route surface (reference: src/api.rs:24-48 for the v1
 * router, src/analytics_api.rs:16-32 for the nested analytics
 * routes, plus /health) from the JDK's built-in HttpServer — no
 * extra dependency, ~one screen of routing. Each route is exactly
 * one [[HistoryServerApi]] function call serialized row-per-object
 * via Dataset.toJSON, so the HTTP layer adds no query semantics of
 * its own and the DataFrame functions stay the single source of
 * truth (HistoryServerHttpSpec asserts route bytes == function
 * rows).
 *
 * Scale note: responses are bounded by each route's `limit`
 * parameter (reference AnalyticsQuery semantics), so the
 * driver-side collect inside toJSON is serving-bounded, never
 * corpus-bounded. A production deployment would put the canonical
 * frame behind a cached view and this server on the driver; the
 * query plans are the same pruned/pushed-down plans the library
 * runs everywhere else.
 */
class HistoryServerHttp(spark: SparkSession, canon: DataFrame, port: Int = 0) {

  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  /** Start serving; returns the bound port (ephemeral when 0). */
  def start(): Int = {
    server.createContext("/", (ex: HttpExchange) => handle(ex))
    server.setExecutor(null) // serve on the dispatch thread
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = server.stop(0)

  private def param(ex: HttpExchange, name: String): Option[String] =
    Option(ex.getRequestURI.getRawQuery).flatMap {
      _.split("&").iterator.map(_.split("=", 2)).collectFirst {
        case Array(k, v) if k == name =>
          java.net.URLDecoder.decode(v, "UTF-8")
      }
    }

  private def intParam(ex: HttpExchange, name: String, dflt: Int): Int =
    param(ex, name).map(_.toInt).getOrElse(dflt)

  /** One JSON array, one object per row — the shape the reference's
   *  Vec<T> serde serialization produces. */
  private def rowsJson(df: DataFrame): String =
    df.toJSON.collect().mkString("[", ",", "]")

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length)
    try ex.getResponseBody.write(bytes) finally ex.close()
  }

  /** Route table: the v1 application routes take the app id as the
   *  path segment between /applications/ and the trailing verb. */
  private def handle(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath
    try {
      val body: Option[String] = path match {
        case "/health" =>
          Some(rowsJson(HistoryServerApi.health(canon)))
        case "/api/v1/version" =>
          Some(rowsJson(HistoryServerApi.version(spark)))
        case "/api/v1/applications" =>
          Some(rowsJson(HistoryServerApi.applications(canon,
            param(ex, "minDate"), param(ex, "maxDate"),
            intParam(ex, "limit", 100))))
        case "/api/v1/optimization/resource-hogs" =>
          Some(rowsJson(HistoryServerApi.topResourceConsumers(canon,
            intParam(ex, "limit", 10))))
        case "/api/v1/optimization/efficiency-analysis" =>
          Some(rowsJson(HistoryServerApi.efficiencyAnalysis(canon,
            intParam(ex, "limit", 20))))
        case "/api/v1/capacity/usage-trends" =>
          Some(rowsJson(HistoryServerApi.capacityTrends(canon,
            intParam(ex, "limit", 30),
            param(ex, "startDate"), param(ex, "endDate"))))
        case "/api/v1/capacity/cost-optimization" =>
          Some(rowsJson(HistoryServerApi.costOptimization(canon,
            intParam(ex, "limit", 15))))
        case AppRoute(appId, verb) => verb match {
          case "" =>
            Some(rowsJson(HistoryServerApi.application(canon, appId)))
          case "jobs" =>
            Some(rowsJson(HistoryServerApi.jobs(canon, appId)))
          case "stages" =>
            Some(rowsJson(HistoryServerApi.stages(canon, appId)))
          case "executors" =>
            Some(rowsJson(HistoryServerApi.executors(canon, appId)))
          case "storage/rdd" =>
            Some(rowsJson(HistoryServerApi.storage(canon, appId)))
          case "environment" =>
            Some(rowsJson(HistoryServerApi.environment(canon, appId)))
          case "sql" =>
            Some(rowsJson(HistoryServerApi.sqlExecutions(canon, appId)))
          case _ => None
        }
        case _ => None
      }
      body match {
        case Some(b) => respond(ex, 200, b)
        case None => respond(ex, 404, """{"error":"not found"}""")
      }
    } catch {
      case e: Throwable =>
        respond(ex, 500,
          s"""{"error":${ujsonString(e.toString)}}""")
    }
  }

  private def ujsonString(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private object AppRoute {
    private val Prefix = "/api/v1/applications/"
    def unapply(path: String): Option[(String, String)] =
      if (!path.startsWith(Prefix)) None
      else {
        val rest = path.stripPrefix(Prefix)
        val slash = rest.indexOf('/')
        if (slash < 0) Some((rest, ""))
        else Some((rest.take(slash), rest.drop(slash + 1)))
      }
  }
}
