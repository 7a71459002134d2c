package graft.pipeline

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.DataFrame

/** Thin serving layer — the reference's REST surface
  * (MartController.java:19-31: GET /mart/all, GET /mart/statistic)
  * re-expressed over the mart DataFrames, JSON out, zero extra
  * dependencies (JDK `com.sun.net.httpserver`).
  *
  * Serving posture at scale: an HTTP hit must NEVER launch a distributed
  * query. The mart/statistic tables are the pipeline's tiny outputs
  * (≤100 rows — §2.9), so each route is SNAPSHOTTED at registration:
  * one collect per pipeline run, served from driver memory after.
  * Refreshing = re-running the pipeline and re-registering, exactly the
  * reference's precompute-then-serve split (its controller reads a table
  * the ETL job rebuilt). Row JSON comes from `df.toJSON` — Spark's own
  * schema-driven serialization, not hand-rolled rendering.
  */
object Serving {

  /** One JSON array string per route, computed once (the snapshot). */
  def snapshot(df: DataFrame): String =
    df.toJSON.collect().mkString("[", ",", "]")

  /** Start serving `routes` (path → DataFrame) on `port` (0 = ephemeral;
    * read the bound port off the returned server). Caller stops it. */
  def start(port: Int, routes: Map[String, DataFrame]): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    routes.foreach { case (path, df) =>
      val body = snapshot(df).getBytes(UTF_8)
      server.createContext(path, (ex: HttpExchange) => {
        try {
          if (ex.getRequestMethod == "GET" && ex.getRequestURI.getPath == path) {
            ex.getResponseHeaders.set("Content-Type", "application/json; charset=utf-8")
            ex.sendResponseHeaders(200, body.length.toLong)
            ex.getResponseBody.write(body)
          } else {
            ex.sendResponseHeaders(404, -1L)
          }
        } finally ex.close()
      })
    }
    server.setExecutor(null) // serve on the dispatcher thread; tiny payloads
    server.start()
    server
  }
}
