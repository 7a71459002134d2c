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

  /** Keyed snapshot for parameterized lookups: key-column string value →
    * JSON array of that key's rows. One collect at registration; every
    * HTTP hit is a driver-side hash-map get (the serving analog of the S5
    * point lookup — never a distributed query per request). */
  def keyedSnapshot(df: DataFrame, keyCol: String): Map[String, String] = {
    import org.apache.spark.sql.functions.col
    df.select(col(keyCol).cast("string").as("__k"),
        org.apache.spark.sql.functions.to_json(
          org.apache.spark.sql.functions.struct(df.columns.toIndexedSeq.map(col): _*)).as("__j"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (k, rows) => k -> rows.map(_.getString(1)).mkString("[", ",", "]") }
  }

  /** Start serving `routes` (path → whole-table snapshot) and `lookups`
    * (path → (DataFrame, keyCol): `GET path?<keyCol>=v` returns v's rows,
    * an empty array for unknown keys, 400 when the key param is absent)
    * on `port` (0 = ephemeral; read the bound port off the returned
    * server). Binds loopback by default — an unauthenticated snapshot
    * server has no business on all interfaces; pass an explicit
    * `bindHost` to expose it deliberately. Caller stops it. */
  def start(port: Int, routes: Map[String, DataFrame],
            lookups: Map[String, (DataFrame, String)] = Map.empty,
            bindHost: String = "127.0.0.1"): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress(bindHost, port), 0)

    def respond(ex: HttpExchange, status: Int, body: Option[Array[Byte]]): Unit =
      try {
        body match {
          case Some(b) =>
            ex.getResponseHeaders.set("Content-Type", "application/json; charset=utf-8")
            ex.sendResponseHeaders(status, b.length.toLong)
            ex.getResponseBody.write(b)
          case None => ex.sendResponseHeaders(status, -1L)
        }
      } finally ex.close()

    routes.foreach { case (path, df) =>
      val body = snapshot(df).getBytes(UTF_8)
      server.createContext(path, (ex: HttpExchange) => {
        if (ex.getRequestMethod == "GET" && ex.getRequestURI.getPath == path)
          respond(ex, 200, Some(body))
        else respond(ex, 404, None)
      })
    }

    lookups.foreach { case (path, (df, keyCol)) =>
      val byKey = keyedSnapshot(df, keyCol)
      server.createContext(path, (ex: HttpExchange) => {
        // real query-string parsing: split on '&', take key=value pairs —
        // extra or reordered params must not change which key is looked
        // up, and 400 means the key param is genuinely absent
        val params = Option(ex.getRequestURI.getQuery).getOrElse("")
          .split("&").iterator
          .map(_.split("=", 2))
          .collect { case Array(k, v) =>
            java.net.URLDecoder.decode(k, "UTF-8") ->
              java.net.URLDecoder.decode(v, "UTF-8")
          }
          .toMap
        if (ex.getRequestMethod != "GET" || ex.getRequestURI.getPath != path)
          respond(ex, 404, None)
        else params.get(keyCol) match {
          case None => respond(ex, 400, None)
          case Some(v) =>
            respond(ex, 200, Some(byKey.getOrElse(v, "[]").getBytes(UTF_8)))
        }
      })
    }

    server.setExecutor(null) // serve on the dispatcher thread; tiny payloads
    server.start()
    server
  }
}
