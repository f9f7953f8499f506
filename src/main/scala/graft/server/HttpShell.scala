package graft.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

import graft.{BadRequestException, DatasetLoadException}
import graft.functions.JsonRows
import graft.operators.{Preview, Regression, SortedDelays}
import graft.sources.DataLake

/** Thin HTTP shell reproducing the reference's service surface
  * (build_router, reference main.rs:309-335):
  *
  *   GET  /                              — console page
  *   GET  /data/{id}/preview?limit=N     — main.rs:106-121
  *   GET  /data/{id}/delays?sorting=&limit= — main.rs:260-306
  *   POST /data/{id}/regression          — main.rs:124-203
  *
  * Status mapping mirrors the reference: bad column/cast/empty/degenerate
  * → 400; load failure → 500 (main.rs:114). The library does the work;
  * this class only routes, parses, and serializes — so correctness tests
  * target the library and the shell stays ~200 lines.
  *
  * JDK-built-in httpserver: zero extra dependencies (offline build).
  */
final class HttpShell(spark: SparkSession, baseDir: String, port: Int = 3000) {

  private val lake = new DataLake(spark, baseDir)
  private var server: HttpServer = _

  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/", (ex: HttpExchange) => route(ex))
    server.setExecutor(null) // request-at-a-time; Spark jobs serialize anyway
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private val DataPath = "/data/([^/]+)/(preview|delays|regression)".r

  private def route(ex: HttpExchange): Unit =
    try {
      (ex.getRequestMethod, ex.getRequestURI.getPath) match {
        case ("GET", "/") => respond(ex, 200, HttpShell.consoleHtml, "text/html")
        case ("GET", DataPath(id, "preview")) => preview(ex, id)
        case ("GET", DataPath(id, "delays")) => delays(ex, id)
        case ("POST", DataPath(id, "regression")) => regression(ex, id)
        case _ => respondJson(ex, 404, """{"error":"not found"}""")
      }
    } catch {
      case e: BadRequestException =>
        respondJson(ex, 400, s"""{"error":"${esc(e.getMessage)}"}""")
      case e: DatasetLoadException =>
        respondJson(ex, 500, s"""{"error":"${esc(e.getMessage)}"}""")
      case e: Throwable =>
        respondJson(ex, 500, s"""{"error":"${esc(String.valueOf(e.getMessage))}"}""")
    }

  private def query(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).getOrElse("").split("&").toSeq
      .filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }
      .toMap

  private def intParam(q: Map[String, String], name: String): Option[Int] =
    q.get(name).map { v =>
      try v.toInt
      catch { case _: NumberFormatException =>
        throw BadRequestException(s"invalid $name: '$v'") }
    }

  private def preview(ex: HttpExchange, id: String): Unit = {
    val q = query(ex)
    respondJson(ex, 200, JsonRows.toJson(Preview.run(lake.load(id), intParam(q, "limit"))))
  }

  private def delays(ex: HttpExchange, id: String): Unit = {
    val q = query(ex)
    val sorting = q.get("sorting") match {
      case Some("Desc") => Some(SortedDelays.Desc)
      case Some("Asc") => Some(SortedDelays.Asc)
      case Some(other) => throw BadRequestException(s"invalid sorting: '$other'")
      case None => None
    }
    respondJson(ex, 200,
      JsonRows.toJson(SortedDelays.run(lake.load(id), sorting, intParam(q, "limit"))))
  }

  private def regression(ex: HttpExchange, id: String): Unit = {
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    def field(name: String): String =
      ("\"" + name + "\"\\s*:\\s*\"([^\"]*)\"").r.findFirstMatchIn(body)
        .map(_.group(1))
        .getOrElse(throw BadRequestException(s"missing field: $name"))
    val r = Regression.run(lake.load(id), field("x_col"), field("y_col"))
    val r2 = r.r2.map(_.toString).getOrElse("null")
    respondJson(ex, 200,
      s"""{"slope":${r.slope},"intercept":${r.intercept},"r2":$r2}""")
  }

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  private def respondJson(ex: HttpExchange, code: Int, body: String): Unit =
    respond(ex, code, body, "application/json")

  private def respond(ex: HttpExchange, code: Int, body: String, ctype: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", ctype)
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }
}

object HttpShell {
  /** Minimal console driving the three endpoints (reference main.rs:337-520). */
  val consoleHtml: String =
    """<!DOCTYPE html><html><head><title>graft console</title></head><body>
      |<h1>graft</h1>
      |<p>GET /data/{id}/preview?limit=N · GET /data/{id}/delays?sorting=Desc&limit=N ·
      |POST /data/{id}/regression {"x_col":"...","y_col":"..."}</p>
      |<input id="ds" placeholder="dataset id"/><button onclick="prev()">preview</button>
      |<pre id="out"></pre>
      |<script>
      |async function prev() {
      |  const id = document.getElementById('ds').value;
      |  const r = await fetch(`/data/${id}/preview?limit=10`);
      |  document.getElementById('out').textContent = JSON.stringify(await r.json(), null, 2);
      |}
      |</script></body></html>""".stripMargin

  /** Standalone entry: HttpShell <baseDir> [port]. */
  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("./data")
    val port = args.lift(1).map(_.toInt).getOrElse(3000)
    val spark = graft.SparkEngine.session()
    val shell = new HttpShell(spark, baseDir, port)
    println(s"graft http shell on :${shell.start()} over $baseDir")
    Thread.currentThread().join()
  }
}
