package graft.run

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.nio.file.{Files, Path, Paths}

/** `graft docs --serve` — the reference's `dbt docs serve`
  * (`core/dbt/task/docs/serve.py`: a static file server over the
  * generated target directory). JDK-built-in HttpServer, zero
  * dependencies; the docs site itself is the self-contained static
  * page Artifacts.writeLineageHtml emits.
  */
object DocsServer {

  /** Start serving `dir` on `port` (0 = ephemeral). Returns the
    * running server; callers stop it with `.stop(0)`.
    */
  def serve(dir: String, port: Int): HttpServer = {
    val root = Paths.get(dir).toAbsolutePath.normalize()
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val reqPath = ex.getRequestURI.getPath match {
          case "/" | "" => "index.html"
          case p => p.stripPrefix("/")
        }
        val f = root.resolve(reqPath).normalize()
        if (!f.startsWith(root) || !Files.isRegularFile(f)) {
          val msg = "not found".getBytes("UTF-8")
          ex.sendResponseHeaders(404, msg.length.toLong)
          ex.getResponseBody.write(msg)
        } else {
          val bytes = Files.readAllBytes(f)
          ex.getResponseHeaders.add("Content-Type", contentType(f))
          ex.sendResponseHeaders(200, bytes.length.toLong)
          ex.getResponseBody.write(bytes)
        }
        ex.close()
      }
    })
    server.setExecutor(null) // single-threaded is plenty for local docs
    server.start()
    server
  }

  private def contentType(f: Path): String = {
    val n = f.getFileName.toString
    if (n.endsWith(".html")) "text/html; charset=utf-8"
    else if (n.endsWith(".json")) "application/json"
    else if (n.endsWith(".dot")) "text/plain; charset=utf-8"
    else "application/octet-stream"
  }
}
