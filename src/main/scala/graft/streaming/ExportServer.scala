package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** Pull-export HTTP endpoints over a [[MetricsStore]] — /metrics
  * (Prometheus), /json, /varz, /graphite, like the reference's mtail
  * HTTP mux (`internal/mtail/mtail.go:120`). JDK-built-in server: no
  * extra dependencies, good enough for a scrape endpoint.
  */
final class ExportServer(store: MetricsStore, program: String,
    /** export-name → label keys for /json, read at scrape time so a
      * live program reload that re-keys a metric is reflected in the
      * next response (pass `() => runner.exportKeys`).
      */
    keys: () => Map[String, Seq[String]], port: Int = 0,
    hostname: String = "localhost",
    /** runtime self-instrumentation cells, appended to /metrics and
      * served alone on /debug/vars-style /internalz (runtime.go:33).
      */
    internal: Option[MetricsStore] = None,
    /** opt-in per-sample timestamps on /metrics
      * (prometheus.go:89-93); program cells only, like the reference.
      */
    emitTimestamp: Boolean = false) {

  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  private def handler(f: () => String): HttpHandler = new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val body = f().getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "text/plain")
      ex.sendResponseHeaders(200, body.length.toLong)
      val os = ex.getResponseBody
      os.write(body)
      os.close()
    }
  }

  private def internalProm(excludeNames: Set[String] = Set.empty)
      : String =
    internal.map { s =>
      // a program may declare a metric named like an internal one
      // (e.g. its own lines_total); a second # TYPE block for the same
      // name breaks the Prometheus text format, so colliding internal
      // cells are served only on /internalz
      val cells = s.snapshot().filterNot(c =>
        excludeNames.contains(c.name.replace("-", "_")))
      Exporters.prometheus(cells, "mtail", omitProgLabel = true)
    }.getOrElse("")

  server.createContext("/metrics",
    handler { () =>
      val cells = store.snapshot()
      Exporters.prometheus(cells, program,
        emitTimestamp = emitTimestamp) +
        internalProm(cells.map(_.name.replace("-", "_")).toSet)
    })
  server.createContext("/internalz", handler(() => internalProm()))
  server.createContext("/json",
    handler(() => Exporters.json(store.snapshot(), program, keys())))
  server.createContext("/varz",
    handler(() => Exporters.varz(store.snapshot(), program, hostname)))
  server.createContext("/graphite",
    handler(() => Exporters.graphite(store.snapshot(), program)))

  def start(): Int = {
    server.setExecutor(null)
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = server.stop(0)
}
