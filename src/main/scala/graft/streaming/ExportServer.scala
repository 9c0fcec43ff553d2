package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** Pull-export HTTP endpoints over one or more [[MetricsStore]]s —
  * /metrics (Prometheus), /json, /varz, /graphite, like the
  * reference's mtail HTTP mux (`internal/mtail/mtail.go:120`), which
  * serves EVERY loaded program on the same port. JDK-built-in server:
  * no extra dependencies, good enough for a scrape endpoint.
  *
  * Build with [[ExportServer.single]] (one program — `Graft.tail`) or
  * [[ExportServer.multi]] (a live program set — `Graft.tailProgs`,
  * where programs come and go under [[ProgramReloader]]; `sources` is
  * re-evaluated per scrape so the response always reflects the
  * currently loaded set).
  */
final class ExportServer private (
    sources: () => Seq[ExportServer.Source],
    port: Int, hostname: String,
    internals: () => Seq[(String, MetricsStore)],
    /** single-program servers render internal cells without a prog
      * label (matching the one-store reference export shape pinned by
      * StreamingSpec); multi-program servers label per runner so two
      * runners' same-named internal counters stay distinct samples.
      */
    internalProgLabel: Boolean,
    emitTimestamp: Boolean) {

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
      : String = {
    // a program may declare a metric named like an internal one
    // (e.g. its own lines_total); a second # TYPE block for the same
    // name breaks the Prometheus text format, so colliding internal
    // cells are served only on /internalz
    val byProg = internals().map { case (p, s) =>
      p -> s.snapshot().filterNot(c =>
        excludeNames.contains(c.name.replace("-", "_")))
    }.filter(_._2.nonEmpty)
    if (byProg.isEmpty) ""
    else if (internalProgLabel)
      Exporters.prometheusMulti(byProg)
    else
      Exporters.prometheusMulti(byProg.map { case (_, cs) =>
        "mtail" -> cs }, omitProgLabel = true)
  }

  server.createContext("/metrics",
    handler { () =>
      val snaps = sources().map(s => s.program -> s.store.snapshot())
      Exporters.prometheusMulti(snaps, emitTimestamp = emitTimestamp) +
        internalProm(snaps.flatMap(_._2)
          .map(_.name.replace("-", "_")).toSet)
    })
  server.createContext("/internalz", handler(() => internalProm()))
  server.createContext("/json",
    handler(() => Exporters.jsonMulti(sources().map(s =>
      (s.program, s.store.snapshot(), s.keys)))))
  server.createContext("/varz",
    handler(() => Exporters.varzMulti(sources().map(s =>
      s.program -> s.store.snapshot()), hostname)))
  server.createContext("/graphite",
    handler(() => sources().map(s =>
      Exporters.graphite(s.store.snapshot(), s.program)).mkString))

  def start(): Int = {
    server.setExecutor(null)
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = server.stop(0)
}

object ExportServer {
  /** One program's export surface: name, store, and export-name →
    * label keys for /json (resolved per scrape so a live reload that
    * re-keys a metric is reflected in the next response).
    */
  final case class Source(program: String, store: MetricsStore,
      keys: Map[String, Seq[String]])

  /** The single-program server `Graft.tail` uses. */
  def single(store: MetricsStore, program: String,
      keys: () => Map[String, Seq[String]], port: Int = 0,
      hostname: String = "localhost",
      /** runtime self-instrumentation cells, appended to /metrics and
        * served alone on /debug/vars-style /internalz (runtime.go:33).
        */
      internal: Option[MetricsStore] = None,
      /** opt-in per-sample timestamps on /metrics
        * (prometheus.go:89-93); program cells only, like the
        * reference.
        */
      emitTimestamp: Boolean = false): ExportServer =
    new ExportServer(() => Seq(Source(program, store, keys())),
      port, hostname, () => internal.toSeq.map(program -> _),
      internalProgLabel = false, emitTimestamp = emitTimestamp)

  /** A live multi-program server (`Graft.tailProgs`): `sources` and
    * `internals` are functions so the scrape always serves the
    * currently loaded program set.
    */
  def multi(sources: () => Seq[Source], port: Int = 0,
      hostname: String = "localhost",
      internals: () => Seq[(String, MetricsStore)] = () => Nil,
      emitTimestamp: Boolean = false): ExportServer =
    new ExportServer(sources, port, hostname, internals,
      internalProgLabel = true, emitTimestamp = emitTimestamp)
}
