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
    emitTimestamp: Boolean,
    /** `-emit_prog_label=false` (main.go:60, exporter/export.go:61):
      * drop the `prog` label from /metrics samples and /varz lines.
      * The reference's flag reaches exactly those two formats
      * (prometheus.go:55, varz.go:52); graphite/statsd/collectd paths
      * and /json's Program field always carry the program name.
      */
    omitProgLabel: Boolean) {

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
      Exporters.prometheusMulti(snaps, omitProgLabel = omitProgLabel,
        emitTimestamp = emitTimestamp) +
        internalProm(snaps.flatMap(_._2)
          .map(_.name.replace("-", "_")).toSet)
    })
  server.createContext("/internalz", handler(() => internalProm()))
  server.createContext("/json",
    handler(() => Exporters.jsonMulti(sources().map(s =>
      (s.program, s.store.snapshot(), s.keys)))))
  server.createContext("/varz",
    handler(() => Exporters.varzMulti(sources().map(s =>
      s.program -> s.store.snapshot()), hostname, omitProgLabel)))
  server.createContext("/graphite",
    handler(() => sources().map(s =>
      Exporters.graphite(s.store.snapshot(), s.program)).mkString))

  private def htmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  // the reference's online-status root page (httpstatus.go:13-30):
  // links to every endpoint plus the loaded-program count
  server.createContext("/", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      if (ex.getRequestURI.getPath != "/") {
        ex.sendResponseHeaders(404, -1); ex.close(); return
      }
      val n = sources().size
      val body = ("<!DOCTYPE html>\n<html><head><title>graft</title>" +
        "</head>\n<body>\n<h1>graft</h1>\n" +
        s"<p>$n program(s) loaded</p>\n" +
        "<p>Metrics: <a href=\"/json\">json</a>, " +
        "<a href=\"/graphite\">graphite</a>, " +
        "<a href=\"/metrics\">prometheus</a></p>\n" +
        "<p>Info: <a href=\"/varz\">varz</a>, " +
        "<a href=\"/progz\">progz</a>, " +
        "<a href=\"/internalz\">internalz</a></p>\n</body></html>\n")
        .getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "text/html")
      ex.sendResponseHeaders(200, body.length.toLong)
      val os = ex.getResponseBody; os.write(body); os.close()
    }
  })

  // /progz (runtime/httpstatus.go:95-117): no query = the loaded
  // program list (with load-error state where the source provides
  // it); ?prog=name = that program's compiled form — the reference
  // dumps VM bytecode, graft dumps the typed IR the Spark plan is
  // built from — plus the last error
  server.createContext("/progz", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      // decode the query value: the listing URL-encodes program names
      // (a name with &, spaces or quotes must round-trip)
      val progQ = q.split("&").collectFirst {
        case kv if kv.startsWith("prog=") =>
          java.net.URLDecoder.decode(kv.drop(5), "UTF-8") }
      val ss = sources()
      progQ match {
        case Some(name) =>
          ss.find(_.program == name) match {
            case None =>
              val e = "No program found\n"
                .getBytes(StandardCharsets.UTF_8)
              ex.sendResponseHeaders(404, e.length.toLong)
              val os = ex.getResponseBody; os.write(e); os.close()
            case Some(s) =>
              val body = (s.dump() +
                s"\nLast load error:\n${s.error().getOrElse("")}\n")
                .getBytes(StandardCharsets.UTF_8)
              ex.getResponseHeaders.add("Content-Type", "text/plain")
              ex.sendResponseHeaders(200, body.length.toLong)
              val os = ex.getResponseBody; os.write(body); os.close()
          }
        case None =>
          val items = ss.map { s =>
            val err = s.error()
              .map(e => s" - load error: ${htmlEscape(e)}")
              .getOrElse("")
            // the href value is URL-encoded (then HTML-escaped: URL
            // encoding can itself produce no HTML-special chars, but
            // the attribute context demands it) so a program name with
            // quotes/&/spaces stays clickable and round-trips through
            // the ?prog= decode above
            val encoded = htmlEscape(
              java.net.URLEncoder.encode(s.program, "UTF-8"))
            s"""<li><a href="?prog=$encoded">${
              htmlEscape(s.program)}</a>$err</li>"""
          }.mkString
          val body = s"<ul>$items</ul>"
            .getBytes(StandardCharsets.UTF_8)
          ex.getResponseHeaders.add("Content-Type", "text/html")
          ex.sendResponseHeaders(200, body.length.toLong)
          val os = ex.getResponseBody; os.write(body); os.close()
      }
    }
  })

  def start(): Int = {
    server.setExecutor(null)
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = server.stop(0)
}

object ExportServer {
  /** One program's export surface: name, store, export-name → label
    * keys for /json (resolved per scrape so a live reload that re-keys
    * a metric is reflected in the next response), plus the /progz
    * introspection hooks — `dump` renders the compiled form (typed
    * IR), `error` the last load/compile error if any.
    */
  final case class Source(program: String, store: MetricsStore,
      keys: Map[String, Seq[String]],
      dump: () => String = () => "",
      error: () => Option[String] = () => None)

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
      emitTimestamp: Boolean = false,
      /** /progz hooks: compiled-form dump + last load error. */
      dump: () => String = () => "",
      error: () => Option[String] = () => None,
      /** `-emit_prog_label=false`: drop `prog` from /metrics, /varz. */
      omitProgLabel: Boolean = false): ExportServer =
    new ExportServer(
      () => Seq(Source(program, store, keys(), dump, error)),
      port, hostname, () => internal.toSeq.map(program -> _),
      internalProgLabel = false, emitTimestamp = emitTimestamp,
      omitProgLabel = omitProgLabel)

  /** A live multi-program server (`Graft.tailProgs`): `sources` and
    * `internals` are functions so the scrape always serves the
    * currently loaded program set.
    */
  def multi(sources: () => Seq[Source], port: Int = 0,
      hostname: String = "localhost",
      internals: () => Seq[(String, MetricsStore)] = () => Nil,
      emitTimestamp: Boolean = false,
      omitProgLabel: Boolean = false): ExportServer =
    new ExportServer(sources, port, hostname, internals,
      internalProgLabel = true, emitTimestamp = emitTimestamp,
      omitProgLabel = omitProgLabel)
}
