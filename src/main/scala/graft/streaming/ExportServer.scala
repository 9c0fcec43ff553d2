package graft.streaming

import java.net.{InetSocketAddress, StandardProtocolFamily,
  UnixDomainSocketAddress}
import java.nio.ByteBuffer
import java.nio.channels.{ServerSocketChannel, SocketChannel}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** Pull-export HTTP endpoints over one or more [[MetricsStore]]s —
  * /metrics (Prometheus), /json, /varz, /graphite, like the
  * reference's mtail HTTP mux (`internal/mtail/mtail.go:120`), which
  * serves EVERY loaded program on the same port. JDK-built-in server:
  * no extra dependencies, good enough for a scrape endpoint.
  *
  * Two front-ends share one route table: the TCP [[start]] (JDK
  * HttpServer) and the `-unix_socket` listener [[startUnix]]
  * (`cmd/mtail/main.go:43`, `BindUnixSocket`) — a minimal HTTP/1.0
  * responder over a unix domain socket, since the JDK server only
  * binds TCP. Scrapers dial the socket and speak plain HTTP, exactly
  * like the reference's `unix_socket_export_integration_test.go`.
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
    omitProgLabel: Boolean,
    /** `-address` (main.go:41): host/IP to bind the TCP listener to;
      * empty = all interfaces, like the reference's default.
      */
    bindAddress: String,
    /** `-http_debugging_endpoint` (main.go:75): serve the debug
      * paths (here /debug/vars and /internalz); false = 404.
      */
    debugEndpoints: Boolean,
    /** `-http_info_endpoint` (main.go:76): serve the info pages
      * (/progz, /varz); false = 404.
      */
    infoEndpoints: Boolean) {

  /** created (and bound) on [[start]] only — a unix-socket-only server
    * must not claim the TCP port as a side effect of construction
    * (HttpServer.create binds immediately).
    */
  @volatile private var server: Option[HttpServer] = None

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

  private def htmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def metricsBody: String = {
    val snaps = sources().map(s => s.program -> s.store.snapshot())
    Exporters.prometheusMulti(snaps, omitProgLabel = omitProgLabel,
      emitTimestamp = emitTimestamp) +
      internalProm(snaps.flatMap(_._2)
        .map(_.name.replace("-", "_")).toSet)
  }

  /** /debug/vars (`-http_debugging_endpoint`, main.go:75): the expvar
    * shape — one JSON object, keyless internal metrics as numbers,
    * labelled ones as an object keyed by the flattened label string,
    * prefixed per program when several are loaded (Go expvar publishes
    * mtail's internal counters the same way).
    */
  private def debugVarsBody: String = {
    // every key and string value goes through the escape, and
    // non-finite floats quote (bare NaN/Infinity is invalid JSON)
    def esc(s: String): String =
      s.flatMap {
        case '\\' => "\\\\"
        case '"' => "\\\""
        case c if c < ' ' => "\\u%04x".format(c.toInt)
        case c => c.toString
      }
    def valueJson(v: graft.mtail.Snapshot.Value): String = v match {
      case graft.mtail.Snapshot.VInt(i) => i.toString
      case graft.mtail.Snapshot.VFloat(f) =>
        if (java.lang.Double.isFinite(f)) f.toString
        else "\"" + f.toString + "\""
      case graft.mtail.Snapshot.VStr(s) => "\"" + esc(s) + "\""
    }
    val ints = internals() // ONE snapshot of the live program set
    val multi = ints.size > 1
    val entries = ints.flatMap { case (p, s) =>
      s.snapshot().groupBy(_.name).toSeq.sortBy(_._1).map {
        case (name, cells) =>
          val key = if (multi) s"$p.$name" else name
          val v =
            if (cells.forall(_.labels.isEmpty))
              valueJson(cells.head.value)
            else cells.sortBy(_.labels.toSeq.sorted.mkString(","))
              .map { c =>
                val lk = c.labels.toSeq.sortBy(_._1)
                  .map { case (k, vv) => s"$k=$vv" }.mkString(",")
                "\"" + esc(lk) + "\": " + valueJson(c.value)
              }.mkString("{", ", ", "}")
          "\"" + esc(key) + "\": " + v
      }
    }
    entries.mkString("{", ", ", "}") + "\n"
  }

  private def rootBody: String = {
    val n = sources().size
    "<!DOCTYPE html>\n<html><head><title>graft</title>" +
      "</head>\n<body>\n<h1>graft</h1>\n" +
      s"<p>$n program(s) loaded</p>\n" +
      "<p>Metrics: <a href=\"/json\">json</a>, " +
      "<a href=\"/graphite\">graphite</a>, " +
      "<a href=\"/metrics\">prometheus</a></p>\n" +
      "<p>Info: <a href=\"/varz\">varz</a>, " +
      "<a href=\"/progz\">progz</a>, " +
      "<a href=\"/internalz\">internalz</a></p>\n</body></html>\n"
  }

  // /progz (runtime/httpstatus.go:95-117): no query = the loaded
  // program list (with load-error state where the source provides
  // it); ?prog=name = that program's compiled form — the reference
  // dumps VM bytecode, graft dumps the typed IR the Spark plan is
  // built from — plus the last error
  private def progzBody(rawQuery: String): (Int, String, String) = {
    // decode the query value: the listing URL-encodes program names
    // (a name with &, spaces or quotes must round-trip)
    val progQ = rawQuery.split("&").collectFirst {
      case kv if kv.startsWith("prog=") =>
        java.net.URLDecoder.decode(kv.drop(5), "UTF-8") }
    val wantDot = rawQuery.split("&").contains("format=dot")
    val ss = sources()
    progQ match {
      case Some(name) =>
        ss.find(_.program == name) match {
          case None => (404, "text/plain", "No program found\n")
          case Some(s) if wantDot =>
            val g = s.dot()
            if (g.isEmpty) (404, "text/plain", "No dot form\n")
            else (200, "text/vnd.graphviz", g)
          case Some(s) => (200, "text/plain", s.dump() +
            s"\nLast load error:\n${s.error().getOrElse("")}\n")
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
        (200, "text/html", s"<ul>$items</ul>")
    }
  }

  /** one route table for both front-ends: (status, content-type,
    * body) for a request path + raw (undecoded) query string.
    */
  private val notFound =
    (404, "text/plain", "404 page not found\n")

  private def route(path: String, rawQuery: String)
      : (Int, String, String) = path match {
    // flag-gated route families FIRST, so a disabled endpoint is
    // indistinguishable from an unknown path (the reference simply
    // never registers the handler, mtail.go:163-181)
    case p if !debugEndpoints &&
      (p.startsWith("/debug") || p == "/internalz") => notFound
    case ("/progz" | "/varz") if !infoEndpoints => notFound
    case "/metrics" => (200, "text/plain", metricsBody)
    case "/internalz" => (200, "text/plain", internalProm())
    case "/json" => (200, "text/plain",
      Exporters.jsonMulti(sources().map(s =>
        (s.program, s.store.snapshot(), s.keys))))
    case "/varz" => (200, "text/plain",
      Exporters.varzMulti(sources().map(s =>
        s.program -> s.store.snapshot()), hostname, omitProgLabel))
    case "/graphite" => (200, "text/plain",
      sources().map(s =>
        Exporters.graphite(s.store.snapshot(), s.program)).mkString)
    case "/debug/vars" => (200, "application/json", debugVarsBody)
    case "/progz" => progzBody(rawQuery)
    case "/" => (200, "text/html", rootBody)
    case _ => notFound
  }

  def start(): Int = synchronized {
    require(server.isEmpty, "already started")
    val s = HttpServer.create(
      if (bindAddress.isEmpty) new InetSocketAddress(port)
      else new InetSocketAddress(bindAddress, port), 0)
    s.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val (status, ctype, bodyStr) = route(ex.getRequestURI.getPath,
          Option(ex.getRequestURI.getRawQuery).getOrElse(""))
        val body = bodyStr.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.add("Content-Type", ctype)
        ex.sendResponseHeaders(status, body.length.toLong)
        val os = ex.getResponseBody
        os.write(body)
        os.close()
      }
    })
    s.setExecutor(null)
    s.start()
    server = Some(s)
    s.getAddress.getPort
  }

  // ---- unix-socket front-end (`-unix_socket`, BindUnixSocket) ----

  @volatile private var unixChannel: Option[(ServerSocketChannel,
    Path)] = None

  /** Serve the same routes over a unix domain socket — a minimal
    * HTTP/1.0 responder (request line + ignored headers in, one
    * Content-Length'd response out, connection closed), which is all
    * a scrape client speaks. A stale socket file is replaced, like
    * net.Listen("unix") deployments expect after a crash.
    */
  def startUnix(socketPath: String): Unit = synchronized {
    require(unixChannel.isEmpty, "unix listener already started")
    val p = Paths.get(socketPath)
    Files.deleteIfExists(p)
    val ch = ServerSocketChannel.open(StandardProtocolFamily.UNIX)
    ch.bind(UnixDomainSocketAddress.of(p))
    val t = new Thread(() => {
      try while (true) {
        val conn = ch.accept()
        // one thread per connection: a stalled or idle client must not
        // head-of-line-block every other scraper (the accept loop
        // itself never reads). Scrape concurrency is tiny, so
        // unpooled daemon threads are fine.
        val worker = new Thread(() => {
          try serveUnixConn(conn)
          catch { case _: Exception => () } // one bad client ≠ listener
          finally { try conn.close() catch { case _: Exception => () } }
        }, "graft-export-unix-conn")
        worker.setDaemon(true)
        worker.start()
      } catch { case _: Exception => () } // channel closed by stop()
    }, "graft-export-unix")
    t.setDaemon(true)
    t.start()
    unixChannel = Some((ch, p))
  }

  private def serveUnixConn(conn: SocketChannel): Unit = {
    // read the request head (8 KB cap — scrape requests are tiny)
    // non-blocking with a 5 s deadline: unix-domain channels have no
    // SO_TIMEOUT, and a blocking read would pin this worker forever on
    // a client that connects and never writes
    conn.configureBlocking(false)
    val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
    val buf = ByteBuffer.allocate(8192)
    var head = ""
    var done = false
    while (!done && buf.hasRemaining &&
        System.nanoTime() < deadline) {
      val n = conn.read(buf)
      if (n < 0) done = true
      else if (n == 0) Thread.sleep(2)
      else {
        head = new String(buf.array(), 0, buf.position(),
          StandardCharsets.ISO_8859_1)
        done = head.contains("\r\n\r\n") || head.contains("\n\n")
      }
    }
    conn.configureBlocking(true)
    val requestLine = head.linesIterator.nextOption().getOrElse("")
    val parts = requestLine.split(" ")
    val (status, ctype, bodyStr) =
      if (parts.length < 2 || parts(0) != "GET")
        (400, "text/plain", "bad request\n")
      else parts(1).split("\\?", 2) match {
        case Array(path, q) => route(path, q)
        case Array(path) => route(path, "")
      }
    val body = bodyStr.getBytes(StandardCharsets.UTF_8)
    val reason = status match {
      case 200 => "OK"
      case 404 => "Not Found"
      case _ => "Bad Request"
    }
    val resp = ByteBuffer.wrap(
      (s"HTTP/1.0 $status $reason\r\nContent-Type: $ctype\r\n" +
        s"Content-Length: ${body.length}\r\nConnection: close\r\n\r\n")
        .getBytes(StandardCharsets.ISO_8859_1))
    while (resp.hasRemaining) conn.write(resp)
    val b = ByteBuffer.wrap(body)
    while (b.hasRemaining) conn.write(b)
  }

  def stop(): Unit = synchronized {
    server.foreach(_.stop(0))
    server = None
    unixChannel.foreach { case (ch, p) =>
      try ch.close() catch { case _: Exception => () }
      Files.deleteIfExists(p)
    }
    unixChannel = None
  }
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
      error: () => Option[String] = () => None,
      /** `?prog=X&format=dot`: the AST as graphviz (the daemon-side
        * face of `graft dot` — the reference serves the same graph
        * from mdot's embedded HTTP mode). Empty = arm disabled.
        */
      dot: () => String = () => "")

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
      /** /progz?format=dot hook (see [[Source.dot]]). */
      dot: () => String = () => "",
      /** `-emit_prog_label=false`: drop `prog` from /metrics, /varz. */
      omitProgLabel: Boolean = false,
      /** `-address`: bind host/IP; empty = all interfaces. */
      bindAddress: String = "",
      debugEndpoints: Boolean = true,
      infoEndpoints: Boolean = true): ExportServer =
    new ExportServer(
      () => Seq(Source(program, store, keys(), dump, error, dot)),
      port, hostname, () => internal.toSeq.map(program -> _),
      internalProgLabel = false, emitTimestamp = emitTimestamp,
      omitProgLabel = omitProgLabel, bindAddress = bindAddress,
      debugEndpoints = debugEndpoints, infoEndpoints = infoEndpoints)

  /** A live multi-program server (`Graft.tailProgs`): `sources` and
    * `internals` are functions so the scrape always serves the
    * currently loaded program set.
    */
  def multi(sources: () => Seq[Source], port: Int = 0,
      hostname: String = "localhost",
      internals: () => Seq[(String, MetricsStore)] = () => Nil,
      emitTimestamp: Boolean = false,
      omitProgLabel: Boolean = false,
      bindAddress: String = "",
      debugEndpoints: Boolean = true,
      infoEndpoints: Boolean = true): ExportServer =
    new ExportServer(sources, port, hostname, internals,
      internalProgLabel = true, emitTimestamp = emitTimestamp,
      omitProgLabel = omitProgLabel, bindAddress = bindAddress,
      debugEndpoints = debugEndpoints, infoEndpoints = infoEndpoints)
}
