package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.mtail.{Frontend, Ir, LogLines, Snapshot}
import graft.plan.PlanBuilder
import graft.sources.LogSources
import graft.streaming.{ExportServer, Exporters, MultiRunner,
  ProgramReloader, PushExporter, StreamRunner}

/** User-facing facade — the library shape of the reference binary's two
  * modes (`mtail -one_shot` and the daemon): compile `.mtail` source,
  * run it over logs, export metrics. Everything here is a thin
  * composition of the public pieces (Frontend → PlanBuilder /
  * StreamRunner → exporters); use those directly for anything bespoke.
  */
object Graft {

  /** compile program source (the reference's compile path; throws on
    * parse or plan errors like the checker).
    */
  def compile(source: String, name: String): Ir.Program =
    Frontend.parse(source, name)

  /** /progz dump body: the typed IR the Spark plan is built from —
    * graft's analogue of the reference VM's DumpByteCode
    * (`runtime/httpstatus.go:105`).
    */
  private[graft] def irDump(p: Ir.Program): String =
    (s"program ${p.name}" +:
      (p.decls.map("decl " + _) ++ p.stmts.map("stmt " + _)))
      .mkString("\n")

  /** One-shot mode (`mtail -one_shot -logs …`): run the program over
    * file patterns and return the final metric store as a DataFrame
    * (program, name, kind, type, labels, ival, fval, sval, buckets,
    * ts_micros — one row per cell). Reads are parallel byte-range
    * splits with total per-file line order.
    */
  def oneShot(spark: SparkSession, programSource: String,
      programName: String, paths: Seq[String],
      defaultYear: Int = java.time.Year.now.getValue,
      /** -override_timezone: zone for naive strptime timestamps. */
      overrideZone: String = "UTC"): DataFrame = {
    val prog = compile(programSource, programName)
    val pb = new PlanBuilder(prog, LogLines.batch(spark, paths: _*),
      defaultYear, overrideZone = overrideZone)
    // share ONE scan+extraction across the per-metric aggregation
    // branches (snapshot() is a union of independent branches), then
    // eagerly materialize the cell-cardinality result so the cache
    // can be freed before returning — the same lifecycle the
    // streaming runner uses per batch
    pb.materializeExtraction()
    try pb.snapshot().localCheckpoint(true)
    finally pb.unpersistExtraction()
  }

  /** `mtail -one_shot -one_shot_format={json,prometheus}`
    * (cmd/mtail/main.go:244-276): one-shot run rendered in the
    * requested debug format — json is the store dump shape
    * (store.WriteMetrics), prometheus the text exposition.
    */
  def oneShotExport(spark: SparkSession, programSource: String,
      programName: String, paths: Seq[String], format: String = "json",
      defaultYear: Int = java.time.Year.now.getValue,
      overrideZone: String = "UTC"): String = {
    // reject a typo'd format BEFORE compiling and scanning the logs
    require(format == "json" || format == "prometheus",
      s"unsupported format: '$format' (json|prometheus)")
    val prog = compile(programSource, programName)
    val cells = Snapshot.collect(oneShot(spark, programSource,
      programName, paths, defaultYear, overrideZone))
    if (format == "json")
      Exporters.json(cells, programName,
        prog.decls.map(d => d.exportName -> d.keys).toMap)
    else Exporters.prometheus(cells, programName)
  }

  /** Daemon mode handle: the runner (stores), streaming query, pull
    * server, and a push scheduler (register targets on `push`, then
    * `push.start(intervalMillis)`) — stop() tears all down.
    */
  final case class Tail(runner: StreamRunner, query: StreamingQuery,
      server: ExportServer, port: Int, push: PushExporter) {
    def reload(source: String, name: String): Unit =
      runner.reload(Frontend.parse(source, name))
    def stop(): Unit = {
      push.stop()
      query.stop()
      server.stop()
    }
  }

  /** Tail mode (the daemon): follow a log source pattern — file glob,
    * `udp://`, `tcp://`, `unix://`, `unixgram://`, `fifo://`, `-` —
    * run the program per micro-batch and serve /metrics (+/json,
    * /varz, /internalz) on `port`. Push sinks: register targets on the
    * returned handle's `push` and start its ticker.
    */
  def tail(spark: SparkSession, programSource: String,
      programName: String, sourcePattern: String, port: Int = 0,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      defaultYear: Int = java.time.Year.now.getValue,
      ignoreRegex: Option[String] = None,
      /** -override_timezone: zone for naive strptime timestamps. */
      overrideZone: String = "UTC",
      /** -emit_prog_label (main.go:60): `prog` label on /metrics,/varz. */
      emitProgLabel: Boolean = true,
      /** -emit_metric_timestamp (main.go:61): per-sample ts on /metrics. */
      emitMetricTimestamp: Boolean = false): Tail = {
    val prog = compile(programSource, programName)
    val runner = new StreamRunner(prog, spark, defaultYear, overrideZone)
    // keys resolved per scrape from the live program, so reload()
    // re-keying a metric updates /json without rebuilding the server
    val server = ExportServer.single(runner.store, programName,
      () => runner.exportKeys, port,
      internal = Some(runner.internalStore),
      dump = () => irDump(runner.currentProgram),
      dot = () => mtail.Dot.dot(runner.currentProgram),
      emitTimestamp = emitMetricTimestamp,
      omitProgLabel = !emitProgLabel)
    val boundPort = server.start()
    // a failed query start must not leak the bound HTTP port
    val query =
      try runner.start(
        LogSources.open(spark, sourcePattern, ignoreRegex), trigger)
      catch { case e: Throwable => server.stop(); throw e }
    val push = new PushExporter(runner.store, programName,
      internal = Some(runner.internalStore))
    Tail(runner, query, server, boundPort, push)
  }

  /** Progs-dir daemon handle: the live program set, its reloader, the
    * streaming query and the pull server. `reloadNow()` is the
    * explicit-HUP analogue for callers that manage their own signals.
    */
  final case class TailProgs(multi: MultiRunner,
      reloader: ProgramReloader, query: StreamingQuery,
      server: ExportServer, port: Int) {
    def reloadNow(): Unit = reloader.loadAll()
    def stop(): Unit = {
      reloader.stop()
      query.stop()
      server.stop()
    }
  }

  /** The reference daemon's full shape (`mtail --progs dir --logs …`,
    * `runtime.go:49-100`): load every `*.mtail` under `progsPath`, fan
    * every log line out to every program, serve ALL programs on one
    * pull port, and keep watching the program path — `kill -HUP`
    * (`sighup = true`, `runtime.go:311-332`) and/or a poll ticker
    * (`pollMillis`) re-scan it; edits swap validate-first between
    * micro-batches, a broken edit keeps the old program running (its
    * error lands in `reloader.programErrors`), new files join the
    * fan-out, deleted files unload.
    *
    * A program that fails to compile at STARTUP is recorded, not
    * fatal, like the reference's default `errorsAbort=false`; callers
    * that want fail-fast check `reloader.programErrors` after this
    * returns.
    */
  def tailProgs(spark: SparkSession, progsPath: String,
      sourcePattern: String, port: Int = 0,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      defaultYear: Int = java.time.Year.now.getValue,
      ignoreRegex: Option[String] = None,
      overrideZone: String = "UTC",
      sighup: Boolean = false,
      pollMillis: Option[Long] = None,
      /** -emit_prog_label (main.go:60): `prog` label on /metrics,/varz. */
      emitProgLabel: Boolean = true,
      /** -emit_metric_timestamp (main.go:61): per-sample ts on /metrics. */
      emitMetricTimestamp: Boolean = false,
      /** -unix_socket (main.go:43): serve the pull endpoints over this
        * unix domain socket INSTEAD of TCP (the reference binds one or
        * the other); the returned handle's port is -1.
        */
      unixSocket: Option[String] = None,
      /** -address (main.go:41): host/IP for the TCP listener;
        * empty = all interfaces. */
      bindAddress: String = "",
      /** compile resource guards (main.go:69-70); 0 = defaults. */
      maxRegexpLength: Int = 0,
      maxRecursionDepth: Int = 0,
      /** -poll_log_interval (main.go:66): glob-rescan cadence for the
        * tail source, decoupled from the data-poll trigger; None =
        * every micro-batch, Some(0) = startup file set only. */
      pollLogMs: Option[Long] = None,
      /** -expired_metrics_gc_interval (main.go:67); <=0 = every batch. */
      gcIntervalMs: Long = 0L,
      /** -vm_logs_runtime_errors (main.go:62). */
      logRuntimeErrors: Boolean = true,
      /** -http_debugging_endpoint / -http_info_endpoint
        * (main.go:75-76): route-family toggles on the pull server. */
      httpDebugEndpoints: Boolean = true,
      httpInfoEndpoints: Boolean = true): TailProgs = {
    val multi = new MultiRunner(Nil, spark, defaultYear, overrideZone,
      gcIntervalMs = gcIntervalMs, logRuntimeErrors = logRuntimeErrors)
    val reloader = new ProgramReloader(progsPath,
      multi.load, multi.unload,
      maxRegexpLength = maxRegexpLength,
      maxRecursionDepth = maxRecursionDepth)
    reloader.loadAll()
    def sorted = multi.runners.toSeq.sortBy(_._1)
    val server = ExportServer.multi(
      () => sorted.map { case (n, r) =>
        ExportServer.Source(n, r.store, r.exportKeys,
          dump = () => irDump(r.currentProgram),
          error = () => reloader.programErrors.get(n).flatten,
          dot = () => mtail.Dot.dot(r.currentProgram)) },
      port,
      internals = () => sorted.map { case (n, r) =>
        n -> r.internalStore },
      emitTimestamp = emitMetricTimestamp,
      omitProgLabel = !emitProgLabel,
      bindAddress = bindAddress,
      debugEndpoints = httpDebugEndpoints,
      infoEndpoints = httpInfoEndpoints)
    val boundPort = unixSocket match {
      case Some(path) => server.startUnix(path); -1
      case None => server.start()
    }
    val query =
      try multi.start(
        LogSources.open(spark, sourcePattern, ignoreRegex, pollLogMs),
        trigger)
      catch { case e: Throwable => server.stop(); throw e }
    if (sighup) reloader.installSighup()
    pollMillis.foreach(reloader.startPolling)
    TailProgs(multi, reloader, query, server, boundPort)
  }
}
