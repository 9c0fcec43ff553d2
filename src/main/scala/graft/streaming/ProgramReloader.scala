package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest

import scala.jdk.CollectionConverters._

import graft.mtail.{Frontend, Ir}

/** SIGHUP / program-path reload — the reference's runtime loader
  * (`internal/runtime/runtime.go:49-100` `LoadAllPrograms` over a progs
  * path, HUP-triggered at `runtime.go:311-332`, compile-and-swap per
  * program at `runtime.go:141-158`): programs may be created, updated
  * and deleted while the daemon runs; a HUP (or an explicit
  * [[loadAll]], or a poll tick) re-scans the path; a program that
  * fails to compile leaves the previous version running.
  *
  * Mechanics mirrored from the reference:
  *  - a directory scan loads every non-hidden `*.mtail` file (program
  *    name = file basename); a plain-file path loads just that file
  *    with the same hidden/extension checks (`LoadProgram`,
  *    `runtime.go:102-118`)
  *  - unchanged contents (sha-256) skip the recompile
  *    (`CompileAndRun`, `runtime.go:141-157`)
  *  - a compile error is recorded in [[programErrors]] and counted,
  *    and does NOT unload the running program — the `CompileAndRun`
  *    contract ("If the new program fails to compile, any existing
  *    virtual machine with the same name remains running")
  *  - programs whose file disappeared are unloaded (the `markDeleted`
  *    sweep, `runtime.go:61-88`)
  *
  * The `load`/`unload` callbacks do the engine work; validate-first
  * semantics live THERE. For a single-program [[StreamRunner]], pass
  * `p => runner.reload(p)` — reload probes the whole new plan against
  * an empty frame before swapping, so a program that parses but cannot
  * plan is also rejected with the old program left running. For a
  * [[MultiRunner]], dispatch by name:
  * `p => multi.runners.get(p.name).foreach(_.reload(p))`.
  *
  * Scale note: reload is pure driver-side control plane — parse +
  * plan-probe on a handful of KB of program text. Nothing here touches
  * executors; the swapped plan applies from the next microbatch.
  */
final class ProgramReloader(programPath: String,
    load: Ir.Program => Unit,
    unload: String => Unit = _ => (),
    /** compile resource guards (`cmd/mtail/main.go:69-70`);
      * `<= 0` = reference defaults. */
    maxRegexpLength: Int = 0,
    maxRecursionDepth: Int = 0) {

  /** name → sha-256 of the last successfully loaded contents. */
  @volatile private var loaded = Map.empty[String, String]
  /** name → last load error (None = last load succeeded) — the
    * reference's `programErrors` map (`runtime.go:125-133`).
    */
  @volatile var programErrors = Map.empty[String, Option[String]]
  @volatile private var poller: Option[Thread] = None

  private def sha256(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** hidden-file + extension gate (`runtime.go:104-112`). */
  private def eligible(fileName: String): Boolean =
    !fileName.startsWith(".") && fileName.endsWith(".mtail")

  /** One scan of the program path: load new/changed programs, skip
    * unchanged ones, unload deleted ones. Per-program failures are
    * recorded, not thrown (the reference's default `errorsAbort=false`
    * daemon mode); an unreadable path itself throws.
    */
  def loadAll(): Unit = synchronized {
    val p = Paths.get(programPath)
    val files: Seq[Path] =
      if (Files.isDirectory(p)) {
        // Files.list must be closed or the directory fd leaks on every
        // scan tick (its javadoc requires close; GC is not guaranteed)
        val s = Files.list(p)
        try s.iterator().asScala.toSeq
          .filter(f => !Files.isDirectory(f))
          .sortBy(_.getFileName.toString)
        finally s.close()
      } else Seq(p)
    val seen = scala.collection.mutable.Set[String]()
    files.foreach { f =>
      val name = f.getFileName.toString
      if (eligible(name)) {
        seen += name
        // the read is inside the per-program try: a file deleted or
        // made unreadable between the directory scan and here is
        // recorded like a compile error and the scan continues (the
        // reference's errorsAbort=false daemon mode, runtime.go:74-81);
        // the deleted-program unload happens on the NEXT tick, when the
        // directory listing no longer shows it
        try {
          val src = new String(Files.readAllBytes(f),
            StandardCharsets.UTF_8)
          val hash = sha256(src)
          if (!loaded.get(name).contains(hash)) {
            load(Frontend.parse(src, name,
              maxRegexpLength, maxRecursionDepth))
            loaded += name -> hash
            programErrors += name -> None
          } else {
            // unchanged contents: the running program IS the current
            // file, so clear any stale error from an intervening bad
            // edit that was since reverted (the reference assigns
            // CompileAndRun's nil on a hash match, runtime.go:125-133)
            programErrors += name -> None
          }
        } catch {
          // StackOverflowError: a pathologically nested program blows
          // the JVM stack inside the recursive-descent parser before
          // the depth guard can fire; it must surface as a per-program
          // compile error, not kill the reload/signal thread.
          case e @ (_: Exception | _: StackOverflowError) =>
            // old program (if any) keeps running; its hash stays so
            // reverting the bad edit is seen as unchanged-and-healthy
            programErrors += name -> Some(
              Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
        }
      }
    }
    (loaded.keySet -- seen).foreach { name =>
      unload(name)
      loaded -= name
      programErrors -= name
    }
  }

  /** Install a HUP handler calling [[loadAll]] — `runtime.go:311-332`.
    * Errors are swallowed like the reference's `glog.Info(err)`: a
    * signal must never kill the daemon.
    *
    * Returns false when the JVM inherited an IGNORED disposition for
    * SIGHUP (e.g. launched under `nohup` or a supervisor that sets
    * SIG_IGN): `sun.misc.Signal.handle` still succeeds, but the signal
    * is never delivered to the process, so the handler can never fire.
    * Go's `signal.Notify` overrides an ignored disposition, so the
    * reference *does* reload under nohup — the JVM cannot; we warn and
    * point at the `-progs_poll_interval` fallback instead.
    */
  def installSighup(): Boolean = {
    import sun.misc.{Signal, SignalHandler}
    val prev = Signal.handle(new Signal("HUP"), new SignalHandler {
      override def handle(sig: Signal): Unit =
        try loadAll() catch { case _: Exception | _: StackOverflowError => () }
    })
    val inheritedIgnore = prev eq SignalHandler.SIG_IGN
    if (inheritedIgnore)
      System.err.println(
        "warning: SIGHUP was ignored when this JVM started (nohup?); " +
          "HUP-triggered program reload will not work — use " +
          "-progs_poll_interval for polling reload instead")
    !inheritedIgnore
  }

  /** Watch the program path by polling every `intervalMillis` — the
    * filesystem-watch analogue for deployments that cannot signal the
    * JVM. Content hashes make each tick cheap (no recompiles unless a
    * file actually changed).
    */
  def startPolling(intervalMillis: Long): Unit = synchronized {
    require(poller.isEmpty, "already polling")
    val t = new Thread(() => {
      try while (!Thread.interrupted()) {
        Thread.sleep(intervalMillis)
        try loadAll() catch { case _: Exception | _: StackOverflowError => () }
      } catch { case _: InterruptedException => () }
    }, "graft-prog-reloader")
    t.setDaemon(true)
    t.start()
    poller = Some(t)
  }

  def stop(): Unit = synchronized {
    poller.foreach(_.interrupt())
    poller = None
  }
}
