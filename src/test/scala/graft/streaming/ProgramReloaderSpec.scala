package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.mtail.Ir

/** Pins the reference's runtime-loader contract
  * (`internal/runtime/runtime.go:49-158`): new/changed files load,
  * unchanged files skip the recompile, deleted files unload, a compile
  * failure keeps the old program running and is recorded in
  * programErrors, and reverting a bad edit clears the recorded error.
  */
class ProgramReloaderSpec extends AnyFunSuite {

  private def withDir(f: Path => Unit): Unit = {
    val dir = Files.createTempDirectory("graft-reloader")
    try f(dir)
    finally {
      val s = Files.list(dir)
      try s.iterator().forEachRemaining(p => Files.deleteIfExists(p))
      finally s.close()
      Files.deleteIfExists(dir)
    }
  }

  private def write(dir: Path, name: String, src: String): Path =
    Files.write(dir.resolve(name), src.getBytes(StandardCharsets.UTF_8))

  private val good = "counter lines_total\n/$/ {\n  lines_total++\n}\n"
  private val good2 = "counter other_total\n/x/ {\n  other_total++\n}\n"
  private val bad = "counter lines_total\n/$/ {\n  lines_total++\n" // unclosed block

  test("load / skip-unchanged / update / unload lifecycle") {
    withDir { dir =>
      val loads = scala.collection.mutable.ArrayBuffer[String]()
      val unloads = scala.collection.mutable.ArrayBuffer[String]()
      val r = new ProgramReloader(dir.toString,
        p => loads += s"${p.name}:${p.decls.head.name}",
        unloads += _)

      write(dir, "a.mtail", good)
      write(dir, ".hidden.mtail", good) // hidden: ignored
      write(dir, "notes.txt", good)     // wrong extension: ignored
      r.loadAll()
      assert(loads.toSeq == Seq("a.mtail:lines_total"))
      assert(r.programErrors == Map("a.mtail" -> None))

      // unchanged contents: no recompile
      r.loadAll()
      assert(loads.size == 1)

      // changed contents: reload
      write(dir, "a.mtail", good2)
      r.loadAll()
      assert(loads.toSeq ==
        Seq("a.mtail:lines_total", "a.mtail:other_total"))

      // deleted file: unload sweep
      Files.delete(dir.resolve("a.mtail"))
      r.loadAll()
      assert(unloads.toSeq == Seq("a.mtail"))
      assert(r.programErrors.isEmpty)
    }
  }

  test("compile failure keeps old program; revert clears the error") {
    withDir { dir =>
      val loads = scala.collection.mutable.ArrayBuffer[Ir.Program]()
      val r = new ProgramReloader(dir.toString, loads += _)

      write(dir, "a.mtail", good)
      r.loadAll()
      assert(loads.size == 1)

      // a bad edit: the old program stays, the error is recorded
      write(dir, "a.mtail", bad)
      r.loadAll()
      assert(loads.size == 1, "bad program must not be loaded")
      assert(r.programErrors("a.mtail").isDefined)

      // reverting to the last-good contents hash-matches the running
      // program: no recompile, and the stale error is cleared
      // (runtime.go:125-133 assigns the nil result on a hash match)
      write(dir, "a.mtail", good)
      r.loadAll()
      assert(loads.size == 1, "revert to running contents must not recompile")
      assert(r.programErrors("a.mtail").isEmpty)
    }
  }

  test("per-file load errors don't abort the scan") {
    withDir { dir =>
      val loads = scala.collection.mutable.ArrayBuffer[String]()
      val r = new ProgramReloader(dir.toString, p => loads += p.name)
      // a.mtail fails to compile; b.mtail (later in sort order) must
      // still load on the same tick (errorsAbort=false,
      // runtime.go:74-81)
      write(dir, "a.mtail", bad)
      write(dir, "b.mtail", good)
      r.loadAll()
      assert(loads.toSeq == Seq("b.mtail"))
      assert(r.programErrors("a.mtail").isDefined)
      assert(r.programErrors("b.mtail").isEmpty)
    }
  }

  test("single-file path loads just that file") {
    withDir { dir =>
      val f = write(dir, "solo.mtail", good)
      val loads = scala.collection.mutable.ArrayBuffer[String]()
      val r = new ProgramReloader(f.toString, p => loads += p.name)
      r.loadAll()
      assert(loads.toSeq == Seq("solo.mtail"))
    }
  }

  test("SIGHUP triggers a rescan (raised in-process)") {
    withDir { dir =>
      write(dir, "a.mtail", good)
      val loads = new java.util.concurrent.atomic.AtomicInteger
      val r = new ProgramReloader(dir.toString,
        _ => loads.incrementAndGet())
      r.loadAll()
      assert(loads.get == 1)
      val deliverable = r.installSighup()
      // under nohup/supervisors the JVM inherits SIGHUP=SIG_IGN and
      // the raise below is never delivered — that's an environment
      // property, not a bug; skip rather than fail (installSighup
      // already warned and pointed at -progs_poll_interval)
      assume(deliverable,
        "SIGHUP inherited as ignored (nohup?) — skipping raise test")
      write(dir, "a.mtail", good2)
      sun.misc.Signal.raise(new sun.misc.Signal("HUP"))
      val deadline = System.nanoTime() + 5_000_000_000L
      while (loads.get < 2 && System.nanoTime() < deadline)
        Thread.sleep(10)
      assert(loads.get == 2, "HUP handler did not rescan")
    }
  }

  test("polling picks up an edit without an explicit loadAll") {
    withDir { dir =>
      write(dir, "a.mtail", good)
      val loads = new java.util.concurrent.atomic.AtomicInteger
      val r = new ProgramReloader(dir.toString, _ => loads.incrementAndGet())
      r.loadAll()
      assert(loads.get == 1)
      r.startPolling(20)
      try {
        write(dir, "a.mtail", good2)
        val deadline = System.nanoTime() + 5_000_000_000L
        while (loads.get < 2 && System.nanoTime() < deadline)
          Thread.sleep(10)
        assert(loads.get == 2, "poller did not pick up the edit")
      } finally r.stop()
    }
  }
}
