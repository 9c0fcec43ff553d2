package graft.streaming

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import graft.SparkSpec
import graft.mtail.Snapshot.VInt

/** End-to-end progs-dir daemon semantics (the reference's
  * `mtail --progs` + HUP loop, `runtime.go:49-158,311-332`): edits
  * swap program behaviour BETWEEN micro-batches, a bad edit keeps the
  * old program running, new files join the fan-out, deleted files
  * unload, and one pull endpoint serves every loaded program.
  */
class TailProgsSpec extends SparkSpec {
  import spark.implicits._

  private def withDir(f: Path => Unit): Unit = {
    val dir = Files.createTempDirectory("graft-tailprogs")
    try f(dir)
    finally {
      val s = Files.list(dir)
      try s.iterator().forEachRemaining(p => Files.deleteIfExists(p))
      finally s.close()
      Files.deleteIfExists(dir)
    }
  }

  private def write(dir: Path, name: String, src: String): Unit =
    Files.write(dir.resolve(name),
      src.getBytes(StandardCharsets.UTF_8))

  private def get(port: Int, path: String): String = {
    val conn = URI.create(s"http://localhost:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    try scala.io.Source.fromInputStream(conn.getInputStream,
      "UTF-8").mkString
    finally conn.disconnect()
  }

  private val getsProg =
    "counter gets\n/^get/ {\n  gets++\n}\n"
  private val putsProg =
    "counter puts\n/^put/ {\n  puts++\n}\n"
  private val allProg =
    "counter all_lines\n// {\n  all_lines++\n}\n"
  private val badProg = "counter x\n/unclosed {\n"

  test("edit swaps behaviour between batches; bad edit keeps old") {
    withDir { dir =>
      write(dir, "a.mtail", getsProg)
      val multi = new MultiRunner(Nil, spark, 0)
      val reloader = new ProgramReloader(dir.toString,
        multi.load, multi.unload)
      reloader.loadAll()

      def counters(prog: String): Map[String, Any] =
        multi.runners(prog).store.snapshot()
          .map(c => c.name -> c.value).toMap

      multi.processBatch(Seq("get a", "put b").toDF("line"), 0)
      assert(counters("a.mtail")("gets") == VInt(1))

      // edit: from the NEXT batch the program counts puts; the store
      // carries over (reload keeps it), so gets stays at 1
      write(dir, "a.mtail", getsProg + putsProg)
      reloader.loadAll()
      multi.processBatch(Seq("get c", "put d").toDF("line"), 1)
      assert(counters("a.mtail")("gets") == VInt(2))
      assert(counters("a.mtail")("puts") == VInt(1))

      // bad edit: recorded, old program keeps running
      write(dir, "a.mtail", badProg)
      reloader.loadAll()
      assert(reloader.programErrors("a.mtail").isDefined)
      multi.processBatch(Seq("get e", "put f").toDF("line"), 2)
      assert(counters("a.mtail")("gets") == VInt(3))
      assert(counters("a.mtail")("puts") == VInt(2))

      // new file joins the fan-out; deleting a.mtail unloads it
      write(dir, "b.mtail", allProg)
      Files.delete(dir.resolve("a.mtail"))
      reloader.loadAll()
      assert(multi.runners.keySet == Set("b.mtail"))
      multi.processBatch(Seq("get g", "put h").toDF("line"), 3)
      assert(counters("b.mtail")("all_lines") == VInt(2))
    }
  }

  test("tailProgs daemon: polling picks up an edit while streaming") {
    withDir { progs =>
      withDir { logs =>
        write(progs, "gets.mtail", getsProg)
        Files.write(logs.resolve("t.log"),
          "get 1\n".getBytes(StandardCharsets.UTF_8))
        val t = graft.Graft.tailProgs(spark, progs.toString,
          s"$logs/*.log",
          trigger = org.apache.spark.sql.streaming.Trigger
            .ProcessingTime("200 milliseconds"),
          pollMillis = Some(100L))
        try {
          def metrics(): String = get(t.port, "/metrics")
          val d1 = System.currentTimeMillis() + 30000
          while (!metrics().contains("""gets{prog="gets.mtail"} 1""")
            && System.currentTimeMillis() < d1) Thread.sleep(250)
          assert(metrics().contains("""gets{prog="gets.mtail"} 1"""))

          // drop a NEW program file: the poller loads it and the next
          // batches feed it — no signal, no API call
          write(progs, "all.mtail", allProg)
          Files.write(logs.resolve("t.log"),
            "put 2\n".getBytes(StandardCharsets.UTF_8),
            java.nio.file.StandardOpenOption.APPEND)
          val d2 = System.currentTimeMillis() + 30000
          while (!metrics().contains("""all_lines{prog="all.mtail"}""")
            && System.currentTimeMillis() < d2) Thread.sleep(250)
          assert(metrics().contains("""all_lines{prog="all.mtail"}"""))

          // the reference's status surface: / links the endpoints,
          // /progz lists programs, ?prog= dumps the compiled form,
          // and a bad edit's error shows on the listing
          assert(get(t.port, "/").contains("/progz"))
          val progz = get(t.port, "/progz")
          assert(progz.contains("gets.mtail") &&
            progz.contains("all.mtail"), progz)
          val dump = get(t.port, "/progz?prog=gets.mtail")
          assert(dump.contains("program gets.mtail") &&
            dump.contains("gets"), dump)
          // &format=dot serves the live program's AST as graphviz
          // (the daemon-side face of `graft dot`)
          val dotg = get(t.port, "/progz?prog=gets.mtail&format=dot")
          assert(dotg.startsWith("digraph \"gets.mtail\" {") &&
            dotg.contains("VarDecl"), dotg.take(120))
          write(progs, "all.mtail", badProg)
          val d3 = System.currentTimeMillis() + 10000
          while (!get(t.port, "/progz").contains("load error")
            && System.currentTimeMillis() < d3) Thread.sleep(100)
          assert(get(t.port, "/progz").contains("load error"))
          // ...and the old program still runs
          assert(metrics().contains("""all_lines{prog="all.mtail"}"""))
        } finally t.stop()
      }
    }
  }

  test("tailProgs daemon binds a unix socket instead of TCP") {
    // the reference's -unix_socket bind (main.go:43,
    // unix_socket_export_integration_test.go): the daemon comes up on
    // the socket, a plain-HTTP GET scrapes it, and load-time zero-init
    // means the program's cells are visible before any data flows
    withDir { progs =>
      withDir { logs =>
        write(progs, "gets.mtail", getsProg)
        Files.write(logs.resolve("t.log"),
          "get 1\n".getBytes(StandardCharsets.UTF_8))
        val sockDir = Files.createTempDirectory("graft-uds")
        val sock = sockDir.resolve("mtail.sock")
        val t = graft.Graft.tailProgs(spark, progs.toString,
          s"$logs/*.log",
          trigger = org.apache.spark.sql.streaming.Trigger
            .ProcessingTime("200 milliseconds"),
          unixSocket = Some(sock.toString))
        try {
          assert(t.port == -1) // no TCP listener in unix-socket mode
          val ch = java.nio.channels.SocketChannel.open(
            java.net.UnixDomainSocketAddress.of(sock))
          val resp = try {
            val req = java.nio.ByteBuffer.wrap(
              "GET /metrics HTTP/1.0\r\n\r\n".getBytes("ISO-8859-1"))
            while (req.hasRemaining) ch.write(req)
            val sb = new StringBuilder
            val buf = java.nio.ByteBuffer.allocate(65536)
            while (ch.read(buf) >= 0) {
              buf.flip()
              sb.append(new String(buf.array(), 0, buf.limit(), "UTF-8"))
              buf.clear()
            }
            sb.toString
          } finally ch.close()
          assert(resp.startsWith("HTTP/1.0 200 OK\r\n"), resp)
          assert(resp.contains("""gets{prog="gets.mtail"}"""), resp)
        } finally {
          t.stop()
          Files.deleteIfExists(sock)
          Files.deleteIfExists(sockDir)
        }
      }
    }
  }

  test("one pull endpoint serves every loaded program") {
    withDir { dir =>
      write(dir, "gets.mtail", getsProg)
      write(dir, "all.mtail", allProg)
      val multi = new MultiRunner(Nil, spark, 0)
      val reloader = new ProgramReloader(dir.toString,
        multi.load, multi.unload)
      reloader.loadAll()
      multi.processBatch(
        Seq("get a", "get b", "put c").toDF("line"), 0)

      def sorted = multi.runners.toSeq.sortBy(_._1)
      val server = ExportServer.multi(
        () => sorted.map { case (n, r) =>
          ExportServer.Source(n, r.store, r.exportKeys) },
        internals = () => sorted.map { case (n, r) =>
          n -> r.internalStore })
      val port = server.start()
      try {
        val prom = get(port, "/metrics")
        assert(prom.contains("""gets{prog="gets.mtail"} 2"""))
        assert(prom.contains("""all_lines{prog="all.mtail"} 3"""))
        // internals from BOTH runners, prog-labelled, and exactly one
        // TYPE block per family across programs (text-format rule)
        assert(prom.contains("""lines_total{prog="all.mtail"} 3"""))
        assert(prom.contains("""lines_total{prog="gets.mtail"} 3"""))
        val typeLines = prom.linesIterator
          .filter(_.startsWith("# TYPE ")).toSeq
        assert(typeLines.distinct.size == typeLines.size,
          s"duplicate TYPE blocks:\n$prom")

        val json = get(port, "/json")
        assert(json.contains(""""Name": "gets", "Program": "gets.mtail""""))
        assert(json.contains(""""Name": "all_lines", "Program": "all.mtail""""))

        // a scrape AFTER an unload no longer shows the program
        Files.delete(dir.resolve("gets.mtail"))
        reloader.loadAll()
        assert(!get(port, "/metrics").contains("gets.mtail"))
      } finally server.stop()
    }
  }
}
