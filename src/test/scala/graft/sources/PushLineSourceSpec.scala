package graft.sources

import java.net.{DatagramPacket, DatagramSocket, InetAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.SparkSpec

class PushLineSourceSpec extends SparkSpec {

  private def startQuery(pattern: String, name: String): StreamingQuery =
    LogSources.open(spark, pattern)
      .writeStream.format("memory").queryName(name)
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()

  private def awaitRows(table: String, want: Int,
      timeoutMs: Long = 30000): Seq[(String, String)] = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var rows = Seq.empty[(String, String)]
    while (rows.size < want && System.currentTimeMillis() < deadline) {
      Thread.sleep(200)
      rows = spark.sql(s"SELECT filename, line FROM $table ORDER BY off")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    }
    rows
  }

  test("udp datagram source end-to-end, partial lines carry over") {
    val sock = new DatagramSocket(0)
    val port = sock.getLocalPort
    sock.close() // free it for the source to bind
    val q = startQuery(s"udp://localhost:$port", "udpmem")
    try {
      Thread.sleep(500) // let the receiver bind
      val c = new DatagramSocket()
      def send(s: String): Unit = {
        val b = s.getBytes(UTF_8)
        c.send(new DatagramPacket(b, b.length,
          InetAddress.getByName("localhost"), port))
      }
      send("alpha\nbe")
      send("ta\ngamma\n") // "be"+"ta" joins across datagrams
      c.close()
      val rows = awaitRows("udpmem", 3)
      assert(rows.map(_._2) == Seq("alpha", "beta", "gamma"))
      assert(rows.head._1 == s"udp://localhost:$port")
    } finally q.stop()
  }

  test("tcp listening source accepts writers") {
    val probe = new java.net.ServerSocket(0)
    val port = probe.getLocalPort
    probe.close()
    val q = startQuery(s"tcp://localhost:$port", "tcpmem")
    try {
      Thread.sleep(500)
      val c = new Socket("localhost", port)
      c.getOutputStream.write("one\ntwo\r\n".getBytes(UTF_8))
      c.getOutputStream.flush()
      c.close()
      val rows = awaitRows("tcpmem", 2)
      assert(rows.map(_._2) == Seq("one", "two")) // \r stripped
    } finally q.stop()
  }

  test("fifo (named pipe) source end-to-end") {
    val dir = Files.createTempDirectory("fifosrc")
    val fifo = dir.resolve("in.pipe")
    val mk = new ProcessBuilder("mkfifo", fifo.toString).start()
    assert(mk.waitFor() == 0, "mkfifo failed")
    val q = startQuery(s"fifo://$fifo", "fifomem")
    try {
      Thread.sleep(500) // reader end open, blocking for a writer
      val out = Files.newOutputStream(fifo)
      out.write("pipe line 1\npipe line 2\n".getBytes(UTF_8))
      out.close()
      val rows = awaitRows("fifomem", 2)
      assert(rows.map(_._2) == Seq("pipe line 1", "pipe line 2"))
      // fifo reopens for a second writer (fifostream semantics)
      val out2 = Files.newOutputStream(fifo)
      out2.write("pipe line 3\n".getBytes(UTF_8))
      out2.close()
      assert(awaitRows("fifomem", 3).map(_._2).contains("pipe line 3"))
    } finally q.stop()
  }

  test("commit trims the receiver buffer; indexes stay stable") {
    val probe = new DatagramSocket(0)
    val port = probe.getLocalPort
    probe.close()
    val stream = new PushLineMicroBatchStream(s"udp://localhost:$port")
    try {
      Thread.sleep(300) // receiver bind
      val c = new DatagramSocket()
      def send(s: String): Unit = {
        val b = s.getBytes(UTF_8)
        c.send(new DatagramPacket(b, b.length,
          InetAddress.getByName("localhost"), port))
      }
      send("a\nb\nc\n")
      val deadline = System.currentTimeMillis() + 10000
      def latest(): Long = stream.latestOffset()
        .asInstanceOf[PushLineIndexOffset].index
      while (latest() < 3 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(latest() == 3)
      def rows(s: Long, e: Long): Seq[String] = {
        val parts = stream.planInputPartitions(
          new PushLineIndexOffset(s), new PushLineIndexOffset(e))
        parts.toSeq.flatMap(
          _.asInstanceOf[PushLinePartition].rows.toSeq)
      }
      assert(rows(0, 3) == Seq("a", "b", "c"))
      stream.commit(new PushLineIndexOffset(3))
      // committed lines are gone from driver memory…
      assert(rows(0, 3).isEmpty)
      // …and indexes keep advancing from where they were
      send("d\n")
      while (latest() < 4 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(rows(3, 4) == Seq("d"))
      c.close()
    } finally stream.stop()
  }

  test("tcp writer closing without a trailing newline delivers the " +
      "partial as a final line") {
    val probe = new java.net.ServerSocket(0)
    val port = probe.getLocalPort
    probe.close()
    val stream = new PushLineMicroBatchStream(s"tcp://localhost:$port")
    try {
      Thread.sleep(300) // listener bind
      val sock = new Socket("localhost", port)
      sock.getOutputStream.write("complete\nunterminated".getBytes(UTF_8))
      sock.getOutputStream.flush()
      sock.close() // EOF with a partial line pending — reader.go:99-106
      def latest(): Long = stream.latestOffset()
        .asInstanceOf[PushLineIndexOffset].index
      val deadline = System.currentTimeMillis() + 10000
      while (latest() < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      val parts = stream.planInputPartitions(
        new PushLineIndexOffset(0), new PushLineIndexOffset(2))
      assert(parts.toSeq.flatMap(
        _.asInstanceOf[PushLinePartition].rows.toSeq) ==
        Seq("complete", "unterminated"))
    } finally stream.stop()
  }

  test("restart rebases to the checkpointed offset; new lines follow") {
    val probe = new DatagramSocket(0)
    val port = probe.getLocalPort
    probe.close()
    // a FRESH stream (as after a query restart) starts at base=0; the
    // restored offset says 100 lines were committed before the restart
    val stream = new PushLineMicroBatchStream(s"udp://localhost:$port")
    try {
      Thread.sleep(300) // receiver bind
      stream.deserializeOffset("100")
      def latest(): Long = stream.latestOffset()
        .asInstanceOf[PushLineIndexOffset].index
      // without the rebase this is 0 and the next 100 arrivals would
      // be silently swallowed before latestOffset catches up
      assert(latest() == 100)
      // the replayed in-flight range is empty (documented at-most-once)
      assert(stream.planInputPartitions(new PushLineIndexOffset(100),
        new PushLineIndexOffset(100)).isEmpty)
      // a new arrival lands AT the checkpointed index, not at 0
      val c = new DatagramSocket()
      val b = "fresh\n".getBytes(UTF_8)
      c.send(new DatagramPacket(b, b.length,
        InetAddress.getByName("localhost"), port))
      val deadline = System.currentTimeMillis() + 10000
      while (latest() < 101 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(latest() == 101)
      val parts = stream.planInputPartitions(
        new PushLineIndexOffset(100), new PushLineIndexOffset(101))
      assert(parts.toSeq.flatMap(
        _.asInstanceOf[PushLinePartition].rows.toSeq) == Seq("fresh"))
      c.close()
    } finally stream.stop()
  }

  test("burst before offset restore: all buffered lines survive the " +
      "rebase") {
    val probe = new DatagramSocket(0)
    val port = probe.getLocalPort
    probe.close()
    val stream = new PushLineMicroBatchStream(s"udp://localhost:$port")
    try {
      Thread.sleep(300)
      def latest(): Long = stream.latestOffset()
        .asInstanceOf[PushLineIndexOffset].index
      // 3 lines land BEFORE Spark restores the checkpointed offset
      val c = new DatagramSocket()
      val b = "a\nb\nc\n".getBytes(UTF_8)
      c.send(new DatagramPacket(b, b.length,
        InetAddress.getByName("localhost"), port))
      val deadline = System.currentTimeMillis() + 10000
      while (latest() < 3 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      // restore at 100: the buffered arrivals map to 100..102, not
      // 0..2 (which a `idx > base+len` guard would have swallowed)
      stream.deserializeOffset("100")
      assert(latest() == 103)
      val parts = stream.planInputPartitions(
        new PushLineIndexOffset(100), new PushLineIndexOffset(103))
      assert(parts.toSeq.flatMap(
        _.asInstanceOf[PushLinePartition].rows.toSeq) ==
        Seq("a", "b", "c"))
      c.close()
    } finally stream.stop()
  }

  test("restart restores the in-flight END offset first: the rebase " +
      "anchors on the committed start, so the replayed range is fed") {
    val probe = new DatagramSocket(0)
    val port = probe.getLocalPort
    probe.close()
    val stream = new PushLineMicroBatchStream(s"udp://localhost:$port")
    try {
      Thread.sleep(300)
      // MicroBatchExecution deserializes the offset log's LATEST entry
      // (the uncommitted in-flight batch's END, 102) BEFORE the
      // committed start (100); anchoring on the first-seen value would
      // set base=102 and leave the replayed range [100,102) forever
      // empty
      stream.deserializeOffset("102")
      stream.deserializeOffset("100")
      def latest(): Long = stream.latestOffset()
        .asInstanceOf[PushLineIndexOffset].index
      assert(latest() == 100)
      val c = new DatagramSocket()
      val b = "p\nq\n".getBytes(UTF_8)
      c.send(new DatagramPacket(b, b.length,
        InetAddress.getByName("localhost"), port))
      val deadline = System.currentTimeMillis() + 10000
      while (latest() < 102 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      c.close()
      // the two post-restart arrivals map to 100..101 and fill the
      // replayed in-flight range (earliest post-restart lines — the
      // documented at-most-once replacement for the lost pre-restart
      // data)
      val parts = stream.planInputPartitions(
        new PushLineIndexOffset(100), new PushLineIndexOffset(102))
      assert(parts.toSeq.flatMap(
        _.asInstanceOf[PushLinePartition].rows.toSeq) == Seq("p", "q"))
      // a WAL re-read after the first batch is planned must not
      // re-shift anything
      stream.deserializeOffset("50")
      assert(latest() == 102)
    } finally stream.stop()
  }

  test("restart with an in-flight batch and NO prior commit: the " +
      "first planned batch rebases to its start 0") {
    val probe = new DatagramSocket(0)
    val port = probe.getLocalPort
    probe.close()
    val stream = new PushLineMicroBatchStream(s"udp://localhost:$port")
    try {
      Thread.sleep(300)
      // crash before any commit: only the in-flight END offset (5) is
      // in the offset log; the committed start 0 never passes through
      // deserializeOffset (it arrives as initialOffset)
      stream.deserializeOffset("5")
      def latest(): Long = stream.latestOffset()
        .asInstanceOf[PushLineIndexOffset].index
      val c = new DatagramSocket()
      val b = "r\ns\n".getBytes(UTF_8)
      c.send(new DatagramPacket(b, b.length,
        InetAddress.getByName("localhost"), port))
      val deadline = System.currentTimeMillis() + 10000
      while (stream.latestOffset()
        .asInstanceOf[PushLineIndexOffset].index < 7 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      c.close()
      // replaying [0, 5): the first planned batch anchors base on its
      // start, so the post-restart arrivals fill the replayed range
      // instead of hiding behind base=5
      val parts = stream.planInputPartitions(
        new PushLineIndexOffset(0), new PushLineIndexOffset(5))
      assert(parts.toSeq.flatMap(
        _.asInstanceOf[PushLinePartition].rows.toSeq) == Seq("r", "s"))
      // the 2 delivered lines are shifted to butt up against the
      // replayed end (base = 5 - 2), so the NEXT arrival lands at 5 —
      // no index gap for commit(5) to swallow it into
      assert(latest() == 5)
      val c2 = new DatagramSocket()
      val b2 = "t\n".getBytes(UTF_8)
      c2.send(new DatagramPacket(b2, b2.length,
        InetAddress.getByName("localhost"), port))
      val deadline2 = System.currentTimeMillis() + 10000
      while (latest() < 6 && System.currentTimeMillis() < deadline2)
        Thread.sleep(100)
      c2.close()
      val next = stream.planInputPartitions(
        new PushLineIndexOffset(5), new PushLineIndexOffset(6))
      assert(next.toSeq.flatMap(
        _.asInstanceOf[PushLinePartition].rows.toSeq) == Seq("t"))
    } finally stream.stop()
  }

  test("comma list splits outside braces only") {
    // `-logs a,b` splits; a `{err,out}` glob alternation stays whole
    assert(LogSources.splitList("a.log,b.log") == Seq("a.log", "b.log"))
    assert(LogSources.splitList("logs/*.{err,out}") ==
      Seq("logs/*.{err,out}"))
    assert(LogSources.splitList("x.{a,b},y.log") ==
      Seq("x.{a,b}", "y.log"))
    assert(LogSources.splitList(",,a") == Seq("a"))
  }

  test("glob ignore-regex filters discovered files") {
    val dir = Files.createTempDirectory("ignoresrc")
    Files.write(dir.resolve("app.log"), "keep\n".getBytes(UTF_8))
    Files.write(dir.resolve("app.log.gz"), "skip\n".getBytes(UTF_8))
    val all = TailSource.expand(s"$dir/*")
    assert(all.size == 2)
    val filtered = TailSource.expand(s"$dir/*", Some("\\.gz$"))
    assert(filtered.map(_.getFileName.toString) == Seq("app.log"))
    // through the DSv2 option as well
    val rows = spark.read.format("graft-tail")
      .option("path", s"$dir/*")
      .option("ignoreRegex", "\\.gz$").load()
      .collect().map(_.getString(1)).toSeq
    assert(rows == Seq("keep"))
  }

  test("scheme dispatch: file patterns route to graft-tail") {
    val dir = Files.createTempDirectory("dispatch")
    Files.write(dir.resolve("d.log"), "x\n".getBytes(UTF_8))
    val df = LogSources.open(spark, s"$dir/*.log")
    assert(df.isStreaming)
    assert(df.schema.fieldNames.toSeq ==
      Seq("filename", "line", "off"))
  }
}
