package graft.sources

import java.nio.file.{Files, Path, StandardOpenOption}

import graft.SparkSpec

class TailSourceSpec extends SparkSpec {

  private def tmpDir(): Path = Files.createTempDirectory("tailsrc")
  private def write(p: Path, s: String): Unit =
    Files.write(p, s.getBytes, StandardOpenOption.CREATE,
      StandardOpenOption.APPEND)

  private def deltaLines(stream: TailMicroBatchStream,
      from: org.apache.spark.sql.connector.read.streaming.Offset)
      : (Seq[String], org.apache.spark.sql.connector.read.streaming.Offset) = {
    val to = stream.latestOffset()
    val parts = stream.planInputPartitions(from, to)
    val factory = stream.createReaderFactory()
    val out = Seq.newBuilder[String]
    parts.foreach { p =>
      val r = factory.createReader(p)
      while (r.next()) out += r.get().getUTF8String(1).toString
    }
    (out.result(), to)
  }

  test("append-only tailing advances past complete lines only") {
    val dir = tmpDir()
    val f = dir.resolve("app.log")
    write(f, "a\nb\npartial")
    val stream = new TailMicroBatchStream(s"$dir/*.log")
    val (batch1, o1) = deltaLines(stream, stream.initialOffset())
    assert(batch1 == Seq("a", "b")) // partial line held back
    write(f, " line\nc\n")
    val (batch2, _) = deltaLines(stream, o1)
    assert(batch2 == Seq("partial line", "c"))
  }

  test("rotation (new inode at same path) rereads from start") {
    val dir = tmpDir()
    val f = dir.resolve("rot.log")
    write(f, "one\ntwo\n")
    val stream = new TailMicroBatchStream(s"$dir/*.log")
    val (b1, o1) = deltaLines(stream, stream.initialOffset())
    assert(b1 == Seq("one", "two"))
    // rotate: move aside, create fresh file at the same path
    Files.move(f, dir.resolve("rot.log.1"))
    write(f, "three\n")
    val (b2, _) = deltaLines(stream, o1)
    assert(b2.contains("three"))
  }

  test("truncation resets the offset") {
    val dir = tmpDir()
    val f = dir.resolve("trunc.log")
    write(f, "aaaa\nbbbb\n")
    val stream = new TailMicroBatchStream(s"$dir/*.log")
    val (b1, o1) = deltaLines(stream, stream.initialOffset())
    assert(b1.size == 2)
    Files.write(f, "x\n".getBytes) // truncate + rewrite
    val (b2, _) = deltaLines(stream, o1)
    assert(b2 == Seq("x"))
  }

  test("offset round-trips through JSON") {
    val o = new TailOffset(Map(
      "/var/log/app.log" -> FileState("(dev=1,ino=2)", 42L)))
    val back = TailOffset.fromJson(o.json())
    assert(back.state == o.state)
  }

  test("crlf stripped; glob discovers new files") {
    val dir = tmpDir()
    write(dir.resolve("a.log"), "x\r\ny\n")
    val stream = new TailMicroBatchStream(s"$dir/*.log")
    val (b1, o1) = deltaLines(stream, stream.initialOffset())
    assert(b1 == Seq("x", "y"))
    write(dir.resolve("b.log"), "z\n")
    val (b2, _) = deltaLines(stream, o1)
    assert(b2 == Seq("z"))
  }

  test("readStream end-to-end via format(graft-tail)") {
    val dir = tmpDir()
    write(dir.resolve("s.log"), "l1\nl2\n")
    val q = spark.readStream.format("graft-tail")
      .option("path", s"$dir/*.log").load()
      .writeStream.format("memory").queryName("tailmem")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(30000)
    val rows = spark.sql("SELECT line FROM tailmem").collect()
      .map(_.getString(0)).toSeq
    assert(rows == Seq("l1", "l2"))
  }
}
