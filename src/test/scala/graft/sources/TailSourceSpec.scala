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

  test("stale file parks (offset kept for exact restart resume); a " +
      "late append resumes from the recorded position") {
    val dir = tmpDir()
    val f = dir.resolve("stale.log")
    write(f, "a\nb\npartial")
    val stream = new TailMicroBatchStream(s"$dir/*.log",
      staleAfterMs = 300)
    val (b1, o1) = deltaLines(stream, stream.initialOffset())
    assert(b1 == Seq("a", "b"))
    Thread.sleep(500) // idle past the window
    val o2 = stream.latestOffset().asInstanceOf[TailOffset]
    // parked, but the entry STAYS in the offset state at its recorded
    // position — a restarted query must resume exactly from the
    // checkpoint, not re-read the file from 0
    assert(o2.state(f.toString).pos == 4)
    // while parked, polls stop scanning for line ends: the unterminated
    // "partial" tail would keep pos at 4 anyway, but an appended
    // newline is only noticed because the SIZE changed (unpark)
    assert(stream.latestOffset().asInstanceOf[TailOffset]
      .state(f.toString).pos == 4)
    // a late append wakes it; reading resumes at byte 4, not 0
    write(f, " line\nc\n")
    val o3 = stream.latestOffset().asInstanceOf[TailOffset]
    assert(o3.state(f.toString).pos == 19)
    val parts = stream.planInputPartitions(o2, o3)
    assert(parts.length == 1)
    val tp = parts(0).asInstanceOf[TailPartition]
    assert(tp.start == 4 && tp.end == 19,
      s"must resume from the parked offset, got [${tp.start},${tp.end})")
    // rotation while parked restarts at 0 like any rotation. The
    // replacement is created while the old file still exists (as
    // logrotate does), so it gets a distinct inode — a delete-then-
    // recreate that RECYCLES the inode is indistinguishable from an
    // append by path-stat alone (the reference only catches that case
    // by holding the fd open).
    Thread.sleep(500)
    val oParked = stream.latestOffset().asInstanceOf[TailOffset]
    assert(oParked.state(f.toString).pos == 19)
    val fresh = dir.resolve("incoming.tmp")
    write(fresh, "xx\nyy\nzz\n")
    Files.move(fresh, f,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val o4 = stream.latestOffset().asInstanceOf[TailOffset]
    val parts2 = stream.planInputPartitions(oParked, o4)
    assert(parts2.length == 1 &&
      parts2(0).asInstanceOf[TailPartition].start == 0)
  }

  test("same-size in-place rewrite unparks a parked file (mtime)") {
    val dir = tmpDir()
    val f = dir.resolve("rw.log")
    write(f, "a\nb\npartial") // 11 bytes, last line end at 4
    val stream = new TailMicroBatchStream(s"$dir/*.log",
      staleAfterMs = 300)
    val (b1, o1) = deltaLines(stream, stream.initialOffset())
    assert(b1 == Seq("a", "b"))
    Thread.sleep(500) // idle past the window
    val o2 = stream.latestOffset().asInstanceOf[TailOffset]
    assert(o2.state(f.toString).pos == 4) // parked
    // rewrite in place: same inode, same 11-byte size, different line
    // structure — only the mtime betrays the change, and a (key, size)
    // parked comparison would never re-scan it. Per the documented
    // contract (same as the reference's fd-based reader), the recorded
    // position survives the rewrite: delivery resumes at byte 4, so
    // content before it is not re-read and a rewrite whose line
    // boundaries don't align there would surface a partial first line.
    Files.write(f, "x\ny\nz\nqqqqq".getBytes)
    val o3 = stream.latestOffset().asInstanceOf[TailOffset]
    assert(o3.state(f.toString).pos == 6,
      "mtime change must unpark and re-scan a same-size rewrite")
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

  test("glob metacharacters work in directory components; new subdirs " +
      "are discovered after start") {
    // TestPollLogPathPatterns (multiple_levels_directory_integration_
    // test.go): the pattern logs/*/app.log matches one directory level
    // per component, and a subdirectory created AFTER the stream
    // starts joins the tail on the next poll — Go filepath.Glob
    // semantics, not filename-only globbing
    val root = tmpDir()
    Files.createDirectories(root.resolve("a"))
    write(root.resolve("a/app.log"), "one\n")
    val stream = new TailMicroBatchStream(s"$root/*/app.log")
    val (b1, o1) = deltaLines(stream, stream.initialOffset())
    assert(b1 == Seq("one"))
    // a whole new level appears while tailing
    Files.createDirectories(root.resolve("b"))
    write(root.resolve("b/app.log"), "two\n")
    val (b2, _) = deltaLines(stream, o1)
    assert(b2 == Seq("two"))

    // directories matching the FILE component are ignored
    // (TestGlobIgnoreFolder): a dir named like a log is not tailed
    Files.createDirectories(root.resolve("a/ignored.log"))
    assert(!TailSource.expand(s"$root/a/*.log")
      .exists(_.getFileName.toString == "ignored.log"))

    // literal (no-glob) patterns still resolve to the single file
    assert(TailSource.expand(s"$root/a/app.log").map(_.getFileName
      .toString) == Seq("app.log"))
    assert(TailSource.expand(s"$root/missing/app.log").isEmpty)
  }

  test("an unreadable file is skipped, not a failure; readable again " +
      "later picks it up from the start (permission_denied test)") {
    val dir = tmpDir()
    write(dir.resolve("ok.log"), "fine\n")
    val bad = dir.resolve("bad.log")
    write(bad, "secret\n")
    bad.toFile.setReadable(false, false)
    val stream = new TailMicroBatchStream(s"$dir/*.log")
    if (Files.isReadable(bad)) {
      // running as root mode bits don't bind — both files just read
      val (b1, _) = deltaLines(stream, stream.initialOffset())
      assert(b1.toSet == Set("fine", "secret"))
    } else {
      val (b1, o1) = deltaLines(stream, stream.initialOffset())
      assert(b1 == Seq("fine"))
      // permissions restored → next discovery tails it from offset 0
      bad.toFile.setReadable(true, false)
      val (b2, _) = deltaLines(stream, o1)
      assert(b2 == Seq("secret"))
    }
  }

  test("batch reads are split-invariant: offsets give total order") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir()
    val f = dir.resolve("g.log")
    // 2000 gauge writes; last-write-wins depends on total line order
    val sb = new StringBuilder
    (1 to 2000).foreach(i => sb.append(s"v=$i\n"))
    write(f, sb.toString)
    val prog = graft.mtail.Frontend.parse(
      """gauge last
        |counter n
        |/^v=(?P<x>\d+)$/ {
        |  last = $x
        |  n++
        |}
        |""".stripMargin, "split_test")
    def run(maxSplit: Option[Long]) = {
      val base = spark.read.format("graft-tail").option("path", f.toString)
      val df = maxSplit.fold(base)(m =>
        base.option("maxSplitBytes", m.toString)).load()
      assert(maxSplit.forall(_ > (1L << 15)) ||
        df.rdd.getNumPartitions >= 4, "expected a split read")
      val lines = df.select(col("filename"), col("line"),
        struct(col("filename").as("f"), col("off").as("o")).as("ord"))
      graft.mtail.Snapshot.collect(
        new graft.plan.PlanBuilder(prog, lines, 0).snapshot())
        .map(c => c.name -> c.value).toMap
    }
    val single = run(None) // one ~12KB file, one split
    val multi = run(Some(1L << 16)) // floor-clamped: still exercises path
    // force real multi-partition by tiny split: clamp floor is 64KiB, so
    // write a bigger file instead
    val big = dir.resolve("big.log")
    val sb2 = new StringBuilder
    (1 to 40000).foreach(i => sb2.append(s"v=$i\npad_line_to_make_bytes_$i\n"))
    write(big, sb2.toString)
    val progB = prog
    def runBig(split: Long) = {
      val df = spark.read.format("graft-tail")
        .option("path", big.toString)
        .option("maxSplitBytes", split.toString).load()
      (df.rdd.getNumPartitions,
        graft.mtail.Snapshot.collect(new graft.plan.PlanBuilder(progB,
          df.select(col("filename"), col("line"),
            struct(col("filename").as("f"), col("off").as("o"))
              .as("ord")), 0).snapshot())
          .map(c => c.name -> c.value).toMap)
    }
    val (parts, bigMulti) = runBig(1L << 16)
    assert(parts >= 4, s"expected >=4 splits, got $parts")
    val (_, bigSingle) = runBig(1L << 30)
    assert(bigMulti == bigSingle)
    assert(bigMulti("last") == graft.mtail.Snapshot.VInt(40000L))
    assert(single("last") == graft.mtail.Snapshot.VInt(2000L))
    assert(single == multi)
  }

  test("a micro-batch burst on one file fans out into byte-range " +
      "partitions that cover it exactly once, in order") {
    val dir = tmpDir()
    val f = dir.resolve("burst.log")
    val sb = new StringBuilder
    (1 to 60000).foreach(i =>
      sb.append(s"burst_line_payload_with_some_width_$i\n"))
    sb.append("partial-tail") // held back by the line-end offset scan
    write(f, sb.toString)
    val stream = new TailMicroBatchStream(s"$dir/*.log")
    val to = stream.latestOffset()
    val parts = stream.planInputPartitions(stream.initialOffset(), to)
      .map(_.asInstanceOf[TailPartition])
    // ~2.3 MB of new bytes with a 1 MB chunk floor → several chunks
    assert(parts.length >= 2, s"expected a fan-out, got ${parts.length}")
    // contiguous, non-overlapping, covering [0, lastLineEnd)
    assert(parts.head.start == 0L)
    parts.sliding(2).foreach { case Array(a, b) =>
      assert(a.end == b.start, s"gap/overlap between $a and $b")
    }
    // reading the partitions in order reproduces the file exactly:
    // every complete line once, offsets strictly increasing
    val factory = stream.createReaderFactory()
    val got = Seq.newBuilder[(Long, String)]
    parts.foreach { p =>
      val r = factory.createReader(p)
      while (r.next()) {
        val row = r.get()
        got += ((row.getLong(2), row.getUTF8String(1).toString))
      }
      r.close()
    }
    val rows = got.result()
    assert(rows.map(_._2) ==
      (1 to 60000).map(i => s"burst_line_payload_with_some_width_$i"))
    assert(rows.map(_._1) == rows.map(_._1).sorted)
  }

  test("query restart resumes exactly from the checkpointed offsets") {
    val dir = tmpDir()
    val ckpt = tmpDir()
    val f = dir.resolve("r.log")
    write(f, "a\nb\n")
    // foreachBatch invocations are serialized per query, and the two
    // queries run sequentially — a plain buffer is safe
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream.format("graft-tail")
        .option("path", s"$dir/*.log").load()
        .writeStream
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          buf ++= b.orderBy("off").collect().map(_.getString(1))
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    val q1 = run(); q1.awaitTermination(30000)
    assert(buf.toSeq == Seq("a", "b"))
    // append and restart with a FRESH source instance: the restored
    // TailOffset must resume at byte 4 — "a","b" are never re-read,
    // nothing is skipped
    write(f, "c\nd\n")
    val q2 = run(); q2.awaitTermination(30000)
    assert(buf.toSeq == Seq("a", "b", "c", "d"))
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

  test("poll_log_interval=0: only the startup file set is tailed " +
      "(main.go:66 zero behavior)") {
    val dir = tmpDir()
    write(dir.resolve("a.log"), "a1\n")
    val stream = new TailMicroBatchStream(s"$dir/*.log", pollLogMs = 0L)
    val (b1, o1) = deltaLines(stream, stream.initialOffset())
    assert(b1 == Seq("a1"))
    // a file created after startup is never discovered...
    write(dir.resolve("b.log"), "b1\n")
    val (b2, o2) = deltaLines(stream, o1)
    assert(b2.isEmpty)
    // ...but new data in the startup set still flows
    write(dir.resolve("a.log"), "a2\n")
    val (b3, _) = deltaLines(stream, o2)
    assert(b3 == Seq("a2"))
    // the library default (rescan every batch) picks b.log up
    val fresh = new TailMicroBatchStream(s"$dir/*.log")
    val (all, _) = deltaLines(fresh, fresh.initialOffset())
    assert(all.toSet == Set("a1", "a2", "b1"))
  }

  test("poll_log_interval caches the glob between rescans and " +
      "survives a cached file's deletion") {
    val dir = tmpDir()
    write(dir.resolve("a.log"), "a1\n")
    write(dir.resolve("b.log"), "b1\n")
    // a one-hour cadence: the startup scan is the only one this test
    // will ever see, so the cached-list path is what's exercised
    val stream = new TailMicroBatchStream(s"$dir/*.log",
      pollLogMs = 3600L * 1000)
    val (b1, o1) = deltaLines(stream, stream.initialOffset())
    assert(b1.toSet == Set("a1", "b1"))
    // deleting a cached file must not kill the poll; the other file
    // keeps flowing
    Files.delete(dir.resolve("b.log"))
    write(dir.resolve("a.log"), "a2\n")
    val (b2, _) = deltaLines(stream, o1)
    assert(b2 == Seq("a2"))
  }
}
