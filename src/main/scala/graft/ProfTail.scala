package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiler for the streaming-tail daemon path (optimization
  * rounds): replicates the bench's streaming stage — a real file
  * tailed by TailSource under a microbatch trigger — with the
  * per-batch phase decomposition (GRAFT_BATCH_TIMING) on, so the
  * tail's fixed cost can be attributed to plan build vs extraction
  * vs snapshot jobs. Not part of the driver contract.
  *
  *   GRAFT_BATCH_TIMING=1 sbt "runMain graft.ProfTail <sfDir> [lines] [triggerMs]"
  */
object ProfTail {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val nLines = if (args.length > 1) args(1).toInt else 1000000
    val triggerMs = if (args.length > 2) args(2).toInt else 250
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val localDir = Some("/dev/shm/graft-proftail").filter(d =>
      try { java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(d)); true }
      catch { case _: Exception => false })
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
    val spark = localDir.fold(b)(d => b.config("spark.local.dir", d)
      .config("spark.sql.streaming.checkpointLocation",
        s"$d/ckpt-${ProcessHandle.current().pid()}"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val programSrc =
      """counter events_total
        |counter by_type by t
        |gauge last_value by t
        |/^(?P<ts>\S+) type=(?P<t>\w+) value=(?P<v>\d+\.\d+)$/ {
        |  strptime($ts, "2006-01-02T15:04:05")
        |  events_total++
        |  by_type[$t]++
        |  last_value[$t] = $v
        |}
        |""".stripMargin
    val lineDf = Tables(spark, sfDir, "events")
      .repartition(cpus.toInt)
      .crossJoin(spark.range(math.max(1L, nLines / 100000L)))
      .select(concat_ws(" ",
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"),
        concat(lit("type="), col("event_type")),
        concat(lit("value="), col("value").cast("string"))).as("line"))
    val lines = lineDf.collect().map(_.getString(0))
    val dir = java.nio.file.Files.createTempDirectory(
      localDir.map(java.nio.file.Paths.get(_)).getOrElse(
        java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))),
      "proftail")
    val logPath = dir.resolve("proftail.log")
    java.nio.file.Files.createFile(logPath)
    val handle = Graft.tail(spark, programSrc, "proftail",
      logPath.toString,
      trigger = org.apache.spark.sql.streaming.Trigger
        .ProcessingTime(s"$triggerMs milliseconds"))
    def totalCell: Long =
      handle.runner.store.snapshot()
        .find(c => c.name == "events_total" && c.labels.isEmpty)
        .map(_.value match {
          case graft.mtail.Snapshot.VInt(v) => v
          case _ => 0L
        }).getOrElse(0L)
    try {
      def append(ls: Seq[String]): Unit = {
        val w = java.nio.file.Files.newBufferedWriter(logPath,
          java.nio.charset.StandardCharsets.UTF_8,
          java.nio.file.StandardOpenOption.APPEND)
        try ls.foreach { l => w.write(l); w.write('\n') }
        finally w.close()
      }
      def awaitTotal(target: Long, timeoutSecs: Int): Boolean = {
        val deadline = System.nanoTime() + timeoutSecs * 1000000000L
        while (totalCell < target && System.nanoTime() < deadline)
          Thread.sleep(50)
        totalCell >= target
      }
      append(lines.take(50000))
      awaitTotal(50000, 60)
      var expected = 50000L
      (1 to 2).foreach { r =>
        val t0 = System.nanoTime()
        append(lines)
        expected += lines.length
        val done = awaitTotal(expected, 180)
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[proftail] run=$r lines=${lines.length} done=$done " +
          f"secs=$secs%.3f klines=${lines.length / 1000.0 / secs}%.1f")
      }
    } finally {
      handle.stop()
      java.nio.file.Files.deleteIfExists(logPath)
      java.nio.file.Files.deleteIfExists(dir)
      spark.stop()
    }
  }
}
