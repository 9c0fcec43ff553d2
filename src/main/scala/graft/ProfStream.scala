package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc decomposition of the streaming per-microbatch fixed cost
  * (optimization round): runs one StreamingPipeline stage over
  * MemoryStream microbatches under varying shuffle-partition counts
  * and with/without the stateful aggregate, printing per-batch wall.
  * Not part of the driver contract.
  *
  *   sbt "runMain graft.ProfStream <stage> <batches> <rowsPerBatch> <shufflePartitions>"
  *   stage: scrub | scrub_nostate | quality | dedup | ident
  */
object ProfStream {
  def main(args: Array[String]): Unit = {
    val stage = if (args.length > 0) args(0) else "scrub"
    val batches = if (args.length > 1) args(1).toInt else 9
    val rowsPer = if (args.length > 2) args(2).toInt else 10000
    val parts = if (args.length > 3) args(3) else "32"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val ckptDir = sys.env.getOrElse("PROFSTREAM_CKPT",
      System.getProperty("java.io.tmpdir")) +
      s"/profstream-ckpt-${System.nanoTime()}"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.checkpointLocation", ckptDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    val srcs = Array("web", "books", "code", "wiki")
    val n = rowsPer * (batches + 1)
    val rows = (0 until n).map { i =>
      val pii = if (i % 97 == 0) s" contact user$i@example.com" else ""
      (new java.sql.Timestamp(1700000000000L + (i / 1000) * 1000L),
        srcs(i % srcs.length),
        s"line $i type=ev${i % 7} value=${i % 1000}.${i % 97}$pii")
    }
    val msrc = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, String, String)]
    val in = msrc.toDF().toDF("ts", "source", "text")
    val out = stage match {
      case "scrub" => operators.StreamingPipeline.streamingScrubMonitor(
        in, "ts", "source", "text", "10 seconds", "30 seconds")
      case "scrub_nostate" =>
        operators.Scrub.scrub(in, "text")
          .select(col("ts"), col("source"))
      case "quality" => operators.StreamingPipeline
        .streamingQualityCounts(in, "ts", "source",
          length(col("text")).between(20, 100000), "10 seconds",
          "30 seconds")
      case "dedup" => operators.StreamingPipeline.streamingExactDedup(
        in, "ts", "text", "30 seconds")
      case "ident" => in.select(col("ts"), col("source"))
    }
    val q = out.writeStream.format("memory").queryName("profstream")
      .outputMode("append").start()
    try {
      msrc.addData(rows.take(rowsPer))
      q.processAllAvailable()
      var i = 1
      val times = rows.drop(rowsPer).grouped(rowsPer).map { ch =>
        val t0 = System.nanoTime()
        msrc.addData(ch)
        q.processAllAvailable()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[profstream] stage=$stage parts=$parts batch=$i rows=${ch.size} secs=$secs%.3f")
        i += 1
        secs
      }.toSeq
      println(f"[profstream] TOTAL stage=$stage parts=$parts batches=$batches " +
        f"rowsPer=$rowsPer sum=${times.sum}%.3f perBatchMedian=${times.sorted.apply(times.size / 2)}%.3f")
    } finally {
      q.stop()
      spark.stop()
      // the per-run checkpoint dir (offset/state logs) otherwise
      // accumulates across profiling runs — mirror Bench's cleanup
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p)) {
          val s = java.nio.file.Files.list(p)
          try s.forEach(rm(_)) finally s.close()
        }
        java.nio.file.Files.deleteIfExists(p)
      }
      try rm(java.nio.file.Paths.get(ckptDir))
      catch { case _: Exception => () }
    }
  }
}
