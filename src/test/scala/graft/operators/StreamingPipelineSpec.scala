package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

class StreamingPipelineSpec extends SparkSpec {

  private def ts(s: Int) = new Timestamp(1700000000000L + s * 1000L)

  test("streaming exact dedup: first arrival wins inside the " +
      "watermark horizon; state expires past it") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(Timestamp, String, Long)]
    val dedup = StreamingPipeline.streamingExactDedup(
      ms.toDF().toDF("ts", "text", "id"), "ts", "text", "10 seconds")
    val q = dedup.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      ms.addData((ts(0), "alpha", 1L), (ts(1), "alpha", 2L),
        (ts(2), "beta", 3L))
      q.processAllAvailable()
      // duplicate "alpha" (id 2) dropped; first arrivals kept
      val got1 = spark.sql("SELECT id FROM sdedup").as[Long]
        .collect().toSet
      assert(got1 == Set(1L, 3L))
      // advance event time far past the horizon: the alpha state row
      // has expired, so a late re-arrival is re-admitted (the
      // documented horizon contract)
      ms.addData((ts(60), "advance", 4L))
      q.processAllAvailable()
      ms.addData((ts(61), "alpha", 5L))
      q.processAllAvailable()
      val got2 = spark.sql("SELECT id FROM sdedup").as[Long]
        .collect().toSet
      assert(got2 == Set(1L, 3L, 4L, 5L), got2.toString)
    } finally q.stop()
  }

  test("streaming exact dedup ≡ batch first-arrival dedup on the " +
      "same rows within the watermark horizon") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // 40 rows over 8 distinct texts, ids in arrival order, all inside
    // one horizon — the regime where the streaming contract promises
    // exactly the batch answer
    val rows = (0 until 40).map(i =>
      (ts(i % 9), s"text_${i % 8}", i.toLong))
    val ms = MemoryStream[(Timestamp, String, Long)]
    val q = StreamingPipeline.streamingExactDedup(
      ms.toDF().toDF("ts", "text", "id"), "ts", "text", "1 hour")
      .writeStream.format("memory").queryName("sdedup_eq")
      .outputMode("append").start()
    val got =
      try {
        ms.addData(rows: _*)
        q.processAllAvailable()
        spark.sql("SELECT id FROM sdedup_eq").as[Long].collect().toSet
      } finally q.stop()
    // batch twin: first arrival per text = min id (ids ARE the
    // arrival order) — the dedup_exact keep-first semantics
    val batch = rows.toDF("ts", "text", "id")
      .groupBy("text").agg(min("id").as("id"))
      .select("id").as[Long].collect().toSet
    assert(got == batch, s"streaming=$got batch=$batch")
  }

  test("streaming quality counts ≡ the same windowed aggregation " +
      "run in batch, for every window the watermark closed") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val rows = (0 until 60).map(i =>
      (ts(i), s"src_${i % 3}", if (i % 4 == 0) "no" else "long enough"))
    val keepExpr = length(col("text")) >= 5
    val ms = MemoryStream[(Timestamp, String, String)]
    val q = StreamingPipeline.streamingQualityCounts(
      ms.toDF().toDF("ts", "source", "text"), "ts", "source",
      keepExpr, "10 seconds", "5 seconds")
      .writeStream.format("memory").queryName("squal_eq")
      .outputMode("append").start()
    val got =
      try {
        ms.addData(rows: _*)
        q.processAllAvailable()
        // sentinel far past the data: closes every data window
        ms.addData((ts(3600), "src_0", "sentinel"))
        q.processAllAvailable()
        spark.sql("SELECT * FROM squal_eq")
          .as[(Timestamp, String, Long, Long)].collect().toSet
      } finally q.stop()
    // batch twin: the SAME transform applied to the bounded frame
    // (withWatermark is a no-op in batch), minus the sentinel's
    // still-open window
    val batch = StreamingPipeline.streamingQualityCounts(
      rows.toDF("ts", "source", "text"), "ts", "source",
      keepExpr, "10 seconds", "5 seconds")
      .as[(Timestamp, String, Long, Long)].collect().toSet
    assert(got == batch, s"streaming=$got batch=$batch")
  }

  test("streaming scrub monitor ≡ the same scrub aggregation run in " +
      "batch, for every window the watermark closed") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // every 5th doc leaks an email, every 7th an IP; sources rotate
    val rows = (0 until 60).map { i =>
      val pii = (if (i % 5 == 0) s" leak$i@example.com" else "") +
        (if (i % 7 == 0) " from 10.0.0.1" else "")
      (ts(i), s"src_${i % 3}", s"doc $i body$pii")
    }
    val ms = MemoryStream[(Timestamp, String, String)]
    val q = StreamingPipeline.streamingScrubMonitor(
      ms.toDF().toDF("ts", "source", "text"), "ts", "source", "text",
      "10 seconds", "5 seconds")
      .writeStream.format("memory").queryName("sscrub_eq")
      .outputMode("append").start()
    val got =
      try {
        ms.addData(rows: _*)
        q.processAllAvailable()
        ms.addData((ts(3600), "src_0", "sentinel"))
        q.processAllAvailable()
        spark.sql("SELECT * FROM sscrub_eq")
          .as[(Timestamp, String, Long, Long, Long)].collect().toSet
      } finally q.stop()
    val batch = StreamingPipeline.streamingScrubMonitor(
      rows.toDF("ts", "source", "text"), "ts", "source", "text",
      "10 seconds", "5 seconds")
      .as[(Timestamp, String, Long, Long, Long)].collect().toSet
    assert(got == batch, s"streaming=$got batch=$batch")
    // the fixture actually exercises redactions
    assert(got.exists(_._4 > 0))
    assert(got.map(_._5).sum < got.map(_._3).sum) // not every doc leaks
  }

  test("windowed quality counts finalize per tumbling window in " +
      "append mode") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(Timestamp, String, String)]
    val counts = StreamingPipeline.streamingQualityCounts(
      ms.toDF().toDF("ts", "source", "text"), "ts", "source",
      length(col("text")) >= 5, "10 seconds", "5 seconds")
    val q = counts.writeStream.format("memory").queryName("squal")
      .outputMode("append").start()
    try {
      ms.addData((ts(1), "a", "long enough"), (ts(2), "a", "no"),
        (ts(3), "b", "also long"))
      q.processAllAvailable()
      // windows not yet closed by the watermark → nothing appended
      ms.addData((ts(30), "a", "closes the first window"))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT source, docs, kept FROM squal ORDER BY source")
        .as[(String, Long, Long)].collect().toSeq
      assert(rows == Seq(("a", 2L, 1L), ("b", 1L, 1L)), rows.toString)
    } finally q.stop()
  }
}
