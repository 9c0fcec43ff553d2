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
