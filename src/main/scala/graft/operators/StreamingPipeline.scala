package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data pipeline stages as NATIVE Structured Streaming
  * transforms — `readStream → transform → writeStream` with
  * watermarked state, no foreachBatch loop. Where the mtail engine
  * needs custom per-batch merge semantics (its store IS the sink),
  * these stages are plain incremental queries: Spark's own state
  * store handles dedup/window state, checkpoints it with the query,
  * and expires it by watermark — the operational shape a 100 TB
  * ingest pipeline runs 24/7, where UNBOUNDED state (a dedup set that
  * only grows) is the thing that kills the job at day 30.
  */
object StreamingPipeline {

  /** Exact near-real-time dedup on content hash: the first arrival of
    * each text wins, duplicates within the watermark horizon are
    * dropped by Spark's streaming-dedup state store, and state older
    * than the horizon is expired — `dropDuplicatesWithinWatermark`,
    * NOT plain `dropDuplicates`, whose state never expires unless the
    * event-time column itself is a dedup key (the unbounded-state
    * trap this operator exists to avoid). Hashing first keeps the
    * state rows 32 bytes (a SHA-256 digest), not documents; state
    * size is bounded by ingest rate × horizon instead of corpus
    * size. SHA-256, not md5: "exact dedup" must not drop distinct
    * documents, and md5 collisions are constructible.
    *
    * Exactly-once caveat (same as any watermarked dedup): a duplicate
    * arriving LATER than the horizon re-admits — the horizon is the
    * contract, chosen per pipeline.
    */
  def streamingExactDedup(docs: DataFrame, tsCol: String,
      textCol: String, horizon: String): DataFrame =
    docs.withColumn("__text_hash", unhex(sha2(col(textCol), 256)))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("__text_hash")
      .drop("__text_hash")

  /** Windowed PII-scrub monitor: tumbling event-time windows of
    * per-source redaction volume — the live alarm feed of
    * [[Scrub.report]]'s batch audit (a redaction-rate spike on one
    * source is the operational signal that an upstream feed started
    * leaking raw user data). The scrub itself is [[Scrub.scrub]]'s
    * stateless map-side fold, so the ONLY streaming state is the
    * windowed aggregate: bounded by sources × open windows, expired by
    * the watermark, append-mode finalized per window.
    */
  def streamingScrubMonitor(docs: DataFrame, tsCol: String,
      sourceCol: String, textCol: String, windowLen: String,
      horizon: String,
      rules: Seq[Scrub.Rule] = Scrub.defaultRules): DataFrame = {
    require(rules.nonEmpty, "streamingScrubMonitor needs >= 1 rule")
    val redactions = rules.map(r => col(s"n_${r.name}"))
      .reduceLeft[Column](_ + _)
    Scrub.scrub(docs, textCol, rules)
      .withWatermark(tsCol, horizon)
      .groupBy(window(col(tsCol), windowLen), col(sourceCol))
      .agg(count(lit(1)).as("docs"),
        sum(redactions.cast("long")).as("redactions"),
        sum((redactions > 0).cast("long")).as("docs_with_pii"))
      .select(col("window.start").as("window_start"), col(sourceCol),
        col("docs"), col("redactions"), col("docs_with_pii"))
  }

  /** Windowed per-source quality funnel: tumbling event-time windows
    * of arrival counts and keep-counts under a quality predicate —
    * the live dashboard feed of [[Pipeline.qualityFunnel]]'s batch
    * report. Watermark + tumbling window = append-mode output, so the
    * sink sees each window once, finalized.
    */
  def streamingQualityCounts(docs: DataFrame, tsCol: String,
      sourceCol: String, keep: Column, windowLen: String,
      horizon: String): DataFrame =
    docs.withWatermark(tsCol, horizon)
      .groupBy(window(col(tsCol), windowLen), col(sourceCol))
      .agg(count(lit(1)).as("docs"),
        sum(keep.cast("long")).as("kept"))
      .select(col("window.start").as("window_start"), col(sourceCol),
        col("docs"), col("kept"))
}
