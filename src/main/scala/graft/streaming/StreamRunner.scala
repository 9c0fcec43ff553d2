package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.mtail.{Ir, Snapshot}
import graft.plan.PlanBuilder

/** Streaming ("tail") mode: a Structured Streaming source of lines →
  * per-microbatch mtail plan → cumulative [[MetricsStore]] merge — the
  * Spark shape of the reference's tailer→VM→store loop
  * (`internal/tailer/tail.go`, `internal/runtime/runtime.go:284-304`).
  *
  * Each microbatch runs the full batch PlanBuilder (so within-batch
  * semantics — conds, time register, same-line ordering, windows — are
  * identical to one-shot mode), then merges kind-aware into the store:
  * counters add, gauges last-write-wins. Cross-BATCH hidden-metric state
  * (a session opened in batch N, closed in batch N+1) is carried by
  * [[PlanBuilder]] windows only within a batch; programs needing it
  * across batches are the `flatMapGroupsWithState` extension noted in
  * SURVEY §7.7 — the counter/gauge surface (the vast majority of shipped
  * programs) is exact under this merge.
  *
  * Scale: the per-batch plan is the same narrow extraction + small-key
  * shuffles as batch mode; only aggregated cells reach the driver store.
  */
final class StreamRunner(program: Ir.Program, spark: SparkSession,
    defaultYear: Int) {

  val store = new MetricsStore

  /** cross-batch state of cross-line-read metrics (sessions in flight):
    * carried into the next batch's PlanBuilder so a session opened in
    * batch N pairs with its close in batch N+k.
    */
  @volatile private var carriedState: Map[String, Map[String, Any]] =
    Map.empty

  /** Start over a streaming Dataset with a `line` STRING column (e.g.
    * `spark.readStream.format("text"|"socket")`).
    */
  def start(lines: DataFrame,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      queryName: String = "graft-stream"): StreamingQuery = {
    lines.writeStream
      .queryName(queryName)
      .outputMode("update")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId)
      }
      .start()
  }

  /** visible for tests: run one microbatch through the plan + merge. */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    // mtail dialect: conversion errors null out (vm.go:97-129)
    batch.sparkSession.conf.set("spark.sql.ansi.enabled", "false")
    if (!batch.isEmpty) {
      val withCols = batch
        .withColumn("filename",
          if (batch.columns.contains("filename")) col("filename")
          else lit(""))
        .withColumn("ord", monotonically_increasing_id())
      val pb = new PlanBuilder(program, withCols, defaultYear,
        carriedState)
      store.merge(Snapshot.collect(pb.snapshot())
        // zero-init rows only describe "never updated" state; don't
        // re-add them every batch
        .filterNot(c => c.kind == "counter" &&
          c.value == Snapshot.VInt(0L) && c.tsSec.contains(0L)))
      carriedState = pb.finalReadState()
    }
  }
}
