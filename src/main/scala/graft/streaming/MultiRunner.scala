package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.mtail.{Ir, Snapshot}

/** Fan-out: ONE source stream feeding EVERY loaded program — the
  * reference's runtime loop, where each log line is dispatched to all
  * compiled programs (`internal/runtime/runtime.go:284-304`). Each
  * program keeps its own [[StreamRunner]] (store, carried state,
  * instrumentation); the shared micro-batch is persisted once so N
  * programs don't re-read the source N times, then released.
  */
final class MultiRunner(programs: Seq[Ir.Program], spark: SparkSession,
    defaultYear: Int, overrideZone: String = "UTC",
    /** pass-throughs to each [[StreamRunner]] (see its scaladoc). */
    gcIntervalMs: Long = 0L,
    logRuntimeErrors: Boolean = true) {

  require(programs.map(_.name).distinct.size == programs.size,
    "duplicate program names: every program needs a distinct name " +
      "(the reference keys programs by filename)")

  @volatile private var runnersNow: Map[String, StreamRunner] =
    programs.map(p => p.name -> new StreamRunner(p, spark,
      defaultYear, overrideZone, gcIntervalMs, logRuntimeErrors)).toMap

  /** The currently loaded program set. Each micro-batch reads this
    * once, so a concurrent load/unload applies cleanly from the NEXT
    * batch (the reference's UnloadProgram/CompileAndRun between runs,
    * `runtime.go:61-88,141-158`).
    */
  def runners: Map[String, StreamRunner] = runnersNow

  /** Load a program: an existing name is a live reload through the
    * runner's validate-first [[StreamRunner.reload]] (a program that
    * fails to plan is rejected with the OLD program left running —
    * throws, so a [[ProgramReloader]] records the error); a new name
    * joins the fan-out from the next micro-batch with fresh stores.
    */
  def load(p: Ir.Program): Unit = synchronized {
    runnersNow.get(p.name) match {
      case Some(r) => r.reload(p)
      case None => runnersNow += p.name ->
        new StreamRunner(p, spark, defaultYear, overrideZone,
          gcIntervalMs, logRuntimeErrors)
    }
  }

  /** Unload a program: removed from the fan-out and the export
    * surface from the next batch/scrape (`markDeleted` sweep,
    * `runtime.go:61-88`). Unknown names are a no-op.
    */
  def unload(name: String): Unit = synchronized {
    runnersNow -= name
  }

  def start(lines: DataFrame,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      queryName: String = "graft-multi"): StreamingQuery =
    lines.writeStream
      .queryName(queryName)
      .outputMode("update")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId)
      }
      .start()

  /** visible for tests: one micro-batch through every program.
    *
    * One program's failure must not starve the rest: the reference
    * dispatches every line to every VM and recovers per-VM errors
    * (`runtime.go:284-304`), so a broken program here is counted in
    * ITS internal store and the other programs keep exporting. Only
    * when EVERY program failed is the error rethrown — that signals
    * a batch/source-level problem the streaming query should surface
    * and retry, not a program bug.
    */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    // ONE read of the live program set per batch: a concurrent
    // load/unload applies wholesale to the next batch, never half-way
    // through this one
    val rs = runners
    val shared = batch.persist()
    try {
      val failures = rs.toSeq.flatMap { case (name, r) =>
        try { r.processBatch(shared, batchId); None }
        catch {
          case e: Exception =>
            r.internalStore.merge(Seq(Snapshot.Cell("counter",
              "prog_runtime_errors_total", Map("prog" -> name),
              Snapshot.VInt(1), None)))
            Some(e)
        }
      }
      if (failures.nonEmpty && failures.size == rs.size)
        throw failures.head
    } finally shared.unpersist()
  }
}
