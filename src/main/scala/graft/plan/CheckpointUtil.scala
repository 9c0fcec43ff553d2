package graft.plan

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame

/** Eager cleanup for `localCheckpoint`-materialized iteration state.
  *
  * Spark frees a local checkpoint's blocks only when the
  * ContextCleaner notices the backing RDD was garbage-collected on
  * the driver — with a large driver heap under low allocation
  * pressure that can be minutes away, so iterative algorithms
  * (connected-components rounds, streaming carried state) stack dead
  * rounds in executor block managers meanwhile. [[checkpointRdd]]
  * digs the backing RDD out of the checkpointed Dataset's `LogicalRDD`
  * leaf so a superseded round can be unpersisted the moment its
  * successor is materialized.
  *
  * `LogicalRDD` is `private[sql]`, hence the reflective access (Scala
  * package-private erases to public bytecode); if the plan shape or
  * the class ever changes this degrades to None — i.e. back to the
  * ContextCleaner's GC-paced cleanup, never an error.
  */
object CheckpointUtil {
  def checkpointRdd(df: DataFrame): Option[RDD[_]] = {
    val plan = df.queryExecution.logical
    if (plan.children.nonEmpty) None // not a checkpoint leaf
    else scala.util.Try(
      plan.getClass.getMethod("rdd").invoke(plan).asInstanceOf[RDD[_]]
    ).toOption
  }

  /** Unpersist the checkpoint backing `df`, if `df` is a
    * localCheckpoint'ed Dataset (no-op otherwise). Non-blocking.
    */
  def freeCheckpoint(df: DataFrame): Unit =
    checkpointRdd(df).foreach(_.unpersist(false))
}
