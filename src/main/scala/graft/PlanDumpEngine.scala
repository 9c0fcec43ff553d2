package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dump the INTERNAL engine-query plan — the unmaterialized snapshot,
  * with every window / offsets-join / as-of subtree inline — for plan
  * evidence. The declared engine queries checkpoint their snapshot, so
  * PlanDump on them shows only the checkpoint scan; this tool builds
  * the same program's plan without the cache/checkpoint lifecycle.
  *
  *   sbt "runMain graft.PlanDumpEngine <sfDir> <outDir> <suffix> [q1,q2,…]"
  *
  * PLANDUMP_CONF="k=v;k=v" applies extra session confs (e.g. toggling
  * spark.graft.keylessRead.direct for before/after dumps).
  */
object PlanDumpEngine {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").map(_.trim).toSet)
      else None
    Files.createDirectories(Paths.get(outDir))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config(sys.env.get("PLANDUMP_CONF").map(_.split(";").toSeq)
        .getOrElse(Seq.empty)
        .filter(_.contains("="))
        .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }
        .foldLeft(new org.apache.spark.SparkConf()) {
          case (c, (k, v)) => c.set(k, v)
        })
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = queries.EngineQueries.specs.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    qs.foreach { name =>
      try {
        val df = queries.EngineQueries.internalPlan(spark, sfDir, name)
        val plan = df.queryExecution.explainString(FormattedMode)
        Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
          plan.getBytes(StandardCharsets.UTF_8))
        System.err.println(s"[plandump-engine] $name ok (${plan.length} bytes)")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump-engine] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
