package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query profiler for the optimization rounds: runs one
  * declared query N times and reports wall per run plus Spark job /
  * stage counts and summed task time, so a slow query can be
  * attributed to orchestration overhead (many tiny jobs/stages) vs
  * actual compute. Not part of the driver contract.
  *
  *   sbt "runMain graft.ProfQ <sfDir> <query> [runs]"
  */
object ProfQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val qname = args(1)
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // experiment knobs: PROFQ_CONF="k=v;k=v" applies extra confs
      .config(sys.env.get("PROFQ_CONF").map(_.split(";").toSeq)
        .getOrElse(Seq.empty)
        .filter(_.contains("="))
        .map { kv =>
          val Array(k, v) = kv.split("=", 2); k -> v
        }.foldLeft(new org.apache.spark.SparkConf()) {
          case (c, (k, v)) => c.set(k, v)
        })
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.get("PROFQ_LOG_CODEGEN").contains("1")) {
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator",
        org.apache.logging.log4j.Level.DEBUG)
    }
    // same warmup as Bench
    Tables(spark, sfDir, "lineitem").agg(
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1))).collect()
    spark.sql("SELECT lower('Warm'), upper('warm')").collect()
    SparkEntry.queries("mt_line_count")(spark, sfDir).count()

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    @volatile var taskTimeMs = 0L
    val verbose = sys.env.get("PROFQ_VERBOSE").contains("1")
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1
        if (verbose) {
          val site = Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse("?")
          println(s"[profq-job] id=${j.jobId} stages=${j.stageInfos.size} site=$site")
        }
      }
      override def onStageCompleted(
          s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        taskTimeMs += s.stageInfo.taskMetrics.executorRunTime
        if (verbose) {
          val tm = s.stageInfo.taskMetrics
          println(f"[profq-stage] id=${s.stageInfo.stageId} " +
            f"tasks=${s.stageInfo.numTasks} " +
            f"runMs=${tm.executorRunTime} " +
            f"deserMs=${tm.executorDeserializeTime} " +
            f"gcMs=${tm.jvmGCTime} " +
            f"cpuMs=${tm.executorCpuTime / 1000000} " +
            f"name=${s.stageInfo.name.take(70)}")
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val fn = SparkEntry.queries(qname)
    (1 to runs).foreach { r =>
      jobs = 0; stages = 0; tasks = 0L; taskTimeMs = 0L
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a beat
      Thread.sleep(300)
      println(f"[profq] $qname run=$r rows=$n wall=$wall%.3f " +
        f"jobs=$jobs stages=$stages tasks=$tasks " +
        f"taskTime=${taskTimeMs / 1000.0}%.2fs")
    }
    spark.stop()
  }
}
