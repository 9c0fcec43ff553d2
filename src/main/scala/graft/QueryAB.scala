package graft

import org.apache.spark.sql.SparkSession

/** Query-level A/B harness (round 18): time a named subset of
  * SparkEntry.queries EXACTLY as the ×100 scale slice does (Verify's
  * session confs, serial execution, parquet result write included in
  * the clock) and nothing else, so two class trees (e.g. the round-16
  * commit vs HEAD) can be interleaved on one box to attribute a
  * scale-slice ratio movement to code or to host drift. Same technique
  * as [[ReplayAB]], which closed the r16 replay question
  * (AB_REPLAY_r17.txt); this one targets the r17 ×100 per-query
  * ratios that doubled without a controlled explanation
  * (readmix 18.9, seqcycle 17.1, multimodal 16.7, boilerplate 23.1).
  *
  * One JSON line per run; the caller interleaves processes (A B A B …)
  * and compares per-query medians. Knobs:
  *   SPARK_GRAFT_AB_TAG     — label stamped on every line
  *   SPARK_GRAFT_AB_QUERIES — comma-separated SparkEntry.queries names
  *   SPARK_GRAFT_AB_RUNS    — warm runs after the cold one (default 2)
  *   SPARK_GRAFT_SF_DIR     — data dir (the ×100 ScaleGen output)
  */
object QueryAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val tag = sys.env.getOrElse("SPARK_GRAFT_AB_TAG", "untagged")
    val warmRunsN = sys.env.getOrElse("SPARK_GRAFT_AB_RUNS", "2").toInt
    val names = sys.env.getOrElse("SPARK_GRAFT_AB_QUERIES",
      "mtail_engine_readmix").split(",").map(_.trim).filter(_.nonEmpty)
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_query_ab").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same out-of-clock warmup as Verify: ICU collation tables
    spark.sql("SELECT lower('Warm'), upper('warm')").collect()
    def ms(v: Double): String =
      "%.3f".formatLocal(java.util.Locale.ROOT, v)
    /** /proc/stat steal cpu-secs, so a noisy sample self-reports. */
    def stealCpuSecs(): Double = try {
      val l = scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).get.trim.split("\\s+")
      l(8).toDouble / 100.0
    } catch { case _: Exception => 0.0 }
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      (0 to warmRunsN).foreach { i =>
        val s0 = stealCpuSecs()
        val t0 = System.nanoTime()
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        val secs = (System.nanoTime() - t0) / 1e9
        val label = if (i == 0) "\"cold\"" else i.toString
        println(s"""{"ab":"$tag","query":"$name","run":$label,"secs":${ms(secs)},"steal_cpu_secs":${ms(stealCpuSecs() - s0)}}""")
      }
    }
    spark.stop()
  }
}
