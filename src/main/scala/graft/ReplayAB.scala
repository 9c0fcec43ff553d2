package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Replay-only A/B harness (round 17): the 1 M-line engine_counters
  * replay EXACTLY as Bench stages it — same program, same generator,
  * same session confs — and nothing else, so two class trees (e.g.
  * the round-14 commit vs HEAD) can be interleaved on one box to
  * separate a code regression from host drift. This is the technique
  * that root-caused the r14→r15 streaming-path question; BENCH_r16's
  * 1126→794 klines/s replay delta gets the same treatment.
  *
  * One JSON line per run; the caller interleaves processes
  * (A B A B …) and compares medians. Knobs:
  *   SPARK_GRAFT_AB_TAG   — label stamped on every line
  *   SPARK_GRAFT_AB_RUNS  — warm runs after the cold one (default 5)
  */
object ReplayAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.get("SPARK_GRAFT_BENCH_SF")
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val tag = sys.env.getOrElse("SPARK_GRAFT_AB_TAG", "untagged")
    val warmRunsN = sys.env.getOrElse("SPARK_GRAFT_AB_RUNS", "5").toInt
    val localDir = sys.env.get("SPARK_GRAFT_LOCAL_DIR").orElse(
      Some("/dev/shm/graft-bench").filter(d =>
        try { java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get(d)); true }
        catch { case _: Exception => false }))
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    val spark = localDir.fold(builder)(d =>
      builder.config("spark.local.dir", d)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same out-of-clock warmup as Bench: parquet footers + the ICU
    // collation-table build
    Tables(spark, sfDir, "lineitem").agg(count(lit(1))).collect()
    spark.sql("SELECT lower('Warm'), upper('warm')").collect()

    val programSrc =
      """counter events_total
        |counter by_type by t
        |gauge last_value by t
        |/^(?P<ts>\S+) type=(?P<t>\w+) value=(?P<v>\d+\.\d+)$/ {
        |  strptime($ts, "2006-01-02T15:04:05")
        |  events_total++
        |  by_type[$t]++
        |  last_value[$t] = $v
        |}
        |""".stripMargin
    val program = mtail.Frontend.parse(programSrc, "bench_replay.mtail")
    val lineDf = Tables(spark, sfDir, "events")
      .repartition(cpus.toInt)
      .crossJoin(spark.range(10L))
      .select(concat_ws(" ",
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"),
        concat(lit("type="), col("event_type")),
        concat(lit("value="), col("value").cast("string"))).as("line"))
    val nLines = lineDf.count()
    def runReplay(): Unit = {
      val pb = new plan.PlanBuilder(program,
        mtail.LogLines.fromLines(lineDf, "line"), 0)
      pb.materializeExtraction()
      try pb.snapshot().collect()
      finally pb.unpersistExtraction()
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def ms(v: Double): String =
      "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val cold = time { runReplay() }
    println(s"""{"ab":"$tag","run":"cold","secs":${ms(cold)}}""")
    val warm = (1 to warmRunsN).map { i =>
      val s = time { runReplay() }
      println(s"""{"ab":"$tag","run":$i,"secs":${ms(s)},"klines_per_sec":${ms(nLines / 1000.0 / s)}}""")
      s
    }
    val sorted = warm.sorted
    val med = if (sorted.size % 2 == 1) sorted(sorted.size / 2)
      else (sorted(sorted.size / 2 - 1) + sorted(sorted.size / 2)) / 2.0
    println(s"""{"ab":"$tag","median_secs":${ms(med)},"median_klines_per_sec":${ms(nLines / 1000.0 / med)},"lines":$nLines}""")
    spark.stop()
  }
}
