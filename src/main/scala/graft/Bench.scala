package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-round benchmark: times every SparkEntry query at the given SF and
  * replays an mtail program over ~1M synthesized log lines to produce a
  * klines/sec figure directly comparable to the reference's
  * benchmark_results.csv anchor (BASELINE.md: 6–37 klines/s on 4 cores,
  * regex-bound).
  *
  * Output: ONE JSON line {"metric","value","unit","queries","sf"} plus
  * an "extra" object with replay throughput.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm up the JVM + codegen + parquet footers outside the clock
    Tables(spark, sfDir, "lineitem").agg(count(lit(1))).collect()
    SparkEntry.queries("mt_line_count")(spark, sfDir).count()

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        name -> time {
          try fn(spark, sfDir).count()
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            -1L
          }
        }
    }

    // mtail replay: the engine_counters program over replicated event
    // lines — the reference's per-line-engine benchmark shape
    val program = mtail.Frontend.parse(
      """counter events_total
        |counter by_type by t
        |gauge last_value by t
        |/^(?P<ts>\S+) type=(?P<t>\w+) value=(?P<v>\d+\.\d+)$/ {
        |  strptime($ts, "2006-01-02T15:04:05")
        |  events_total++
        |  by_type[$t]++
        |  last_value[$t] = $v
        |}
        |""".stripMargin, "bench_replay.mtail")
    val replicate = 10
    // events.parquet is one row group = one scan partition; spread the
    // small table BEFORE the 10× multiply so the 1M generated lines are
    // born across all cores and never funnel through a single
    // shuffle-write task (a real deployment's file source arrives
    // byte-range-split the same way)
    val lineDf = Tables(spark, sfDir, "events")
      .repartition(cpus.toInt)
      .crossJoin(spark.range(replicate.toLong))
      .select(concat_ws(" ",
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"),
        concat(lit("type="), col("event_type")),
        concat(lit("value="), col("value").cast("string"))).as("line"))
    val nLines = lineDf.count()
    def runReplay(df: org.apache.spark.sql.DataFrame): Unit = {
      val pb = new plan.PlanBuilder(program,
        mtail.LogLines.fromLines(df, "line"), 0)
      // the engine's own execution recipe (StreamRunner does the
      // same): one scan feeds every metric branch
      pb.materializeExtraction()
      try pb.snapshot().collect()
      finally pb.unpersistExtraction()
    }
    // Warm the replay plan's generated code outside the clock, like
    // the battery warm-up above: janino compilation + JIT of the
    // extraction/aggregation stages dominate a cold first run
    // (measured ~8.8 s cold vs ~2.6 s steady on identical data, and
    // most of the round-to-round variance). A long-running tailer is
    // always warm; the reference's Go engine has no JIT cliff to
    // amortize, so steady-state is the apples-to-apples figure. The
    // cold first run is still timed and reported under its own key so
    // round-over-round BENCH comparisons can see the r2→r3 methodology
    // change (r1/r2 "mtail_replay_1m_lines" was a cold run).
    val replayColdSecs = time { runReplay(lineDf) }
    val replaySecs = time { runReplay(lineDf) }
    val klinesPerSec = nLines / 1000.0 / replaySecs

    val all = results :+ ("mtail_replay_1m_lines" -> replaySecs)
    val qs = all.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = all.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","extra":{"replay_lines":$nLines,"replay_klines_per_sec":$klinesPerSec,"replay_cold_secs":$replayColdSecs,"replay_cold_klines_per_sec":${nLines / 1000.0 / replayColdSecs},"baseline_klines_per_sec_4core":"6-37 (benchmark_results.csv)"}}""")
    spark.stop()
  }
}
