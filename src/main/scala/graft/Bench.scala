package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-round benchmark: times every SparkEntry query at the given SF and
  * replays an mtail program over ~1M synthesized log lines to produce a
  * klines/sec figure directly comparable to the reference's
  * benchmark_results.csv anchor (BASELINE.md: 6–37 klines/s on 4 cores,
  * regex-bound).
  *
  * Output: TWO JSON lines. The first ("detail") carries the bulky
  * per-pass battery timings, all raw warm-replay samples, and a data
  * fingerprint (per-table row count + order-insensitive content hash,
  * so a silent testdata regeneration is visible round-over-round). The
  * LAST line is the compact headline {"metric","value","unit",
  * "queries","sf","failed","extra"} — deliberately last and small so a
  * tail-truncating capture (which cost round 6 its replay median)
  * always keeps the summary.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Shuffle/spill scratch on tmpfs when available: this box's virtual
    // disk intermittently burns hundreds of CPU-seconds of guest system
    // time on shuffle-file mmap/write syscalls under host I/O
    // contention (round-8 diagnosis; thread dumps in FileChannel.map0 /
    // write0 with sys≫user). A single-node bench box keeping scratch in
    // RAM is the same condition the reference's benchmarks run under
    // (page-cache-resident logs). Cluster deployments size real
    // local-dir disks instead — this is bench-box hygiene, not an
    // engine requirement.
    val localDir = sys.env.get("SPARK_GRAFT_LOCAL_DIR").orElse(
      Some("/dev/shm/graft-bench").filter(d =>
        try { java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get(d)); true }
        catch { case _: Exception => false }))
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    val spark = localDir.fold(builder)(d =>
      builder.config("spark.local.dir", d)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm up the JVM + codegen + parquet footers outside the clock
    Tables(spark, sfDir, "lineitem").agg(count(lit(1))).collect()
    SparkEntry.queries("mt_line_count")(spark, sfDir).count()

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    // Hypervisor CPU steal (aggregate cpu-seconds across all vCPUs,
    // /proc/stat field 8 @ USER_HZ=100), sampled around every
    // measurement so residual host noise is auditable in the artifact
    // itself. Round 8's investigation of the 10–50× warm-run swings
    // (r7's 18 s mtail_engine_counters / 80 s replay median) found the
    // DOMINANT causes were guest-side and are now fixed — un-pinned
    // JVM heap (commit/uncommit churn → page-fault + TLB-shootdown
    // storms billed as system time; -Xms=-Xmx + AlwaysPreTouch in
    // build.sbt) and shuffle scratch on the contended virtual disk
    // (tmpfs local.dir above) — but the box remains a shared microVM,
    // so the steal column stays as the tell for what's left.
    def stealCpuSecs: Double = try {
      val line = scala.io.Source.fromFile("/proc/stat").getLines()
        .next().trim.split("\\s+")
      if (line.length > 8) line(8).toDouble / 100.0 else 0.0
    } catch { case _: Exception => 0.0 }
    // (wall secs, steal cpu-secs during the measurement)
    def timeWithSteal[A](f: => A): (Double, Double) = {
      val s0 = stealCpuSecs
      val secs = time(f)
      (secs, stealCpuSecs - s0)
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }

    // The bench box is shared and demonstrably noisy (r4/r5 both showed
    // warm-slower-than-cold inversions and 3-6x swings on unchanged
    // queries), so single samples can't separate regressions from load
    // spikes. Run the battery twice and report the per-query MIN — the
    // least-load-contaminated sample — plus both raw passes so the
    // spread itself is visible in the JSON. The reference's own harness
    // repeats for the same reason (Makefile:199-208, `go test -count=N`
    // piped through benchstat).
    val batteryPasses = 2
    // (name, secs, ok, steal): a pass that THROWS is recorded with
    // ok=false so its fast failure time can never masquerade as a
    // min-of-N speedup; steal is the hypervisor-stolen cpu-seconds
    // during that query's measurement window
    val rawPasses: Seq[Seq[(String, Double, Boolean, Double)]] =
      (1 to batteryPasses).map { _ =>
        SparkEntry.queries.toSeq.sortBy(_._1).map {
          case (name, fn) =>
            var ok = true
            val (secs, steal) = timeWithSteal {
              try fn(spark, sfDir).count()
              catch { case e: Throwable =>
                System.err.println(s"[bench] $name failed: ${e.getMessage}")
                ok = false
              }
            }
            (name, secs, ok, steal)
        }
      }
    val failed = rawPasses.flatten.collect { case (n, _, false, _) => n }
      .distinct.sorted
    val results = rawPasses.head.map(_._1).map { name =>
      val samples = rawPasses.map(_.find(_._1 == name).get)
      name -> (if (samples.exists(!_._3)) -1.0 else samples.map(_._2).min)
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
    // The cold first run pays janino compilation + JIT of the
    // extraction/aggregation stages; a long-running tailer is always
    // warm and the reference's Go engine has no JIT cliff to amortize,
    // so steady-state is the apples-to-apples figure. The cold run is
    // timed and reported under its own key (r1/r2
    // "mtail_replay_1m_lines" was a cold run; r3-r5 a single warm run).
    // From r6 the headline is the MEDIAN of N warm runs with min/max
    // alongside, so a load spike on the shared box shows up as spread
    // instead of silently becoming the headline.
    val replayColdSecs = time { runReplay(lineDf) }
    val replayWarmRuns = 5
    val warmRuns = (1 to replayWarmRuns).map(_ =>
      timeWithSteal { runReplay(lineDf) })
    val warmSecs = warmRuns.map(_._1)
    val replaySecs = median(warmSecs)
    val klinesPerSec = nLines / 1000.0 / replaySecs

    // data fingerprint: per-table (rows, order-insensitive content hash
    // = 32-bit murmur3 row hashes summed into a long, overflow-free
    // below 2³² rows) so a regenerated-but-row-count-identical testdata
    // set is visible in the round artifact without diffing CORRECTNESS
    val fingerprint = Seq("region", "nation", "customer", "supplier",
        "part", "orders", "lineitem", "events", "documents",
        "embeddings").map { t =>
      val df = Tables(spark, sfDir, t)
      val r = df.agg(count(lit(1)).as("n"),
        sum(hash(df.columns.map(col): _*).cast("long")).as("h")).head()
      t -> (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    val all = results :+ ("mtail_replay_1m_lines" -> replaySecs)
    // headline values are rounded to ms: round 7's full-precision
    // doubles pushed the final line to ~2.5 KB and the driver's
    // tail-capture cut its head ("parsed": null two rounds running).
    // Full precision lives in the detail line's battery_passes.
    def ms(v: Double): String =
      if (v < 0) "-1"
      else "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def qjson(pass: Seq[(String, Double, Boolean, Double)]): String =
      pass.map { case (k, v, ok, _) =>
        "\"" + k + "\":" + (if (ok) v.toString else s"""{"secs":$v,"failed":true}""")
      }.mkString("{", ",", "}")
    def sjson(pass: Seq[(String, Double, Boolean, Double)]): String =
      pass.map { case (k, _, _, st) => "\"" + k + "\":" + ms(st) }
        .mkString("{", ",", "}")
    val fpJson = fingerprint.map { case (t, (n, h)) =>
      "\"" + t + "\":{\"rows\":" + n + ",\"hash\":" + h + "}"
    }.mkString("{", ",", "}")
    // bulky detail FIRST on its own line; the compact headline is the
    // LAST line so a tail-truncating capture always retains it
    println(s"""{"detail":{"battery_passes":${rawPasses.map(qjson).mkString("[", ",", "]")},"battery_steal_cpu_secs":${rawPasses.map(sjson).mkString("[", ",", "]")},"replay_warm_secs_all":${warmSecs.mkString("[", ",", "]")},"replay_warm_steal_cpu_secs":${warmRuns.map(r => ms(r._2)).mkString("[", ",", "]")},"data_fingerprint":$fpJson,"queries_are":"per-query min of $batteryPasses passes, -1 = a pass threw (see failed); replay is median of $replayWarmRuns warm runs; *_steal_cpu_secs = hypervisor-stolen cpu-secs (/proc/stat) during that window — high steal means the wall time is host noise, not engine time","baseline_klines_per_sec_4core":"6-37 (benchmark_results.csv)"}}""")
    val total = all.collect { case (_, v) if v >= 0 => v }.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    def headline(prec: Int): String = {
      def p(v: Double): String =
        if (v < 0) "-1"
        else s"%.${prec}f".formatLocal(java.util.Locale.ROOT, v)
      val qsP = all.map { case (k, v) => "\"" + k + "\":" + p(v) }
        .mkString("{", ",", "}")
      val extra =
        s""""replay_lines":$nLines,"replay_klines_per_sec":${p(klinesPerSec)},""" +
        s""""replay_warm_secs_median":${p(replaySecs)},""" +
        s""""replay_warm_secs_min":${p(warmSecs.min)},""" +
        s""""replay_warm_secs_max":${p(warmSecs.max)},""" +
        s""""replay_warm_runs":$replayWarmRuns,""" +
        s""""replay_cold_secs":${p(replayColdSecs)},""" +
        s""""replay_cold_klines_per_sec":${p(nLines / 1000.0 / replayColdSecs)},""" +
        s""""replay_warm_steal_cpu_secs_sum":${p(warmRuns.map(_._2).sum)},""" +
        s""""battery_steal_cpu_secs_sum":${p(rawPasses.flatten.map(_._4).sum)}"""
      s"""{"metric":"total","value":${p(total)},"unit":"sec","queries":$qsP,"sf":"$sfDir","failed":$failedJson,"extra":{$extra}}"""
    }
    // the driver's tail capture keeps ~2.4 KB; the headline grows ~30
    // bytes per registered query, so degrade precision (ms → cs → ds)
    // before it can ever outgrow the window again (r6/r7 both lost
    // their summaries to exactly this)
    val line = Seq(3, 2, 1).map(headline).find(_.length <= 2200)
      .getOrElse(headline(1))
    println(line)
    spark.stop()
  }
}
