package graft.plan

import org.apache.spark.sql.SparkSession

import graft.mtail.{Frontend, LogLines}

/** Diagnostic main: print the approxNotes each frozen declared
  * survivor emits — which resolution arm (splice class, last-resort
  * replay corner, fence-stall surrender) a tangle takes changes with
  * the machinery, and this is the quickest way to see the current
  * routing when working on it (it drove the r19 splice-order fix).
  * Run: Test/runMain graft.plan.ApproxNoteDump
  */
object ApproxNoteDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("approx-note-dump")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val seeds =
      Seq(4467, 4788) ++ ApproxPinFixtures.huntSurvivors :+ 60150
    seeds.foreach { seed =>
      val (src, lines) = ApproxPinFixtures.pins(seed)
      val prog = Frontend.parse(src, s"approx.$seed")
      val pb = new PlanBuilder(prog,
        LogLines.fromLines(lines.toDF("line"), "line"), 2020)
      pb.snapshot().collect()
      println(s"=== seed $seed ===")
      pb.approxNotes.foreach(n => println(s"  NOTE: $n"))
    }
    spark.stop()
  }
}
