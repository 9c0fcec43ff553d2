package graft.plan

import org.apache.spark.sql.SparkSession

import graft.mtail.{Frontend, LogLines}

/** Scratch diagnostic: print the approxNotes each frozen declared
  * survivor emits, so the routing work knows which splice arm fires.
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
    val seeds = Seq(4467, 4788) ++ ApproxPinFixtures.huntSurvivors
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
