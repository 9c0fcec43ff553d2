ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mtailspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++ (
  // Pin the heap FOR BENCH RUNS ONLY: without -Xms the JVM grows/
  // shrinks the committed heap around every GC cycle, and on this
  // 32-vCPU microVM the resulting mmap/munmap churn (page re-zeroing +
  // TLB-shootdown IPIs to 31 other vCPUs, each a VM exit)
  // intermittently burned 100-800 CPU-seconds of guest SYSTEM time per
  // benchmark run — 10-50× wall-time swings on identical warm queries
  // (diagnosed round 8: thread dumps in user-space memcpy loops while
  // /proc time billed to sys). AlwaysPreTouch faults every page once
  // at JVM start so steady state never faults.
  //
  // Gated on SPARK_GRAFT_SF_DIR (set only when invoking graft.Bench,
  // per the driver contract) because the flip side — an 8 GiB
  // pre-fault on EVERY fork — taxed round 8's sbt-test and Verify
  // wall time inside the driver's capture window for JVMs whose
  // timings nobody measures. Correctness/test forks take the
  // unpinned heap; only the measured bench JVM pays for determinism.
  if (sys.env.contains("SPARK_GRAFT_SF_DIR"))
    Seq(s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
      "-XX:+AlwaysPreTouch")
  else Seq.empty
)
