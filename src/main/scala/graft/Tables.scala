package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All queries take the scale-factor directory as a parameter so the same
  * plan runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1+ (bench). At
  * cluster scale the same code reads a partitioned table root; nothing here
  * assumes single-file inputs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark's TimestampType
    // (micros) cannot represent natively; read it as a long and convert.
    // Sub-microsecond precision is dropped — queries that compare or emit
    // event time truncate to seconds on both the Spark and oracle side.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the engine's dialect is mtail's: conversion errors null out and
    // drop the line (vm.go:97-129), never fail the job
    spark.conf.set("spark.sql.ansi.enabled", "false")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") {
      import org.apache.spark.sql.functions._
      // the driver's parquet carries TIMESTAMP(NANOS) (arrives here as
      // a long, via nanosAsLong); a regenerated/scaled set may already
      // carry a native TIMESTAMP(MICROS) column — convert only the
      // long shape, pass a real timestamp through
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts",
            timestamp_micros((col("ts") / 1000L).cast("long")))
        case _ => df
      }
    } else df
  }
}
