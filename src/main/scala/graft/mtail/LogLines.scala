package graft.mtail

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch ("one-shot") log source: one row per text line with the schema
  * from FIXTURES.md §1 — (filename, line, ord).
  *
  * `ord` is the arrival-order key used for last-write-wins semantics.
  * Spark's text source yields rows of a split in file order; for the
  * single-split files of golden tests `monotonically_increasing_id` is
  * exactly file order. For multi-split files at scale, order is only
  * per-split — a custom source carrying (file, byte offset) replaces this
  * for the streaming/tail path (SURVEY §2.1), where arrival order is the
  * reference's own ordering anyway.
  */
object LogLines {

  def batch(spark: SparkSession, paths: String*): DataFrame = {
    // mtail dialect: conversion errors null out (vm.go:97-129)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.read.textFile(paths: _*)
      .select(
        input_file_name().as("filename"),
        col("value").as("line"))
      .withColumn("ord", monotonically_increasing_id())
  }

  /** Wrap any (line STRING) DataFrame, e.g. a driver table. */
  def fromLines(df: DataFrame, lineCol: String,
      filename: String = ""): DataFrame =
    df.select(lit(filename).as("filename"), col(lineCol).as("line"))
      .withColumn("ord", monotonically_increasing_id())
}
