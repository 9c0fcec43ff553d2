package graft.mtail

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch ("one-shot") log source: one row per text line with the schema
  * from FIXTURES.md §1 — (filename, line, ord).
  *
  * `ord` is the arrival-order key used for last-write-wins semantics.
  * File reads go through the graft-tail DSv2 source, which emits each
  * line's BYTE OFFSET: ord = struct(filename, off) is total and
  * split-invariant, so a file split into any number of partitions (for
  * parallel scan at scale) replays with exactly single-reader
  * semantics — unlike `monotonically_increasing_id`, whose order is
  * only per-split and silently depends on split enumeration order.
  * Across files, order is lexicographic by filename (deterministic;
  * the reference's one-shot mode also processes file-by-file).
  */
object LogLines {

  def batch(spark: SparkSession, paths: String*): DataFrame = {
    // mtail dialect: conversion errors null out (vm.go:97-129)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    // the engine's generated predicates are huge (stop guards conjoin
    // per-site conds embedding window reads); catalyst constraint
    // inference over them is super-linear and buys nothing for these
    // hand-shaped plans — measured minutes of pure optimizer time on
    // mysql_slowqueries before disabling
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    paths.map { p =>
      spark.read.format("graft-tail").option("path", p).load()
    }.reduceOption(_ unionAll _)
      .getOrElse( // zero paths: an empty line frame, not a crash
        spark.range(0).select(lit("").as("filename"), lit("").as("line"),
          lit(0L).as("off")))
      .select(col("filename"), col("line"),
        struct(col("filename").as("f"), col("off").as("o")).as("ord"))
  }

  /** Wrap any (line STRING) DataFrame, e.g. a driver table. Row order
    * here is the source's own enumeration order (per-split ids): driver
    * tables have no inherent arrival order, so the caller's layout IS
    * the order.
    */
  def fromLines(df: DataFrame, lineCol: String,
      filename: String = "",
      /** explicit arrival-order key. The default (per-split monotonic
        * ids) equals row order only while the source enumerates
        * deterministically — true for a single-file scan or a driver
        * table, NOT for a multi-file layout (Spark orders splits by
        * size). A caller whose rows carry their own order (an event id,
        * a sequence number) should pass it: exact last-write-wins
        * semantics with NO sort and no layout assumption.
        */
      ordCol: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val base = ordCol match {
      case Some(o) =>
        df.select(lit(filename).as("filename"), col(lineCol).as("line"),
          o.as("ord"))
      case None =>
        df.select(lit(filename).as("filename"), col(lineCol).as("line"))
          .withColumn("ord", monotonically_increasing_id())
    }
    base
  }
}
