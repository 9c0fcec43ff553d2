package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** URL-scheme dispatch from a log path pattern to its streaming
  * source — the reference's logstream factory
  * (`internal/tailer/logstream/logstream.go`, dispatching file globs,
  * tcp/unix/udp/unixgram addresses, fifos and "-" to their stream
  * types). Every branch yields the same (filename, line, off) schema,
  * so [[graft.streaming.StreamRunner]] consumes any of them unchanged.
  */
object LogSources {

  /** streaming DataFrame of lines for a source pattern:
    *  - `udp://h:p`, `unixgram://…/p`, `tcp://h:p`, `unix://…/p`,
    *    `fifo://…/p`, `stdin://`, `-` → graft-lines push source;
    *  - anything else → graft-tail file glob, with an optional
    *    filename ignore regex (tail.go:222-253).
    *
    * A COMMA-SEPARATED list opens every pattern and unions the
    * streams — the reference's repeatable `-logs` flag splits its
    * values the same way (`cmd/mtail/main.go:30-36`), so one string
    * can carry a whole `-logs` list (mixing schemes is fine). Commas
    * INSIDE braces do not split: `*.{err,out}` stays one glob
    * alternation (the reference's flag-level split would break it;
    * there, brace patterns must arrive via separate -logs flags).
    */
  def open(spark: SparkSession, pattern: String,
      ignoreRegex: Option[String] = None,
      /** glob-rescan cadence for file patterns (`-poll_log_interval`,
        * see [[graft.sources.TailMicroBatchStream]]); None = every
        * micro-batch. Push schemes ignore it. */
      pollLogMs: Option[Long] = None): DataFrame =
    splitList(pattern) match {
      case Seq(single) => openOne(spark, single, ignoreRegex, pollLogMs)
      case many => many.map(openOne(spark, _, ignoreRegex, pollLogMs))
        .reduce(_ unionByName _)
    }

  /** split on commas at brace depth 0 only (shared with the CLI's
    * -logs flag handling so a brace glob survives both paths). */
  private[graft] def splitList(pattern: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    pattern.foreach {
      case '{' => depth += 1; cur += '{'
      case '}' => depth = math.max(0, depth - 1); cur += '}'
      case ',' if depth == 0 =>
        if (cur.nonEmpty) { out += cur.toString; cur.clear() }
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.toString
    out.result() match {
      case Seq() => Seq(pattern) // all-comma degenerate input
      case ps => ps
    }
  }

  private def openOne(spark: SparkSession, pattern: String,
      ignoreRegex: Option[String],
      pollLogMs: Option[Long] = None): DataFrame = {
    val pushSchemes =
      Seq("udp://", "unixgram://", "tcp://", "unix://", "fifo://",
        "stdin://")
    if (pattern == "-" || pushSchemes.exists(pattern.startsWith))
      spark.readStream.format("graft-lines")
        .option("address", pattern).load()
    else {
      val r0 = spark.readStream.format("graft-tail")
        .option("path", pattern)
      val r1 = ignoreRegex.fold(r0)(re => r0.option("ignoreRegex", re))
      pollLogMs.fold(r1)(ms => r1.option("pollLogMs", ms.toString))
        .load()
    }
  }
}
