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
    *  - `udp://h:p`, `unixgram:///p`, `tcp://h:p`, `unix:///p`,
    *    `fifo:///p`, `stdin://`, `-` → graft-lines push source;
    *  - anything else → graft-tail file glob, with an optional
    *    filename ignore regex (tail.go:222-253).
    */
  def open(spark: SparkSession, pattern: String,
      ignoreRegex: Option[String] = None): DataFrame = {
    val pushSchemes =
      Seq("udp://", "unixgram://", "tcp://", "unix://", "fifo://",
        "stdin://")
    if (pattern == "-" || pushSchemes.exists(pattern.startsWith))
      spark.readStream.format("graft-lines")
        .option("address", pattern).load()
    else {
      val r = spark.readStream.format("graft-tail")
        .option("path", pattern)
      ignoreRegex.fold(r)(re => r.option("ignoreRegex", re)).load()
    }
  }
}
