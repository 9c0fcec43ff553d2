package graft.sources

import java.io.RandomAccessFile
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, LinkOption, Path, Paths}
import java.util.{Map => JMap}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `format("graft-tail")` — a DSv2 MicroBatchStream that tails growing
  * log files with the reference tailer's semantics
  * (`internal/tailer/logstream/filestream.go:34-239`):
  *
  *  - per-file byte offsets advance only past COMPLETE lines (partial
  *    trailing lines wait for their newline, reader.go:68-95);
  *  - ROTATION: a changed file identity (inode via fileKey) at the same
  *    path restarts the offset at 0 (filestream.go:155-163);
  *  - TRUNCATION: size below the recorded offset restarts at 0
  *    (filestream.go:178-190);
  *  - glob patterns discover new files each micro-batch
  *    (tail.go:186-220);
  *  - trailing `\r` is stripped (reader.go:85-88).
  *
  * Offsets serialize as JSON {path: {key, pos}}, so restarts resume
  * exactly. Schema: (filename STRING, line STRING).
  */
final class TailSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-tail"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TailSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new TailTable(properties.get("path"),
      Option(properties.get("ignoreRegex")),
      Option(properties.get("staleAfterMs")).map(_.toLong)
        .getOrElse(TailMicroBatchStream.DefaultStaleMs),
      Option(properties.get("pollLogMs")).map(_.toLong).getOrElse(-1L))
}

object TailSource {
  val schema: StructType = StructType(Seq(
    StructField("filename", StringType, nullable = false),
    StructField("line", StringType, nullable = false),
    StructField("off", org.apache.spark.sql.types.LongType,
      nullable = false)))

  /** Iterate complete lines whose START byte lies in [start, end),
    * reading past `end` to finish a line that straddles it. `start` may
    * fall mid-line: ownership-by-start means the straddler belongs to
    * the PREVIOUS range, so we scan from start-1 for the first newline
    * (if byte start-1 is itself '\n', the line starting exactly at
    * `start` is correctly kept). Emits (absolute line-start offset,
    * line) with trailing \r stripped; an unterminated final line is
    * dropped (complete-lines-only, reader.go:68-95). This single reader
    * serves both the streaming scan (whose ranges are always at line
    * boundaries) and split batch scans of arbitrary byte ranges.
    */
  /** iterator over (line-start offset, line) that also exposes close()
    * so an abandoned partition reader releases the file handle.
    */
  final class LineRangeIterator(path: String, start: Long, end: Long)
      extends Iterator[(Long, String)] with AutoCloseable {
    private val raf = new RandomAccessFile(path, "r")
    private var done = false
    private var nextLine: (Long, String) = _
    private var curStart = 0L
    private var in: java.io.BufferedInputStream = _

    locally {
      var ls = 0L
      var empty = false
      if (start > 0) {
        raf.seek(start - 1)
        val buf = new Array[Byte](8192)
        var pos = start - 1
        var found = -1L
        var n = raf.read(buf)
        while (found < 0 && n > 0) {
          var j = 0
          while (found < 0 && j < n) {
            if (buf(j) == '\n') found = pos + j
            j += 1
          }
          pos += n
          if (found < 0) n = raf.read(buf)
        }
        if (found < 0) empty = true else ls = found + 1
      }
      if (empty || ls >= end) close()
      else {
        curStart = ls
        raf.seek(ls)
        in = new java.io.BufferedInputStream(
          java.nio.channels.Channels.newInputStream(raf.getChannel),
          1 << 16)
        advance()
      }
    }

    private def advance(): Unit = {
      nextLine = null
      if (done || curStart >= end) { close(); return }
      val bb = new java.io.ByteArrayOutputStream(256)
      var b = in.read()
      while (b != -1 && b != '\n') { bb.write(b); b = in.read() }
      if (b == -1) { close(); return } // unterminated tail → held back
      val bytes = bb.toByteArray
      val s = new String(bytes, StandardCharsets.UTF_8)
      val line = if (s.endsWith("\r")) s.dropRight(1) else s
      nextLine = (curStart, line)
      curStart += bytes.length + 1
    }

    override def hasNext: Boolean = nextLine != null
    override def next(): (Long, String) = {
      val r = nextLine; advance(); r
    }
    override def close(): Unit =
      if (!done) { done = true; raf.close() }
  }

  def readRange(path: String, start: Long, end: Long): LineRangeIterator =
    new LineRangeIterator(path, start, end)

  /** glob expansion with metacharacters allowed in ANY path component
    * — Go's filepath.Glob semantics, which the reference's log-pattern
    * poll relies on for multi-level layouts like "logs/&#42;/app.log"
    * (`multiple_levels_directory_integration_test.go`: a subdirectory
    * created AFTER startup is discovered on the next poll). Each
    * component matches one directory level (filepath.Glob has no
    * `**`). Files whose NAME matches `ignoreRegex` are skipped — the
    * reference's -ignore_filename_regex_pattern filter
    * (`internal/tailer/tail.go:222-253`); directories matching the
    * file component are ignored like `TestGlobIgnoreFolder`.
    */
  def expand(pattern: String,
      ignoreRegex: Option[String] = None): Seq[Path] = {
    val p = Paths.get(pattern)
    val comps = (0 until p.getNameCount).map(p.getName(_).toString)
    val meta = Set('*', '?', '[', '{')
    val litCount = comps.takeWhile(c => !c.exists(meta)).length
    // a fully-glob relative pattern anchors at "." (the old behavior)
    val anchor =
      if (p.isAbsolute) p.getRoot
      else if (litCount == 0) Paths.get(".")
      else Paths.get("")
    val base = comps.take(litCount).foldLeft(anchor)(_.resolve(_))
    val rest = comps.drop(litCount)
    val ignore = ignoreRegex.map(_.r)
    def ignored(f: Path): Boolean =
      ignore.exists(_.findFirstIn(f.getFileName.toString).isDefined)
    // fully literal pattern: the file itself (tail of one known path)
    if (rest.isEmpty)
      return if (Files.isRegularFile(base) && !ignored(base)) Seq(base)
      else Nil
    if (!Files.isDirectory(base)) return Nil
    // Files.list must be closed or the directory fd leaks every poll
    def children(d: Path): Seq[Path] = {
      val s = Files.list(d)
      try s.iterator().asScala.toSeq finally s.close()
    }
    def matching(d: Path, comp: String): Seq[Path] = {
      val m = d.getFileSystem.getPathMatcher("glob:" + comp)
      children(d).filter(f => m.matches(f.getFileName))
    }
    // intermediate components select directories, the last selects files
    val dirs = rest.init.foldLeft(Seq(base)) { (ds, comp) =>
      ds.flatMap(d => matching(d, comp).filter(Files.isDirectory(_)))
    }
    dirs.flatMap(d => matching(d, rest.last)
        .filter(f => Files.isRegularFile(f) && !ignored(f)))
      .sortBy(_.toString)
  }

  def fileKey(p: Path): String =
    Option(Files.readAttributes(p, "unix:fileKey",
      LinkOption.NOFOLLOW_LINKS).get("fileKey"))
      .map(_.toString).getOrElse(p.toString)

  /** scan back from `size` for the last newline at/after `from`;
    * returns the exclusive end of the last complete line. */
  def lastLineEnd(p: Path, from: Long, size: Long): Long = {
    if (size <= from) return from
    val raf = new RandomAccessFile(p.toFile, "r")
    try {
      var i = size - 1
      val buf = new Array[Byte](8192)
      while (i >= from) {
        val start = math.max(from, i - buf.length + 1)
        val n = (i - start + 1).toInt
        raf.seek(start)
        raf.readFully(buf, 0, n)
        var j = n - 1
        while (j >= 0) {
          if (buf(j) == '\n') return start + j + 1
          j -= 1
        }
        i = start - 1
      }
      from
    } finally raf.close()
  }
}

final class TailTable(pathPattern: String,
    ignoreRegex: Option[String] = None,
    staleAfterMs: Long = TailMicroBatchStream.DefaultStaleMs,
    pollLogMs: Long = -1L)
    extends Table with SupportsRead {
  override def name(): String = s"graft-tail($pathPattern)"
  override def schema(): StructType = TailSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new ScanBuilder {
    override def build(): Scan = new Scan {
      override def readSchema(): StructType = TailSource.schema
      override def toMicroBatchStream(checkpointLocation: String)
          : MicroBatchStream =
        new TailMicroBatchStream(pathPattern, ignoreRegex, staleAfterMs,
          pollLogMs)
      override def toBatch: Batch = new Batch {
        // files split into byte ranges for parallelism — SAFE because
        // each line carries its byte offset as the ordering key, so
        // split boundaries cannot reorder last-write-wins semantics
        // (unlike monotonically_increasing_id, which is per-split only)
        private val split = math.max(1L << 16,
          options.getLong("maxSplitBytes", 128L << 20))
        override def planInputPartitions(): Array[InputPartition] =
          TailSource.expand(pathPattern, ignoreRegex).flatMap { p =>
            val size = Files.size(p)
            (0L until size by split).map(s =>
              TailPartition(p.toString, s,
                math.min(s + split, size)): InputPartition)
          }.toArray
        override def createReaderFactory(): PartitionReaderFactory =
          new TailReaderFactory
      }
    }
  }
}

/** offset state per file. */
final case class FileState(key: String, pos: Long)

final class TailOffset(val state: Map[String, FileState]) extends Offset {
  override def json(): String =
    state.toSeq.sortBy(_._1).map { case (p, fs) =>
      s""""${p.replace("\"", "\\\"")}":{"key":"${fs.key}","pos":${fs.pos}}"""
    }.mkString("{", ",", "}")
}

object TailOffset {
  private val entryRe =
    """"((?:[^"\\]|\\.)*)":\{"key":"((?:[^"\\]|\\.)*)","pos":(\d+)\}""".r
  def fromJson(json: String): TailOffset =
    new TailOffset(entryRe.findAllMatchIn(json).map { m =>
      m.group(1).replace("\\\"", "\"") ->
        FileState(m.group(2).replace("\\\"", "\""), m.group(3).toLong)
    }.toMap)
}

object TailMicroBatchStream {
  /** the reference's stale-stream window (`internal/tailer/logstream/
    * reader.go:55-56`: a log stream idle for 24h is cancelled and its
    * resources released). ≤ 0 disables parking.
    */
  val DefaultStaleMs: Long = 24L * 3600 * 1000
}

final class TailMicroBatchStream(pathPattern: String,
    ignoreRegex: Option[String] = None,
    staleAfterMs: Long = TailMicroBatchStream.DefaultStaleMs,
    /** `-poll_log_interval` (cmd/mtail/main.go:66): cadence of the
      * GLOB RESCAN that discovers newly matched files, decoupled from
      * the data poll (the trigger interval). `< 0` = rescan every
      * micro-batch (library default); `0` = rescan never after
      * startup, so only files present at start are tailed (the
      * reference's documented zero behavior); `> 0` = rescan at most
      * every this-many ms. At scale a glob over a wide directory tree
      * is driver-side metadata I/O on every batch — this knob bounds
      * it independently of how hot the data poll runs.
      */
    pollLogMs: Long = -1L)
    extends MicroBatchStream {

  /** wall-clock ms of the last glob rescan, and its result. */
  private var lastExpandMs: Long = Long.MinValue
  private var cachedPaths: Seq[Path] = Nil

  /** Driver-side stale tracking, the analogue of the reference's
    * 24h idle cancellation (`reader.go:55-56`): a file that produced
    * no new bytes for `staleAfterMs` is PARKED — exempted from the
    * per-batch line-end scan (a cheap size/inode stat remains, like
    * the reference's directory poll) until its size or inode changes.
    * The parked file KEEPS its entry in the emitted offset state at
    * the recorded position: restarts must resume exactly from the
    * checkpointed offsets (the class contract above), which dropping
    * idle entries would break by re-reading the whole file after a
    * restart. Offset-JSON growth is still bounded — paths deleted from
    * disk leave the glob and therefore the state, and the maps below,
    * immediately. Rotation while parked (new inode) restarts at 0 as
    * usual.
    */
  private val lastSeen =
    mutable.Map[String, (String, Long, Long)]() // key, pos, sinceMs
  private val parked = // resume state, size, mtimeMs
    mutable.Map[String, (FileState, Long, Long)]()

  override def initialOffset(): Offset = new TailOffset(Map.empty)

  override def latestOffset(): Offset = {
    val now = System.currentTimeMillis()
    val state = mutable.Map[String, FileState]()
    val existing =
      if (pollLogMs < 0 || lastExpandMs == Long.MinValue ||
          (pollLogMs > 0 && now - lastExpandMs >= pollLogMs)) {
        cachedPaths = TailSource.expand(pathPattern, ignoreRegex)
        lastExpandMs = now
        cachedPaths
      } else cachedPaths
    // a path deleted from disk can never resume (a recreated file is a
    // new inode → reads from 0), so drop its tracking entries — else a
    // dated-logrotate dir grows one driver-map entry per historical
    // file forever
    val keep = existing.map(_.toString).toSet
    lastSeen.filterInPlace((p, _) => keep(p))
    parked.filterInPlace((p, _) => keep(p))
    existing.foreach { p =>
      val path = p.toString
      // ONE stat per file per poll: key, size, and mtime all come from
      // a single readAttributes call (3 separate stats would triple the
      // driver's metadata I/O on network filesystems). mtime is part of
      // the parked comparison: an in-place rewrite that keeps the same
      // inode AND byte size would otherwise never be re-scanned. On
      // such a rewrite the recorded position SURVIVES (only bytes at or
      // after it are delivered, possibly starting mid-line in the new
      // content) — same contract as the reference's fd-based reader,
      // which keeps reading an in-place-rewritten file from its old
      // offset (`filestream.go:178-190` only resets when size shrinks
      // below the offset).
      // with a cached glob (pollLogMs >= 0) the path may have been
      // deleted since the last rescan; skip it this batch (the next
      // rescan drops its tracking entries like a glob miss would)
      val attrsOpt =
        try Some(Files.readAttributes(p,
          classOf[java.nio.file.attribute.BasicFileAttributes],
          java.nio.file.LinkOption.NOFOLLOW_LINKS))
        catch { case _: java.io.IOException => None }
      // a matched-but-unreadable file is skipped this batch, not a
      // stream failure — the reference logs the permission error and
      // keeps retrying each poll (permission_denied_integration test),
      // so a later chmod picks the file up with no state recorded
      attrsOpt.filter(_ => Files.isReadable(p)).foreach { attrs =>
        val key = Option(attrs.fileKey).map(_.toString).getOrElse(path)
        val size = attrs.size
        val mtime = attrs.lastModifiedTime.toMillis
        parked.get(path) match {
          case Some((fs, sz, mt))
              if fs.key == key && sz == size && mt == mtime =>
            // still idle: no line-end scan; the recorded position
            // stays in the offset state so restarts resume exactly
            state(path) = fs
          case prev =>
            prev.foreach(_ => parked.remove(path)) // woke up
            val pos = TailSource.lastLineEnd(p, 0L, size)
            val since = lastSeen.get(path) match {
              case Some((k0, p0, s0)) if k0 == key && p0 == pos => s0
              case _ => now
            }
            lastSeen(path) = (key, pos, since)
            if (staleAfterMs > 0 && now - since > staleAfterMs) {
              parked(path) = (FileState(key, pos), size, mtime)
              lastSeen.remove(path)
            }
            state(path) = FileState(key, pos)
        }
      }
    }
    new TailOffset(state.toMap)
  }

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[TailOffset].state
    val e = end.asInstanceOf[TailOffset].state
    // A burst on ONE hot file must not serialize the batch onto one
    // core: split each file's byte range like the one-shot Batch path
    // does (LineRangeIterator snaps a mid-range start forward to the
    // next line boundary and reads a crossing line fully, so splits
    // never tear lines) — safe because every line carries its byte
    // offset as the ordering key, so the engine's order-sensitive
    // folds are unaffected by which task read which range. Chunk size
    // adapts to the batch: an idle tail stays one small partition (no
    // task-overhead regression at the trigger cadence), a catch-up or
    // burst batch fans out to the session's parallelism.
    val parallelism = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.defaultParallelism).getOrElse(8)
    e.toSeq.sortBy(_._1).flatMap { case (path, endFs) =>
      val p = Paths.get(path)
      if (!Files.exists(p)) None
      else {
        val from = s.get(path) match {
          // rotation (new inode) or truncation → restart at 0
          case Some(prev) if prev.key == endFs.key &&
            prev.pos <= endFs.pos => prev.pos
          case _ => 0L
        }
        if (endFs.pos > from) {
          val range = endFs.pos - from
          val chunk = math.max(1L << 20,
            (range + parallelism - 1) / parallelism)
          (from until endFs.pos by chunk).map(cs =>
            TailPartition(path, cs,
              math.min(cs + chunk, endFs.pos)): InputPartition)
        } else Nil
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TailReaderFactory

  override def deserializeOffset(json: String): Offset =
    TailOffset.fromJson(json)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class TailPartition(path: String, start: Long, end: Long)
    extends InputPartition

final class TailReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val tp = partition.asInstanceOf[TailPartition]
    new PartitionReader[InternalRow] {
      private val lines = TailSource.readRange(tp.path, tp.start, tp.end)
      private var current: (Long, String) = _
      override def next(): Boolean =
        if (lines.hasNext) { current = lines.next(); true } else false
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(tp.path),
          UTF8String.fromString(current._2), current._1)
      override def close(): Unit = lines.close()
    }
  }
}
