package graft.sources

import java.net.{InetSocketAddress, StandardProtocolFamily,
  UnixDomainSocketAddress}
import java.nio.ByteBuffer
import java.nio.channels.{DatagramChannel, ServerSocketChannel,
  SocketChannel}
import java.nio.charset.StandardCharsets
import java.nio.file.Paths
import java.util.{Map => JMap}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream,
  Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `format("graft-lines")` — push-style line sources behind one URL
  * scheme dispatch, porting the reference's non-file log streams:
  *
  *  - `udp://host:port` / `unixgram:///path` — datagram sockets
  *    (`internal/tailer/logstream/dgramstream.go`); partial trailing
  *    lines carry over between datagrams like the shared LineReader;
  *  - `tcp://host:port` / `unix:///path` — LISTENING stream sockets
  *    accepting any number of writers
  *    (`internal/tailer/logstream/socketstream.go`);
  *  - `fifo:///path` — named pipes, reopened at writer EOF
  *    (`internal/tailer/logstream/fifostream.go`);
  *  - `stdin://` or `-` — standard input.
  *
  * A driver-side receiver buffers arriving lines; micro-batch offsets
  * are indexes into that buffer (the shape of Spark's own socket
  * source). These sources are inherently single-endpoint — one UDP
  * port, one fifo — exactly like the reference process; the heavy
  * multi-partition path at scale is file tailing (graft-tail), while
  * these carry low-volume syslog/fifo feeds. Delivery is at-most-once
  * across restarts (UDP is lossy by nature; the reference offers no
  * stronger guarantee).
  *
  * Schema: (filename = source URL, line, off = arrival index).
  */
final class PushLineSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-lines"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TailSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new PushLineTable(properties.get("address"))
}

final class PushLineTable(address: String) extends Table
    with SupportsRead {
  override def name(): String = s"graft-lines($address)"
  override def schema(): StructType = TailSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new ScanBuilder {
    override def build(): Scan = new Scan {
      override def readSchema(): StructType = TailSource.schema
      override def toMicroBatchStream(checkpointLocation: String)
          : MicroBatchStream = new PushLineMicroBatchStream(address)
    }
  }
}

final class PushLineIndexOffset(val index: Long) extends Offset {
  override def json(): String = index.toString
}

/** receiver thread(s) + growable buffer; offsets index the buffer. */
final class PushLineMicroBatchStream(address: String)
    extends MicroBatchStream {

  /** lines [base, base + buffer.length); committed prefixes are
    * TRIMMED in commit() (like Spark's socket source), so driver
    * memory holds only the uncommitted tail, not the stream's history.
    */
  private val buffer = mutable.ArrayBuffer[String]()
  private var base = 0L
  private val lock = new Object
  @volatile private var closed = false
  private val closeables = mutable.ArrayBuffer[AutoCloseable]()

  private def add(line: String): Unit = lock.synchronized {
    buffer += line
  }

  /** split a chunk into complete lines, carrying the partial tail. */
  private final class Splitter {
    private val partial = new StringBuilder
    def feed(chunk: String): Unit = {
      partial.append(chunk)
      var idx = partial.indexOf("\n")
      while (idx >= 0) {
        var line = partial.substring(0, idx)
        if (line.endsWith("\r")) line = line.dropRight(1)
        add(line)
        partial.delete(0, idx + 1)
        idx = partial.indexOf("\n")
      }
    }
    /** emit the accumulated partial as a final line at stream end —
      * the reference's LineReader.Finish (reader.go:99-106), so a
      * writer that closes without a trailing newline still delivers
      * its last record.
      */
    def flush(): Unit = if (partial.nonEmpty) {
      add(partial.toString)
      partial.clear()
    }
  }

  private def daemon(name: String)(body: => Unit): Unit = {
    val t = new Thread(() => try body catch { case _: Throwable => },
      name)
    t.setDaemon(true)
    t.start()
  }

  private def datagramLoop(ch: DatagramChannel): Unit = {
    closeables += ch
    val splitter = new Splitter
    daemon("graft-dgram") {
      val buf = ByteBuffer.allocate(1 << 16)
      while (!closed) {
        buf.clear()
        ch.receive(buf)
        buf.flip()
        val bytes = new Array[Byte](buf.remaining())
        buf.get(bytes)
        splitter.feed(new String(bytes, StandardCharsets.UTF_8))
      }
    }
  }

  private def acceptLoop(server: ServerSocketChannel): Unit = {
    closeables += server
    daemon("graft-accept") {
      while (!closed) {
        val conn = server.accept()
        daemon("graft-conn") {
          closeables.synchronized { closeables += conn }
          try {
            val splitter = new Splitter // per-connection partial state
            val buf = ByteBuffer.allocate(1 << 16)
            var n = conn.read(buf)
            while (!closed && n >= 0) {
              buf.flip()
              val bytes = new Array[Byte](buf.remaining())
              buf.get(bytes)
              splitter.feed(new String(bytes, StandardCharsets.UTF_8))
              buf.clear()
              n = conn.read(buf)
            }
            if (n < 0) splitter.flush() // writer closed mid-line
          } finally {
            // a long-running daemon sees many short-lived writers:
            // release each connection as it ends instead of holding
            // every socket until stop()
            closeables.synchronized { closeables -= conn }
            try conn.close() catch { case _: Exception => }
          }
        }
      }
    }
  }

  private def streamLoop(open: () => java.io.InputStream,
      reopenAtEof: Boolean): Unit =
    daemon("graft-stream") {
      val splitter = new Splitter
      var go = true
      while (!closed && go) {
        val in = open()
        closeables.synchronized { closeables += in }
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (!closed && n >= 0) {
          splitter.feed(new String(buf, 0, n, StandardCharsets.UTF_8))
          n = in.read(buf)
        }
        in.close()
        // a fifo reopens per writer: release the dead stream's entry
        // (same long-lived-daemon leak as per-connection sockets)
        closeables.synchronized { closeables -= in }
        go = reopenAtEof // fifo: next writer reopens; stdin: done
        if (go && !closed) Thread.sleep(50)
      }
      // final close only — a fifo partial carries across writer
      // reopens (the same LineReader persists in the reference)
      splitter.flush()
    }

  // ---- scheme dispatch (tail.go's logpathpattern URL forms) ----
  locally {
    val uri = if (address == "-") "stdin://" else address
    uri.split("://", 2) match {
      case Array("udp", hostPort) =>
        val Array(h, p) = hostPort.split(":", 2)
        val ch = DatagramChannel.open()
        ch.bind(new InetSocketAddress(h, p.toInt))
        datagramLoop(ch)
      case Array("unixgram", path) =>
        val ch = DatagramChannel.open(StandardProtocolFamily.UNIX)
        ch.bind(UnixDomainSocketAddress.of(path))
        datagramLoop(ch)
      case Array("tcp", hostPort) =>
        val Array(h, p) = hostPort.split(":", 2)
        val server = ServerSocketChannel.open()
        server.bind(new InetSocketAddress(h, p.toInt))
        acceptLoop(server)
      case Array("unix", path) =>
        val server = ServerSocketChannel.open(StandardProtocolFamily.UNIX)
        server.bind(UnixDomainSocketAddress.of(path))
        acceptLoop(server)
      case Array("fifo", path) =>
        streamLoop(() => java.nio.file.Files.newInputStream(
          Paths.get(path)), reopenAtEof = true)
      case Array("stdin", _) =>
        streamLoop(() => System.in, reopenAtEof = false)
      case _ => throw new IllegalArgumentException(
        s"graft-lines: unsupported address '$address' " +
          "(udp|unixgram|tcp|unix|fifo|stdin)")
    }
  }

  override def initialOffset(): Offset = new PushLineIndexOffset(0L)

  override def latestOffset(): Offset =
    new PushLineIndexOffset(
      lock.synchronized(base + buffer.length))

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[PushLineIndexOffset].index
    val e = end.asInstanceOf[PushLineIndexOffset].index
    // The FIRST planned batch performs the definitive rebase:
    // deserialization order can only anchor on indexes it sees, and a
    // committed start of 0 never passes through deserializeOffset at
    // all (it arrives via initialOffset), so a restart with an
    // in-flight [0, N2) would otherwise stay anchored at N2 and replay
    // an empty range. Anchor on the batch's start s, then shift so the
    // k lines this replay delivers are immediately followed — index-
    // wise — by the rest of the buffer at the range's end e (base =
    // e - k): anchoring at s alone would leave a gap [s+k, e) that
    // commit(e) silently swallows later arrivals into. Before the
    // first batch no line has been handed out, so re-basing is safe.
    lock.synchronized {
      if (!planned) {
        planned = true
        if (s < base) base = s
        val k = math.min(buffer.length.toLong, math.max(0L, e - base))
        if (e - k > base) base = e - k
      }
    }
    if (e <= s) Array.empty
    else {
      val rows = lock.synchronized(
        buffer.slice(math.max(0L, s - base).toInt,
          math.max(0L, e - base).toInt).toArray)
      Array(PushLinePartition(address, s, rows))
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PushLineReaderFactory

  /** set once the first batch is planned; later deserializations (WAL
    * re-reads) must not re-shift lines that already have indexes.
    */
  private var planned = false

  override def deserializeOffset(json: String): Offset = {
    val idx = json.trim.toLong
    // Restart from a checkpoint: a fresh stream starts at base=0 while
    // restored offsets carry pre-restart indexes. MicroBatchExecution
    // restores the offset log's LATEST entry first — an in-flight
    // batch's END offset N2 — and the committed start N only after, so
    // the rebase anchors on the SMALLEST index restored before the
    // first batch is planned. EVERY line buffered since reopen is a
    // post-restart arrival, so the first of them maps to that index N —
    // unconditionally, even if more than N lines burst in before Spark
    // restored the offset (otherwise latestOffset stays below N until
    // N new lines arrive and everything in between is silently
    // dropped). A replayed in-flight range [N, N2) then delivers the
    // earliest post-restart lines instead of the lost pre-restart
    // ones — each line still delivered exactly once; only in-flight
    // pre-restart data is lost, per the documented at-most-once
    // contract.
    lock.synchronized {
      if (!planned && idx > 0 && (base == 0L || idx < base)) base = idx
    }
    new PushLineIndexOffset(idx)
  }

  /** drop lines at or below the committed index — bounds driver memory
    * to the uncommitted tail over an unbounded stream.
    */
  override def commit(end: Offset): Unit = lock.synchronized {
    val e = end.asInstanceOf[PushLineIndexOffset].index
    val drop = math.max(0L, math.min(e - base, buffer.length.toLong))
    if (drop > 0) {
      buffer.dropInPlace(drop.toInt)
      base += drop
    }
  }

  override def stop(): Unit = {
    closed = true
    closeables.synchronized {
      closeables.foreach(c => try c.close() catch {
        case _: Exception =>
      })
    }
  }
}

final case class PushLinePartition(source: String, base: Long,
    rows: Array[String]) extends InputPartition

final class PushLineReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PushLinePartition]
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < p.rows.length }
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(p.source),
          UTF8String.fromString(p.rows(i)), p.base + i)
      override def close(): Unit = ()
    }
  }
}
