package graft.streaming

import java.net.{DatagramPacket, DatagramSocket, InetAddress,
  InetSocketAddress, Socket, UnixDomainSocketAddress}
import java.nio.ByteBuffer
import java.nio.channels.SocketChannel
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{Executors, ScheduledExecutorService,
  TimeUnit}

import scala.collection.mutable

import graft.mtail.Snapshot.{Cell, VInt}

/** Interval push scheduler + socket writers — the reference's
  * PushMetrics / StartMetricPush loop
  * (`internal/exporter/export.go:211-262`): graphite over TCP
  * (`graphite.go:20`), StatsD over UDP (`statsd.go:16`), collectd over
  * its unix socket (`collectd.go:22`). Each tick dials the target,
  * writes the current store snapshot in the sink's wire format
  * (formatters shared with the pull endpoints, byte-identical), and
  * closes; a failed dial or write skips that target this tick, like
  * the reference's "pusher dial error … continue".
  *
  * Per-sink `<sink>_export_total` / `<sink>_export_success` counters
  * are merged into the internal store when one is supplied
  * (`graphite.go:25-26`).
  */
final class PushExporter(store: MetricsStore, program: String,
    hostname: String = "localhost",
    internal: Option[MetricsStore] = None) {

  private sealed trait Target {
    def name: String
    def format(): String
    def push(body: String): Unit
  }

  private final class Graphite(host: String, port: Int, prefix: String)
      extends Target {
    val name = "graphite"
    def format(): String =
      Exporters.graphite(store.snapshot(), program, prefix)
    def push(body: String): Unit = {
      val s = new Socket()
      try {
        s.connect(new InetSocketAddress(host, port), 5000)
        s.getOutputStream.write(body.getBytes(UTF_8))
        s.getOutputStream.flush()
      } finally s.close()
    }
  }

  private final class Statsd(host: String, port: Int, prefix: String)
      extends Target {
    val name = "statsd"
    def format(): String =
      Exporters.statsd(store.snapshot(), program, prefix)
    def push(body: String): Unit = {
      val sock = new DatagramSocket()
      try {
        val addr = InetAddress.getByName(host)
        // one datagram per metric line, like the reference's per-metric
        // writes over the UDP "connection" (export.go:188-205)
        body.split("\n").filter(_.nonEmpty).foreach { line =>
          val bytes = line.getBytes(UTF_8)
          sock.send(new DatagramPacket(bytes, bytes.length, addr, port))
        }
      } finally sock.close()
    }
  }

  private final class Collectd(path: String, prefix: String,
      intervalSecs: Long) extends Target {
    val name = "collectd"
    def format(): String =
      Exporters.collectd(store.snapshot(), program, hostname, prefix,
        intervalSecs)
    def push(body: String): Unit = {
      val ch = SocketChannel.open(UnixDomainSocketAddress.of(path))
      try {
        val buf = ByteBuffer.wrap(body.getBytes(UTF_8))
        while (buf.hasRemaining) ch.write(buf)
      } finally ch.close()
    }
  }

  // registration may race the scheduler thread's pushOnce — guard the
  // buffer and iterate over a snapshot
  private val targets = mutable.ArrayBuffer[Target]()
  private var scheduler: Option[ScheduledExecutorService] = None

  def registerGraphite(host: String, port: Int,
      prefix: String = ""): this.type = {
    targets.synchronized { targets += new Graphite(host, port, prefix) }
    this
  }

  def registerStatsd(host: String, port: Int,
      prefix: String = ""): this.type = {
    targets.synchronized { targets += new Statsd(host, port, prefix) }
    this
  }

  def registerCollectd(socketPath: String, prefix: String = "",
      intervalSecs: Long = 60): this.type = {
    targets.synchronized {
      targets += new Collectd(socketPath, prefix, intervalSecs)
    }
    this
  }

  /** one push to every target; returns the number that succeeded. */
  def pushOnce(): Int = {
    var ok = 0
    targets.synchronized(targets.toList).foreach { t =>
      val succeeded =
        try { t.push(t.format()); ok += 1; true }
        catch { case _: Exception => false }
      internal.foreach(_.merge(
        Seq(Cell("counter", s"${t.name}_export_total", Map.empty,
          VInt(1), None)) ++
        (if (succeeded)
          Seq(Cell("counter", s"${t.name}_export_success", Map.empty,
            VInt(1), None))
        else Nil)))
    }
    ok
  }

  /** start the push ticker (export.go:235-262); targets registered
    * after start are picked up on the next tick.
    */
  def start(intervalMillis: Long): Unit = synchronized {
    if (scheduler.isEmpty) {
      val ex = Executors.newSingleThreadScheduledExecutor { r =>
        val th = new Thread(r, "graft-push")
        th.setDaemon(true)
        th
      }
      ex.scheduleAtFixedRate(() => pushOnce(), intervalMillis,
        intervalMillis, TimeUnit.MILLISECONDS)
      scheduler = Some(ex)
    }
  }

  def stop(): Unit = synchronized {
    scheduler.foreach(_.shutdownNow())
    scheduler = None
  }
}
