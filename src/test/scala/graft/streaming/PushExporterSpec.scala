package graft.streaming

import java.net.{DatagramPacket, DatagramSocket, ServerSocket,
  StandardProtocolFamily, UnixDomainSocketAddress}
import java.nio.ByteBuffer
import java.nio.channels.ServerSocketChannel
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

import graft.mtail.Snapshot.{Cell, VInt}

/** Push-sink transport tests against real local listeners: each body
  * received must be byte-identical to the corresponding pull
  * formatter's output (the formats themselves are verified against the
  * reference's exporter tests in StreamingSpec).
  */
class PushExporterSpec extends AnyFunSuite {

  private def newStore(): MetricsStore = {
    val s = new MetricsStore
    s.merge(Seq(
      Cell("counter", "bytes_total", Map("operation" -> "sent"),
        VInt(62793673), Some(1298440450L)),
      Cell("gauge", "last_size", Map.empty, VInt(7), Some(100L))))
    s
  }

  test("graphite pushes over TCP, byte-identical to the formatter") {
    val store = newStore()
    val server = new ServerSocket(0)
    val got = new java.util.concurrent.atomic.AtomicReference[String]()
    val latch = new CountDownLatch(1)
    val t = new Thread(() => {
      val sock = server.accept()
      val body = scala.io.Source.fromInputStream(
        sock.getInputStream)(scala.io.Codec.UTF8).mkString
      got.set(body)
      sock.close()
      latch.countDown()
    })
    t.setDaemon(true)
    t.start()
    val push = new PushExporter(store, "p.mtail")
      .registerGraphite("localhost", server.getLocalPort)
    assert(push.pushOnce() == 1)
    assert(latch.await(10, TimeUnit.SECONDS))
    server.close()
    assert(got.get() == Exporters.graphite(store.snapshot(), "p.mtail"))
    assert(got.get().contains(
      "p.mtail.bytes_total.operation.sent 62793673 1298440450"))
  }

  test("statsd pushes over UDP, one datagram per metric line") {
    val store = newStore()
    val sock = new DatagramSocket(0)
    sock.setSoTimeout(10000)
    val push = new PushExporter(store, "p.mtail")
      .registerStatsd("localhost", sock.getLocalPort)
    assert(push.pushOnce() == 1)
    val expected = Exporters.statsd(store.snapshot(), "p.mtail")
      .split("\n").filter(_.nonEmpty).toSet
    val received = (1 to expected.size).map { _ =>
      val pkt = new DatagramPacket(new Array[Byte](65536), 65536)
      sock.receive(pkt)
      new String(pkt.getData, pkt.getOffset, pkt.getLength, UTF_8)
    }.toSet
    sock.close()
    assert(received == expected)
  }

  test("collectd pushes over a unix socket") {
    val store = newStore()
    val dir = java.nio.file.Files.createTempDirectory("collectd")
    val path = dir.resolve("collectd.sock")
    val server = ServerSocketChannel.open(StandardProtocolFamily.UNIX)
    server.bind(UnixDomainSocketAddress.of(path))
    val got = new java.util.concurrent.atomic.AtomicReference[String]()
    val latch = new CountDownLatch(1)
    val t = new Thread(() => {
      val ch = server.accept()
      val buf = ByteBuffer.allocate(1 << 16)
      val out = new java.io.ByteArrayOutputStream()
      while (ch.read(buf) >= 0) {
        buf.flip()
        val arr = new Array[Byte](buf.remaining())
        buf.get(arr)
        out.write(arr)
        buf.clear()
      }
      got.set(new String(out.toByteArray, UTF_8))
      ch.close()
      latch.countDown()
    })
    t.setDaemon(true)
    t.start()
    val internal = new MetricsStore
    val push = new PushExporter(store, "p.mtail", "host1",
      Some(internal))
      .registerCollectd(path.toString, intervalSecs = 60)
    assert(push.pushOnce() == 1)
    assert(latch.await(10, TimeUnit.SECONDS))
    server.close()
    assert(got.get() ==
      Exporters.collectd(store.snapshot(), "p.mtail", "host1",
        intervalSecs = 60))
    val cells = internal.snapshot().map(c => c.name -> c.value).toMap
    assert(cells("collectd_export_total") == VInt(1))
    assert(cells("collectd_export_success") == VInt(1))
  }

  test("failed dial is skipped and counted, not thrown") {
    val store = newStore()
    val internal = new MetricsStore
    // nothing listens on this port
    val push = new PushExporter(store, "p.mtail", "host1",
      Some(internal)).registerGraphite("localhost", 1)
    assert(push.pushOnce() == 0)
    val cells = internal.snapshot().map(c => c.name -> c.value).toMap
    assert(cells("graphite_export_total") == VInt(1))
    assert(!cells.contains("graphite_export_success"))
  }

  test("interval scheduler pushes repeatedly") {
    val store = newStore()
    val sock = new DatagramSocket(0)
    sock.setSoTimeout(15000)
    val push = new PushExporter(store, "p.mtail")
      .registerStatsd("localhost", sock.getLocalPort)
    push.start(100)
    try {
      // two ticks' worth of datagrams proves the ticker re-fires
      val perTick = Exporters.statsd(store.snapshot(), "p.mtail")
        .split("\n").count(_.nonEmpty)
      (1 to perTick * 2).foreach { _ =>
        val pkt = new DatagramPacket(new Array[Byte](65536), 65536)
        sock.receive(pkt)
      }
    } finally {
      push.stop()
      sock.close()
    }
  }
}
