package graft.operators

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with a
  * typed metadata struct, processed per-partition so a real codec is
  * initialised once per task (the Scala analogue of a batched
  * `mapInPandas` decode stage).
  *
  * All three arms are REAL header parsers — no pixel/sample data is
  * ever materialised, only the leading container bytes are touched:
  *  - IMAGE: payloads recognised by the JDK's `javax.imageio` registry
  *    (PNG, JPEG, GIF, BMP, …) — format name + pixel dimensions;
  *  - AUDIO: WAV/RIFF — channels + sample rate from the `fmt ` chunk,
  *    duration from the `data` chunk size over the byte rate;
  *  - VIDEO: MP4/ISO-BMFF — duration from `moov/mvhd`
  *    (timescale-normalised to ms), track pixel dimensions from the
  *    largest video `trak/tkhd` (16.16 fixed-point).
  * Container headers need no codec, so these parse everywhere; a
  * payload no arm recognises (or that throws mid-parse — ImageIO
  * plugins raise RuntimeExceptions on malformed headers) yields
  * `format = "unknown"` with zeroed fields rather than fabricated
  * metadata or a failed Spark task.
  *
  * Scale: decode is embarrassingly parallel (narrow, no shuffle);
  * metadata aggregation shuffles only small structs. Payload bytes
  * never enter a shuffle.
  */
object Multimodal {

  final case class MediaMeta(id: Long, format: String, width: Int,
      height: Int, n_frames: Int, n_bytes: Long, sample_rate: Int,
      channels: Int, duration_ms: Long)

  private def unknownMeta(id: Long, payload: Array[Byte]): MediaMeta =
    MediaMeta(id, "unknown", 0, 0, 0, payload.length.toLong, 0, 0, 0L)

  /** real image-header decode via the ImageIO reader registry: format
    * and dimensions from the container header, no pixel decode. None
    * when no installed reader recognises the payload.
    */
  private def decodeImage(id: Long, payload: Array[Byte])
      : Option[MediaMeta] = {
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    if (in == null) return None // no registered stream SPI
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(in)
          Some(MediaMeta(id,
            format = r.getFormatName.toLowerCase(java.util.Locale.ROOT),
            width = r.getWidth(0), height = r.getHeight(0),
            n_frames = 1, n_bytes = payload.length.toLong,
            sample_rate = 0, channels = 0, duration_ms = 0L))
        } finally r.dispose()
      }
    } catch {
      // plugin readers throw RuntimeExceptions (not just IOException)
      // on truncated/corrupt headers — one bad payload must not fail
      // the task at corpus scale
      case NonFatal(_) => None
    } finally in.close()
  }

  // ---- little/big-endian primitive reads (bounds-checked callers) --
  private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def u32be(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def u64be(b: Array[Byte], o: Int): Long =
    (u32be(b, o) << 32) | u32be(b, o + 4)
  private def tag4(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** WAV/RIFF header parse (pure byte walking, no codec): channels +
    * sample rate from the `fmt ` chunk, duration = data-chunk bytes
    * over the byte rate. None unless the RIFF/WAVE magic and a sane
    * `fmt ` chunk are present.
    */
  private def decodeWav(id: Long, p: Array[Byte]): Option[MediaMeta] = {
    if (p.length < 12 || tag4(p, 0) != "RIFF" || tag4(p, 8) != "WAVE")
      return None
    var off = 12L
    var sr = 0; var ch = 0; var byteRate = 0L; var dataBytes = -1L
    while (off + 8 <= p.length) {
      val o = off.toInt
      val cid = tag4(p, o)
      val sz = u32le(p, o + 4)
      if (cid == "fmt " && o + 8 + 16 <= p.length) {
        ch = u16le(p, o + 10)
        sr = u32le(p, o + 12).toInt
        byteRate = u32le(p, o + 16)
      } else if (cid == "data") dataBytes = sz
      off += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
    }
    if (sr <= 0 || ch <= 0 || dataBytes < 0) None
    else Some(MediaMeta(id, "wav", 0, 0, 0, p.length.toLong, sr, ch,
      if (byteRate > 0) dataBytes * 1000L / byteRate else 0L))
  }

  /** MP4/ISO-BMFF box walk (pure byte parsing, no codec): duration
    * from `moov/mvhd` (timescale → ms), pixel dimensions from the
    * largest `trak/tkhd` (16.16 fixed-point; audio tracks carry 0×0).
    * None unless the file leads with `ftyp` and contains an `mvhd`.
    */
  private def decodeMp4(id: Long, p: Array[Byte]): Option[MediaMeta] = {
    if (p.length < 12 || tag4(p, 4) != "ftyp") return None
    var durMs = 0L; var w = 0; var h = 0; var sawMvhd = false
    // walk the box list in [from, to); f(boxType, payloadStart, end)
    def boxes(from: Long, to: Long,
        f: (String, Long, Long) => Unit): Unit = {
      var off = from
      var ok = true
      while (ok && off + 8 <= to) {
        val o = off.toInt
        var sz = u32be(p, o)
        val t = tag4(p, o + 4)
        var hdr = 8L
        if (sz == 1 && off + 16 <= to) { sz = u64be(p, o + 8); hdr = 16 }
        else if (sz == 0) sz = to - off // box extends to end
        if (sz < hdr) ok = false // malformed: stop walking
        else {
          f(t, off + hdr, math.min(off + sz, to))
          off += sz
        }
      }
    }
    boxes(0, p.length.toLong, { (t, s, e) =>
      if (t == "moov") boxes(s, e, { (t2, s2, e2) =>
        val o2 = s2.toInt
        if (t2 == "mvhd" && e2 - s2 >= 20) {
          sawMvhd = true
          val v = p(o2) & 0xff
          val (ts, d) =
            if (v == 1 && e2 - s2 >= 32)
              (u32be(p, o2 + 20), u64be(p, o2 + 24))
            else (u32be(p, o2 + 12), u32be(p, o2 + 16))
          // adversarial headers: a v1 duration with bit 63 set reads
          // as a negative Long, and anything above Long.Max/1000
          // would overflow the ms scaling into garbage — treat both
          // as unparsed (duration stays 0) rather than fabricate
          if (ts > 0 && d >= 0 && d <= Long.MaxValue / 1000L)
            durMs = d * 1000L / ts
        } else if (t2 == "trak") boxes(s2, e2, { (t3, s3, e3) =>
          if (t3 == "tkhd") {
            val v = p(s3.toInt) & 0xff
            // width sits after verflags + times/ids/duration +
            // reserved + layer/group/volume + the 36-byte matrix
            val wo = s3 + (if (v == 1) 88L else 76L)
            if (wo + 8 <= e3) {
              val tw = (u32be(p, wo.toInt) >> 16).toInt
              val th = (u32be(p, wo.toInt + 4) >> 16).toInt
              if (tw > 0 && th > 0) { w = math.max(w, tw); h = math.max(h, th) }
            }
          }
        })
      })
    })
    if (!sawMvhd) None
    else Some(MediaMeta(id, "mp4", w, h, 0, p.length.toLong, 0, 0,
      durMs))
  }

  private[operators] def decodeOne(id: Long,
      payload: Array[Byte]): MediaMeta =
    try {
      decodeImage(id, payload)
        .orElse(decodeWav(id, payload))
        .orElse(decodeMp4(id, payload))
        .getOrElse(unknownMeta(id, payload))
    } catch { case NonFatal(_) => unknownMeta(id, payload) }

  /** (id, payload binary) → typed metadata, one codec init per
    * partition.
    */
  def decodeMeta(media: DataFrame, idCol: String, payloadCol: String)
      : Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real codecs initialise here, once per task
        rows.map { case (id, payload) => decodeOne(id, payload) }
      }
  }

  // ---- deterministic demo payload synthesis ------------------------
  // The container ships no media corpus, so the demo source FABRICATES
  // REAL containers (valid WAV and MP4 headers, byte-exact) from the
  // documents table, deterministically per doc_id — the decode arms
  // above then parse them for real, and the DuckDB oracle predicts
  // every field from (doc_id, length(text)) alone.

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** canonical 44-byte-header PCM WAV with a zeroed data chunk. */
  private[operators] def synthWav(sampleRate: Int, channels: Int,
      dataBytes: Int): Array[Byte] = {
    val blockAlign = channels * 2 // 16-bit PCM
    val byteRate = sampleRate.toLong * blockAlign
    val b = java.nio.ByteBuffer.allocate(44 + dataBytes)
    b.put(ascii("RIFF")).put(le32(36L + dataBytes)).put(ascii("WAVE"))
      .put(ascii("fmt ")).put(le32(16L))
      .put(le16(1)).put(le16(channels)).put(le32(sampleRate.toLong))
      .put(le32(byteRate)).put(le16(blockAlign)).put(le16(16))
      .put(ascii("data")).put(le32(dataBytes.toLong))
    b.array()
  }

  /** minimal valid ISO-BMFF: ftyp(20) + moov(8 + mvhd v0 108 +
    * trak(8 + tkhd v0 92)) = 236 bytes total.
    */
  private[operators] def synthMp4(width: Int, height: Int,
      durationMs: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(236)
    def w(bs: Array[Byte]*): Unit = bs.foreach(out.write)
    w(be32(20), ascii("ftyp"), ascii("isom"), be32(0), ascii("isom"))
    w(be32(216), ascii("moov"))
    // mvhd v0: timescale 1000 → duration units = ms
    w(be32(108), ascii("mvhd"), be32(0), be32(0), be32(0),
      be32(1000), be32(durationMs), be32(0x00010000L), le16(0).reverse,
      Array.fill[Byte](10)(0))
    w(identityMatrix, Array.fill[Byte](24)(0), be32(2))
    w(be32(100), ascii("trak"))
    w(be32(92), ascii("tkhd"), be32(0), be32(0), be32(0), be32(1),
      be32(0), be32(durationMs), Array.fill[Byte](8)(0),
      Array.fill[Byte](8)(0))
    w(identityMatrix, be32(width.toLong << 16), be32(height.toLong << 16))
    out.toByteArray
  }
  private def identityMatrix: Array[Byte] =
    be32(0x00010000L) ++ be32(0) ++ be32(0) ++
      be32(0) ++ be32(0x00010000L) ++ be32(0) ++
      be32(0) ++ be32(0) ++ be32(0x40000000L)

  /** Demo source over `documents`: doc_id % 3 routes each doc to a
    * synthesized WAV (0), a synthesized MP4 (1), or the raw text bytes
    * (2 — no arm recognises them → `unknown`). Every synthesized field
    * is a pure function of (doc_id, length(text)) so the SQL oracle
    * reproduces it exactly; see LlmExtras.oracleSql.
    */
  def demoMedia(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // spread the single-row-group scan (r20): the typed map below is
    // a Scala closure (ser/deser per row, no codegen) and dominated
    // the query single-task; the synthesis is a pure per-row function
    // of (doc_id, length) — partitioning-independent by construction
    graft.Tables.spread(graft.Tables(spark, sfDir, "documents"))
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val n = text.length.toLong
        val payload = (id % 3) match {
          case 0 =>
            val ch = (1 + id % 2).toInt
            synthWav(sampleRate = (8000 + (n % 8) * 1000).toInt,
              channels = ch,
              dataBytes = (((n % 50) + 1) * ch * 2 * 8).toInt)
          case 1 =>
            synthMp4(width = (160 + (n % 16) * 16).toInt,
              height = (120 + (id % 9) * 8).toInt,
              durationMs = n % 10000)
          case _ => text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        }
        (id, payload)
      }.toDF("media_id", "payload")
  }
}
