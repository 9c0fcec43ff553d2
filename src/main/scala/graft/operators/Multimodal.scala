package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with a
  * typed metadata struct, processed per-partition so a real codec is
  * initialised once per task (the Scala analogue of a batched
  * `mapInPandas` decode stage).
  *
  * The IMAGE arm is REAL: payloads recognised by the JDK's `javax.
  * imageio` registry (PNG, JPEG, GIF, BMP, …) are header-decoded —
  * format name and pixel dimensions read from the container without
  * materialising pixel data. The AUDIO/VIDEO arm remains an honest,
  * documented stub (no A/V codecs ship in this environment):
  * deterministic pseudo-metadata keeps the stage testable end-to-end;
  * swap [[stubMeta]] for JavaCV/ffmpeg without touching the plan.
  *
  * Scale: decode is embarrassingly parallel (narrow, no shuffle);
  * metadata aggregation shuffles only small structs. Payload bytes never
  * enter a shuffle, and the header read touches only the leading bytes
  * of each payload.
  */
object Multimodal {

  final case class MediaMeta(id: Long, format: String, width: Int,
      height: Int, n_frames: Int, n_bytes: Long)

  /** real image-header decode via the ImageIO reader registry: format
    * and dimensions from the container header, no pixel decode. None
    * when no installed reader recognises the payload.
    */
  private def decodeImage(id: Long, payload: Array[Byte])
      : Option[MediaMeta] = {
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
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
            n_frames = 1, n_bytes = payload.length.toLong))
        } finally r.dispose()
      }
    } catch {
      case _: java.io.IOException => None // truncated/corrupt header
    } finally in.close()
  }

  /** STUB decode for audio/video containers: deterministic
    * pseudo-metadata from the payload bytes. A real implementation
    * would parse the container header here.
    */
  private def stubMeta(id: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    val format = (n % 3) match {
      case 0 => "image"
      case 1 => "audio"
      case _ => "video"
    }
    MediaMeta(
      id = id,
      format = format,
      width = (16 + n % 624).toInt,
      height = (16 + (n / 7) % 464).toInt,
      n_frames = (1 + n % 24).toInt,
      n_bytes = n)
  }

  private def decodeOne(id: Long, payload: Array[Byte]): MediaMeta =
    decodeImage(id, payload).getOrElse(stubMeta(id, payload))

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

  /** Demo source: documents.text re-cast as binary payloads (the
    * container ships no media files; the bytes are opaque to the
    * pipeline either way).
    */
  def demoMedia(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"))
}
