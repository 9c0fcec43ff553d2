package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with a
  * typed metadata struct, processed per-partition so a real codec is
  * initialised once per task (the Scala analogue of a batched
  * `mapInPandas` decode stage).
  *
  * The DECODE ITSELF IS A STUB — image/audio codecs are not available in
  * this environment — but everything Spark-level is real: the binary
  * column schema, the per-partition batch shape, the typed Dataset
  * output with an Encoder, and deterministic metadata so the stage is
  * testable end-to-end. Swap [[decodeOne]] for a real codec (JavaCV /
  * ImageIO / ffmpeg) without touching the plan.
  *
  * Scale: decode is embarrassingly parallel (narrow, no shuffle);
  * metadata aggregation shuffles only small structs. Payload bytes never
  * enter a shuffle.
  */
object Multimodal {

  final case class MediaMeta(id: Long, format: String, width: Int,
      height: Int, n_frames: Int, n_bytes: Long)

  /** STUB decode: deterministic pseudo-metadata from the payload bytes.
    * A real implementation would parse the container header here.
    */
  private def decodeOne(id: Long, payload: Array[Byte]): MediaMeta = {
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
