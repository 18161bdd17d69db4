package graft.multimodal

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (driver-mandated extension surface): treat
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, and run decode / feature-extraction / resize / frame-sampling
  * as BATCHED per-partition operators over typed Datasets — the Scala twin
  * of a `mapInPandas` pipeline (iterator-of-batches inside each partition,
  * so a real decoder would amortize model/codec setup per batch, not per
  * row).
  *
  * The decode itself is a STUB — this container has no image/audio codecs —
  * implemented as a DETERMINISTIC FAKE: all "decoded" properties are
  * md5-arithmetic over the payload bytes, so the Spark-side plumbing
  * (schema, Encoders, partitioning, batch shape) is real AND the output is
  * exactly reproducible by the DuckDB oracle. Swapping `StubCodec` for a
  * real codec changes no plumbing.
  */
object Multimodal {

  val BatchSize = 64

  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte])
  final case class DecodedMedia(media_id: Long, kind: String,
      width: Long, height: Long, n_frames: Long, feat: Array[Double])

  /** ======== STUB CODEC (deterministic fake — see scaladoc above) ======= */
  object StubCodec {
    private def md5hex(bytes: Array[Byte]): String = {
      val md = MessageDigest.getInstance("MD5")
      md.digest(bytes).map("%02x".format(_)).mkString
    }
    private def h60(hex: String): Long = BigInt(hex.take(15), 16).toLong

    /** "Decode" dimensions and frame count from the payload hash. */
    def decode(content: Array[Byte], kind: String): (Long, Long, Long) = {
      val h = h60(md5hex(content))
      val frames = kind match {
        case "video" => 1L + h % 32
        case "audio" => 1L + h % 16
        case _       => 1L
      }
      (1L + h % 640, 1L + h % 480, frames)
    }

    /** 8-dim "embedding" of the payload: per-component md5 in [-1, 1]. */
    def features(content: Array[Byte], dim: Int = 8): Array[Double] = {
      val hex = md5hex(content)
      Array.tabulate(dim) { j =>
        (h60(md5hex(s"$j:$hex".getBytes("UTF-8"))) % 2001 - 1000) / 1000.0
      }
    }
  }

  /** Synthesize a deterministic media table from `documents` (no media
    * files ship in the testdata): payload = utf-8 text bytes, kind cycles
    * image/audio/video by doc_id.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("content"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[MediaRow]
  }

  /** Batched decode + feature extraction: iterator-of-batches inside each
    * partition (`grouped(BatchSize)`), one codec "session" per batch.
    */
  def decodeAndFeaturize(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        // a real pipeline would init the codec/model HERE, once per batch
        batch.iterator.map { m =>
          val (w, h, f) = StubCodec.decode(m.content, m.kind)
          DecodedMedia(m.media_id, m.kind, w, h, f,
            StubCodec.features(m.content))
        }
      }
    }
  }

  /** Resize: pure metadata transform (aspect-preserving fit into a box). */
  def resize(decoded: Dataset[DecodedMedia], maxW: Long, maxH: Long): DataFrame =
    decoded.toDF()
      .withColumn("scale",
        least(lit(maxW) / col("width"), lit(maxH) / col("height"), lit(1.0)))
      .withColumn("out_width", floor(col("width") * col("scale")).cast("long"))
      .withColumn("out_height", floor(col("height") * col("scale")).cast("long"))
      .drop("scale")

  /** Frame sampling for video rows: every `stride`-th frame index, exploded
    * to one row per sampled frame (posexplode keeps the sample ordinal).
    */
  def sampleFrames(decoded: Dataset[DecodedMedia], stride: Long): DataFrame =
    decoded.toDF()
      .filter(col("kind") === "video")
      .select(col("media_id"), col("n_frames"),
        posexplode(sequence(lit(0L), col("n_frames") - 1, lit(stride)))
          .as(Seq("sample_idx", "frame_idx")))
      .withColumn("sample_idx", col("sample_idx").cast("long"))
}
