package graft.multimodal

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
  * Two codec backends behind one [[Multimodal.MediaCodec]] seam:
  * [[Multimodal.StubCodec]] (default; gate path) is a DETERMINISTIC FAKE —
  * all "decoded" properties are md5-arithmetic over the payload bytes, so
  * the Spark-side plumbing (schema, Encoders, partitioning, batch shape)
  * is real AND the output is exactly reproducible by the DuckDB oracle.
  * [[Multimodal.ImageIoCodec]] is the honest image path over the JDK's
  * built-in `javax.imageio` (real pixel dimensions + luminance features;
  * audio/video still have no JVM codec and dead-letter). Select with
  * `spark.graft.multimodal.codec=imageio`; swapping changes no plumbing.
  */
object Multimodal {

  val BatchSize = 64

  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte])
  final case class DecodedMedia(media_id: Long, kind: String,
      width: Long, height: Long, n_frames: Long, feat: Array[Double])

  /** Pluggable decode backend. Implementations must be deterministic for
    * a given payload (retries/speculative tasks must agree) and
    * serializable (the instance ships inside the `mapPartitions`
    * closure). Failure contract: undecodable payloads return
    * `(-1, -1, 0)` / empty features — rows stay in the Dataset with the
    * failure marker so downstream can dead-letter them (log-and-skip,
    * reference §1.4), never throw inside an executor task.
    */
  trait MediaCodec extends Serializable {
    def decode(content: Array[Byte], kind: String): (Long, Long, Long)
    def features(content: Array[Byte], kind: String, dim: Int = 8): Array[Double]

    /** Both halves in one call. The pipeline always wants both, and for a
      * real codec the decode IS the cost — the default pays it twice;
      * implementations backed by an actual decoder override this to
      * decode once (ImageIO measured ~2× on the gated PNG path).
      */
    def decodeWithFeatures(content: Array[Byte], kind: String,
        dim: Int = 8): ((Long, Long, Long), Array[Double]) =
      (decode(content, kind), features(content, kind, dim))
  }

  /** ======== STUB CODEC (deterministic fake — see scaladoc above) ======= */
  object StubCodec extends MediaCodec {
    import graft.functions.Md5Bits

    private val HexChars = "0123456789abcdef".toCharArray
    private def hexOf(d: Array[Byte]): String = {
      val out = new Array[Char](32)
      var i = 0
      while (i < 16) {
        out(2 * i) = HexChars((d(i) >> 4) & 0xf)
        out(2 * i + 1) = HexChars(d(i) & 0xf)
        i += 1
      }
      new String(out)
    }

    /** "Decode" dimensions and frame count from the payload hash
      * ([[Md5Bits.top60]] ≡ the old hex-string round-trip, bit-exact).
      */
    override def decode(content: Array[Byte], kind: String): (Long, Long, Long) = {
      val h = Md5Bits.top60(Md5Bits.md5(content))
      val frames = kind match {
        case "video" => 1L + h % 32
        case "audio" => 1L + h % 16
        case _       => 1L
      }
      (1L + h % 640, 1L + h % 480, frames)
    }

    /** 8-dim "embedding" of the payload: per-component md5 in [-1, 1].
      * The hex STRING of the content digest is semantic here (it is what
      * gets re-hashed per component, matching the oracle), so it is kept
      * — only the per-byte format() encoding and the final hex→int
      * round-trip are replaced.
      */
    override def features(content: Array[Byte], kind: String,
        dim: Int = 8): Array[Double] = {
      val hex = hexOf(Md5Bits.md5(content))
      Array.tabulate(dim) { j =>
        (Md5Bits.hash60(s"$j:$hex") % 2001 - 1000) / 1000.0
      }
    }
  }

  /** ======== REAL CODEC: JDK ImageIO (PNG/JPEG/GIF/BMP) ========
    * The honest image path — `javax.imageio` ships in the JVM, so the
    * `image` kind needs no external codec: real pixel dimensions, and an
    * 8-dim feature of per-vertical-strip mean luminance scaled to
    * [-1, 1] (a deterministic, rotation-sensitive fingerprint — the
    * shape a real embedding model would slot into). Audio/video kinds
    * have no JVM-built-in codec and return the failure marker, exactly
    * the dead-letter contract a missing system codec produces in a real
    * pipeline.
    */
  object ImageIoCodec extends MediaCodec {
    private def readImage(content: Array[Byte]): java.awt.image.BufferedImage =
      // Explicit MEMORY-cached stream: the ImageIO.read(InputStream)
      // convenience wraps the bytes in a FileCache stream — one temp
      // file created AND deleted per decoded row (the dominant cost of
      // the gated decode at sf0.1: ~240 s of task time for ~1 s of
      // pixel work). The payload is already fully in memory.
      try {
        val img = javax.imageio.ImageIO.read(
          new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(content)))
        img
      } catch { case _: java.io.IOException => null }

    override def decode(content: Array[Byte], kind: String): (Long, Long, Long) =
      if (kind != "image") (-1L, -1L, 0L)
      else {
        val img = readImage(content)
        if (img == null) (-1L, -1L, 0L)
        else (img.getWidth.toLong, img.getHeight.toLong, 1L)
      }

    /** Strip-luminance features of an already-decoded image. Pixels are
      * fetched as ONE bulk getRGB row-major array and accumulated in the
      * same y-outer/x-inner order as the former per-pixel loop —
      * identical double arithmetic.
      */
    private def featuresOf(img: java.awt.image.BufferedImage,
        dim: Int): Array[Double] = {
      val (w, h) = (img.getWidth, img.getHeight)
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      val sums = new Array[Double](dim)
      val counts = new Array[Long](dim)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = px(y * w + x)
          val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) /
            (3.0d * 255.0d)
          val strip = math.min(dim - 1, x * dim / w)
          sums(strip) += lum
          counts(strip) += 1
          x += 1
        }
        y += 1
      }
      Array.tabulate(dim)(j =>
        if (counts(j) == 0) 0.0d else 2.0d * sums(j) / counts(j) - 1.0d)
    }

    override def features(content: Array[Byte], kind: String,
        dim: Int = 8): Array[Double] = {
      if (kind != "image") return Array.empty
      val img = readImage(content)
      if (img == null) return Array.empty
      featuresOf(img, dim)
    }

    /** One ImageIO.read serves both halves (the separate decode +
      * features calls each re-decoded the payload).
      */
    override def decodeWithFeatures(content: Array[Byte], kind: String,
        dim: Int = 8): ((Long, Long, Long), Array[Double]) = {
      if (kind != "image") return ((-1L, -1L, 0L), Array.empty)
      val img = readImage(content)
      if (img == null) ((-1L, -1L, 0L), Array.empty)
      else ((img.getWidth.toLong, img.getHeight.toLong, 1L),
        featuresOf(img, dim))
    }
  }

  /** Codec registry for the session-conf knob
    * `spark.graft.multimodal.codec` (`stub` default / `imageio`).
    */
  def codecFor(name: String): MediaCodec = name.toLowerCase match {
    case "imageio" => ImageIoCodec
    case _         => StubCodec
  }

  /** Synthesize a deterministic media table from `documents` (no media
    * files ship in the testdata): payload = utf-8 text bytes, kind cycles
    * image/audio/video by doc_id.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // Range-partition + sort on media_id INSTEAD of round-robin (r12):
    // consumers that present ordered output then need no orderBy ABOVE
    // the decode — a sort there makes RangePartitioner's reservoir
    // sample run the whole decode+featurize a second time (the
    // sort-over-heavy-project class, README r12). Ordering the raw
    // payloads below the codec costs the same one exchange round-robin
    // did, and aggregating consumers are indifferent.
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("content"))
      .repartitionByRange(
        spark.sparkContext.defaultParallelism, col("media_id"))
      .sortWithinPartitions("media_id")
      .as[MediaRow]
  }

  /** REAL PNG fixture corpus (r7 verdict item 5): one deterministic
    * constant-gray PNG per document, encoded on the EXECUTORS with the
    * JDK's ImageIO writer — width `8 + doc_id % 33` (≥8 so every one of
    * the 8 luminance strips is non-empty), height `1 + doc_id % 17`,
    * every pixel gray level `doc_id % 256`. PNG is lossless, so
    * whatever byte layout the encoder picks, [[ImageIoCodec]] must
    * decode back the exact generator parameters — which a SQL oracle
    * can predict from `doc_id` arithmetic alone. This is how the REAL
    * codec gets onto a hash-gated hot path without shipping binary
    * fixtures in testdata.
    */
  def pngFixturesFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"))
      .repartitionByRange(
        spark.sparkContext.defaultParallelism, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = (8 + id % 33).toInt
          val h = (1 + id % 17).toInt
          val g = (id % 256).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val rgb = (g << 16) | (g << 8) | g
          val px = new Array[Int](w * h)
          java.util.Arrays.fill(px, rgb)
          img.setRGB(0, 0, w, h, px, 0, w)
          val bos = new java.io.ByteArrayOutputStream()
          // memory-cached stream: ImageIO.write(_, _, OutputStream)
          // otherwise spools every encode through a temp FILE
          val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
          javax.imageio.ImageIO.write(img, "png", ios)
          ios.close()
          MediaRow(id, "image", bos.toByteArray)
        }
      }
  }

  /** Batched decode + feature extraction: iterator-of-batches inside each
    * partition (`grouped(BatchSize)`), one codec "session" per batch.
    * Codec defaults to the session conf `spark.graft.multimodal.codec`
    * (stub unless overridden), so the oracle gate stays deterministic
    * while a real deployment flips one conf to decode with ImageIO.
    */
  def decodeAndFeaturize(media: Dataset[MediaRow]): Dataset[DecodedMedia] =
    decodeAndFeaturize(media,
      codecFor(media.sparkSession.conf
        .getOption("spark.graft.multimodal.codec").getOrElse("stub")))

  def decodeAndFeaturize(media: Dataset[MediaRow],
      codec: MediaCodec): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        // a real pipeline would init the codec/model HERE, once per batch
        batch.iterator.map { m =>
          val ((w, h, f), feat) = codec.decodeWithFeatures(m.content, m.kind)
          DecodedMedia(m.media_id, m.kind, w, h, f, feat)
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
