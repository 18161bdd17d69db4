package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Gate coverage for the multimodal plumbing: the batched mapPartitions
  * decode+featurize pipeline runs for real (typed Dataset, Encoders,
  * per-batch iteration) and its stub-codec output is recomputed by DuckDB
  * from the same md5 arithmetic.
  */
object MultimodalQueries {

  def multimodalDecode(spark: SparkSession, sfDir: String): DataFrame = {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sfDir))
    val decoded = Multimodal.decodeAndFeaturize(media)
    // No orderBy above the decode (r12): media arrives range-sorted by
    // media_id from mediaFromDocuments and every stage here preserves
    // row order, so the output is already totally ordered — a sort here
    // would re-run the decode inside the range sample (README r12).
    Multimodal.resize(decoded, maxW = 320, maxH = 240)
      .select(col("media_id"), col("kind"), col("width"), col("height"),
        col("n_frames"), col("out_width"), col("out_height"),
        round(element_at(col("feat"), 1), 4).as("feat0"),
        round(element_at(col("feat"), 8), 4).as("feat7"))
  }

  /** Frame sampling gated end-to-end: every 4th frame index of each video
    * row, one output row per sampled frame with its sample ordinal.
    */
  def multimodalFrameSample(spark: SparkSession, sfDir: String): DataFrame = {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sfDir))
    // Ordered without a sort: range-sorted media + order-preserving
    // decode/filter, and posexplode emits each row's samples in idx
    // order — total (media_id, sample_idx) order by construction.
    Multimodal.sampleFrames(Multimodal.decodeAndFeaturize(media), stride = 4)
  }

  val multimodalFrameSampleSql: String =
    """WITH media AS (
      |  SELECT doc_id AS media_id,
      |    ['image','audio','video'][(doc_id % 3) + 1] AS kind,
      |    ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
      |  FROM documents),
      |videos AS (
      |  SELECT media_id, 1 + h % 32 AS n_frames
      |  FROM media WHERE kind = 'video')
      |SELECT media_id, n_frames,
      |  CAST(f // 4 AS BIGINT) AS sample_idx,
      |  CAST(f AS BIGINT) AS frame_idx
      |FROM (SELECT media_id, n_frames,
      |        unnest(generate_series(0, n_frames - 1, 4)) AS f
      |      FROM videos)
      |ORDER BY media_id, sample_idx""".stripMargin

  val multimodalDecodeSql: String =
    """WITH media AS (
      |  SELECT doc_id AS media_id,
      |    ['image','audio','video'][(doc_id % 3) + 1] AS kind,
      |    text, md5(text) AS hex,
      |    ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
      |  FROM documents),
      |decoded AS (
      |  SELECT media_id, kind,
      |    1 + h % 640 AS width, 1 + h % 480 AS height,
      |    CASE kind WHEN 'video' THEN 1 + h % 32
      |              WHEN 'audio' THEN 1 + h % 16
      |              ELSE 1 END AS n_frames,
      |    (('0x' || substr(md5('0:' || hex), 1, 15))::BIGINT % 2001 - 1000) / 1000.0 AS f0,
      |    (('0x' || substr(md5('7:' || hex), 1, 15))::BIGINT % 2001 - 1000) / 1000.0 AS f7
      |  FROM media),
      |resized AS (
      |  SELECT *, least(320.0 / width, 240.0 / height, 1.0) AS scale FROM decoded)
      |SELECT media_id, kind, width, height, n_frames,
      |  CAST(floor(width * scale) AS BIGINT) AS out_width,
      |  CAST(floor(height * scale) AS BIGINT) AS out_height,
      |  round(f0, 4) AS feat0, round(f7, 4) AS feat7
      |FROM resized
      |ORDER BY media_id""".stripMargin

  /** The REAL ImageIO codec on a hash-gated hot path (r7 verdict item
    * 5): executors encode one deterministic constant-gray PNG per
    * document ([[Multimodal.pngFixturesFromDocuments]]), then
    * [[Multimodal.ImageIoCodec]] — explicitly, not the stub — decodes
    * the bytes and extracts strip-luminance features. The oracle
    * predicts every output from `doc_id` arithmetic: decoded width and
    * height must equal the generator's, and each luminance feature must
    * be `2·(3g/765)−1` (constant-gray image ⇒ every strip mean is the
    * pixel luminance; PNG is lossless so the roundtrip is exact).
    * Features are compared at micro precision via `floor(x·1e6 + 0.5)`
    * — identical truncation in both engines, and the value grid (g/51
    * rationals) keeps every point ≥ ~1e-2 from a half-integer while
    * accumulated double error is ≤ ~1e-13, so the comparison is exact
    * in practice. `f_spread_micro` (max−min over the 8 strips) pins ALL
    * strips, not just the first.
    */
  def multimodalImageioDecode(spark: SparkSession, sfDir: String): DataFrame = {
    val media = Multimodal.pngFixturesFromDocuments(
      Tables.documents(spark, sfDir))
    Multimodal.decodeAndFeaturize(media, Multimodal.ImageIoCodec)
      .toDF()
      .select(col("media_id"), col("width"), col("height"), col("n_frames"),
        floor(element_at(col("feat"), 1) * 1e6 + lit(0.5)).cast("long")
          .as("f_first_micro"),
        floor((array_max(col("feat")) - array_min(col("feat"))) * 1e6
          + lit(0.5)).cast("long").as("f_spread_micro"))
  }

  val multimodalImageioDecodeSql: String =
    """SELECT doc_id AS media_id,
      |  8 + doc_id % 33 AS width,
      |  1 + doc_id % 17 AS height,
      |  CAST(1 AS BIGINT) AS n_frames,
      |  CAST(FLOOR(1e6 * (2 * ((3.0 * (doc_id % 256)) / 765.0) - 1) + 0.5)
      |    AS BIGINT) AS f_first_micro,
      |  CAST(0 AS BIGINT) AS f_spread_micro
      |FROM documents
      |ORDER BY media_id""".stripMargin

  /** Binary-column governance: per media kind, row count, byte volume,
    * largest object and distinct-content count (content-hash dedup
    * check) — the storage audit run before shipping a media corpus to
    * an object store. Byte length is OCTET length of the binary column
    * in both engines (UTF-8-safe); one kind-keyed aggregation, all
    * integers.
    */
  def multimodalSizeAudit(spark: SparkSession, sfDir: String): DataFrame = {
    Multimodal.mediaFromDocuments(Tables.documents(spark, sfDir))
      .toDF()
      .select(col("kind"), length(col("content")).cast("long").as("n_bytes"),
        md5(col("content")).as("content_hash"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"), sum(col("n_bytes")).as("total_bytes"),
        max(col("n_bytes")).as("max_bytes"),
        countDistinct(col("content_hash")).as("n_distinct_contents"))
      .orderBy(col("kind"))
  }

  val multimodalSizeAuditSql: String =
    """WITH media AS (
      |  SELECT ['image','audio','video'][(doc_id % 3) + 1] AS kind,
      |    octet_length(encode(text)) AS n_bytes,
      |    md5(text) AS content_hash
      |  FROM documents)
      |SELECT kind, CAST(count(*) AS BIGINT) AS n_media,
      |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
      |  CAST(max(n_bytes) AS BIGINT) AS max_bytes,
      |  CAST(count(DISTINCT content_hash) AS BIGINT) AS n_distinct_contents
      |FROM media
      |GROUP BY kind
      |ORDER BY kind""".stripMargin
}
