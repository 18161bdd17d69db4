package graft.multimodal

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("decode is deterministic and schema-complete") {
    val out = Multimodal.decodeAndFeaturize(Multimodal.mediaFromDocuments(docs))
    val r1 = out.orderBy($"media_id").limit(5).collect()
    val r2 = out.orderBy($"media_id").limit(5).collect()
    assert(r1.map(_.media_id).sameElements(r2.map(_.media_id)))
    assert(r1.zip(r2).forall { case (a, b) =>
      a.width == b.width && a.feat.sameElements(b.feat) })
    assert(r1.forall(_.feat.length == 8))
    assert(r1.forall(m => m.width >= 1 && m.width <= 640))
  }

  test("frame sampling explodes only video rows with stride") {
    val decoded = Multimodal.decodeAndFeaturize(Multimodal.mediaFromDocuments(docs))
    val frames = Multimodal.sampleFrames(decoded, stride = 4)
    val kinds = decoded.toDF().select("media_id", "kind", "n_frames")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val byMedia: Map[Long, Seq[org.apache.spark.sql.Row]] =
      frames.collect().toSeq.groupBy(_.getAs[Long]("media_id"))
    byMedia.foreach { case (id, rows) =>
      val (kind, nf) = kinds(id)
      assert(kind == "video")
      // sampled indexes are 0, 4, 8, … < n_frames
      val idx = rows.map(_.getAs[Long]("frame_idx")).sorted
      assert(idx == 0L.until(nf, 4L).toSeq)
    }
    // every video with frames appears
    assert(byMedia.keySet == kinds.filter(_._2._1 == "video").keySet)
  }

  test("ImageIoCodec decodes a real PNG through the Dataset plumbing") {
    // fixture built in-memory with the JDK: 32×20, left half black, right
    // half white — known dimensions AND known strip-luminance features
    val img = new java.awt.image.BufferedImage(
      32, 20, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 20).foreach { y =>
      (0 until 32).foreach { x =>
        img.setRGB(x, y, if (x < 16) 0x000000 else 0xffffff)
      }
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    val media = Seq(
      Multimodal.MediaRow(1L, "image", png),
      Multimodal.MediaRow(2L, "image", "not an image".getBytes("UTF-8")),
      Multimodal.MediaRow(3L, "video", png)).toDS()
    val out = Multimodal
      .decodeAndFeaturize(media, Multimodal.ImageIoCodec)
      .collect().map(d => d.media_id -> d).toMap
    // real decode: true pixel dimensions, one frame
    assert(out(1L).width == 32L && out(1L).height == 20L &&
      out(1L).n_frames == 1L)
    // strips 0-3 are black (luminance 0 → −1), strips 4-7 white (+1)
    assert(out(1L).feat.take(4).forall(f => math.abs(f + 1.0d) < 1e-9))
    assert(out(1L).feat.drop(4).forall(f => math.abs(f - 1.0d) < 1e-9))
    // undecodable payload and codec-less kinds dead-letter, never throw
    assert(out(2L).width == -1L && out(2L).feat.isEmpty)
    assert(out(3L).width == -1L && out(3L).n_frames == 0L)
  }

  test("codec conf knob selects ImageIO without touching the plumbing") {
    spark.conf.set("spark.graft.multimodal.codec", "imageio")
    try {
      // documents payloads are text → every row carries the dead-letter
      // marker under the real codec (honest: nothing here is a real image)
      val out = Multimodal
        .decodeAndFeaturize(Multimodal.mediaFromDocuments(docs.limit(9)))
        .collect()
      assert(out.nonEmpty && out.forall(_.width == -1L))
    } finally spark.conf.unset("spark.graft.multimodal.codec")
  }

  test("batch shape: partitions processed in chunks of BatchSize") {
    val media = Multimodal.mediaFromDocuments(docs).repartition(2)
    val batchSizes = media.mapPartitions { rows =>
      rows.grouped(Multimodal.BatchSize).map(_.size)
    }.collect()
    assert(batchSizes.sum == 500)
    assert(batchSizes.forall(_ <= Multimodal.BatchSize))
  }
}
