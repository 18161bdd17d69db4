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

  test("batch shape: partitions processed in chunks of BatchSize") {
    val media = Multimodal.mediaFromDocuments(docs).repartition(2)
    val batchSizes = media.mapPartitions { rows =>
      rows.grouped(Multimodal.BatchSize).map(_.size)
    }.collect()
    assert(batchSizes.sum == 500)
    assert(batchSizes.forall(_ <= Multimodal.BatchSize))
  }
}
