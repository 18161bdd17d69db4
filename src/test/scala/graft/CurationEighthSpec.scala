package graft

import java.nio.file.Files

import graft.queries.CurationEighth

/** Value-level checks for the round-9 curation/audit queries against
  * hand-computed fixtures (the DuckDB gate checks the full corpus; these
  * pin the SEMANTICS on inputs small enough to verify by hand).
  */
class CurationEighthSpec extends SparkTestBase {

  /** Write a documents/embeddings fixture as a parquet sfDir. */
  private def fixtureDir(): String =
    Files.createTempDirectory("curation8").toString

  test("ngram_novelty_profile: corpus-unique 3-gram mass per source") {
    import spark.implicits._
    val dir = fixtureDir()
    // grams: doc1 {"x y z","y z w"}, doc2 {"x y z"}, doc3 {"p q r","q r s"}
    // df("x y z")=2 so only "y z w" is novel in source a.
    Seq(
      (1L, "x y z w", "en", "a", 7L),
      (2L, "x y z", "en", "a", 5L),
      (3L, "p q r s", "en", "b", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = CurationEighth.ngramNoveltyProfile(spark, dir).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq ===
      Seq(("a", 2L, 3L, 1L), ("b", 1L, 2L, 2L)))
    assert(math.abs(rows(0).getDouble(4) - 1.0 / 3.0) < 1e-12)
    assert(rows(1).getDouble(4) === 1.0)
  }

  test("embedding_ks_screen: exact cross-multiplied KS on a 4-dim fixture") {
    import spark.implicits._
    val dir = fixtureDir()
    // Group A = labels < 5, group B = labels >= 5; na = nb = 2.
    // dim0 separates fully (KS 2*2=4), dim3 likewise, dim1 partially
    // (KS 2), dim2 identical (KS 0). Ranks tie-break by dimension.
    Seq(
      (1L, Array(0.0f, 0.1f, 0.5f, 0.9f), 0),
      (2L, Array(0.0f, 0.2f, 0.5f, 0.9f), 1),
      (3L, Array(1.0f, 0.1f, 0.5f, 0.1f), 7),
      (4L, Array(1.0f, 0.3f, 0.5f, 0.1f), 9))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val rows = CurationEighth.embeddingKsScreen(spark, dir).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getBoolean(5))).toSeq ===
      Seq((0L, 2L, 2L, 4L, 1L, true), (1L, 2L, 2L, 2L, 3L, true),
        (2L, 2L, 2L, 0L, 4L, true), (3L, 2L, 2L, 4L, 2L, true)))
  }

  test("embedding_covariance_drift: identical shapes drift 0, else exact") {
    import spark.implicits._
    val dir = fixtureDir()
    // labels 0 and 1 hold IDENTICAL vector multisets {e0, e1} → their
    // scatter matrices are equal, the normalized numerator cancels, and
    // the pair's drift must be exactly 0. label 2 is a single row → zero
    // scatter, so for (0,2): qt[d,e] = |S₀[d,e]·1²| div (2·1)², with
    // S₀[0,0]=S₀[1,1]=10⁶, S₀[0,1]=−10⁶ → qt = 250000 at all three
    // entries and drift = 250000²·(1 + 1 + 2) = 250 000 000 000.
    def basis(i: Int): Array[Float] = {
      val a = Array.fill(64)(0.0f); a(i) = 1.0f; a
    }
    Seq(
      (1L, basis(0), 0), (2L, basis(1), 0),
      (3L, basis(0), 1), (4L, basis(1), 1),
      (5L, Array.fill(64)(0.25f), 2))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val rows = CurationEighth.embeddingCovarianceDrift(spark, dir).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq ===
      Seq((0L, 1L, 2L, 2L, 0L),
        (0L, 2L, 2L, 1L, 250000000000L), (1L, 2L, 2L, 1L, 250000000000L)))
  }

  test("dedup_cluster_profile: known clusters + singleton mass") {
    import spark.implicits._
    val dir = fixtureDir()
    // docs 1-3 (en) form one Jaccard>0.2 cluster (1≡2 exact, 3 at 0.5);
    // doc 4 shares nothing; doc 5 matches doc 1 but is lang-blocked (fr)
    // → sizes: one 3-cluster + two singletons over a 5-doc corpus.
    Seq(
      (1L, "a b c d e", "en", "s", 9L),
      (2L, "a b c d e", "en", "s", 9L),
      (3L, "a b c d x", "en", "s", 9L),
      (4L, "p q r s t", "en", "s", 9L),
      (5L, "a b c d e", "fr", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = CurationEighth.dedupClusterProfile(spark, dir).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      === Seq((1L, 2L, 2L), (3L, 1L, 3L)))
    assert(rows(0).getDouble(3) === 0.4 && rows(1).getDouble(3) === 0.6)
  }

  test("spearman_daily: closed form on a hand-ranked fixture") {
    import spark.implicits._
    val dir = fixtureDir()
    // daily (n_orders, cents): d1 (1, 3000), d2 (2, 1000), d3 (3, 2000)
    // revenue ranks (d2,d3,d1) vs count ranks (d1,d2,d3) → d = (2,-1,-1),
    // Σd² = 6, ρ = 1 − 6·6/(3·8) = −0.5
    Seq(
      ("1995-01-01", 30.00), ("1995-01-02", 5.00), ("1995-01-02", 5.00),
      ("1995-01-03", 10.00), ("1995-01-03", 5.00), ("1995-01-03", 5.00))
      .toDF("d", "o_totalprice")
      .selectExpr("cast(d as date) as o_orderdate", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    val r = CurationEighth.spearmanDaily(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1)) === (3L, 6L))
    assert(r.getDouble(2) === -0.5)
  }

  test("source_minhash_similarity: exact jaccard + independent sketch replay") {
    import spark.implicits._
    val dir = fixtureDir()
    // source a grams {"x y z","y z w"}, b {"x y z"}, c {"p q r"}:
    // (a,b) inter 1 / union 2, (a,c) and (b,c) disjoint.
    Seq(
      (1L, "x y z w", "en", "a", 7L),
      (2L, "x y z", "en", "b", 5L),
      (3L, "p q r", "en", "c", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    // independent reimplementation of the 16-slot signature for the
    // (a,b) pair: slots match exactly when a's min includes b's only gram
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expectedAB = (0 until 16).count { j =>
      val ha = Seq(md5hex(s"$j:x y z"), md5hex(s"$j:y z w")).min
      ha == md5hex(s"$j:x y z")
    }.toLong
    val rows = CurationEighth.sourceMinhashSimilarity(spark, dir).collect()
    assert(rows.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(5))).toSeq ===
      Seq(("a", "b", 1L, 2L, expectedAB), ("a", "c", 0L, 3L, 0L),
        ("b", "c", 0L, 2L, 0L)))
    assert(rows(0).getDouble(4) === 0.5)
    assert(rows(0).getDouble(6) === expectedAB / 16.0)
    assert(rows(1).getDouble(4) === 0.0 && rows(2).getDouble(4) === 0.0)
  }

  test("embedding_clip_calibration: exact integer rank thresholds") {
    import spark.implicits._
    val dir = fixtureDir()
    // one dimension, 100 distinct values 1..100 µ (each count 1):
    // p1 = first level with cum ≥ ⌈100/100⌉ = 1 → 1 µ;
    // p99 = first level with cum ≥ ⌈99·100/100⌉ = 99 → 99 µ;
    // clipped = {100 µ} → 1 row, fraction 0.01; step = 98 div 255 = 0.
    (1 to 100).map(i => (i.toLong, Array(i / 1000.0f), i % 10))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val rows = CurationEighth.embeddingClipCalibration(spark, dir).collect()
    assert(rows.length === 1)
    val r = rows(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) === (0L, 100L, 1L, 99L, 1L, 0L))
    assert(math.abs(r.getDouble(6) - 0.01) < 1e-12)
  }

  test("multimodal_phash_hamming: independent driver-side recount at sf0.001") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // independent reimplementation of the stub codec's feature + phash
    // arithmetic over the 500-doc corpus, then brute-force H0/H1 masses
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val kinds = Array("image", "audio", "video")
    val hist = docs.map { case (id, text) =>
      val hex = md5hex(text)
      val f = (0 until 8).map { j =>
        (java.lang.Long.parseLong(md5hex(s"$j:$hex").substring(0, 15), 16)
          % 2001 - 1000) / 1000.0
      }
      val phash = (0 until 8).map { j =>
        if (f(j) > f((j + 1) % 8)) 1L << j else 0L
      }.sum
      (kinds((id % 3).toInt), phash)
    }.groupBy(identity).map { case ((k, h), v) => (k, h, v.length.toLong) }
    val expected = kinds.sorted.map { k =>
      val buckets = hist.filter(_._1 == k).toSeq
      val h0 = buckets.map(b => b._3 * (b._3 - 1) / 2).sum
      val h1 = (for {
        a <- buckets; b <- buckets
        if a._2 < b._2 && java.lang.Long.bitCount(a._2 ^ b._2) == 1
      } yield a._3 * b._3).sum
      (k, buckets.size.toLong, h0, h1)
    }.toSeq
    val rows = CurationEighth.multimodalPhashHamming(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(rows === expected)
    assert(rows.exists(_._3 > 0), "500 docs over <=256 buckets must collide")
  }

  test("multimodal_phash_dedup: bucket arithmetic and determinism") {
    val df = CurationEighth.multimodalPhashDedup(spark, sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty, "500-doc corpus over <=256 buckets must collide")
    rows.foreach { r =>
      val kind = r.getString(0)
      val n = r.getLong(2)
      assert(Set("image", "audio", "video")(kind))
      assert(n >= 2, s"bucket emitted with $n members")
      assert(r.getLong(1) >= 0 && r.getLong(1) < 256, "phash is 8 order bits")
      assert(r.getLong(3) <= r.getLong(4), "min_media_id <= max_media_id")
      assert(r.getLong(5) === n * (n - 1) / 2, "pair count formula")
    }
    // total bucketed members never exceed the media corpus
    assert(rows.map(_.getLong(2)).sum <= 500)
    val again = CurationEighth.multimodalPhashDedup(spark, sf0001).collect()
    assert(rows.toSeq === again.toSeq, "fingerprints must be deterministic")
  }

  test("dataset_mixture_weights: hand-computed ppm rates, cap, and deficit") {
    import spark.implicits._
    val dir = fixtureDir()
    // Three sources; T_total = 100 + 49 + 10 = 159.
    //   target_ppm = (idx+1)*1e6 div 210
    //   src0  idx=0  → 4761;  wanted = 4761*159  div 1e6 = 0
    //   src4  idx=4  → 23809; wanted = 23809*159 div 1e6 = 3
    //   src19 idx=19 → 95238; wanted = 95238*159 div 1e6 = 15
    // src4 is UNCAPPED with a truncation remainder (rate = 3e6 div 49 =
    // 61224; sampled = 61224*49 div 1e6 = 2 < wanted 3) — its deficit
    // must still be 0 (deficit is inventory shortfall, not floor residue).
    // src19 is genuinely inventory-short: rate caps at 1e6, sampled = 10,
    // deficit = 15 - 10 = 5.
    def doc(id: Long, src: String, nTok: Int) =
      (id, Seq.fill(nTok)("t").mkString(" "), "en", src, nTok.toLong * 2)
    Seq(doc(1L, "src0", 100), doc(2L, "src4", 49), doc(3L, "src19", 10))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = CurationEighth.datasetMixtureWeights(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(rows === Seq( // string order: src0 < src19 < src4
      ("src0", 100L, 4761L, 0L, 0L, 0L),
      ("src19", 10L, 95238L, 1000000L, 10L, 5L),
      ("src4", 49L, 23809L, 61224L, 2L, 0L)))
  }
}
