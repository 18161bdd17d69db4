package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Checkpoints.StableCheckpoint
import graft.Tables
import graft.multimodal.Multimodal
import graft.text.{Dedup, TextFunctions}

/** Round-9 curation/audit additions: corpus n-gram novelty profiling,
  * perceptual-hash media dedup, per-dimension KS feature screening, and
  * per-label covariance drift — four report shapes a training-data
  * pipeline runs between ingest and mixture design.
  *
  * Usual discipline: integer/fixed-point statistics wherever the gate
  * hashes them, one final double per report, gram/bucket/bounded-domain
  * keyed shuffles only.
  */
object CurationEighth {

  // ------------------------------------------------ n-gram novelty

  /** Per-source novelty profile: how much of each source's 3-gram mass
    * is corpus-unique (df = 1)? The inverse of boilerplate detection —
    * high novelty sources contribute fresh content, low ones repeat
    * what's already in the corpus (the signal behind "dedup then check
    * what's left" mixture design).
    *
    * Scale shape: one tokenize+gram explode off a numbered repartition
    * (full parallelism above the one-row-group scan), one gram-keyed
    * df aggregate, one gram-keyed join back, one source-keyed final
    * aggregate — all mergeable, no all-pairs anywhere; cost is linear
    * in total gram postings exactly like the dedup family's inverted
    * index. The gram relation is checkpointed once for its two
    * consumers (df aggregate + join probe).
    */
  def ngramNoveltyProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val grams = Tables.documents(spark, sfDir)
      .repartition(nPart)
      .select(col("doc_id"), col("source"),
        TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("source"),
        explode(Dedup.ngramSetOfTokens(col("toks"), 3)).as("g"))
      .stableCheckpoint()
    val dfreq = grams.groupBy(col("g")).agg(count(lit(1)).as("df"))
    grams.join(dfreq, "g")
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_gram_occurrences"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty_ratio",
        col("n_novel").cast("double") / col("n_gram_occurrences").cast("double"))
      .orderBy(col("source"))
  }

  val ngramNoveltyProfileSql: String =
    """WITH grams AS (
      |  SELECT doc_id, source,
      |    unnest(list_distinct([array_to_string(t[i:i+2], ' ')
      |      for i in range(1, greatest(len(t) - 2, 1) + 1)])) AS g
      |  FROM (SELECT doc_id, source,
      |          regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |        FROM documents)),
      |dfreq AS (SELECT g, count(*) AS df FROM grams GROUP BY g)
      |SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |  CAST(count(*) AS BIGINT) AS n_gram_occurrences,
      |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
      |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) AS novelty_ratio
      |FROM grams JOIN dfreq USING (g)
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // ------------------------------------------------ mixture design

  /** Token-budget mixture design: given target per-source weights
    * (deterministic ppm shares derived from the source index — in a real
    * pipeline these come from a tiny config table), compute the
    * per-source sampling rate that realizes the mixture within one epoch
    * of the corpus, plus the deficit for sources whose target exceeds
    * their inventory (rate capped at 1e6 ppm — oversampling is an
    * epochs decision, not a sampling-rate one). The arithmetic every
    * data-mixing run does between "dedup finished" and "start sampling".
    *
    * Exactness: everything is integer — token inventory from one
    * mergeable groupBy(source), target_ppm = (i+1)·1e6 div Σ(1..20),
    * wanted = target_ppm·T_total div 1e6, rate_ppm = min(1e6,
    * wanted·1e6 div T_s) — so Spark `div` ≡ DuckDB `//` row for row.
    *
    * Scale shape: one map + one 20-key aggregate; the corpus total
    * joins back as a broadcast 1-row cross join. Nothing here grows
    * with corpus size except the first mergeable pass.
    */
  def datasetMixtureWeights(spark: SparkSession, sfDir: String): DataFrame = {
    val inv = Tables.documents(spark, sfDir)
      .select(col("source"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("toks"))
      .groupBy(col("source")).agg(sum(col("toks")).as("n_tokens"))
    val total = inv.agg(sum(col("n_tokens")).as("t_total"))
    val denom = (1 to 20).sum // Σ source-index weights
    inv.crossJoin(broadcast(total))
      .withColumn("src_idx",
        expr("cast(substring(source, 4) as long)"))
      .withColumn("target_ppm",
        expr(s"(src_idx + 1) * 1000000 div $denom"))
      .withColumn("wanted_tokens", expr("target_ppm * t_total div 1000000"))
      .withColumn("rate_ppm",
        least(lit(1000000L), expr("wanted_tokens * 1000000 div n_tokens")))
      .withColumn("sampled_tokens", expr("rate_ppm * n_tokens div 1000000"))
      // Deficit is the INVENTORY shortfall (wanted beyond what the source
      // holds), not the ppm-floor truncation remainder: uncapped sources
      // lose up to 1 token/1e6 to the two floor divisions, and reporting
      // that residue as "deficit" would misstate the report's semantics
      // (deficit = needs more epochs; truncation = rounding).
      .withColumn("deficit_tokens",
        greatest(lit(0L), expr("wanted_tokens - n_tokens")))
      .select(col("source"), col("n_tokens"), col("target_ppm"),
        col("rate_ppm"), col("sampled_tokens"), col("deficit_tokens"))
      .orderBy(col("source"))
  }

  val datasetMixtureWeightsSql: String =
    """WITH inv AS (
      |  SELECT source,
      |    CAST(sum(len(regexp_split_to_array(trim(lower(text)), '\s+')))
      |         AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source),
      |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t_total FROM inv),
      |calc AS (
      |  SELECT source, n_tokens,
      |    (CAST(substr(source, 4) AS BIGINT) + 1) * 1000000 // 210
      |      AS target_ppm,
      |    ((CAST(substr(source, 4) AS BIGINT) + 1) * 1000000 // 210)
      |      * t_total // 1000000 AS wanted_tokens
      |  FROM inv, tot)
      |SELECT source, n_tokens, target_ppm,
      |  least(1000000, wanted_tokens * 1000000 // n_tokens) AS rate_ppm,
      |  least(1000000, wanted_tokens * 1000000 // n_tokens)
      |    * n_tokens // 1000000 AS sampled_tokens,
      |  greatest(0, wanted_tokens - n_tokens) AS deficit_tokens
      |FROM calc
      |ORDER BY source""".stripMargin

  // ------------------------------------------------ perceptual-hash dedup

  /** Perceptual-hash near-dup buckets over the media corpus: decode →
    * 8-dim feature → order-bit fingerprint (bit j set iff
    * feat[j] > feat[(j+1) mod 8] — the dHash idea applied to the
    * feature vector) → bucket by (kind, phash). The multimodal twin of
    * MinHash-LSH banding: candidate pairs come from bucket collisions,
    * never from an all-pairs scan, so cost is Σ_bucket n_b² with
    * 256-way hashing keeping buckets small. Runs on the deterministic
    * stub codec so the oracle reproduces every fingerprint from the
    * same md5 arithmetic (the real-codec path is exercised by
    * `multimodal_imageio_decode`).
    */
  def multimodalPhashDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sfDir))
    val dec = Multimodal.decodeAndFeaturize(media).toDF()
    val phash = (0 until 8).map { j =>
      when(element_at(col("feat"), j + 1) >
        element_at(col("feat"), ((j + 1) % 8) + 1), 1L << j).otherwise(0L)
    }.reduce(_ + _)
    dec.select(col("kind"), col("media_id"), phash.as("phash"))
      .groupBy(col("kind"), col("phash"))
      .agg(count(lit(1)).as("n_members"),
        min(col("media_id")).as("min_media_id"),
        max(col("media_id")).as("max_media_id"))
      .filter(col("n_members") >= 2)
      .withColumn("n_candidate_pairs",
        expr("n_members * (n_members - 1) div 2"))
      .orderBy(col("kind"), col("phash"))
  }

  val multimodalPhashDedupSql: String =
    """WITH media AS (
      |  SELECT doc_id AS media_id,
      |    ['image','audio','video'][(doc_id % 3) + 1] AS kind,
      |    md5(text) AS hex
      |  FROM documents),
      |sigs AS (
      |  SELECT media_id, kind,
      |    [(('0x' || substr(md5(j::VARCHAR || ':' || hex), 1, 15))::BIGINT
      |       % 2001 - 1000) / 1000.0 for j in range(0, 8)] AS f
      |  FROM media),
      |hashed AS (
      |  SELECT media_id, kind,
      |    CAST(list_sum([CASE WHEN f[j + 1] > f[((j + 1) % 8) + 1]
      |                        THEN 1 << j ELSE 0 END
      |                   for j in range(0, 8)]) AS BIGINT) AS phash
      |  FROM sigs)
      |SELECT kind, phash, CAST(count(*) AS BIGINT) AS n_members,
      |  min(media_id) AS min_media_id, max(media_id) AS max_media_id,
      |  CAST(count(*) * (count(*) - 1) // 2 AS BIGINT) AS n_candidate_pairs
      |FROM hashed
      |GROUP BY kind, phash
      |HAVING count(*) >= 2
      |ORDER BY kind, phash""".stripMargin

  // ------------------------------------------------ phash multi-probe

  /** Hamming-1 multi-probe audit for the perceptual-hash dedup: per
    * media kind, how many candidate pairs does exact-bucket collision
    * (H0) yield versus widening to fingerprints one bit apart (H1 — the
    * multi-probe recall lever, exactly as `sim_lsh_multiprobe` does for
    * LSH buckets)? The planning number behind "do we need probes": if
    * H1 mass is small relative to H0, exact banding suffices.
    *
    * Scale shape: the ENTIRE pair computation runs on the (kind, phash)
    * bucket HISTOGRAM — a ≤3·256-row relation regardless of corpus
    * size — H0 as Σ C(n,2) per bucket, H1 as Σ n_a·n_b over bucket
    * pairs whose XOR is a power of two (≤ 256·8/2 pairs per kind). The
    * only corpus-sized pass is the one mergeable groupBy; no per-item
    * probe explosion is ever materialized.
    */
  def multimodalPhashHamming(spark: SparkSession, sfDir: String): DataFrame = {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sfDir))
    val dec = Multimodal.decodeAndFeaturize(media).toDF()
    val phash = (0 until 8).map { j =>
      when(element_at(col("feat"), j + 1) >
        element_at(col("feat"), ((j + 1) % 8) + 1), 1L << j).otherwise(0L)
    }.reduce(_ + _)
    val hist = dec.select(col("kind"), phash.as("h"))
      .groupBy(col("kind"), col("h")).agg(count(lit(1)).as("n"))
    val h0 = hist.groupBy(col("kind"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(expr("n * (n - 1) div 2")).as("h0_pairs"))
    val h1 = hist.toDF("kind", "ha", "na")
      .join(hist.toDF("kind", "hb", "nb"), "kind")
      .filter(col("ha") < col("hb") &&
        expr("(ha ^ hb) in (1, 2, 4, 8, 16, 32, 64, 128)"))
      .groupBy(col("kind"))
      .agg(sum(col("na") * col("nb")).as("h1_pairs"))
    h0.join(h1, Seq("kind"), "left")
      .na.fill(0L, Seq("h1_pairs"))
      .select(col("kind"), col("n_buckets"), col("h0_pairs"),
        col("h1_pairs"))
      .orderBy(col("kind"))
  }

  val multimodalPhashHammingSql: String =
    """WITH media AS (
      |  SELECT doc_id AS media_id,
      |    ['image','audio','video'][(doc_id % 3) + 1] AS kind,
      |    md5(text) AS hex
      |  FROM documents),
      |sigs AS (
      |  SELECT media_id, kind,
      |    [(('0x' || substr(md5(j::VARCHAR || ':' || hex), 1, 15))::BIGINT
      |       % 2001 - 1000) / 1000.0 for j in range(0, 8)] AS f
      |  FROM media),
      |hashed AS (
      |  SELECT media_id, kind,
      |    CAST(list_sum([CASE WHEN f[j + 1] > f[((j + 1) % 8) + 1]
      |                        THEN 1 << j ELSE 0 END
      |                   for j in range(0, 8)]) AS BIGINT) AS h
      |  FROM sigs),
      |hist AS (SELECT kind, h, CAST(count(*) AS BIGINT) AS n
      |         FROM hashed GROUP BY kind, h),
      |h0 AS (
      |  SELECT kind, CAST(count(*) AS BIGINT) AS n_buckets,
      |    CAST(sum(n * (n - 1) // 2) AS BIGINT) AS h0_pairs
      |  FROM hist GROUP BY kind),
      |h1 AS (
      |  SELECT a.kind, CAST(sum(a.n * b.n) AS BIGINT) AS h1_pairs
      |  FROM hist a JOIN hist b
      |    ON a.kind = b.kind AND a.h < b.h
      |   AND xor(a.h, b.h) IN (1, 2, 4, 8, 16, 32, 64, 128)
      |  GROUP BY a.kind)
      |SELECT h0.kind, h0.n_buckets, h0.h0_pairs,
      |  coalesce(h1.h1_pairs, 0) AS h1_pairs
      |FROM h0 LEFT JOIN h1 ON h1.kind = h0.kind
      |ORDER BY h0.kind""".stripMargin

  // ------------------------------------------------ KS feature screen

  /** Per-dimension two-sample KS screen between label groups (labels
    * 0–4 vs 5–9): which embedding dimensions actually separate the
    * classes? The feature-selection pass run before training a linear
    * probe. The KS statistic is kept EXACT as the integer
    * `max_t |cnt_A(v ≤ t)·n_B − cnt_B(v ≤ t)·n_A|` over the observed
    * per-dimension value grid (cross-multiplied to avoid division),
    * with `screened` marking the top-8 dimensions (deterministic ties
    * by dimension).
    *
    * Scale shape: values quantize to a BOUNDED domain (≤2001 levels ×
    * 64 dims), so the cumulative windows run over the aggregated
    * (d, v) histogram — ≤128k rows regardless of corpus size — never
    * over raw vectors; the raw pass is one mergeable groupBy. Cross
    * products stay ≪ 2⁶³ for any n (cnt·n ≤ n²; n ≤ 3·10⁹ is safe).
    */
  def embeddingKsScreen(spark: SparkSession, sfDir: String): DataFrame = {
    val q = expr(
      "transform(embedding, x -> cast(round(cast(x as double) * 1000) as long))")
    val base = Tables.embeddingsSpread(spark, sfDir)
      .select(col("label").cast("long").as("label"), q.as("q"))
      .select(col("label"), posexplode(col("q")).as(Seq("d", "v")))
    val hist = base.groupBy(col("d"), col("v"))
      .agg(sum(when(col("label") < 5, 1L).otherwise(0L)).as("ca"),
        sum(when(col("label") >= 5, 1L).otherwise(0L)).as("cb"))
    val totals = hist.groupBy(col("d"))
      .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val cumWin = Window.partitionBy(col("d")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ks = hist
      .withColumn("cuma", sum(col("ca")).over(cumWin))
      .withColumn("cumb", sum(col("cb")).over(cumWin))
      .join(totals, "d")
      .groupBy(col("d"), col("na"), col("nb"))
      .agg(max(abs(col("cuma") * col("nb") - col("cumb") * col("na")))
        .as("ks_scaled"))
    ks.withColumn("ks_rank", row_number().over(
        Window.orderBy(col("ks_scaled").desc, col("d"))))
      .withColumn("screened", col("ks_rank") <= 8)
      .select(col("d").cast("long").as("d"), col("na"), col("nb"),
        col("ks_scaled"), col("ks_rank").cast("long").as("ks_rank"),
        col("screened"))
      .orderBy(col("d"))
  }

  val embeddingKsScreenSql: String =
    """WITH base AS (
      |  SELECT CAST(label AS BIGINT) AS label, d - 1 AS d,
      |    CAST(round(CAST(v AS DOUBLE) * 1000) AS BIGINT) AS v
      |  FROM (SELECT label, unnest(embedding) AS v,
      |          generate_subscripts(embedding, 1) AS d
      |        FROM embeddings)),
      |hist AS (
      |  SELECT d, v,
      |    sum(CASE WHEN label < 5 THEN 1 ELSE 0 END) AS ca,
      |    sum(CASE WHEN label >= 5 THEN 1 ELSE 0 END) AS cb
      |  FROM base GROUP BY d, v),
      |totals AS (
      |  SELECT d, CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
      |  FROM hist GROUP BY d),
      |cum AS (
      |  SELECT d, v,
      |    sum(ca) OVER (PARTITION BY d ORDER BY v
      |                  ROWS UNBOUNDED PRECEDING) AS cuma,
      |    sum(cb) OVER (PARTITION BY d ORDER BY v
      |                  ROWS UNBOUNDED PRECEDING) AS cumb
      |  FROM hist),
      |ks AS (
      |  SELECT c.d, t.na, t.nb,
      |    CAST(max(abs(c.cuma * t.nb - c.cumb * t.na)) AS BIGINT) AS ks_scaled
      |  FROM cum c JOIN totals t USING (d)
      |  GROUP BY c.d, t.na, t.nb),
      |ranked AS (
      |  SELECT *, row_number() OVER (ORDER BY ks_scaled DESC, d) AS ks_rank
      |  FROM ks)
      |SELECT CAST(d AS BIGINT) AS d, na, nb, ks_scaled,
      |  CAST(ks_rank AS BIGINT) AS ks_rank, ks_rank <= 8 AS screened
      |FROM ranked
      |ORDER BY d""".stripMargin

  // ------------------------------------------------ cluster profile

  /** Duplicate-cluster size profile: the distribution of near-dup
    * cluster sizes (from the same lang-blocked 3-gram-Jaccard
    * connected components as `dedup_components`) plus the singleton
    * row, each with its corpus share — the one-page answer to "how
    * duplicated is this corpus, and is the mass in a few giant
    * clusters or many pairs?" that decides between survivor-selection
    * and wholesale source drops.
    *
    * Scale shape: inherits the components machinery (banded candidate
    * join, iterative min-label with checkpoints); everything after is
    * component-count-sized (cluster sizes → a ≤max-size histogram) and
    * the corpus total joins in as a broadcast 1-row aggregate. The
    * final division is of exact integers, in double.
    */
  def dedupClusterProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val pairs = Dedup.ngramJaccardPairs(docs,
      blockCols = Seq("lang"), n = 3, threshold = 0.2)
    val comp = Dedup.connectedComponents(pairs)
    val hist = comp.groupBy(col("lbl")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").cast("long").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
    val dupMass = hist.agg(
      coalesce(sum(col("cluster_size") * col("n_clusters")), lit(0L))
        .as("n_dup"))
    val total = docs.agg(count(lit(1)).as("n_total"))
    val singles = total.crossJoin(broadcast(dupMass))
      .select(lit(1L).as("cluster_size"),
        (col("n_total") - col("n_dup")).as("n_clusters"))
    hist.unionByName(singles)
      .crossJoin(broadcast(total))
      .withColumn("n_docs", col("cluster_size") * col("n_clusters"))
      .withColumn("corpus_share",
        col("n_docs").cast("double") / col("n_total").cast("double"))
      .select(col("cluster_size"), col("n_clusters"), col("n_docs"),
        col("corpus_share"))
      .orderBy(col("cluster_size"))
  }

  val dedupClusterProfileSql: String =
    "WITH RECURSIVE " + TextQueries.gramSimPairsSqlPreamble + """,
      |pairs AS (SELECT id_a, id_b FROM simpairs WHERE jaccard_sim > 0.2),
      |edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION SELECT id_b, id_a FROM pairs),
      |reach(src, lbl) AS (
      |  SELECT src, src FROM (SELECT DISTINCT src FROM edges)
      |  UNION
      |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.src),
      |comp AS (SELECT src, min(lbl) AS lbl FROM reach GROUP BY src),
      |hist AS (
      |  SELECT CAST(sz AS BIGINT) AS cluster_size,
      |    CAST(count(*) AS BIGINT) AS n_clusters
      |  FROM (SELECT lbl, count(*) AS sz FROM comp GROUP BY lbl)
      |  GROUP BY sz),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM documents),
      |dupmass AS (
      |  SELECT CAST(coalesce(sum(cluster_size * n_clusters), 0) AS BIGINT)
      |    AS n_dup FROM hist),
      |uni AS (
      |  SELECT cluster_size, n_clusters FROM hist
      |  UNION ALL
      |  SELECT 1, n_total - n_dup FROM tot, dupmass)
      |SELECT cluster_size, n_clusters,
      |  CAST(cluster_size * n_clusters AS BIGINT) AS n_docs,
      |  CAST(cluster_size * n_clusters AS DOUBLE) / n_total AS corpus_share
      |FROM uni, tot
      |ORDER BY cluster_size""".stripMargin

  // ------------------------------------------------ rank correlation

  /** Spearman rank correlation between daily revenue and daily order
    * count — the monotone-association companion to the Pearson
    * (`corr_exact`) and Kendall (`kendall_tau_daily`) audits. Ranks are
    * deterministically tie-broken by day (mirrored in the oracle), so
    * both rank vectors are permutations and the classic
    * ρ = 1 − 6·Σd² / (n(n²−1)) closed form applies with Σd² an exact
    * integer; the only division is the final one, of identical
    * integers, in double.
    *
    * Scale shape: the windows rank the AGGREGATED day relation (one
    * row per calendar day — bounded domain, not corpus-sized), per the
    * repo's bounded-domain global-window rule; the corpus-sized pass
    * is one mergeable groupBy(day).
    */
  def spearmanDaily(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").as("day"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val rRev = row_number().over(
      Window.orderBy(col("cents"), col("day"))).cast("long")
    val rCnt = row_number().over(
      Window.orderBy(col("n_orders"), col("day"))).cast("long")
    daily
      .withColumn("rr", rRev).withColumn("rc", rCnt)
      .select((col("rr") - col("rc")).as("d"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("d") * col("d")).as("sum_d2"))
      .withColumn("spearman_rho",
        lit(1.0d) - lit(6.0d) * col("sum_d2").cast("double") /
          (col("n_days") * (col("n_days") * col("n_days") - 1L))
            .cast("double"))
      .select(col("n_days"), col("sum_d2"), col("spearman_rho"))
  }

  val spearmanDailySql: String =
    """WITH daily AS (
      |  SELECT o_orderdate AS day, CAST(count(*) AS BIGINT) AS n_orders,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY o_orderdate),
      |ranked AS (
      |  SELECT
      |    CAST(row_number() OVER (ORDER BY cents, day) AS BIGINT) AS rr,
      |    CAST(row_number() OVER (ORDER BY n_orders, day) AS BIGINT) AS rc
      |  FROM daily),
      |s AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_days,
      |    CAST(sum((rr - rc) * (rr - rc)) AS BIGINT) AS sum_d2
      |  FROM ranked)
      |SELECT n_days, sum_d2,
      |  1.0 - 6.0 * CAST(sum_d2 AS DOUBLE)
      |    / CAST(n_days * (n_days * n_days - 1) AS DOUBLE) AS spearman_rho
      |FROM s""".stripMargin

  // ------------------------------------------------ source similarity

  /** Source-pair similarity matrix, sketch-audited: for every pair of
    * the 20 sources, the EXACT word-3-gram-set Jaccard (via the gram
    * posting join — never a source×source set materialization) next to
    * the 16-permutation MinHash ESTIMATE built from per-source merged
    * signatures. The corpus-level view of the doc-level dedup family:
    * at 100 TB the mergeable signatures are what a mixture planner
    * actually ships between clusters (64 B per source), and this query
    * IS the audit that says how much the cheap estimate can be trusted.
    *
    * Determinism: signature slots are `min(md5(j || ':' || gram))` over
    * lowercase-hex strings — identical ASCII ordering in both engines —
    * and the estimate m/16 is an exact binary double.
    *
    * Scale shape: one distinct-(source, gram) shuffle; the signature
    * build explodes ×16 over DISTINCT grams (vocabulary-bounded, not
    * corpus-bounded) into a 20·16-row aggregate; the exact-intersection
    * join is gram-keyed with per-gram fan-out ≤ C(sources, 2) = 190.
    * Nothing is all-pairs over documents.
    */
  def sourceMinhashSimilarity(spark: SparkSession, sfDir: String): DataFrame = {
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val grams = Tables.documents(spark, sfDir)
      .repartition(nPart)
      .select(col("source"),
        explode(Dedup.ngramSet(col("text"), 3)).as("g"))
      .distinct()
      .stableCheckpoint() // two consumers: signature build, exact join
    val sizes = grams.groupBy(col("source")).agg(count(lit(1)).as("sz"))
    val inter = grams.toDF("sa", "g")
      .join(grams.toDF("sb", "g"), "g")
      .filter(col("sa") < col("sb"))
      .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("n_inter"))
    // codegen'd MinHashSignature loop over the 1-gram array ≡ the HOF
    // `transform(sequence(0,15), j -> md5(j || ':' || g))` it replaces
    // (same definition, same hex strings) — the lambda ran INTERPRETED
    // with a 16-string array allocation per gram row
    graft.functions.MinHashSignature.register(spark)
    val sigs = grams
      .select(col("source"), posexplode(
        call_function("minhash_sig", array(col("g")), lit(16)))
        .as(Seq("j", "h")))
      .groupBy(col("source"), col("j")).agg(min(col("h")).as("sig"))
    val est = sigs.toDF("sa", "j", "sig_a")
      .join(sigs.toDF("sb", "j", "sig_b"), "j")
      .filter(col("sa") < col("sb"))
      .groupBy(col("sa"), col("sb"))
      .agg(sum(when(col("sig_a") === col("sig_b"), 1L).otherwise(0L))
        .as("match16"))
    est
      .join(inter, Seq("sa", "sb"), "left")
      .na.fill(0L, Seq("n_inter"))
      .join(sizes.toDF("sa", "sz_a"), "sa")
      .join(sizes.toDF("sb", "sz_b"), "sb")
      .withColumn("n_union", col("sz_a") + col("sz_b") - col("n_inter"))
      .select(col("sa").as("source_a"), col("sb").as("source_b"),
        col("n_inter"), col("n_union"),
        (col("n_inter").cast("double") / col("n_union").cast("double"))
          .as("jaccard_exact"),
        col("match16"),
        (col("match16").cast("double") / lit(16.0d)).as("jaccard_est"))
      .orderBy(col("source_a"), col("source_b"))
  }

  val sourceMinhashSimilaritySql: String =
    """WITH grams AS (
      |  SELECT DISTINCT source,
      |    unnest(list_distinct([array_to_string(t[i:i+2], ' ')
      |      for i in range(1, greatest(len(t) - 2, 1) + 1)])) AS g
      |  FROM (SELECT source,
      |          regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |        FROM documents)),
      |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS sz
      |          FROM grams GROUP BY source),
      |inter AS (
      |  SELECT a.source AS sa, b.source AS sb, CAST(count(*) AS BIGINT) AS ni
      |  FROM grams a JOIN grams b ON a.g = b.g AND a.source < b.source
      |  GROUP BY 1, 2),
      |sigs AS (
      |  SELECT source, j.range AS j,
      |    min(md5(j.range::VARCHAR || ':' || g)) AS sig
      |  FROM grams, range(0, 16) j GROUP BY 1, 2),
      |est AS (
      |  SELECT a.source AS sa, b.source AS sb,
      |    CAST(sum(CASE WHEN a.sig = b.sig THEN 1 ELSE 0 END) AS BIGINT) AS m
      |  FROM sigs a JOIN sigs b ON a.j = b.j AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT e.sa AS source_a, e.sb AS source_b,
      |  coalesce(i.ni, 0) AS n_inter,
      |  x.sz + y.sz - coalesce(i.ni, 0) AS n_union,
      |  CAST(coalesce(i.ni, 0) AS DOUBLE)
      |    / (x.sz + y.sz - coalesce(i.ni, 0)) AS jaccard_exact,
      |  e.m AS match16, CAST(e.m AS DOUBLE) / 16 AS jaccard_est
      |FROM est e
      |LEFT JOIN inter i ON i.sa = e.sa AND i.sb = e.sb
      |JOIN sizes x ON x.source = e.sa
      |JOIN sizes y ON y.source = e.sb
      |ORDER BY source_a, source_b""".stripMargin

  // ------------------------------------------------ clip calibration

  /** Per-dimension quantile-clip calibration for int8 quantization:
    * from the bounded (dim, value) histogram, the exact p1/p99 rank
    * values (the clip range a calibrated quantizer would use instead of
    * the outlier-hostage max|x| that `embed_quantize` models), the
    * count of values that range would clip, and the resulting int8
    * step in fixed point. The calibration pass every serving-side
    * quantizer runs once per embedding model.
    *
    * Exactness: rank thresholds are integer ceilings (rank ≥
    * ceil(n/100) ⇔ cum·100 ≥ n), the quantile VALUE is the first
    * histogram level whose cumulative count crosses the threshold
    * (min-over-qualifying — order-free), and the step is an integer
    * div by 255 of the µ-scaled range. One final double (clip
    * fraction).
    *
    * Scale shape: same as [[embeddingKsScreen]] — one mergeable
    * groupBy builds the ≤(2001·64)-row histogram; every window runs on
    * that bounded domain, never raw vectors; corpus growth only
    * deepens the first aggregate.
    */
  def embeddingClipCalibration(spark: SparkSession, sfDir: String): DataFrame = {
    val q = expr(
      "transform(embedding, x -> cast(round(cast(x as double) * 1000) as long))")
    val hist = Tables.embeddingsSpread(spark, sfDir)
      .select(posexplode(q).as(Seq("d", "v")))
      .groupBy(col("d"), col("v")).agg(count(lit(1)).as("c"))
    val cumWin = Window.partitionBy(col("d")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum(col("c")).over(cumWin))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("d"))))
    // p1 = smallest level with cum*100 >= n; p99 = smallest level with
    // cum*100 >= 99*n (exact integer rank arithmetic, no division)
    val ranges = cum.groupBy(col("d"), col("n"))
      .agg(
        min(when(col("cum") * 100 >= col("n"), col("v"))).as("p1_mu"),
        min(when(col("cum") * 100 >= col("n") * 99, col("v"))).as("p99_mu"))
    val clipped = hist.join(ranges, "d")
      .groupBy(col("d"), col("n"), col("p1_mu"), col("p99_mu"))
      .agg(sum(when(col("v") < col("p1_mu") || col("v") > col("p99_mu"),
        col("c")).otherwise(0L)).as("n_clipped"))
    clipped
      .withColumn("int8_step_mu", expr("(p99_mu - p1_mu) div 255"))
      .withColumn("clip_fraction",
        col("n_clipped").cast("double") / col("n").cast("double"))
      .select(col("d").cast("long").as("d"), col("n"), col("p1_mu"),
        col("p99_mu"), col("n_clipped"), col("int8_step_mu"),
        col("clip_fraction"))
      .orderBy(col("d"))
  }

  val embeddingClipCalibrationSql: String =
    """WITH base AS (
      |  SELECT d - 1 AS d, CAST(round(CAST(v AS DOUBLE) * 1000) AS BIGINT) AS v
      |  FROM (SELECT unnest(embedding) AS v,
      |          generate_subscripts(embedding, 1) AS d
      |        FROM embeddings)),
      |hist AS (SELECT d, v, CAST(count(*) AS BIGINT) AS c
      |         FROM base GROUP BY d, v),
      |cum AS (
      |  SELECT d, v, c,
      |    CAST(sum(c) OVER (PARTITION BY d ORDER BY v
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |    CAST(sum(c) OVER (PARTITION BY d) AS BIGINT) AS n
      |  FROM hist),
      |ranges AS (
      |  SELECT d, n,
      |    min(CASE WHEN cum * 100 >= n THEN v END) AS p1_mu,
      |    min(CASE WHEN cum * 100 >= n * 99 THEN v END) AS p99_mu
      |  FROM cum GROUP BY d, n),
      |clipped AS (
      |  SELECT h.d, r.n, r.p1_mu, r.p99_mu,
      |    CAST(sum(CASE WHEN h.v < r.p1_mu OR h.v > r.p99_mu
      |                  THEN h.c ELSE 0 END) AS BIGINT) AS n_clipped
      |  FROM hist h JOIN ranges r USING (d)
      |  GROUP BY h.d, r.n, r.p1_mu, r.p99_mu)
      |SELECT CAST(d AS BIGINT) AS d, n, p1_mu, p99_mu, n_clipped,
      |  (p99_mu - p1_mu) // 255 AS int8_step_mu,
      |  CAST(n_clipped AS DOUBLE) / CAST(n AS DOUBLE) AS clip_fraction
      |FROM clipped
      |ORDER BY d""".stripMargin

  // ------------------------------------------------ covariance drift

  private val D = 64

  /** Pairwise per-label covariance drift: the Frobenius norm² of the
    * integer-quantized NORMALIZED scatter difference
    * `Σ_{d≤e} w·(|S_a[d,e]·n_b² − S_b[d,e]·n_a²| div (n_a·n_b)²)²`
    * (w = 2 off-diagonal — Frobenius counts both triangles).
    * `S[d,e]/n² ` is the per-pair covariance in milli-unit² quanta, so
    * the emitted statistic is SCALE-FREE in the label counts — its
    * magnitude is bounded by the embedding value range, not the corpus
    * size. Class-separation (`embedding_class_separation`) compares
    * label MEANS; this compares label SHAPES — two classes with
    * identical centroids but different covariance still drift apart
    * here (the check run before pooling sources or reusing a whitening
    * transform across labels).
    *
    * Exactness + dynamic range (r11 fix): the original emission
    * `Σ w·(S_a·n_b − S_b·n_a)² div 10¹²` GREW as n⁶ and silently
    * wrapped int64 at the ×100 stress scale (n≈2·10⁴/label produced
    * NEGATIVE drift values via the non-ANSI decimal→long cast, while
    * the DuckDB oracle failed loudly on the same INT128→INT64 cast).
    * The normalized form computes everything in exact integers —
    * scatter entries and the cross-scaled numerator in DECIMAL(38,0)
    * (DuckDB HUGEINT), the quotient via integral `div` on an abs()'d
    * numerator (identical truncation in both engines) — and its
    * ceilings are embedding-range-bound, not corpus-bound:
    * numerator |S·n²| ≤ q_max²·n⁴ holds in 38 digits to n ≈ 2·10⁸ per
    * label, and the emitted sum ≤ 2·2080·(2·q_max²)² fits int64 for
    * |x| ≲ 30 (unit-normalized embeddings are |x| ≤ 1). Verified
    * hash-exact vs the oracle at gate scale AND ×100.
    * Scale shape: ONE pass builds all 10 scatter matrices (per-row
    * upper-triangle product array → (label, d, e)-keyed mergeable
    * aggregate, ≤ label·2080 keys); the pairwise stage joins 10·2080
    * tiny rows. Same aggregate-big/solve-tiny split as
    * `embedding_scatter_spectrum`.
    */
  def embeddingCovarianceDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val q = expr(
      "transform(embedding, x -> cast(round(cast(x as double) * 1000) as long))")
    val base = Tables.embeddingsSpread(spark, sfDir)
      .select(col("label").cast("long").as("label"), q.as("q"))
      .stableCheckpoint() // two consumers: counts+dim sums, cross moments
    val counts = base.groupBy(col("label")).agg(count(lit(1)).as("n"))
    val dims = base
      .select(col("label"), posexplode(col("q")).as(Seq("d", "v")))
      .groupBy(col("label"), col("d")).agg(sum(col("v")).as("s"))
    val cross = base
      .select(col("label"), explode(expr(
        s"flatten(transform(sequence(0, ${D - 1}), d -> " +
          s"transform(sequence(d, ${D - 1}), e -> " +
          "struct(d, e, q[d] * q[e] as p))))")).as("t"))
      .select(col("label"), col("t.d").as("d"), col("t.e").as("e"),
        col("t.p").as("p"))
      .groupBy(col("label"), col("d"), col("e")).agg(sum(col("p")).as("sp"))
    // the (label,d,e)-keyed joins below carry ≤ 10·2080 rows — the wide
    // DECIMAL arithmetic is driver-trivial; the corpus pass above stays
    // in long.
    val dec = "decimal(38,0)"
    val scatter = cross
      .join(counts, "label")
      .join(dims.toDF("label", "d", "sd"), Seq("label", "d"))
      .join(dims.toDF("label", "e", "se"), Seq("label", "e"))
      .select(col("label"), col("n"), col("d"), col("e"),
        (col("n").cast(dec) * col("sp") - col("sd").cast(dec) * col("se"))
          .as("scat"))
    val a = scatter.toDF("label_a", "n_a", "d", "e", "scat_a")
    val b = scatter.toDF("label_b", "n_b", "d", "e", "scat_b")
    a.join(b, Seq("d", "e")).filter(col("label_a") < col("label_b"))
      // |S_a·n_b² − S_b·n_a²| div (n_a·n_b)²: the integer-truncated
      // normalized scatter difference — `div` (IntegralDivide) emits
      // LONG; abs() first so truncation direction matches DuckDB's `//`
      // on positives regardless of sign convention.
      .withColumn("qt", expr(
        "abs(scat_a * cast(n_b as decimal(38,0)) * n_b" +
          " - scat_b * cast(n_a as decimal(38,0)) * n_a)" +
          " div (cast(n_a as decimal(38,0)) * n_a * n_b * n_b)"))
      .withColumn("term",
        col("qt") * col("qt") *
          when(col("d") === col("e"), lit(1)).otherwise(lit(2)))
      .groupBy(col("label_a"), col("label_b"), col("n_a"), col("n_b"))
      .agg(sum(col("term")).as("drift_norm_e12"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        col("drift_norm_e12"))
      .orderBy(col("label_a"), col("label_b"))
  }

  val embeddingCovarianceDriftSql: String =
    """WITH base AS (
      |  SELECT CAST(label AS BIGINT) AS label,
      |    [CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)
      |     for x in embedding] AS q
      |  FROM embeddings),
      |counts AS (SELECT label, CAST(count(*) AS BIGINT) AS n
      |           FROM base GROUP BY label),
      |dims AS (
      |  SELECT label, d - 1 AS d, CAST(sum(v) AS BIGINT) AS s
      |  FROM (SELECT label, unnest(q) AS v, generate_subscripts(q, 1) AS d
      |        FROM base)
      |  GROUP BY label, d),
      |cross_m AS (
      |  SELECT label, dd.range AS d, ee.range AS e,
      |    CAST(sum(q[dd.range + 1] * q[ee.range + 1]) AS BIGINT) AS sp
      |  FROM base, range(0, 64) dd, range(0, 64) ee
      |  WHERE ee.range >= dd.range
      |  GROUP BY label, dd.range, ee.range),
      |scatter AS (
      |  SELECT c.label, n.n, c.d, c.e,
      |    n.n::HUGEINT * c.sp - sd.s::HUGEINT * se.s AS scat
      |  FROM cross_m c
      |  JOIN counts n ON n.label = c.label
      |  JOIN dims sd ON sd.label = c.label AND sd.d = c.d
      |  JOIN dims se ON se.label = c.label AND se.d = c.e),
      |quot AS (
      |  SELECT a.label AS label_a, b.label AS label_b,
      |    a.n AS n_a, b.n AS n_b, a.d AS d, a.e AS e,
      |    abs(a.scat * b.n::HUGEINT * b.n - b.scat * a.n::HUGEINT * a.n)
      |      // (a.n::HUGEINT * a.n * b.n * b.n) AS qt
      |  FROM scatter a JOIN scatter b ON a.d = b.d AND a.e = b.e
      |  WHERE a.label < b.label)
      |SELECT label_a, label_b, n_a, n_b,
      |  CAST(sum(qt * qt * (CASE WHEN d = e THEN 1 ELSE 2 END))
      |       AS BIGINT) AS drift_norm_e12
      |FROM quot
      |GROUP BY label_a, label_b, n_a, n_b
      |ORDER BY label_a, label_b""".stripMargin
}
