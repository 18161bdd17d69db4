package graft.queries

import graft.Checkpoints.StableCheckpoint
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.CountMinAggregator
import graft.text.TextFunctions

/** Third corpus-operator batch: a gated Count-Min sketch probe, the first
  * BPE merge step (the inner loop of tokenizer training), and a k-NN
  * document graph over shared n-grams (the neighborhood structure behind
  * clustering / semantic-dedup passes).
  */
object CorpusThird {

  /** Count-Min sketch over the whole token stream, probed for ten fixed
    * tokens and compared to their exact counts. One mergeable aggregate
    * builds the 4×256 counter array (map-side combine; constant memory no
    * matter the corpus size); the probe is a broadcast of that single row
    * against a literal probe list, with the min-of-four-counters lookup
    * in plain codegen'd `element_at`/`least` — no HOFs. The exact counts
    * ride the same scan via a conditional aggregation, so the CMS
    * overestimate property is visible right in the gated output.
    */
  def sketchCountmin(spark: SparkSession, sfDir: String): DataFrame = {
    val probeList = Seq("the", "of", "and", "to", "a",
      "in", "is", "for", "on", "with")
    val toks = Tables.documents(spark, sfDir)
      .select(explode(TextFunctions.tokens(col("text"))).as("t"))
    val agg = toks.agg(
      CountMinAggregator.cmSketch(col("t")).as("cms"),
      // exact counts for the probes, off the same scan
      map_from_arrays(
        typedLit(probeList),
        array(probeList.map(p =>
          sum(when(col("t") === p, 1L).otherwise(0L))): _*)).as("exact"))
    val probes = spark.range(1).select(
      explode(typedLit(probeList)).as("token"))
    def bucketAt(j: Int): Column =
      (lit(j * CountMinAggregator.W) +
        conv(substring(md5(concat(lit(s"$j:"), col("token"))), 1, 15),
          16, 10).cast("long") % CountMinAggregator.W + 1).cast("int")
    probes.crossJoin(broadcast(agg))
      .select(col("token"),
        least((0 until CountMinAggregator.D).map(j =>
          element_at(col("cms"), bucketAt(j))): _*).as("cm_estimate"),
        coalesce(element_at(col("exact"), col("token")), lit(0L))
          .as("exact_cnt"))
      .orderBy(col("token"))
  }

  val sketchCountminSql: String = {
    val probes = Seq("the", "of", "and", "to", "a",
      "in", "is", "for", "on", "with")
      .map(p => s"'$p'").mkString(", ")
    s"""WITH tok AS (
       |  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t
       |  FROM documents),
       |seeds AS (SELECT unnest([0, 1, 2, 3]) AS j),
       |buck AS (
       |  SELECT j,
       |    ('0x' || substr(md5(j::VARCHAR || ':' || t), 1, 15))::BIGINT % 256 AS b,
       |    count(*) AS c
       |  FROM tok, seeds GROUP BY 1, 2),
       |probes AS (SELECT unnest([$probes]) AS token),
       |addr AS (
       |  SELECT p.token, s.j,
       |    ('0x' || substr(md5(s.j::VARCHAR || ':' || p.token), 1, 15))::BIGINT
       |      % 256 AS pb
       |  FROM probes p, seeds s),
       |est AS (
       |  SELECT a.token, CAST(min(COALESCE(bu.c, 0)) AS BIGINT) AS cm_estimate
       |  FROM addr a LEFT JOIN buck bu ON bu.j = a.j AND bu.b = a.pb
       |  GROUP BY 1),
       |exact AS (
       |  SELECT p.token,
       |    CAST(count(t.t) AS BIGINT) AS exact_cnt
       |  FROM probes p LEFT JOIN tok t ON t.t = p.token GROUP BY 1)
       |SELECT est.token, est.cm_estimate, exact.exact_cnt
       |FROM est JOIN exact USING (token) ORDER BY token""".stripMargin
  }

  /** One BPE merge step: the adjacent character-pair frequencies over the
    * word-frequency table — the statistic a tokenizer trainer recomputes
    * every merge iteration. Aggregating words FIRST means the (expensive)
    * pair explosion runs over |vocab| rows, not |corpus| tokens — the same
    * rewrite that makes BPE training feasible at 100 TB (vocab grows
    * sublinearly). Emits the top 20 merge candidates.
    */
  def bpeMergeStep(spark: SparkSession, sfDir: String): DataFrame = {
    val words = Tables.documents(spark, sfDir)
      .select(explode(TextFunctions.tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    words
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"), col("freq"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("pair_freq"))
      .orderBy(col("pair_freq").desc, col("pair"))
      .limit(20)
  }

  val bpeMergeStepSql: String =
    """WITH tok AS (
      |  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
      |  FROM documents),
      |words AS (
      |  SELECT w, count(*) AS freq FROM tok WHERE length(w) >= 2 GROUP BY 1),
      |pairs AS (
      |  SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, freq
      |  FROM (SELECT w, freq,
      |          unnest(generate_series(1, length(w) - 1)) AS i
      |        FROM words))
      |SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_freq
      |FROM pairs GROUP BY 1
      |ORDER BY pair_freq DESC, pair LIMIT 20""".stripMargin

  /** k-nearest-neighbor document graph by shared RARE word-3-gram count:
    * an inverted index (gram → postings) self-joined on the gram key, so
    * the work is Σ posting-list² — never the all-pairs n². Grams held by
    * more than 10% of documents are dropped first (df·10 > n_docs): a
    * stop-gram shared by every document would otherwise pair the whole
    * corpus through one key (the same unguarded-quadratic class as a hot
    * market basket), and ubiquitous grams carry no neighbor signal — the
    * standard stop-term prune every inverted index applies. The per-doc
    * top-3 is a rank window that Spark 4 plans as native WindowGroupLimit
    * (partial top-k before the shuffle). Grams here are hashed to 64-bit
    * longs for join-key compactness; the string-gram oracle sees identical
    * counts modulo ~1e-18 collision odds.
    */
  def knnGraphGrams(spark: SparkSession, sfDir: String): DataFrame = {
    val spread = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      // NUMBERED repartition: without the explicit count AQE coalesces
      // this exchange to 1 partition (input is <1 MB of bytes) and the
      // gram explosion below single-threads
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt,
        col("doc_id"))
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
    val nDocs = Tables.documents(spark, sfDir).agg(count(lit(1)).as("n_docs"))
    val postings = spread
      .select(col("doc_id"), explode(graft.text.Dedup.ngramSetOfTokens(
        col("toks"), 3)).as("gram"))
      .select(col("doc_id"),
        conv(substring(md5(col("gram")), 1, 15), 16, 10).cast("long").as("g"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("g"))))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") * 10 <= col("n_docs"))
      .select(col("doc_id"), col("g"))
      // NUMBERED repartition on the join key before the checkpoint: the
      // window's exchange gets AQE-coalesced to ~3 partitions (small
      // bytes), and the checkpoint would freeze that — leaving the
      // posting self-join's pair explosion on 3 tasks. Pinning g-keyed
      // partitions here keeps the explosion wide
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt,
        col("g"))
      .stableCheckpoint() // both self-join sides read stored partitions
    val shared = postings.toDF("a", "g")
      .join(postings.toDF("b", "g"), Seq("g"))
      .filter(col("a") =!= col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("shared"))
    val rank = Window.partitionBy(col("a"))
      .orderBy(col("shared").desc, col("b"))
    shared
      .withColumn("rnk", row_number().over(rank))
      .filter(col("rnk") <= 3)
      .select(col("a").as("doc_id"), col("b").as("neighbor_id"),
        col("shared"), col("rnk").cast("long").as("rnk"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  val knnGraphGramsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |  FROM documents),
      |grams0 AS (
      |  SELECT DISTINCT doc_id,
      |    array_to_string(t[CAST(i AS INTEGER):CAST(i + 2 AS INTEGER)], ' ') AS gram
      |  FROM (SELECT doc_id, t,
      |          unnest(generate_series(1, greatest(len(t) - 2, 1))) AS i
      |        FROM toks)),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |grams AS (
      |  SELECT doc_id, gram FROM grams0, n
      |  QUALIFY count(*) OVER (PARTITION BY gram) * 10 <= n_docs),
      |shared AS (
      |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS shared
      |  FROM grams x JOIN grams y ON x.gram = y.gram AND x.doc_id <> y.doc_id
      |  GROUP BY 1, 2),
      |ranked AS (
      |  SELECT a, b, shared, row_number() OVER (
      |    PARTITION BY a ORDER BY shared DESC, b) AS rnk
      |  FROM shared)
      |SELECT a AS doc_id, b AS neighbor_id, CAST(shared AS BIGINT) AS shared,
      |  CAST(rnk AS BIGINT) AS rnk
      |FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin
}
