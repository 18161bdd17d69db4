package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Checkpoints.StableCheckpoint
import graft.Tables
import graft.text.TextFunctions

/** Multi-round BPE tokenizer TRAINING on-cluster — the iterative
  * successor to the single `bpe_merge_step` probe: five full merge
  * rounds with the real BPE semantics (count adjacent symbol pairs
  * weighted by word frequency → adopt the globally most frequent pair
  * → rewrite every word's symbol sequence merging LEFTMOST-FIRST,
  * non-overlapping → repeat). Emits the learned merge table: one row
  * per round with the adopted pair, its frequency at adoption time,
  * and the corpus-wide symbol count after the rewrite — the
  * convergence curve a tokenizer build monitors.
  *
  * Scale shape: state between rounds is the (word, pos, symbol)
  * sequence relation — checkpointed each round (synchronous-iteration
  * discipline, same as pagerank/kcore) and explicitly repartitioned on
  * the word key so every window and rewrite is word-local (the
  * alphabet-sized pair count is the only global aggregate, and the
  * adopted pair is a 1-row statistic the driver embeds as a literal in
  * the next round's plan — aggregate big, solve tiny). Leftmost-first
  * overlap resolution (only binding when a pair is a self-pair like
  * (a,a) inside a run "aaa…") is gaps-and-islands over match
  * positions: islands of consecutive matches keep every other
  * position from the island start — pure keyed windows, no per-row
  * Scala anywhere.
  *
  * The oracle replays ALL five rounds in SQL (generated unrolled CTE
  * chain, one MATERIALIZED block per round with the same windows), so
  * the gate hash proves the full training trajectory — rules, counts
  * and rewritten corpus sizes — identical across engines.
  */
object BpeTrainer {

  def bpeTrainRounds(spark: SparkSession, sfDir: String): DataFrame = {
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val wWin = Window.partitionBy(col("w")).orderBy(col("pos"))
    val words = Tables.documents(spark, sfDir)
      .select(explode(TextFunctions.tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .repartition(nPart, col("w"))
    var seq = words.select(col("w"), col("freq"),
      posexplode(expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
        .as(Seq("pos", "sym")))
      .stableCheckpointLazy() // round 1's stats action materializes

    // r19 action fusion: the end-of-round symbol count and the NEXT
    // round's most-frequent-pair argmax both scan the same rewritten
    // sequence, so one aggregation answers both — the per-pair counts
    // keep the nxt-NULL word tails as their own groups purely so
    // Σcnt = |seq|, and the argmax skips them via min_by's documented
    // null-ordering skip. min(struct(-pf, a, b)) IS the old
    // `ORDER BY pf DESC, a, b LIMIT 1` winner (strictly identical
    // lexicographic tie-break; probed incl. ties and the all-NULL
    // degenerate corpus). 3 driver actions per round drop to 2.
    def pairStatsAndCount(s: DataFrame): (Option[(String, String, Long)], Long) = {
      val row = s
        .withColumn("nxt", lead(col("sym"), 1).over(wWin))
        .groupBy(col("sym").as("a"), col("nxt").as("b"))
        .agg(sum(col("freq")).as("pf"), count(lit(1)).as("cnt"))
        .agg(
          sum(col("cnt")).as("n_symbols"),
          min_by(struct(col("a"), col("b"), col("pf")),
            when(col("b").isNotNull,
              struct((-col("pf")).as("npf"), col("a"), col("b")))).as("top"))
        .collect().head
      val top = Option(row.getStruct(1)).map(t =>
        (t.getString(0), t.getString(1), t.getLong(2)))
      // a corpus whose words all reduce to single symbols leaves the
      // pair argmax NULL — emit the rounds trained so far instead of
      // failing (can't happen on this corpus, but the trainer shouldn't
      // be input-brittle)
      (top, if (row.isNullAt(0)) 0L else row.getLong(0))
    }

    val out = Seq.newBuilder[(Long, String, String, Long, Long)]
    var topOpt = pairStatsAndCount(seq)._1
    for (round <- 1L to 5L if topOpt.nonEmpty) {
      val (pa, pb, pf) = topOpt.get
      // leftmost-first non-overlapping merge positions: islands of
      // consecutive matches keep offsets 0, 2, 4, … from the island start
      val marked = seq
        .withColumn("nxt", lead(col("sym"), 1).over(wWin))
        .withColumn("m", col("sym") === lit(pa) && col("nxt") === lit(pb))
      val kept = marked.filter(col("m"))
        .withColumn("k", row_number().over(wWin))
        .withColumn("island", col("pos") - col("k"))
        .withColumn("start", min(col("pos")).over(
          Window.partitionBy(col("w"), col("island"))))
        .filter((col("pos") - col("start")) % 2 === 0)
        .select(col("w"), col("pos").as("mpos"))
      // EAGER on purpose: two sibling probes consume this in one plan,
      // and a lazy mark let their build sides race to compute it twice
      // (measured +0.8 s); materializing once upfront is cheaper.
      val keptCk = kept.stableCheckpoint() // two probes below
      seq = marked
        .join(keptCk.select(col("w"), col("mpos").as("pos"),
          lit(true).as("is_merge")), Seq("w", "pos"), "left_outer")
        .join(keptCk.select(col("w"), (col("mpos") + 1).as("pos"),
          lit(true).as("dropped")), Seq("w", "pos"), "left_outer")
        .filter(col("dropped").isNull)
        .withColumn("sym",
          when(col("is_merge"), concat(lit(pa), lit(pb))).otherwise(col("sym")))
        .withColumn("pos", row_number().over(wWin).cast("long") - 1)
        .select(col("w"), col("freq"), col("pos"), col("sym"))
        .repartition(nPart, col("w"))
        .stableCheckpointLazy()
      // ONE action closes the round: materializes the rewritten seq's
      // lazy checkpoint, reads its symbol count for THIS row, and hands
      // the argmax to the NEXT round
      val (nextTop, nSymbols) = pairStatsAndCount(seq)
      out += ((round, pa, pb, pf, nSymbols))
      topOpt = if (round < 5L) nextTop else None
    }
    import spark.implicits._
    out.result().toDF("round", "pair_a", "pair_b", "pair_freq",
      "n_symbols_after")
  }

  /** One unrolled SQL round: seq{r-1} → rule{r} + seq{r}. */
  private def roundSql(r: Int): String = {
    val p = r - 1
    s"""pairs$r AS MATERIALIZED (
       |  SELECT sym AS a, lead(sym) OVER (PARTITION BY w ORDER BY pos) AS b,
       |    freq
       |  FROM seq$p),
       |rule$r AS MATERIALIZED (
       |  SELECT a, b, CAST(sum(freq) AS BIGINT) AS pf
       |  FROM pairs$r WHERE b IS NOT NULL
       |  GROUP BY a, b ORDER BY pf DESC, a, b LIMIT 1),
       |marked$r AS MATERIALIZED (
       |  SELECT s.w, s.freq, s.pos, s.sym,
       |    (s.sym = (SELECT a FROM rule$r) AND
       |     lead(s.sym) OVER (PARTITION BY s.w ORDER BY s.pos)
       |       = (SELECT b FROM rule$r)) AS m
       |  FROM seq$p s),
       |kept$r AS MATERIALIZED (
       |  SELECT w, pos FROM (
       |    SELECT w, pos,
       |      min(pos) OVER (PARTITION BY w, island) AS start
       |    FROM (
       |      SELECT w, pos,
       |        pos - row_number() OVER (PARTITION BY w ORDER BY pos)
       |          AS island
       |      FROM marked$r WHERE m))
       |  WHERE (pos - start) % 2 = 0),
       |seq$r AS MATERIALIZED (
       |  SELECT w, freq,
       |    row_number() OVER (PARTITION BY w ORDER BY pos) - 1 AS pos,
       |    CASE WHEN is_merge
       |      THEN (SELECT a FROM rule$r) || (SELECT b FROM rule$r)
       |      ELSE sym END AS sym
       |  FROM (
       |    SELECT mk.w, mk.freq, mk.pos, mk.sym,
       |      EXISTS (SELECT 1 FROM kept$r k
       |        WHERE k.w = mk.w AND k.pos = mk.pos) AS is_merge
       |    FROM marked$r mk
       |    WHERE NOT EXISTS (SELECT 1 FROM kept$r k2
       |      WHERE k2.w = mk.w AND k2.pos + 1 = mk.pos)))""".stripMargin
  }

  val bpeTrainRoundsSql: String = {
    val rounds = (1 to 5).map(roundSql).mkString(",\n")
    val rows = (1 to 5).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS round,
         |  (SELECT a FROM rule$r) AS pair_a, (SELECT b FROM rule$r) AS pair_b,
         |  (SELECT pf FROM rule$r) AS pair_freq,
         |  (SELECT CAST(count(*) AS BIGINT) FROM seq$r) AS n_symbols_after"""
        .stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH tok AS MATERIALIZED (
       |  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
       |  FROM documents),
       |words AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS freq
       |  FROM tok WHERE length(w) >= 2 GROUP BY w),
       |seq0 AS MATERIALIZED (
       |  SELECT w, freq, CAST(i - 1 AS BIGINT) AS pos,
       |    substr(w, CAST(i AS INTEGER), 1) AS sym
       |  FROM (SELECT w, freq, unnest(generate_series(1, length(w))) AS i
       |        FROM words)),
       |$rounds
       |$rows
       |ORDER BY round""".stripMargin
  }
}
