package graft.queries

import graft.Checkpoints.StableCheckpoint
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.{Dedup, TextFunctions}

/** Ingestion-time operators: incremental near-dup detection of a new
  * batch against the historical corpus, catalog statistics collection,
  * and mixture-proportioned sampling across sources.
  */
object IngestQueries {

  /** Incremental MinHash dedup: which NEW documents (doc_id % 7 == 0, the
    * arriving batch) near-duplicate any HISTORY document. The asymmetric
    * version of `dedup_minhash_lsh`: both sides band identically, but the
    * join probes new→history on (band, bucket) — at 100 TB the history's
    * banded index is the stored state and each arriving batch only
    * shuffles ITS bands against it, never re-pairing history with itself
    * (the within-history pair space is the expensive part a full dedup
    * pays; an ingest pipeline pays only the cross term).
    */
  def dedupIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val k = 16; val bandCount = 2; val rowsPerBand = 8
    val par = spark.sparkContext.defaultParallelism
    val sigs = Tables.documents(spark, sfDir)
      .select(col("doc_id").as("id"), col("text"))
      // repartition BEFORE tokenizing: the one-row-group scan is 1 task,
      // and tokenize+minhash is the query's CPU bill — spread raw text,
      // then compute wide
      .repartition(par)
      .select(col("id"), TextFunctions.tokens(col("text")).as("toks"))
      .select(col("id"),
        Dedup.minhashSignatureOfTokens(col("toks"), k).as("sig"))
      .stableCheckpoint()
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(Dedup.lshBuckets(col("sig"), bandCount, rowsPerBand))
        .as(Seq("b", "bucket")))
    val newSide = banded.filter(col("id") % 7 === 0)
      .select(col("id").as("id_new"), col("sig").as("sig_new"),
        col("b"), col("bucket"))
    val histSide = banded.filter(col("id") % 7 =!= 0)
      .select(col("id").as("id_hist"), col("sig").as("sig_hist"),
        col("b"), col("bucket"))
    val matches = (0 until k).map(i =>
      when(element_at(col("sig_new"), i + 1) === element_at(col("sig_hist"), i + 1), 1)
        .otherwise(0)).reduce(_ + _)
    newSide.join(histSide, Seq("b", "bucket"))
      .select(col("id_new"), col("id_hist"),
        (matches / lit(16.0)).as("est_jaccard"))
      .distinct()
      .orderBy(col("id_new"), col("id_hist"))
  }

  val dedupIncrementalSql: String =
    """WITH toks AS (
      |  SELECT doc_id AS id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |  FROM documents
      |), sigs AS (
      |  SELECT id, [list_min([md5(s::VARCHAR || ':' || x) for x in t])
      |              for s in range(0, 16)] AS sig
      |  FROM toks
      |), bands AS (
      |  SELECT id, sig, b, md5(array_to_string(sig[b*8+1:b*8+8], '|')) AS bucket
      |  FROM sigs, range(0, 2) r(b)
      |)
      |SELECT DISTINCT n.id AS id_new, h.id AS id_hist,
      |  len(list_filter(range(1, 17), i -> n.sig[i] = h.sig[i])) / 16.0
      |    AS est_jaccard
      |FROM bands n JOIN bands h ON n.b = h.b AND n.bucket = h.bucket
      |WHERE n.id % 7 = 0 AND h.id % 7 <> 0
      |ORDER BY id_new, id_hist""".stripMargin

  /** ANALYZE-style catalog statistics: per (table, column) row count,
    * null count and exact distinct count — the numbers a cost-based
    * optimizer feeds on. Each table contributes one scan with
    * count_distinct per column (map-side partials); emitted long-form so
    * new columns are rows, not schema changes.
    */
  def tableStats(spark: SparkSession, sfDir: String): DataFrame = {
    def stats(table: String, df: DataFrame, cols: Seq[String]): DataFrame = {
      val aggs = count(lit(1)).as("__n") +:
        cols.flatMap(c => Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
          countDistinct(col(c)).as(s"__ndv_$c")))
      // ONE consumer of the one-row aggregate: explode a struct per
      // column instead of unioning three re-projections (the union
      // shape needed an eager checkpoint per table — three extra
      // driver round-trips — to keep the branches from re-running the
      // whole-table aggregate)
      df.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(cols.map(c =>
          struct(lit(table).as("table_name"), lit(c).as("column_name"),
            col("__n").as("n_rows"), col(s"__nulls_$c").as("n_nulls"),
            col(s"__ndv_$c").as("ndv"))): _*)).as("s"))
        .select(col("s.*"))
    }
    stats("orders", Tables.orders(spark, sfDir),
        Seq("o_custkey", "o_orderpriority", "o_orderstatus"))
      .unionByName(stats("lineitem", Tables.lineitem(spark, sfDir),
        Seq("l_partkey", "l_suppkey", "l_returnflag")))
      .unionByName(stats("customer", Tables.customer(spark, sfDir),
        Seq("c_mktsegment", "c_nationkey")))
      .orderBy(col("table_name"), col("column_name"))
  }

  val tableStatsSql: String = {
    def block(table: String, cols: Seq[String]): String =
      cols.map { c =>
        s"""SELECT '$table' AS table_name, '$c' AS column_name,
           |  (SELECT count(*) FROM $table) AS n_rows,
           |  (SELECT CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |   FROM $table) AS n_nulls,
           |  (SELECT count(DISTINCT $c) FROM $table) AS ndv""".stripMargin
      }.mkString("\nUNION ALL\n")
    Seq(
      block("orders", Seq("o_custkey", "o_orderpriority", "o_orderstatus")),
      block("lineitem", Seq("l_partkey", "l_suppkey", "l_returnflag")),
      block("customer", Seq("c_mktsegment", "c_nationkey")))
      .mkString("", "\nUNION ALL\n", "\nORDER BY table_name, column_name")
  }

  /** Mixture-proportioned sampling: per-source keep rates (parts per
    * million) applied via the deterministic md5 hash — the
    * training-mixture step that reweights sources (here: even sources
    * kept at 75%, odd at 25%). Map-only; the audit emits target vs
    * achieved ppm in exact integer arithmetic.
    */
  def mixtureSample(spark: SparkSession, sfDir: String): DataFrame = {
    // try_cast: an unexpected source name (not 'src<N>') must land in the
    // default 25% bucket, not throw under ANSI mode — NULL % 2 is NULL,
    // which falls through to the ELSE arm in both engines.
    val targetPpm = expr(
      "case when try_cast(substring(source, 4) as int) % 2 = 0" +
        " then 750000L else 250000L end")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        targetPpm.as("target_ppm"),
        expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10)" +
          " as bigint) % 1000000").as("h"))
      .groupBy(col("source"), col("target_ppm"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("h") < col("target_ppm"), 1L).otherwise(0L)).as("n_kept"))
      .select(col("source"), col("target_ppm"), col("n_total"), col("n_kept"),
        expr("(n_kept * 1000000L) div n_total").as("achieved_ppm"))
      .orderBy(col("source"))
  }

  val mixtureSampleSql: String =
    """WITH assigned AS (
      |  SELECT doc_id, source,
      |    CASE WHEN TRY_CAST(substr(source, 4) AS INTEGER) % 2 = 0
      |         THEN 750000 ELSE 250000 END AS target_ppm,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000
      |      AS h
      |  FROM documents)
      |SELECT source, CAST(target_ppm AS BIGINT) AS target_ppm,
      |  count(*) AS n_total,
      |  CAST(sum(CASE WHEN h < target_ppm THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_kept,
      |  (CAST(sum(CASE WHEN h < target_ppm THEN 1 ELSE 0 END) AS BIGINT)
      |    * 1000000) // count(*) AS achieved_ppm
      |FROM assigned
      |GROUP BY source, target_ppm
      |ORDER BY source""".stripMargin

  /** Incremental view maintenance: the daily (day, event_type) rollup is
    * kept as a partial-aggregate STATE (counts + exact cent sums — all
    * combinable), and an arriving delta (days ≥ 2024-01-21 here) merges
    * by union + re-aggregation of the partials, never by re-scanning the
    * base. The emitted merged state hash-matching the oracle's full
    * recompute IS the IVM correctness proof: merge(state, agg(delta)) ≡
    * agg(base ∪ delta). At production scale the merge writes only the
    * delta's affected (day, type) partitions (partition overwrite); avg
    * rides along derived from the combinable sums at read time.
    */
  def incrementalRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(to_date(col("ts")).as("day"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
    def rollup(df: DataFrame): DataFrame =
      df.groupBy(col("day"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("value_cents"))
    val state = rollup(ev.filter(col("day") < lit("2024-01-21").cast("date")))
    val delta = rollup(ev.filter(col("day") >= lit("2024-01-21").cast("date")))
    state.unionByName(delta)
      .groupBy(col("day"), col("event_type"))
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("value_cents")).as("value_cents"))
      .orderBy(col("day"), col("event_type"))
  }

  val incrementalRollupSql: String =
    """SELECT CAST(ts AS DATE) AS day, event_type,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
      |    AS value_cents
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY day, event_type""".stripMargin
}
