package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Storage-layout observability: zone-map (block min/max) statistics and
  * the pruning decisions a scan planner would take from them. Companion
  * to the layout queries `zorder_key`, `compaction_bins`, `table_stats`.
  */
object StorageOps {

  /** Zone-map pruning audit over a month-clustered lineitem layout: for
    * each ship-month "block", the min/max of the clustered column
    * (l_shipdate) AND of an unclustered one (l_orderkey), plus whether a
    * planner consulting only those zone maps could skip the block for
    * (a) a date predicate `l_shipdate >= 1997-06-01` and (b) an orderkey
    * predicate `l_orderkey < 2000`. The output shows the whole lesson of
    * zone maps in one table: the clustered column's blocks prune exactly
    * (skip ⟺ month before the cutoff) while the random column's min/max
    * straddle every block, pruning nothing — WHY `zorder_key` exists.
    * One scan + one small groupBy; at 100 TB these stats come from
    * parquet footers, and this query IS the footer aggregation.
    */
  def zoneMapPruning(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .select(
        ((year(col("l_shipdate")) - 1992) * 12 + month(col("l_shipdate")) - 1)
          .cast("long").as("blk"),
        col("l_shipdate"), col("l_orderkey"))
      .groupBy(col("blk"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"),
        min(col("l_orderkey")).as("min_okey"),
        max(col("l_orderkey")).as("max_okey"))
      .withColumn("skip_by_date", col("max_ship") < lit("1997-06-01").cast("date"))
      .withColumn("skip_by_okey", col("min_okey") >= 2000L)
      .select(col("blk"), col("n_rows"), col("min_ship"), col("max_ship"),
        col("min_okey"), col("max_okey"), col("skip_by_date"),
        col("skip_by_okey"))
      .orderBy(col("blk"))
  }

  val zoneMapPruningSql: String =
    """WITH b AS (
      |  SELECT CAST((year(l_shipdate) - 1992) * 12 + month(l_shipdate) - 1
      |              AS BIGINT) AS blk,
      |         l_shipdate, l_orderkey
      |  FROM lineitem)
      |SELECT blk, CAST(count(*) AS BIGINT) AS n_rows,
      |  min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
      |  min(l_orderkey) AS min_okey, max(l_orderkey) AS max_okey,
      |  max(l_shipdate) < DATE '1997-06-01' AS skip_by_date,
      |  min(l_orderkey) >= 2000 AS skip_by_okey
      |FROM b
      |GROUP BY blk
      |ORDER BY blk""".stripMargin

  /** Column-encoding advisor — the physical-layout survey a 100 TB
    * table wants before its first big write: per audited column, exact
    * cardinality, distinct ratio and mean width, plus the encoding the
    * numbers imply (≤64 distinct → dictionary+RLE; <5% ratio →
    * dictionary; else plain). Each column is its own PRUNED single-
    * column scan-and-aggregate (a multi-countDistinct in one pass would
    * Expand the fact table ×columns — strictly worse at scale), unioned
    * at 1 row per column.
    */
  def encodingAdvisor(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val audited =
      Seq("l_returnflag", "l_linestatus", "l_shipdate", "l_partkey", "l_quantity")
    audited.map { c =>
      li.select(col(c).cast("string").as("v"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("v")).as("n_distinct"),
          sum(length(col("v"))).as("total_chars"))
        .select(
          lit(c).as("column_name"), col("n_rows"), col("n_distinct"),
          (col("n_distinct").cast("double") / col("n_rows").cast("double"))
            .as("distinct_ratio"),
          (col("total_chars").cast("double") / col("n_rows").cast("double"))
            .as("avg_chars"),
          when(col("n_distinct") <= 64, "DICT_RLE")
            .when(col("n_distinct").cast("double") / col("n_rows").cast("double")
              < 0.05, "DICT")
            .otherwise("PLAIN").as("encoding"))
    }.reduce(_ unionByName _).orderBy(col("column_name"))
  }

  /** Range-partition planner — the boundary computation behind
    * `repartitionByRange`/range-bucketed writes, made inspectable: decile
    * edges of the partition key from the mergeable KLL sketch
    * (approximate past n > k, where boundary keys become merge-order-
    * dependent — so like the other KLL gates this one emits the
    * VERDICT, not the raw boundaries: every planned partition must land
    * within ±5% of the ideal 1/10 share, with the sketch's ~0.1% rank
    * error at depth 65536 leaving ~50× margin). Rows sharing a key
    * value stay together (boundaries are on values), so multiplicity
    * skew would surface in the ratio too. Two scans + one broadcast
    * edge row — never a global sort of the key column; callers wanting
    * the boundary VALUES read them off the same edges row this query
    * computes.
    */
  def rangePartitionPlan(spark: SparkSession, sfDir: String): DataFrame = {
    val pcts = (1 to 9).map(_ * 10)
    val kll = graft.functions.KllQuantileAggregator.kllQuantiles(65536, pcts)
    val keys = Tables.lineitem(spark, sfDir).select(col("l_orderkey").as("k"))
    val edges = keys.agg(kll(col("k")).as("qv"))
    val parts = keys.crossJoin(broadcast(edges))
      .withColumn("pid",
        (1 to 9).map(i =>
          when(col("k") > element_at(col("qv"), i), 1L).otherwise(0L))
          .reduce(_ + _))
      .groupBy(col("pid"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("k")).as("lo_key"), max(col("k")).as("hi_key"))
    val tot = parts.agg(sum(col("n_rows")).as("total"))
    parts.crossJoin(broadcast(tot))
      .withColumn("balance_ratio",
        col("n_rows").cast("double") * expr("cast(10 as double)")
          / col("total").cast("double"))
      .select(col("pid"),
        (abs(col("balance_ratio") - lit(1.0d)) <= lit(0.05d))
          .as("within_bound"))
      .orderBy(col("pid"))
  }

  val rangePartitionPlanSql: String =
    """SELECT CAST(pid AS BIGINT) AS pid, TRUE AS within_bound
      |FROM (SELECT unnest(range(0, 10)) AS pid) p
      |ORDER BY pid""".stripMargin

  /** Block-level Bloom data skipping — the sketch-per-partition index
    * that answers point-lookup pruning where zone maps cannot (an
    * unclustered key's min/max straddles every block; its Bloom does
    * not): one mergeable [[graft.functions.BloomFilterAggregator]]
    * bitset PER ship-month block (a per-group sketch aggregation —
    * map-side combined, 64 longs/block), probed by a broadcast key set.
    * Output per block: probes that MIGHT be present (bloom verdict),
    * truly present (exact), and the false positives the bitset size
    * buys — the prune-rate/FP-rate trade a 100 TB table tunes before
    * writing footers. The oracle reproduces the exact same verdicts by
    * modeling the two md5 bit positions relationally (a bit is set iff
    * SOME key in the block hashes to it).
    */
  def blockBloomSkipping(spark: SparkSession, sfDir: String): DataFrame = {
    val numBits = 4096
    val li = Tables.lineitem(spark, sfDir)
      .select(
        ((year(col("l_shipdate")) - 1992) * 12 + month(col("l_shipdate")) - 1)
          .cast("long").as("blk"),
        col("l_partkey").cast("string").as("k"))
    val blooms = li.groupBy(col("blk"))
      .agg(graft.functions.BloomFilterAggregator.bloomBuild(numBits)(col("k"))
        .as("bloom"))
    // r13 ×1000 stage-profile rewrite (53-68 s of the 61-97 s run was ONE
    // task): the old shape crossJoined blooms×broadcast(probes), but the
    // bloom aggregate's output is ~84 tiny rows, so AQE coalesced its
    // exchange to ONE partition and the whole fan-out (blocks × probes ≈
    // 8M pairs at ×1000), the per-pair md5(pk) digest chains (2 per PAIR,
    // blocks× redundant) and the join-side shuffle write all serialized
    // on a single thread. Index-probe topology instead: BROADCAST the
    // per-block bloom index (84 rows × 64 longs — the natural broadcast
    // side at any scale) and stream the probes through a NUMBERED
    // round-robin repartition (the probe scan is one parquet row group =
    // one task otherwise; a numbered count survives both the optimizer's
    // redundant-repartition elimination — which silently dropped a
    // same-key-same-count repartition on the bloom side — and AQE
    // coalescing). Probe bit positions depend on pk alone, so they're
    // computed ONCE per probe below the repartition, not per pair.
    def pos(start: Int): String =
      s"cast(conv(substring(md5(pk), $start, 15), 16, 10) as bigint) % $numBits"
    val probes = Tables.part(spark, sfDir)
      .filter(col("p_partkey") % 211 === 0)
      .select(col("p_partkey").cast("string").as("pk"))
      .withColumn("pa", expr(pos(1)))
      .withColumn("pb", expr(pos(17)))
    def bitSet(h: String): String =
      s"(shiftright(element_at(bloom, cast(($h) div 64 as int) + 1)," +
        s" cast(($h) % 64 as int)) & 1) = 1"
    val verdicts = probes.repartition(spark.sparkContext.defaultParallelism)
      .crossJoin(broadcast(blooms))
      .withColumn("maybe", expr(bitSet("pa")) && expr(bitSet("pb")))
    // Exact-membership side on LONG keys with the probe predicate applied
    // as an arithmetic pre-filter: probes are exactly `p_partkey % 211 =
    // 0`, so `l_partkey % 211 = 0` is implied by the semi join — pushing
    // it below prunes 210/211 of the 600M rows BEFORE any string cast or
    // hash probe (the ×1000 profile had this map stage at 46 s, the
    // query's critical path once the fan-out was parallelized; string
    // casting + semi-probing all 600M rows was the cost). The cast to
    // string happens after dedup, on ~2.8M rows.
    val truth = Tables.lineitem(spark, sfDir)
      .filter(col("l_partkey") % 211 === 0)
      .select(
        ((year(col("l_shipdate")) - 1992) * 12 + month(col("l_shipdate")) - 1)
          .cast("long").as("blk"),
        col("l_partkey").as("pknum"))
      .join(broadcast(Tables.part(spark, sfDir)
          .filter(col("p_partkey") % 211 === 0).select(col("p_partkey"))),
        col("pknum") === col("p_partkey"), "left_semi")
      .distinct()
      .select(col("blk"), col("pknum").cast("string").as("pk"))
      .withColumn("present", lit(true))
    // Numbered (blk,pk) repartition carrying the probe-verdict join: the
    // fan-out writes ~81 MB and truth ~39 MB at ×1000 — under the 64 MB
    // advisory AQE coalesced BOTH sides of the sort-merge join to one
    // partition, serializing an 11M-row sort+join+aggregate on a single
    // thread (56-61 s of the ×1000 run). A user-numbered count pins both
    // sides at full width (co-partitioning forbids one-sided coalescing).
    // defaultParallelism, not a literal 32: full width on wider boxes,
    // no over-partitioning on narrower ones (ADVICE r13).
    verdicts.repartition(spark.sparkContext.defaultParallelism,
        col("blk"), col("pk"))
      .join(truth, Seq("blk", "pk"), "left")
      .withColumn("present", coalesce(col("present"), lit(false)))
      .groupBy(col("blk"))
      .agg(count(lit(1)).as("n_probes"),
        sum(when(col("maybe"), 1L).otherwise(0L)).as("n_maybe"),
        sum(when(col("present"), 1L).otherwise(0L)).as("n_present"),
        sum(when(col("maybe") && !col("present"), 1L).otherwise(0L))
          .as("n_false_positive"))
      .withColumn("prunable", col("n_maybe") === 0L)
      .orderBy(col("blk"))
  }

  val blockBloomSkippingSql: String =
    """WITH li AS (
      |  SELECT CAST((year(l_shipdate) - 1992) * 12 + month(l_shipdate) - 1
      |              AS BIGINT) AS blk,
      |    CAST(l_partkey AS VARCHAR) AS k
      |  FROM lineitem),
      |probes AS (
      |  SELECT CAST(p_partkey AS VARCHAR) AS pk FROM part
      |  WHERE p_partkey % 211 = 0),
      |bits AS (
      |  SELECT DISTINCT blk, pos FROM (
      |    SELECT blk,
      |      unnest([('0x' || substr(md5(k), 1, 15))::BIGINT % 4096,
      |              ('0x' || substr(md5(k), 17, 15))::BIGINT % 4096]) AS pos
      |    FROM li)),
      |pp AS (
      |  SELECT pk,
      |    ('0x' || substr(md5(pk), 1, 15))::BIGINT % 4096 AS a,
      |    ('0x' || substr(md5(pk), 17, 15))::BIGINT % 4096 AS b
      |  FROM probes),
      |v AS (
      |  SELECT bl.blk, pp.pk,
      |    EXISTS (SELECT 1 FROM bits WHERE bits.blk = bl.blk
      |            AND bits.pos = pp.a)
      |    AND EXISTS (SELECT 1 FROM bits WHERE bits.blk = bl.blk
      |                AND bits.pos = pp.b) AS maybe
      |  FROM (SELECT DISTINCT blk FROM li) bl CROSS JOIN pp),
      |t AS (
      |  SELECT DISTINCT blk, k AS pk FROM li JOIN probes ON li.k = probes.pk)
      |SELECT v.blk,
      |  CAST(count(*) AS BIGINT) AS n_probes,
      |  CAST(sum(CASE WHEN maybe THEN 1 ELSE 0 END) AS BIGINT) AS n_maybe,
      |  CAST(sum(CASE WHEN t.pk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_present,
      |  CAST(sum(CASE WHEN maybe AND t.pk IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_false_positive,
      |  sum(CASE WHEN maybe THEN 1 ELSE 0 END) = 0 AS prunable
      |FROM v LEFT JOIN t ON v.blk = t.blk AND v.pk = t.pk
      |GROUP BY v.blk
      |ORDER BY v.blk""".stripMargin

  val encodingAdvisorSql: String = {
    val one = (c: String) =>
      s"""SELECT '$c' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count(DISTINCT CAST($c AS VARCHAR)) AS BIGINT) AS n_distinct,
         |  CAST(count(DISTINCT CAST($c AS VARCHAR)) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS distinct_ratio,
         |  CAST(sum(length(CAST($c AS VARCHAR))) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS avg_chars,
         |  CASE WHEN count(DISTINCT CAST($c AS VARCHAR)) <= 64 THEN 'DICT_RLE'
         |       WHEN CAST(count(DISTINCT CAST($c AS VARCHAR)) AS DOUBLE)
         |         / CAST(count(*) AS DOUBLE) < 0.05 THEN 'DICT'
         |       ELSE 'PLAIN' END AS encoding
         |FROM lineitem""".stripMargin
    Seq("l_returnflag", "l_linestatus", "l_shipdate", "l_partkey", "l_quantity")
      .map(one).mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }
}
