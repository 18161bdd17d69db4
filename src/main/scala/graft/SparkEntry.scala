package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AggregatesMore, AnalyticsMore, EtlParity, EventQueries, MultimodalQueries, PipelineQueries, Relational, RelationalMore, RelationalThird, ScalarQueries, SimMore, SimQueries, SkewQueries, StreamQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2 + extension surface) to
  * DataFrame builders over a scale-factor directory; `oracleSql` carries the
  * DuckDB-equivalent SQL for the driver's hash compare. Column names/aliases
  * MUST match between the two — the compare sorts columns by name.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (Relational.q1PricingSummary _),
    "etl_enrich_sessions" -> (EtlParity.enrichSessions _),
    "etl_events_json_extract" -> (EtlParity.eventsJsonExtract _),
    "q3_shipping_priority" -> (Relational.q3ShippingPriority _),
    "q5_region_revenue" -> (Relational.q5RegionRevenue _),
    "join_semi" -> (Relational.joinSemi _),
    "join_anti" -> (Relational.joinAnti _),
    "join_outer_counts" -> (Relational.joinOuterCounts _),
    "window_topn_per_customer" -> (Relational.windowTopNPerCustomer _),
    "window_running_sum" -> (Relational.windowRunningSum _),
    "sort_topk" -> (Relational.sortTopK _),
    "set_ops" -> (Relational.setOps _),
    "agg_distinct" -> (Relational.aggDistinct _),
    "agg_rollup" -> (Relational.aggRollup _),
    "above_type_avg_parts" -> (Relational.aboveTypeAvgParts _),
    "events_hourly_rollup" -> (EventQueries.hourlyRollup _),
    "events_pivot_per_user" -> (EventQueries.pivotPerUser _),
    "events_asof_last_purchase" -> (EventQueries.asofLastPurchase _),
    "events_sessionize" -> (EventQueries.sessionize _),
    "text_stats" -> (TextQueries.textStats _),
    "dedup_exact_groups" -> (TextQueries.dedupExact _),
    "dedup_minhash_lsh" -> (TextQueries.dedupMinhashLsh _),
    "dedup_simhash" -> (TextQueries.dedupSimhash _),
    "dedup_ngram_jaccard" -> (TextQueries.dedupNgramJaccard _),
    "dedup_minhash_corpus" -> (TextQueries.dedupMinhashCorpus _),
    "sim_topk_bruteforce" -> (SimQueries.simTopKBruteForce _),
    "sim_neardup_cosine" -> (SimQueries.simNearDupCosine _),
    "sim_lsh_buckets" -> (SimQueries.simLshBuckets _),
    "sim_lsh_topk" -> (SimQueries.simLshTopK _),
    "quality_filter_pipeline" -> (TextQueries.qualityFilterPipeline _),
    "sharded_log_roundtrip" -> (StreamQueries.shardedLogRoundtrip _),
    "multimodal_decode" -> (MultimodalQueries.multimodalDecode _),
    "scalar_functions" -> (ScalarQueries.scalarFunctions _),
    "q4_priority_check" -> (RelationalMore.q4PriorityCheck _),
    "q12_priority_classes" -> (RelationalMore.q12PriorityClasses _),
    "q14_promo_share" -> (RelationalMore.q14PromoShare _),
    "q18_large_orders" -> (RelationalMore.q18LargeOrders _),
    "q2_cheapest_part" -> (RelationalMore.q2CheapestPart _),
    "window_analytics" -> (AnalyticsMore.windowAnalytics _),
    "agg_cube" -> (AnalyticsMore.aggCube _),
    "set_ops_all" -> (AnalyticsMore.setOpsAll _),
    "string_agg" -> (AnalyticsMore.stringAgg _),
    "agg_extrema" -> (AggregatesMore.aggExtrema _),
    "unpivot_charges" -> (AggregatesMore.unpivotCharges _),
    "ann_centroid_assign" -> (SimMore.annCentroidAssign _),
    "embed_quantize" -> (SimMore.embedQuantize _),
    "q10_returned_items" -> (RelationalThird.q10ReturnedItems _),
    "q17_small_quantity" -> (RelationalThird.q17SmallQuantity _),
    "window_range_frame" -> (AnalyticsMore.windowRangeFrame _),
    "q19_disjunctive_revenue" -> (RelationalThird.q19DisjunctiveRevenue _),
    "q22_idle_balances" -> (RelationalThird.q22IdleBalances _),
    "split_train_test" -> (PipelineQueries.splitTrainTest _),
    "stratified_sample" -> (PipelineQueries.stratifiedSample _),
    "vocab_doc_freq" -> (PipelineQueries.vocabDocFreq _),
    "corpus_stats" -> (PipelineQueries.corpusStats _),
    "skew_salted_join_agg" -> (SkewQueries.skewSaltedJoinAgg _),
    "dedup_components" -> (TextQueries.dedupComponents _),
    "pack_sequences" -> (PipelineQueries.packSequences _),
    "agg_grouping_sets" -> (AnalyticsMore.aggGroupingSets _),
    "events_gapfill_hourly" -> (AnalyticsMore.eventsGapfillHourly _),
    "multimodal_frame_sample" -> (MultimodalQueries.multimodalFrameSample _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> Relational.q1PricingSummarySql,
    "etl_enrich_sessions" -> EtlParity.enrichSessionsSql,
    "etl_events_json_extract" -> EtlParity.eventsJsonExtractSql,
    "q3_shipping_priority" -> Relational.q3ShippingPrioritySql,
    "q5_region_revenue" -> Relational.q5RegionRevenueSql,
    "join_semi" -> Relational.joinSemiSql,
    "join_anti" -> Relational.joinAntiSql,
    "join_outer_counts" -> Relational.joinOuterCountsSql,
    "window_topn_per_customer" -> Relational.windowTopNPerCustomerSql,
    "window_running_sum" -> Relational.windowRunningSumSql,
    "sort_topk" -> Relational.sortTopKSql,
    "set_ops" -> Relational.setOpsSql,
    "agg_distinct" -> Relational.aggDistinctSql,
    "agg_rollup" -> Relational.aggRollupSql,
    "above_type_avg_parts" -> Relational.aboveTypeAvgPartsSql,
    "events_hourly_rollup" -> EventQueries.hourlyRollupSql,
    "events_pivot_per_user" -> EventQueries.pivotPerUserSql,
    "events_asof_last_purchase" -> EventQueries.asofLastPurchaseSql,
    "events_sessionize" -> EventQueries.sessionizeSql,
    "text_stats" -> TextQueries.textStatsSql,
    "dedup_exact_groups" -> TextQueries.dedupExactSql,
    "dedup_minhash_lsh" -> TextQueries.dedupMinhashLshSql,
    "dedup_simhash" -> TextQueries.dedupSimhashSql,
    "dedup_ngram_jaccard" -> TextQueries.dedupNgramJaccardSql,
    "dedup_minhash_corpus" -> TextQueries.dedupMinhashCorpusSql,
    "sim_topk_bruteforce" -> SimQueries.simTopKBruteForceSql,
    "sim_neardup_cosine" -> SimQueries.simNearDupCosineSql,
    "sim_lsh_buckets" -> SimQueries.simLshBucketsSql,
    "sim_lsh_topk" -> SimQueries.simLshTopKSql,
    "quality_filter_pipeline" -> TextQueries.qualityFilterPipelineSql,
    "sharded_log_roundtrip" -> StreamQueries.shardedLogRoundtripSql,
    "multimodal_decode" -> MultimodalQueries.multimodalDecodeSql,
    "scalar_functions" -> ScalarQueries.scalarFunctionsSql,
    "q4_priority_check" -> RelationalMore.q4PriorityCheckSql,
    "q12_priority_classes" -> RelationalMore.q12PriorityClassesSql,
    "q14_promo_share" -> RelationalMore.q14PromoShareSql,
    "q18_large_orders" -> RelationalMore.q18LargeOrdersSql,
    "q2_cheapest_part" -> RelationalMore.q2CheapestPartSql,
    "window_analytics" -> AnalyticsMore.windowAnalyticsSql,
    "agg_cube" -> AnalyticsMore.aggCubeSql,
    "set_ops_all" -> AnalyticsMore.setOpsAllSql,
    "string_agg" -> AnalyticsMore.stringAggSql,
    "agg_extrema" -> AggregatesMore.aggExtremaSql,
    "unpivot_charges" -> AggregatesMore.unpivotChargesSql,
    "ann_centroid_assign" -> SimMore.annCentroidAssignSql,
    "embed_quantize" -> SimMore.embedQuantizeSql,
    "q10_returned_items" -> RelationalThird.q10ReturnedItemsSql,
    "q17_small_quantity" -> RelationalThird.q17SmallQuantitySql,
    "window_range_frame" -> AnalyticsMore.windowRangeFrameSql,
    "q19_disjunctive_revenue" -> RelationalThird.q19DisjunctiveRevenueSql,
    "q22_idle_balances" -> RelationalThird.q22IdleBalancesSql,
    "split_train_test" -> PipelineQueries.splitTrainTestSql,
    "stratified_sample" -> PipelineQueries.stratifiedSampleSql,
    "vocab_doc_freq" -> PipelineQueries.vocabDocFreqSql,
    "corpus_stats" -> PipelineQueries.corpusStatsSql,
    "skew_salted_join_agg" -> SkewQueries.skewSaltedJoinAggSql,
    "dedup_components" -> TextQueries.dedupComponentsSql,
    "pack_sequences" -> PipelineQueries.packSequencesSql,
    "agg_grouping_sets" -> AnalyticsMore.aggGroupingSetsSql,
    "events_gapfill_hourly" -> AnalyticsMore.eventsGapfillHourlySql,
    "multimodal_frame_sample" -> MultimodalQueries.multimodalFrameSampleSql
  )
}
