package graft

import org.apache.spark.sql.SparkSession

/** Scratch main: dump formatted plans of the headline queries so scan
  * pruning (ReadSchema/PushedFilters), join strategies and codegen spans
  * can be audited (not part of the driver contract).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSet else Set(
      "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
      "events_asof_last_purchase", "sim_topk_bruteforce", "dedup_minhash_lsh",
      "q6_forecast_revenue", "q17_small_quantity", "skew_salted_join_agg",
      "pack_sequences", "events_gapfill_hourly", "agg_grouping_sets")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.filter(q => names(q._1)).foreach { case (name, fn) =>
      println(s"\n========== $name ==========")
      fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
