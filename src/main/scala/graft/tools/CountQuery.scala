package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev probe: run one gated query and print its result ROW COUNT and
  * wall time — the cheap way to measure workload mass (e.g. LSH
  * candidate-pair count at a scale decade) without Verify's
  * coalesce(1) result write, which single-threads on billion-row
  * outputs.
  *
  * Usage: CountQuery <sfDir> <query>[,query2,...]
  * Env: SPARK_GRAFT_CPUS (default 32).
  */
object CountQuery {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, csv) = args
    val names = csv.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_MATERIALIZE=noop: write to Spark's no-op sink instead
    // of count() — count() lets Catalyst PRUNE unreferenced aggregate/
    // projection expressions out of the plan (a global agg whose sketch
    // column nobody reads computes NO sketch), so count-based timings
    // under-measure pure-aggregate queries; the noop sink materializes
    // every output column.
    val noop = sys.env.get("SPARK_GRAFT_MATERIALIZE").contains("noop")
    for (name <- names) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val n = if (noop) {
        df.write.format("noop").mode("overwrite").save(); -1L
      } else df.count()
      println(f"[count] $name rows=$n%d sec=${(System.nanoTime() - t0) / 1e9}%.1f" +
        (if (noop) " (noop)" else ""))
    }
    spark.stop()
  }
}
