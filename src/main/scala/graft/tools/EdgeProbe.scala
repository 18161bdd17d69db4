package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Disposable A/B probe for the co-purchase edge-build shape (r18):
  * current distinct+self-join vs collect_set + pair expansion.
  */
object EdgeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def current(): DataFrame = {
      val items = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      items.toDF("ok", "pa")
        .join(items.toDF("ok", "pb"), "ok")
        .filter(col("pa") < col("pb"))
        .select(col("pa"), col("pb"))
        .distinct()
    }

    def collected(): DataFrame = {
      val baskets = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .groupBy(col("ok"))
        .agg(sort_array(collect_set(col("pk"))).as("ps"))
      baskets
        .select(explode(expr(
          "flatten(transform(ps, (x, i) -> " +
            "transform(slice(ps, i + 2, size(ps)), " +
            "y -> struct(x AS pa, y AS pb))))")).as("e"))
        .select(col("e.pa").as("pa"), col("e.pb").as("pb"))
        .distinct()
    }

    graft.functions.SortedPairs.register(spark)
    def codegenPairs(): DataFrame = {
      val baskets = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .groupBy(col("ok"))
        .agg(collect_set(col("pk")).as("ps"))
      baskets
        .select(explode(expr("sorted_pairs(ps)")).as("e"))
        .select(col("e.pa").as("pa"), col("e.pb").as("pb"))
        .distinct()
    }

    def time(tag: String, mk: () => DataFrame): Unit = {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      val ms = (System.nanoTime() - t0) / 1000000
      println(s"[edgeprobe] $tag ${ms} ms")
    }

    // checksum parity first (order-insensitive aggregate over the edge set)
    def chk(df: DataFrame): String =
      df.agg(count(lit(1)), sum(col("pa") * 31 + col("pb")))
        .collect()(0).toString
    println(s"[edgeprobe] current  checksum ${chk(current())}")
    println(s"[edgeprobe] collect  checksum ${chk(collected())}")
    println(s"[edgeprobe] codegen  checksum ${chk(codegenPairs())}")

    for (r <- 1 to 4) {
      time(s"current r$r", current _)
      time(s"collect r$r", collected _)
      time(s"codegen r$r", codegenPairs _)
    }
    spark.stop()
  }
}
