package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.{Dedup, TextFunctions}

/** Scratch profiling main (not part of the driver contract). */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    val docs = Tables.documents(spark, sfDir)
    docs.count()
    time("tokens+grams") {
      docs.select(Dedup.ngramSet(col("text"), 3).as("g")).count()
    }
    time("grams hashed") {
      docs.select(array_distinct(transform(Dedup.ngramSet(col("text"), 3),
        g => xxhash64(g))).as("g")).count()
    }
    time("postings explode") {
      docs.select(col("doc_id"), explode(array_distinct(transform(
        Dedup.ngramSet(col("text"), 3), g => xxhash64(g)))).as("g")).count()
    }
    time("postings spread explode") {
      docs.repartition(32).select(col("lang"), col("doc_id"),
        explode(array_distinct(transform(Dedup.ngramSet(col("text"), 3),
          g => xxhash64(g)))).as("g")).count()
    }
    time("inter co-occurrence") {
      val p = docs.repartition(32).select(col("lang"), col("doc_id"),
        explode(array_distinct(transform(Dedup.ngramSet(col("text"), 3),
          g => xxhash64(g)))).as("g"))
      val pa = p.toDF("lang", "id_a", "g")
      val pb = p.toDF("lang", "id_b", "g")
      pa.join(pb, Seq("lang", "g")).filter(col("id_a") < col("id_b"))
        .groupBy(col("lang"), col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("inter")).count()
    }
    time("postings with sz (new)") {
      docs.repartition(32)
        .select(col("lang"), col("doc_id").as("id"), TextFunctions.tokens(col("text")).as("toks"))
        .select(col("lang"), col("id"),
          array_distinct(transform(Dedup.ngramSetOfTokens(col("toks"), 3),
            g => xxhash64(g))).as("ngrams"))
        .select(col("lang"), col("id"), size(col("ngrams")).as("sz"),
          explode(col("ngrams")).as("g")).count()
    }
    time("join+agg with sz (new)") {
      val p = docs.repartition(32)
        .select(col("lang"), col("doc_id").as("id"), TextFunctions.tokens(col("text")).as("toks"))
        .select(col("lang"), col("id"),
          array_distinct(transform(Dedup.ngramSetOfTokens(col("toks"), 3),
            g => xxhash64(g))).as("ngrams"))
        .select(col("lang"), col("id"), size(col("ngrams")).as("sz"),
          explode(col("ngrams")).as("g"))
      val pa = p.toDF("lang", "id_a", "sz_a", "g")
      val pb = p.toDF("lang", "id_b", "sz_b", "g")
      val joined = pa.join(pb, Seq("lang", "g")).filter(col("id_a") < col("id_b"))
        .groupBy(col("lang"), col("id_a"), col("id_b"), col("sz_a"), col("sz_b"))
        .agg(count(lit(1)).as("inter"))
      val plan = joined.queryExecution.executedPlan.toString
      println("  ReusedExchange in plan: " + plan.contains("ReusedExchange"))
      joined.count()
    }
    time("full ngramJaccardPairs") {
      Dedup.ngramJaccardPairs(docs, Seq("lang"), n = 3, threshold = 0.2).count()
    }
    time("minhash signatures") {
      docs.select(Dedup.minhashSignature(col("text"), 16).as("s")).count()
    }
    time("minhash candidates") {
      Dedup.minhashCandidates(docs, k = 16, bands = 2).count()
    }
    spark.stop()
  }
}
