package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). Current
  * target: copurchase_recall_at_k stage decomposition — where do the
  * four ~50 MB shuffles come from, and which alternatives remove them.
  */
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
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    def exchanges(df: DataFrame): Int =
      df.queryExecution.executedPlan.toString
        .linesIterator.count(l => l.contains("Exchange hashpartitioning"))

    val nPart = 32
    val orders = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_partkey"))
    def split(parity: Int): DataFrame = orders
      .filter(col("o_orderkey") % 2 === parity)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct()
    var train: DataFrame = null
    var test: DataFrame = null
    time("splits + checkpoint") {
      train = split(0).repartition(nPart, col("c")).localCheckpoint()
      test = split(1).localCheckpoint()
      train.count() + test.count()
    }
    val basket = train.repartition(nPart, col("c"))
      .withColumn("brn", row_number().over(
        Window.partitionBy(col("c")).orderBy(col("p"))))
      .filter(col("brn") <= 50)
      .drop("brn")

    // current: groupBy(p,q) then window(p) — two shuffles of the pair mass
    def pairsCur = basket.toDF("c", "p")
      .join(basket.toDF("c", "q"), "c")
      .filter(col("p") =!= col("q"))
      .groupBy(col("p"), col("q")).agg(count(lit(1)).as("w"))
      .withColumn("nrn", row_number().over(
        Window.partitionBy(col("p")).orderBy(col("w").desc, col("q"))))
      .filter(col("nrn") <= 25)
      .drop("nrn")
    // alt: repartition the fan-out on p once; agg + window both reuse it
    def pairsAlt = basket.toDF("c", "p")
      .join(basket.toDF("c", "q"), "c")
      .filter(col("p") =!= col("q"))
      .repartition(nPart, col("p"))
      .groupBy(col("p"), col("q")).agg(count(lit(1)).as("w"))
      .withColumn("nrn", row_number().over(
        Window.partitionBy(col("p")).orderBy(col("w").desc, col("q"))))
      .filter(col("nrn") <= 25)
      .drop("nrn")
    println(s"pairsCur exchanges=${exchanges(pairsCur)} " +
      s"pairsAlt exchanges=${exchanges(pairsAlt)}")
    time("pairsCur")(pairsCur.count())
    time("pairsAlt")(pairsAlt.count())
    time("pairsCur again")(pairsCur.count())
    time("pairsAlt again")(pairsAlt.count())

    val evalUsers = train.select(col("c")).distinct()
      .join(test.select(col("c")).distinct(), "c")
      .localCheckpoint()
    val pc = pairsCur.localCheckpoint()
    // current scoring
    def scoredCur = train.join(broadcast(evalUsers), "c")
      .join(broadcast(pc), "p")
      .groupBy(col("c"), col("q")).agg(sum(col("w")).as("score"))
      .join(train.toDF("c", "q"), Seq("c", "q"), "left_anti")
    def topkOf(scored: DataFrame) = scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("c")).orderBy(col("score").desc, col("q"))))
      .filter(col("rn") <= 10)
    println(s"scoredCur exchanges=${exchanges(topkOf(scoredCur))}")
    println(topkOf(scoredCur).queryExecution.executedPlan.toString
      .linesIterator.filter(l => l.contains("Exchange") || l.contains("Aggregate") || l.contains("Join") || l.contains("Window"))
      .map(_.take(120)).mkString("\n"))
    time("scored+topk cur")(topkOf(scoredCur).count())
    time("scored+topk cur again")(topkOf(scoredCur).count())

    println("train outputPartitioning: " +
      train.queryExecution.executedPlan.outputPartitioning)
    // alt A: explicit repartition(c) of the fan-out before groupBy(c,q) —
    // one shuffle of the raw fan-out, then agg/anti/window all stay on c
    def scoredAltA = train.join(broadcast(evalUsers), "c")
      .join(broadcast(pc), "p")
      .repartition(nPart, col("c"))
      .groupBy(col("c"), col("q")).agg(sum(col("w")).as("score"))
      .join(train.toDF("c", "q"), Seq("c", "q"), "left_anti")
    println(s"scoredAltA exchanges=${exchanges(topkOf(scoredAltA))}")
    time("scored+topk altA")(topkOf(scoredAltA).count())
    time("scored+topk altA again")(topkOf(scoredAltA).count())
    // alt B: keep partial-agg shuffle but feed anti join from the
    // already-(c,q)-partitioned agg and repartition train side only
    val trainCQ = train.toDF("c", "q").repartition(nPart, col("c"))
    def scoredAltB = train.join(broadcast(evalUsers), "c")
      .join(broadcast(pc), "p")
      .groupBy(col("c"), col("q")).agg(sum(col("w")).as("score"))
      .repartition(nPart, col("c"))
      .join(trainCQ, Seq("c", "q"), "left_anti")
    println(s"scoredAltB exchanges=${exchanges(topkOf(scoredAltB))}")
    time("scored+topk altB")(topkOf(scoredAltB).count())
    time("scored+topk altB again")(topkOf(scoredAltB).count())
    spark.stop()
  }
}
