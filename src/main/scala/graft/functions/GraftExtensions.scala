package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions for SQL users, so
  * `spark.sql("SELECT cosine_sim(a, b) ...")` works without touching the
  * Scala API.
  *
  * Activate with
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2, "cosine_sim(arrayA, arrayB) takes 2 arguments")
        CosineSimilarity(exprs(0), exprs(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_sig"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2, "minhash_sig(tokens, k) takes 2 arguments")
        MinHashSignature(exprs(0), exprs(1))
      }))
    // SQL users writing the portable HOF MinHash composition get the
    // codegen'd expression automatically.
    e.injectOptimizerRule(_ => RewriteMinHashHof)
  }
}

object GraftExtensions {

  /** Register the engine's typed mergeable sketch aggregators as SQL
    * functions (udafs need a live session, so they can't ride
    * `injectFunction`). Names carry their fixed parameters — SQL has no
    * constructor-argument channel, so each registration is one concrete,
    * documented instance of the parameterized aggregator:
    * `SELECT event_type, hll_sketch(user_id) FROM events GROUP BY 1`.
    */
  def registerAggregates(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("hll_sketch", HyperLogLogAggregator.hllSketch)
    spark.udf.register("cm_sketch", CountMinAggregator.cmSketch)
    spark.udf.register("kll_quartiles_k4096",
      KllQuantileAggregator.kllQuantiles(4096, Seq(25, 50, 75)))
    spark.udf.register("topk_16", TopKAggregator.topK(16))
    spark.udf.register("heavy_hitters_64", HeavyHittersAggregator.heavyHitters(64))
    spark.udf.register("minhash_merge_128", MinHashAggregator.minhashMerge(128))
    spark.udf.register("bloom_build_4096", BloomFilterAggregator.bloomBuild(4096))
  }
}
