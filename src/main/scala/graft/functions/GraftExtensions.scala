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
