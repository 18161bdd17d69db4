package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  test("fused CosineSimilarity expression matches built-in composition bit-for-bit") {
    Similarity.registerCosine(spark)
    val df = Tuple2(Seq(1.0, 2.0, 3.0), Seq(-1.0, 0.5, 2.0)) :: Nil
    val rows = df.toDF("a", "b")
      .withColumn("fused", Similarity.cosine(col("a"), col("b")))
      .withColumn("builtin", Similarity.cosineBuiltin(col("a"), col("b")))
      .collect()
    assert(rows.head.getDouble(2) == rows.head.getDouble(3))
    // known value: dot = -1 + 1 + 6 = 6, |a|² = 14, |b|² = 5.25
    val expected = 6.0 / (math.sqrt(14.0) * math.sqrt(5.25))
    assert(rows.head.getDouble(2) == expected)
  }

  test("identical vectors have similarity 1.0; orthogonal 0.0") {
    Similarity.registerCosine(spark)
    val rows = Seq(
      (Seq(2.0, 0.0), Seq(2.0, 0.0)),
      (Seq(1.0, 0.0), Seq(0.0, 3.0)))
      .toDF("a", "b")
      .withColumn("sim", Similarity.cosine(col("a"), col("b")))
      .orderBy(col("sim").desc)
      .collect()
    assert(rows(0).getDouble(2) == 1.0)
    assert(rows(1).getDouble(2) == 0.0)
  }

  test("whole-stage codegen stays enabled for the fused expression") {
    Similarity.registerCosine(spark)
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(Similarity.toDoubleVec(col("embedding")).as("e"))
    val plan = emb.withColumn("s", Similarity.cosine(col("e"), col("e")))
      .queryExecution.executedPlan.toString
    // "*(n)" is the collapsed WholeStageCodegen marker; the projection
    // containing cosinesimilarity must be inside a codegen stage.
    assert(plan.linesIterator.exists(l =>
      l.contains("cosinesimilarity") && l.trim.startsWith("*(")))
  }
}
