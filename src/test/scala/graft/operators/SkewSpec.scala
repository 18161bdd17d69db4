package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedJoin returns exactly the plain-join result on a skewed key") {
    // 90% of left rows share one hot key
    val left = ((1 to 900).map(i => ("hot", i)) ++ (1 to 100).map(i => (s"k$i", i)))
      .toDF("key", "n")
    val right = (Seq("hot") ++ (1 to 100).map(i => s"k$i")).zipWithIndex
      .toDF("key", "v")
    val plain = left.join(right, "key").select("key", "n", "v")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(left, right, "key", col("n"), buckets = 8)
      .select("key", "n", "v").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.size == 1000)
  }

  test("saltedAggregate equals direct aggregation") {
    val df = ((1 to 1000).map(i => ("hot", i.toLong)) ++
      (1 to 50).map(i => (s"k$i", i.toLong))).toDF("key", "v")
    val direct = df.groupBy("key")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedAggregate(df, Seq("key"), col("v"), 8,
      partial = Seq("n" -> count(lit(1)), "s" -> sum($"v")),
      combine = Seq("n" -> sum(col("n")), "s" -> sum(col("s"))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("salt is deterministic across evaluations") {
    val df = (1 to 100).map(_.toLong).toDF("v")
    val a = df.select(Skew.saltCol($"v", 16).as("s")).collect().map(_.getLong(0))
    val b = df.select(Skew.saltCol($"v", 16).as("s")).collect().map(_.getLong(0))
    assert(a.sameElements(b))
    assert(a.forall(s => s >= 0 && s < 16))
  }
}
