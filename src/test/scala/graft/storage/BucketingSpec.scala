package graft.storage

import graft.SparkTestBase

class BucketingSpec extends SparkTestBase {

  test("co-located join on same-bucketed tables plans without exchanges") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val ord = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", 8, Seq("l_orderkey"))
    Bucketing.writeBucketed(ord, "ord_bucketed", "o_orderkey", 8, Seq("o_orderkey"))
    // at this test size the planner would broadcast (its own exchange);
    // disable auto-broadcast to exercise the bucketed sort-merge path the
    // layout exists for
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.coLocatedJoin(spark, "li_bucketed", "ord_bucketed",
        "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // correctness: same rows as the plain join
      val plain = li.join(ord, li("l_orderkey") === ord("o_orderkey")).count()
      assert(joined.count() == plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("writeBucketed resolves qualified names through the catalog (rewrite-safe)") {
    // VERDICT r6 item 5: the stale-dir sweep must resolve the managed
    // location via catalog.defaultTablePath, not string concat under
    // warehouse.dir — a db-qualified name in a non-default database is
    // exactly the case a naive concat sweeps wrong. Write twice (the
    // second write is the leftover-directory re-run the sweep exists
    // for) and verify both the data and that the default db saw nothing.
    val nat = spark.read.parquet(s"$sf0001/nation.parquet")
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_bspec")
    try {
      Bucketing.writeBucketed(nat, "graft_bspec.nat_bq", "n_nationkey", 4)
      Bucketing.writeBucketed(nat, "graft_bspec.nat_bq", "n_nationkey", 4)
      assert(spark.table("graft_bspec.nat_bq").count() == nat.count())
      assert(!spark.catalog.tableExists("nat_bq"),
        "qualified write must not create/sweep a default-db table")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bspec.nat_bq")
      spark.sql("DROP DATABASE IF EXISTS graft_bspec")
    }
  }

  test("mismatched bucket counts fall back to a shuffled join (still correct)") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val ord = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    Bucketing.writeBucketed(li, "li_b8", "l_orderkey", 8)
    Bucketing.writeBucketed(ord, "ord_b4", "o_orderkey", 4)
    try {
      val joined = Bucketing.coLocatedJoin(spark, "li_b8", "ord_b4",
        "l_orderkey", "o_orderkey")
      assert(joined.count() ==
        li.join(ord, li("l_orderkey") === ord("o_orderkey")).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b8")
      spark.sql("DROP TABLE IF EXISTS ord_b4")
    }
  }
}
