package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** Loaders for the harness testdata tables (TESTDATA.md).
  *
  * Every query receives a scale-factor directory (e.g.
  * `/root/testdata/sf0.01`) holding one parquet file per table. Reads are
  * plain `spark.read.parquet` so Catalyst's parquet scan handles column
  * pruning and predicate pushdown — callers must select/filter on the
  * DataFrame (declaratively) rather than materialize.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Per-JVM parquet SCHEMA memo (path-keyed). Plain
    * `spark.read.parquet` runs a footer-reading schema-inference JOB on
    * every call — two to four ~60 ms driver round-trips per query, ~30 s
    * across a 286-query bench pass (r18 probe). Passing the
    * once-inferred schema skips exactly that job and nothing else: this
    * caches METADATA (the role a catalog/metastore plays in a real
    * deployment — at 100 TB nobody schema-infers per query), never data
    * or results — every query still scans the parquet inputs in full.
    */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 cannot read as a
    * timestamp — sessions set `spark.sql.legacy.parquet.nanosAsLong=true`
    * and this loader converts to microsecond TimestampType (truncating,
    * which matches DuckDB's TIMESTAMP_NS → TIMESTAMP cast in oracles).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    // Integer division, NOT `/` — epoch-nanos (~1.7e18) exceeds double's
    // 53-bit integer range, so a double divide is off by ±1 µs. The cast to
    // TIMESTAMP_NTZ (wall-clock, session tz is UTC) matches how Spark 4
    // reads the other tables' naive parquet timestamps — keeping every
    // timestamp column NTZ end-to-end so written results are naive µs,
    // exactly like the DuckDB oracle's.
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** `embeddings` spread across an explicit NUMBERED vec_id-keyed
    * repartition. The testdata ships each table as a single parquet row
    * group, so a plain scan is ONE input partition — and a query whose
    * cost is CPU-heavy per-row work above the scan (PQ code assignment,
    * 500-term distance chains) single-threads there; AQE cannot help
    * (it sizes by bytes and never splits a scan) and would coalesce an
    * un-numbered repartition right back. Use THIS loader only when
    * per-row compute dwarfs the row bytes; at cluster scale a large
    * vector corpus arrives pre-split by file layout and the plain
    * loader is right.
    */
  def embeddingsSpread(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    load(s, d, "embeddings").repartition(
      s.conf.get("spark.sql.shuffle.partitions").toInt, col("vec_id"))
  }
}
