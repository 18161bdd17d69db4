package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication family for document corpora (SURVEY.md §7.2(6); the core
  * LLM-data-pipeline operator set): exact, MinHash+LSH, SimHash, and n-gram
  * Jaccard. Everything is hash-based and deterministic (md5 — available and
  * bit-identical in every engine, so the DuckDB oracle can replay each
  * step), and everything is expressed as Catalyst column ops so the
  * pipeline stays declarative and shuffle-planned by the optimizer.
  *
  * Scale design:
  *  - exact dedup = one hash-groupBy shuffle, no pairwise work;
  *  - MinHash/LSH = per-row signatures (map-only) → band explode →
  *    bucket-join: candidate pairs are generated ONLY within equal buckets,
  *    turning the O(n²) pair space into per-bucket micro-joins — this is
  *    the 100 TB path;
  *  - SimHash = per-row 60-bit signature (map-only); hamming-ball pairing
  *    is done on bucket prefixes;
  *  - n-gram Jaccard = exact verifier, only ever run on blocked/candidate
  *    pairs, never the full cross product.
  */
object Dedup {

  /** Exact duplicate groups by normalized-text fingerprint. */
  def exactGroups(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs
      .withColumn("fingerprint", TextFunctions.fingerprint(col(textCol)))
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_docs"))

  /** k MinHash signature values: for seed s, min over tokens of
    * md5(s:token). String-min over hex digests ≡ min over the hash ring;
    * identical in any engine with md5.
    */
  def minhashSignature(text: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      s => array_min(transform(TextFunctions.tokens(text),
        t => md5(concat(s.cast("string"), lit(":"), t)))))

  /** LSH banding: `bands` buckets, each hashing `rowsPerBand` consecutive
    * signature values. Equal bucket in any band ⇒ candidate pair.
    */
  def lshBuckets(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => md5(concat_ws("|", slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)))))

  /** MinHash/LSH candidate pairs with estimated Jaccard similarity
    * (fraction of agreeing signature positions). Returns (id_a, id_b,
    * est_jaccard) with id_a < id_b, deduplicated across bands.
    */
  def minhashCandidates(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", k: Int = 16, bands: Int = 2): DataFrame = {
    val rowsPerBand = k / bands
    val sigs = docs.select(
      col(idCol).as("id"),
      minhashSignature(col(textCol), k).as("sig"))
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(lshBuckets(col("sig"), bands, rowsPerBand))
        .as(Seq("band", "bucket")))
    val a = banded.select(col("id").as("id_a"), col("sig").as("sig_a"),
      col("band"), col("bucket"))
    val b = banded.select(col("id").as("id_b"), col("sig").as("sig_b"),
      col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (aggregate(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => (x === y).cast("long")),
          lit(0L), (acc, v) => acc + v).cast("double") / lit(k.toDouble))
          .as("est_jaccard"))
      .distinct()
  }

  /** 60-bit SimHash over whitespace tokens: per token take the first 15 hex
    * chars of md5 as a 60-bit integer; for each bit position sum ±1 across
    * tokens; set the output bit where the sum is positive. Pure built-in
    * composition (nested higher-order functions) — stays codegen'd.
    */
  def simhash(text: Column): Column = {
    val hashes = transform(TextFunctions.tokens(text),
      t => conv(substring(md5(t), 1, 15), 16, 10).cast("long"))
    aggregate(
      sequence(lit(0), lit(59)),
      lit(0L),
      (acc, b) => acc + when(
        aggregate(hashes, lit(0L),
          (a2, h) => a2 + when(call_function("shiftright", h, b)
            .bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)) > 0,
        call_function("shiftleft", lit(1L), b)).otherwise(lit(0L)))
  }

  /** Hamming distance between two simhash signatures (bit_count of xor). */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Word n-gram sets for exact Jaccard verification. */
  def ngramSet(text: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(size(TextFunctions.tokens(text)) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(TextFunctions.tokens(text), i, lit(n)))))

  /** Exact n-gram Jaccard similarity between two token n-gram set columns:
    * |A∩B| / |A∪B| — integer-count division, bit-identical everywhere.
    */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Blocked exact near-dup pairs: within a blocking key (default: same
    * lang), all pairs with n-gram Jaccard above `threshold`. The blocking
    * keeps the pair space per-block; at scale the caller feeds LSH
    * candidates instead of blocks.
    */
  def ngramJaccardPairs(docs: DataFrame, blockCols: Seq[String],
      textCol: String = "text", idCol: String = "doc_id", n: Int = 3,
      threshold: Double = 0.2): DataFrame = {
    val withSet = docs.select(
      (blockCols.map(col) :+ col(idCol).as("id") :+
        ngramSet(col(textCol), n).as("ngrams")): _*)
    val a = withSet.toDF(blockCols ++ Seq("id_a", "ngrams_a"): _*)
    val b = withSet.toDF(blockCols ++ Seq("id_b", "ngrams_b"): _*)
    a.join(b, blockCols)
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard_sim", round(jaccard(col("ngrams_a"), col("ngrams_b")), 4))
      .filter(col("jaccard_sim") > threshold)
      .select((blockCols.map(col) :+ col("id_a") :+ col("id_b") :+ col("jaccard_sim")): _*)
  }
}
