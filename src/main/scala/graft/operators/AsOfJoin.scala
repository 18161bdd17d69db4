package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward, inclusive) join — the time-series operator Spark lacks
  * natively (SURVEY.md §7 custom-operator surface; same semantics as
  * DuckDB's `ASOF JOIN` / pandas `merge_asof`): for every left row, attach
  * the most recent right row with `right.ts <= left.ts` for the same key.
  *
  * Implementation is the union+window technique rather than a range join:
  * tag both inputs, union them, and carry the last-seen right payload
  * forward with `last(_, ignoreNulls)` over a (key, ts)-sorted window.
  *
  * Scale rationale: exactly ONE shuffle (hash by key for the window), no
  * row explosion — a naive `left.ts >= right.ts` theta-join is O(|L|·|R|)
  * per key before aggregation, which detonates on 100 TB; this stays
  * O(|L|+|R|) with per-partition sorted scans, and skewed keys can be
  * salted upstream without changing the algorithm. The right payload is
  * packed into ONE struct so all its fields come atomically from the same
  * right row (per-column `last(ignoreNulls)` would mix rows when payload
  * fields are null).
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      reference side (payload columns are `rightCols`)
    * @param key        equi-join key column name (same name both sides)
    * @param ts         event-time column name (same name both sides)
    * @param rightCols  right payload columns to attach, emitted with `prefix`
    * @param tiebreak   optional extra right-side ordering columns; when two
    *                   right rows share (key, ts) the one sorting LAST wins
    */
  def backward(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightCols: Seq[String], prefix: String = "matched_",
      tiebreak: Seq[String] = Nil): DataFrame = {

    val payload = struct(
      (rightCols.map(c => col(c).as(c)) ++ tiebreak.map(c => col(c).as(s"__tb_$c"))): _*)
    val payloadType = right.select(payload.as("__payload")).schema("__payload").dataType

    val lPrepared = left
      .withColumn("__ts", col(ts))
      .withColumn("__side", lit(0))
      .withColumn("__payload", lit(null).cast(payloadType))
    // The right side carries only the union schema: left columns (key kept,
    // rest nulled) + the window helpers.
    val rPrepared = right.select((left.columns.toIndexedSeq.map(c =>
        if (c == key) col(key)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+
      col(ts).as("__ts") :+ lit(1).as("__side") :+ payload.as("__payload")): _*)

    // Right rows sort before left rows at equal ts (side desc) so the match
    // is inclusive; among right ties the tiebreak columns order them and the
    // last one wins.
    val order: Seq[Column] =
      (col("__ts").asc +: col("__side").desc +:
        tiebreak.map(c => col("__payload").getField(s"__tb_$c").asc))
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lPrepared.unionByName(rPrepared)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select((left.columns.toIndexedSeq.map(col) ++
        rightCols.map(c => col("__match").getField(c).as(s"$prefix$c"))): _*)
  }

  /** Nearest-neighbor-in-time join: for every left row, the right row
    * (same key) minimizing |right.ts − left.ts|, ties to the PAST —
    * backward is inclusive (right.ts ≤ left.ts), forward strict
    * (right.ts > left.ts), and at equal distance the backward match wins.
    * ONE union + ONE (key, ts)-sorted window pass recovers both
    * candidates (`last` behind, `first` strictly ahead — the right row
    * at equal ts sorts before the left row, so it lands on the backward
    * side at distance 0), then a row-local comparison picks the winner.
    * Same single-shuffle O(|L|+|R|) scale shape as [[backward]].
    *
    * Emits `prefix<c>` payload columns plus `<prefix>direction`
    * ('backward'/'forward', null if no match) and `<prefix>dist_us`.
    * Among right rows sharing (key, ts), the one sorting LAST by
    * `tiebreak` wins — in BOTH directions, the same convention as
    * [[backward]].
    */
  def nearest(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightCols: Seq[String], prefix: String = "matched_",
      tiebreak: Seq[String] = Nil): DataFrame = {

    val payload = struct(
      (col(ts).as("__rts") +: rightCols.map(c => col(c).as(c))) ++
        tiebreak.map(c => col(c).as(s"__tb_$c")): _*)
    val payloadType = right.select(payload.as("__payload")).schema("__payload").dataType

    val lPrepared = left
      .withColumn("__ts", col(ts))
      .withColumn("__side", lit(0))
      .withColumn("__payload", lit(null).cast(payloadType))
    val rPrepared = right.select((left.columns.toIndexedSeq.map(c =>
        if (c == key) col(key)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+
      col(ts).as("__ts") :+ lit(1).as("__side") :+ payload.as("__payload")): _*)

    val order: Seq[Column] =
      (col("__ts").asc +: col("__side").desc +:
        tiebreak.map(c => col("__payload").getField(s"__tb_$c").asc))
    val base = Window.partitionBy(col(key)).orderBy(order: _*)
    val behind = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Forward lookup as a GROWING frame over the REVERSED order — a
    // `first(...) OVER (1 FOLLOWING, UNBOUNDED FOLLOWING)` shrinking
    // frame makes Spark recompute the non-invertible aggregate per row,
    // O(n²) in a key's row count (a hot key detonates). Reversed ts/side
    // layout (ts desc, side asc) keeps semantics identical: right rows
    // at equal ts land BEHIND the left row in DESC order (still backward
    // matches), and `last` over the reversed frame picks the smallest-ts
    // strictly-forward right row. The tiebreak component stays ASC —
    // same direction as the backward ordering — so BOTH directions
    // resolve equal-(key, ts) right-row ties to the row sorting LAST by
    // `tiebreak`, the documented [[backward]] convention (tiebreak
    // direction never affects frame membership; the __side term
    // dominates at equal ts).
    val orderRev: Seq[Column] =
      (col("__ts").desc +: col("__side").asc +:
        tiebreak.map(c => col("__payload").getField(s"__tb_$c").asc))
    val aheadRev = Window.partitionBy(col(key)).orderBy(orderRev: _*)
      .rowsBetween(Window.unboundedPreceding, -1)

    val distB = expr("unix_micros(cast(__ts as timestamp))") -
      expr("unix_micros(cast(__b.__rts as timestamp))")
    val distF = expr("unix_micros(cast(__f.__rts as timestamp))") -
      expr("unix_micros(cast(__ts as timestamp))")
    val pickB = col("__f").isNull || (col("__b").isNotNull && distB <= distF)

    lPrepared.unionByName(rPrepared)
      .withColumn("__b", last(col("__payload"), ignoreNulls = true).over(behind))
      .withColumn("__f", last(col("__payload"), ignoreNulls = true).over(aheadRev))
      .filter(col("__side") === 0)
      .withColumn("__win", when(col("__b").isNull && col("__f").isNull,
          lit(null).cast(payloadType))
        .otherwise(when(pickB, col("__b")).otherwise(col("__f"))))
      .withColumn(s"${prefix}direction",
        when(col("__win").isNull, lit(null).cast("string"))
          .otherwise(when(pickB, lit("backward")).otherwise(lit("forward"))))
      .withColumn(s"${prefix}dist_us",
        when(col("__win").isNull, lit(null).cast("long"))
          .otherwise(when(pickB, distB).otherwise(distF)))
      .select((left.columns.toIndexedSeq.map(col) ++
        rightCols.map(c => col("__win").getField(c).as(s"$prefix$c")) ++
        Seq(col(s"${prefix}direction"), col(s"${prefix}dist_us"))): _*)
  }
}
