package graft.operators

import java.sql.Timestamp
import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward inclusive match with unmatched-left preserved") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"),
      (1L, ts("2024-01-01 12:00:00"), "e2"),
      (2L, ts("2024-01-01 09:00:00"), "e3")) // no purchase for user 2
      .toDF("user_id", "ts", "name")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 100L),
      (1L, ts("2024-01-01 11:00:00"), 200L),
      (3L, ts("2024-01-01 08:00:00"), 999L))
      .toDF("user_id", "ts", "amount")

    val out = AsOfJoin.backward(left, right, "user_id", "ts", Seq("amount"))
      .orderBy($"name").collect()
    assert(out.map(r => r.getAs[String]("name") ->
      Option(r.getAs[Any]("matched_amount"))).toSeq == Seq(
      "e1" -> Some(100L), "e2" -> Some(200L), "e3" -> None))
  }

  test("inclusive: right row at exactly left ts matches") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("user_id", "ts")
    val right = Seq((1L, ts("2024-01-01 10:00:00"), 42L)).toDF("user_id", "ts", "v")
    val out = AsOfJoin.backward(left, right, "user_id", "ts", Seq("v")).collect()
    assert(out.head.getAs[Long]("matched_v") == 42L)
  }

  test("nearest: tiebreak resolves last-sorting-wins SYMMETRICALLY") {
    // two right rows share each candidate (key, ts) on both sides of the
    // probe; both directions must pick the row sorting LAST by the
    // tiebreak column (the documented backward() convention) — round 4
    // resolved backward ties to the largest but forward ties to the
    // smallest
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "probe-back"),
      (2L, ts("2024-01-01 10:00:00"), "probe-fwd"))
      .toDF("user_id", "ts", "name")
    val right = Seq(
      // user 1: only backward candidates, duplicated ts
      (1L, ts("2024-01-01 09:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 09:00:00"), 2L, "b"),
      // user 2: only forward candidates, duplicated ts
      (2L, ts("2024-01-01 11:00:00"), 3L, "c"),
      (2L, ts("2024-01-01 11:00:00"), 4L, "d"))
      .toDF("user_id", "ts", "seq", "v")
    val out = AsOfJoin.nearest(left, right, "user_id", "ts",
      rightCols = Seq("v"), tiebreak = Seq("seq"))
      .orderBy($"user_id").collect()
    assert(out(0).getAs[String]("matched_direction") == "backward")
    assert(out(0).getAs[String]("matched_v") == "b",
      "backward must pick the last-sorting tiebreak (seq=2)")
    assert(out(1).getAs[String]("matched_direction") == "forward")
    assert(out(1).getAs[String]("matched_v") == "d",
      "forward must pick the last-sorting tiebreak (seq=4)")
  }
}
