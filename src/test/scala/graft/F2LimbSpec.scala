package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r12 `ams_f2_moment` emission contract: a DECIMAL(38,0) second
  * moment split into two 60-bit BIGINT limbs reconstructs exactly, at
  * values far past int64 (where the old `cast(f2 as long)` emission
  * silently wrapped — the covariance-drift defect class).
  */
class F2LimbSpec extends SparkTestBase {

  private val Limb = BigInt("1152921504606846976") // 2^60

  test("decimal div/% limb split reconstructs values past int64") {
    // one hot user at 3.5e9 events: fu^2 = 1.225e19 > Long.MaxValue
    val cases = Seq(
      BigInt("12250000000000000000"),           // the motivating wrap case
      BigInt("99999999999999999999999999"),      // 1e26-1: deep two-limb
      BigInt(1), BigInt(0),
      (Limb * Limb) - 1)                         // 2^120-1: limb maxima
    import spark.implicits._
    val df = cases.map(_.toString).toDF("s")
      .select(expr("cast(s as decimal(38,0))").as("v"))
      .select(
        col("v"),
        expr("cast(v div 1152921504606846976 as long)").as("hi"),
        expr("cast(v % 1152921504606846976 as long)").as("lo"))
    df.collect().foreach { r =>
      val v = BigInt(r.getDecimal(0).toBigInteger)
      val hi = BigInt(r.getLong(1))
      val lo = BigInt(r.getLong(2))
      assert(hi * Limb + lo === v, s"limbs must reconstruct $v")
      assert(lo >= 0 && lo < Limb)
      assert(hi >= 0)
    }
  }

  test("overflow channels: ANSI guards the cast but NOT decimal div") {
    import spark.implicits._
    // Documents WHY the limb emission exists AND why an ANSI-clean run
    // is insufficient certification (r12 finding):
    // (a) decimal->long CAST past int64 throws under ANSI=true (Spark
    //     4's default — the gate's semantics) and wraps negative under
    //     ansi=false;
    // (b) `div` (IntegralDivide) on DECIMAL operands returns LONG and
    //     wraps SILENTLY under BOTH settings in 4.1.2 — the channel
    //     that actually bit embedding_covariance_drift at x100.
    val big = Seq("12250000000000000000").toDF("s")
    assert(spark.conf.get("spark.sql.ansi.enabled") === "true")
    intercept[Exception] {
      big.select(expr("cast(cast(s as decimal(38,0)) as long)")).head
    }
    val divWrapped = big
      .select(expr("cast(s as decimal(38,0)) div 1")).head.getLong(0)
    assert(divWrapped < 0L, "div wraps silently even under ANSI")
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      val wrapped = big
        .select(expr("cast(cast(s as decimal(38,0)) as long)")).head.getLong(0)
      assert(wrapped < 0L)
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }
}
