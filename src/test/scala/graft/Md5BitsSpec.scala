package graft

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Md5Bits

/** Pins [[Md5Bits.top60]]/[[Md5Bits.mid60]] bit-identical to the hex
  * round-trip they replaced (`parseLong(hexDigest.substring(a, a+15), 16)`)
  * — the property that lets the round-12 hot-path rewrite leave every
  * oracle hash untouched.
  */
class Md5BitsSpec extends AnyFunSuite {

  private def hexOf(d: Array[Byte]): String =
    d.map("%02x".format(_)).mkString

  private val samples: Seq[String] =
    Seq("", "a", "tok", "0:the", "3:supercalifragilistic", "shard-0007",
      "key-é世界", "x" * 300) ++
      (0 until 500).map(i => s"$i:elem-${i * 2654435761L}")

  test("top60 == parseLong(hex[0,15), 16) on 508 samples incl. unicode") {
    val md = MessageDigest.getInstance("MD5")
    samples.foreach { s =>
      val d = md.digest(s.getBytes("UTF-8"))
      val expected = java.lang.Long.parseLong(hexOf(d).substring(0, 15), 16)
      assert(Md5Bits.top60(d) === expected, s"top60 mismatch for '$s'")
      assert(Md5Bits.top60(d) >= 0L)
    }
  }

  test("mid60 == parseLong(hex[16,31), 16) on the same samples") {
    val md = MessageDigest.getInstance("MD5")
    samples.foreach { s =>
      val d = md.digest(s.getBytes("UTF-8"))
      val expected = java.lang.Long.parseLong(hexOf(d).substring(16, 31), 16)
      assert(Md5Bits.mid60(d) === expected, s"mid60 mismatch for '$s'")
      assert(Md5Bits.mid60(d) >= 0L)
    }
  }

  test("hash60 matches the oracle formula conv(substr(md5(s),1,15),16,10)") {
    val md = MessageDigest.getInstance("MD5")
    samples.foreach { s =>
      val hex = hexOf(md.digest(s.getBytes("UTF-8")))
      assert(Md5Bits.hash60(s) === java.lang.Long.parseLong(hex.take(15), 16))
    }
  }

  test("prefix+elem md5 equals md5 of the concatenated string") {
    val md = MessageDigest.getInstance("MD5")
    for (j <- 0 until 4; e <- Seq("tok", "café", "")) {
      val whole = md.digest(s"$j:$e".getBytes("UTF-8"))
      val split = Md5Bits.md5(s"$j:".getBytes("UTF-8"), e.getBytes("UTF-8"))
      assert(split.toSeq === whole.toSeq)
    }
  }
}
