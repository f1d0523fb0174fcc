package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SimHash64

/** SimHash64 kernel invariants — the properties that make it a
  * near-dup signature (beyond the n04 oracle's value parity). */
class SimHashSpec extends AnyFunSuite {

  private def sh(tokens: Seq[String]): String =
    SimHash64.simhashHex(tokens.map(_.getBytes("UTF-8")).toArray)

  private def hamming(a: String, b: String): Int =
    a.zip(b).map { case (x, y) =>
      Integer.bitCount(Integer.parseInt(x.toString, 16) ^
        Integer.parseInt(y.toString, 16))
    }.sum

  test("permutation-invariant: token order never changes the digest") {
    val rnd = new scala.util.Random(3)
    val toks = Seq.fill(40)(rnd.nextInt(12).toString)
    val base = sh(toks)
    (1 to 10).foreach { _ =>
      assert(sh(rnd.shuffle(toks)) == base)
    }
  }

  test("locality: one changed token among many moves few bits; disjoint texts move many") {
    val rnd = new scala.util.Random(5)
    val dists = (1 to 20).map { i =>
      val toks = Seq.fill(60)(s"w${rnd.nextInt(30)}")
      val mutated = toks.updated(rnd.nextInt(toks.length), s"x$i")
      hamming(sh(toks), sh(mutated))
    }
    // majority vote over 60 tokens: one substitution flips only bits
    // whose margin was 1 — empirically small
    assert(dists.max <= 16, dists)
    val a = sh(Seq.fill(60)("aaa"))
    val b = sh(Seq.fill(60)("zzz"))
    assert(hamming(a, b) >= 20) // unrelated content is far apart
  }

  test("degenerate inputs: empty token set and single token are total") {
    assert(sh(Seq.empty).length == 16)
    assert(sh(Seq.empty) == "0000000000000000") // no majorities
    // single token: digest == first 16 hex of its md5 (every bit's
    // majority is that token's bit)
    val one = sh(Seq("hello"))
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("hello".getBytes("UTF-8"))
    val expect = md.take(8).map(b => f"${b & 0xff}%02x").mkString
    assert(one == expect)
  }
}
