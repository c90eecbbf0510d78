package graft.gen

import org.scalatest.funsuite.AnyFunSuite

/** Bit-exact parity vectors computed by running the reference's Mulberry32
  * (reference: src/utils.ts:40-69) under Node.js. */
class RngSpec extends AnyFunSuite {

  test("mulberry32 seed=1 matches JS bit-exactly") {
    val r = new Mulberry32(1)
    val expected = Seq(0.6270739405881613, 0.002735721180215478, 0.5274470399599522,
      0.9810509674716741, 0.9683778982143849, 0.281103502959013, 0.6128388606011868,
      0.7207431411370635)
    expected.foreach(e => assert(r.next() == e))
  }

  test("mulberry32 seed=123456789 matches JS bit-exactly") {
    val r = new Mulberry32(123456789L)
    val expected = Seq(0.2577907438389957, 0.9707721115555614, 0.7853280142880976,
      0.20616457983851433)
    expected.foreach(e => assert(r.next() == e))
  }

  test("generateRandomStrings(5, 8) matches JS output") {
    assert(Rng.generateRandomStrings(5, 8) ==
      Seq("mAg88Rls", "a9ceIZPJ", "eEYvRLCa", "kxSMohvL", "scv9OuJU"))
  }

  test("vocabulary draws stay within alphabet and length") {
    val vs = Rng.generateRandomStrings(500, 8)
    assert(vs.size == 500)
    assert(vs.forall(_.length == 8))
    assert(vs.forall(_.forall(Rng.Alphabet.contains(_))))
    assert(vs.distinct.size > 490) // 62^8 space → collisions vanishingly rare
  }
}
