package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the ScaleUp per-copy letter bijection (VERDICT r9 ask #4
 * prerequisite): the affine family must stay collision-free out to the
 * 100-copy (sfx10) replica. The r9 Caesar version recycled at copy 26
 * (i % 26) — at copies=100 that planted verbatim cross-copy duplicates in
 * 4-copy groups, superlinearizing every dedup surface in the very bench
 * meant to certify linearity.
 */
class ScaleUpSpec extends AnyFunSuite {

  test("copy 0 is the identity map") {
    assert(ScaleUp.mappedAlphabet(0) == "abcdefghijklmnopqrstuvwxyz")
  }

  test("every map out to 312 copies is a permutation of the alphabet") {
    (0 until 312).foreach { i =>
      val m = ScaleUp.mappedAlphabet(i)
      assert(m.length == 26 && m.toSet.size == 26, s"copy $i not a bijection: $m")
    }
  }

  test("all 312 maps are pairwise distinct (no verbatim cross-copy text)") {
    val maps = (0 until 312).map(ScaleUp.mappedAlphabet)
    assert(maps.toSet.size == 312)
  }

  test("any two maps agree on at most two letters (no real token cross-collides)") {
    // slopes coprime to 26 are all odd → Δa is even → gcd(Δa, 26) ∈ {2, 26},
    // so two DISTINCT maps agree on exactly 0 or 2 letters: only a token
    // written entirely in those ≤2 fixed letters could cross-collide, and
    // a whole document never can.
    val maps = (0 until 100).map(ScaleUp.mappedAlphabet)
    for (i <- maps.indices; j <- (i + 1) until maps.length) {
      val agree = maps(i).zip(maps(j)).count { case (a, b) => a == b }
      assert(agree <= 2, s"copies $i,$j agree on $agree letters")
    }
  }

  test("copies beyond the affine family are rejected, not silently recycled") {
    intercept[IllegalArgumentException](ScaleUp.mappedAlphabet(312))
  }
}
