package graft

import graft.functions.TextFns
import graft.geom.Curves
import org.scalatest.funsuite.AnyFunSuite

/** Pinned values for the hash/curve primitives: these exact outputs are what
  * rows-only queries (q_hilbert_quadkey, q_simhash, q_minhash_neardup,
  * q_lang_id) depend on staying stable across refactors. */
class DeterminismSpec extends AnyFunSuite {

  test("hilbert pins and locality ordering") {
    assert(Curves.hilbertXY(0, 0) == 0L)
    val h = Curves.hilbert(50.0, 50.0, 0, 0, 100, 100)
    assert(h == Curves.hilbert(50.0, 50.0, 0, 0, 100, 100)) // stable
    // quadrant ordering of the first-order curve: (0,0) quadrant comes first
    val q00 = Curves.hilbert(10, 10, 0, 0, 100, 100)
    val q11 = Curves.hilbert(90, 90, 0, 0, 100, 100)
    assert(q00 < q11)
    // monotone locality along an axis within a quadrant
    val a = Curves.hilbert(1, 1, 0, 0, 100, 100)
    val b = Curves.hilbert(2, 1, 0, 0, 100, 100)
    assert(math.abs(a - b) < (1L << 22)) // 0.1% of the 2^32 key space
  }

  test("quadkey pins") {
    // well-known Bing tile behavior: level-1 quadrants
    assert(Curves.quadKey(-90.0, 45.0, 1) == "0")
    assert(Curves.quadKey(90.0, 45.0, 1) == "1")
    assert(Curves.quadKey(-90.0, -45.0, 1) == "2")
    assert(Curves.quadKey(90.0, -45.0, 1) == "3")
    assert(Curves.quadKey(0.0, 0.0, 3).length == 3)
  }

  test("text hash pins are stable") {
    val fp = TextFns.fingerprint("hello world")
    assert(fp == TextFns.fingerprint("  HELLO   world "), "normalization-invariant")
    val sig1 = TextFns.minhash("the quick brown fox", 16, 4, 42)
    val sig2 = TextFns.minhash("the quick brown fox", 16, 4, 42)
    assert(sig1.toSeq == sig2.toSeq)
    val sh = TextFns.simhash("some document text", 4)
    assert(sh == TextFns.simhash("some document text", 4))
    // different seeds give different signatures
    assert(TextFns.minhash("abc def", 16, 4, 1).toSeq != TextFns.minhash("abc def", 16, 4, 2).toSeq)
  }

  test("minhash estimates jaccard") {
    val a = "the quick brown fox jumps over the lazy dog and runs away fast"
    val b = "the quick brown fox jumps over the lazy cat and runs away fast"
    val sa = TextFns.minhash(a, 128, 4, 7)
    val sb = TextFns.minhash(b, 128, 4, 7)
    val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / 128.0
    val exact = TextFns.jaccard(TextFns.charShingles(a, 4), TextFns.charShingles(b, 4))
    assert(math.abs(est - exact) < 0.15, s"minhash estimate $est vs exact $exact")
  }
}
