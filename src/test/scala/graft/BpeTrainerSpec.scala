package graft

import graft.operators.BpeTrainer
import org.scalatest.funsuite.AnyFunSuite

class BpeTrainerSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("learns the classic low/lower/newest merges in frequency order") {
    import spark.implicits._
    // Sennrich et al.'s worked vocabulary: low x5, lower x2, newest x6, widest x3
    val docs = Seq(
      (("low " * 5) + ("lower " * 2) + ("newest " * 6) + ("widest " * 3))
    ).toDF("text")
    val merges = BpeTrainer.learnMerges(spark, docs, "text", rounds = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // round 1: 'es' appears in newest(6)+widest(3) = 9 — the max pair;
    // round 2: 'es'+'t' = 9; round 3: 'lo' in low(5)+lower(2) = 7
    assert(merges == Seq((1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L)),
      merges.toString)
  }

  test("apostrophes in symbols survive pattern generation; empty docs keep 0") {
    import spark.implicits._
    val docs = Seq((1L, "don't don't don't can't"), (2L, "   ")).toDF("id", "text")
    val merges = BpeTrainer.learnMerges(spark, docs, "text", rounds = 2)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // (n,') and (',t) tie at 4; lexicographic tie-break picks (',t) first
    // (ASCII 39 < 110), then (n,'t) merges — symbols containing ' flow
    // through the char()-built replace patterns unharmed
    assert(merges.head == ("'", "t", 4L), merges.toString)
    assert(merges(1) == ("n", "'t", 4L), merges.toString)
    val counts = BpeTrainer.tokenCounts(spark, docs, "text", merges.map(m => (m._1, m._2)))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // don't = d,o,n't (3 symbols) x3; can't = c,a,n't (3)
    assert(counts(1L) == 12L, counts.toString)
    assert(counts(2L) == 0L, "whitespace-only doc must surface with 0 tokens")
  }

  test("multi-char boundary safety: merged symbols never match inside neighbors") {
    import spark.implicits._
    // after merging (a,b) the word 'xab' must NOT let pair (x,ab) be
    // miscounted as matching inside other words like 'cab'
    val docs = Seq(("abab abab cab")).toDF("text")
    val merges = BpeTrainer.learnMerges(spark, docs, "text", rounds = 2)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.head == ("a", "b")) // ab x5 total
    // second merge must be between REAL adjacent symbols only
    assert(Seq(("ab", "ab"), ("c", "ab")).contains(merges(1)), merges.toString)
  }
}
