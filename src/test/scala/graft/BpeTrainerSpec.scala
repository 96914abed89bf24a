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

  test("symbols above U+00FF (Polish/CJK) survive merge patterns verbatim") {
    import spark.implicits._
    // 'ł' = U+0142, '楽' = U+697D: a char()-rendered pattern would mask these
    // to & 0xFF and silently corrupt the merge; literal Columns must not
    val docs = Seq((1L, "była była była miła miła 楽しい 楽しい")).toDF("id", "text")
    val merges = BpeTrainer.learnMerges(spark, docs, "text", rounds = 2)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // 'ła' appears in była(3) + miła(2) = 5 — the top pair, with ł intact
    assert(merges.head == ("ł", "a", 5L), merges.toString)
    val counts = BpeTrainer.tokenCounts(spark, docs, "text",
      merges.map(m => (m._1, m._2)))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // była -> b,y,ła (3) x3; miła -> m,i,ła (3) x2 = 15 so far; the second
    // merge applies to whichever pair won round 2 — recompute expectation
    val strict = {
      def apply1(word: Seq[String], m: (String, String)): Seq[String] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < word.length) {
          if (i + 1 < word.length && word(i) == m._1 && word(i + 1) == m._2) {
            out += (m._1 + m._2); i += 2
          } else { out += word(i); i += 1 }
        }
        out.toSeq
      }
      val ws = Seq("była", "była", "była", "miła", "miła", "楽しい", "楽しい")
      ws.map { w =>
        merges.map(m => (m._1, m._2))
          .foldLeft(w.map(_.toString): Seq[String]) { (acc, m) => apply1(acc, m) }.length
      }.sum
    }
    assert(counts(1L) == strict.toLong, s"got=${counts(1L)} want=$strict ($merges)")
  }

  test("batched learning with lineage checkpoints reaches deep vocab and stays greedy-consistent") {
    import spark.implicits._
    // a corpus rich enough for 24 merges; batch=4 + checkpointEvery=6 walks
    // the batched path AND the localCheckpoint path several times
    val words = Seq(
      "internationalization", "internationalize", "international",
      "intercontinental", "understanding", "understatement",
      "transformation", "transformer", "information", "informal",
      "performance", "performer", "deterministic", "determination")
    val docs = Seq(words.mkString(" ") + " " + words.take(7).mkString(" ")).toDF("text")
    val batched = BpeTrainer.learnMerges(spark, docs, "text",
      rounds = 24, batch = 4, checkpointEvery = 6)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    assert(batched.size == 24, s"got ${batched.size}")
    assert(batched.map(_._1) == (1 to 24), "rounds must be sequential application order")
    // the first merge of every batch equals strict greedy's choice at that
    // point; spot-check the very first against batch=1
    val strict = BpeTrainer.learnMerges(spark, docs, "text", rounds = 1)
      .collect().map(r => (r.getString(1), r.getString(2))).head
    assert((batched.head._2, batched.head._3) == strict)
    // encode with the full batched vocab completes and is positive
    val counts = BpeTrainer.tokenCounts(spark, docs, "text",
      batched.map(m => (m._2, m._3)))
      .collect().map(_.getLong(1))
    assert(counts.forall(_ > 0))
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
