package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

/**
 * Distributed BPE merge learning (Sennrich et al. 2016) — the tokenizer
 * pre-training step run on the corpus itself:
 *
 *   1. word frequency dictionary (one groupBy over normalized tokens)
 *   2. each round: count adjacent symbol pairs weighted by word frequency
 *      (map-side combined), take the max pair (count desc, then
 *      lexicographic — deterministic), merge it in every word
 *
 * Words are SEP-joined symbol strings with outer SEPs (SEP = U+0001, absent
 * from text after control-char filtering), so a merge is one non-overlapping
 * left-to-right string replace — exactly the greedy BPE apply rule — and
 * boundary-safe for multi-char symbols (a pattern must sit between SEPs).
 * Each round is one shuffle (pair groupBy) + one bounded driver row (the
 * argmax pair); the dictionary itself never leaves the cluster.
 */
object BpeTrainer {

  val Sep = "\u0001" // escaped: a raw control char would flip the file to binary for git

  /** Render a symbol as a SQL expression built purely from char() calls —
   *  no string literal, so apostrophes/backslashes in learned symbols can't
   *  corrupt the generated replace pattern. (BMP code units; the corpus
   *  tokens are split per code unit upstream.) */
  private def litExpr(s: String): String =
    if (s.isEmpty) "''" else s.map(c => s"char(${c.toInt})").mkString("||")

  /** @return one row per learned merge: (round, p1, p2, cnt) */
  def learnMerges(spark: SparkSession, docs: DataFrame, textCol: String,
                  rounds: Int): DataFrame = {
    import spark.implicits._
    graft.Graft.register(spark)
    require(rounds >= 1)
    var words = docs
      .select(F.explode(F.expr(s"norm_tokens($textCol)")).as("w"))
      .where(!F.col("w").contains(Sep))
      .groupBy("w").agg(F.count(F.lit(1)).as("cnt"))
      .select(F.expr(
        "concat(char(1), concat_ws(char(1), array_remove(split(w, ''), '')), char(1)) AS sym"),
        F.col("cnt"))
      .cache()

    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (round <- 1 to rounds) {
      val best = words
        .select(F.expr("trim(BOTH char(1) FROM sym) AS t"), F.col("cnt"))
        .select(F.expr("split(t, char(1)) AS syms"), F.col("cnt"))
        .where(F.size(F.col("syms")) >= 2)
        .select(F.expr(
          """explode(zip_with(slice(syms, 1, size(syms) - 1),
                              slice(syms, 2, size(syms) - 1),
                              (a, b) -> struct(a AS p1, b AS p2))) AS pr"""),
          F.col("cnt"))
        .groupBy(F.col("pr.p1").as("p1"), F.col("pr.p2").as("p2"))
        .agg(F.sum("cnt").as("n"))
        .orderBy(F.col("n").desc, F.col("p1"), F.col("p2"))
        .limit(1).collect()
      if (best.isEmpty) {
        return learned.toSeq.toDF("round", "p1", "p2", "cnt")
      }
      val (p1, p2, n) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      learned += ((round, p1, p2, n))
      val next = words.select(F.expr(
        s"replace(sym, char(1)||${litExpr(p1)}||char(1)||${litExpr(p2)}, " +
          s"char(1)||${litExpr(p1 + p2)}) AS sym"),
        F.col("cnt")).cache()
      words.unpersist()
      words = next
    }
    words.unpersist()
    learned.toSeq.toDF("round", "p1", "p2", "cnt")
  }

  /** Apply learned merges in order and count the resulting BPE tokens per
   *  row — the encode half. Same SEP-delimited replace as training, so
   *  application is exactly the greedy rule the merges were learned under. */
  def tokenCounts(spark: SparkSession, docs: DataFrame, textCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    graft.Graft.register(spark)
    val sym0 =
      s"concat(char(1), concat_ws(char(1), array_remove(split(w, ''), '')), char(1))"
    val applied = merges.foldLeft(sym0) { case (acc, (p1, p2)) =>
      s"replace($acc, char(1)||${litExpr(p1)}||char(1)||${litExpr(p2)}, char(1)||${litExpr(p1 + p2)})"
    }
    val counts = docs.selectExpr("*", s"explode(norm_tokens($textCol)) AS w")
      .where(!F.col("w").contains(Sep))
      .selectExpr("*", s"size(split(trim(BOTH char(1) FROM $applied), char(1))) AS n_sym")
      .groupBy(docs.columns.map(F.col): _*)
      .agg(F.sum("n_sym").as("bpe_tokens"))
    // docs with zero tokens must surface with 0, not vanish in the explode
    docs.join(counts, docs.columns.toSeq, "left")
      .na.fill(0L, Seq("bpe_tokens"))
  }
}
