package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession, functions => F}

/**
 * Distributed BPE merge learning (Sennrich et al. 2016) — the tokenizer
 * pre-training step run on the corpus itself:
 *
 *   1. word frequency dictionary (one groupBy over normalized tokens)
 *   2. each round: count adjacent symbol pairs weighted by word frequency
 *      (map-side combined), take the best pair(s) (count desc, then
 *      lexicographic — deterministic), merge them in every word
 *
 * Words are SEP-joined symbol strings with outer SEPs (SEP = U+0001, absent
 * from text after control-char filtering), so a merge is one non-overlapping
 * left-to-right string replace — exactly the greedy BPE apply rule — and
 * boundary-safe for multi-char symbols (a pattern must sit between SEPs).
 * Patterns and replacements are passed as Column LITERALS (F.lit), never
 * rendered into SQL text, so any Unicode symbol — including code units
 * > U+00FF (ł, ğ, đ, CJK) — survives verbatim and no quoting/injection
 * handling is needed.
 *
 * Scale: each round is one shuffle (pair groupBy) + one bounded driver
 * collect (the top handful of pairs); the dictionary never leaves the
 * cluster. Real vocab sizes are reachable via two levers:
 *   - `batch` > 1 applies up to `batch` symbol-disjoint top pairs per round
 *     (classic batched BPE: pairs sharing no symbol have counts unaffected
 *     by each other's application, so their pre-batch counts stay exact;
 *     the only divergence from strict greedy is that a pair CREATED by an
 *     earlier merge in the batch cannot preempt a later one — the standard
 *     trade for rounds/batch fewer Spark jobs).
 *   - the symbol table is `localCheckpoint`ed every `checkpointEvery`
 *     merges, truncating the replace-chain lineage so a 32 k-merge run's
 *     plan depth stays bounded instead of growing one Replace per merge.
 */
object BpeTrainer {

  val Sep = "\u0001" // escaped: a raw control char would flip the file to binary for git

  private def mergePattern(p1: String, p2: String): (Column, Column) =
    (F.lit(Sep + p1 + Sep + p2), F.lit(Sep + p1 + p2))

  /** Strict-greedy learning: one merge per round (matches the reference
   *  greedy rule the oracle unrolls). */
  def learnMerges(spark: SparkSession, docs: DataFrame, textCol: String,
                  rounds: Int): DataFrame =
    learnMerges(spark, docs, textCol, rounds, batch = 1, checkpointEvery = 16)

  /** @param rounds total number of merges to learn
   *  @param batch max symbol-disjoint merges applied per counting round
   *  @param checkpointEvery merges between lineage-truncating localCheckpoints
   *  @return one row per learned merge: (round, p1, p2, cnt); `round` is the
   *          merge's global application order (1-based), `cnt` the pair count
   *          measured when its batch was selected */
  def learnMerges(spark: SparkSession, docs: DataFrame, textCol: String,
                  rounds: Int, batch: Int, checkpointEvery: Int): DataFrame = {
    import spark.implicits._
    graft.Graft.register(spark)
    require(rounds >= 1 && batch >= 1 && checkpointEvery >= 1)
    // `base` is the materialized symbol table; merges applied since the last
    // materialization live in `pending` as an expression chain over it. Rounds
    // between checkpoints therefore schedule exactly ONE job (the pair-count
    // collect) instead of also re-persisting a new table per round — round t
    // re-evaluates at most checkpointEvery string replaces over the cached
    // base, which is noise next to the groupBy it feeds. (The previous shape
    // cached a fresh table every round and unpersisted the old one: one extra
    // materialization pass + storage churn per merge, pure overhead at any
    // scale since the replace chain is bounded by checkpointEvery anyway.)
    var base = docs
      .select(F.explode(F.expr(s"norm_tokens($textCol)")).as("w"))
      .where(!F.col("w").contains(Sep))
      .groupBy("w").agg(F.count(F.lit(1)).as("cnt"))
      .select(
        F.concat(F.lit(Sep),
          F.concat_ws(Sep, F.array_remove(F.split(F.col("w"), ""), "")),
          F.lit(Sep)).as("sym"),
        F.col("cnt"))
      .cache()
    var pending: List[(String, String)] = Nil
    def words: DataFrame = {
      val sym = pending.reverse.foldLeft(F.col("sym")) { case (c, (p1, p2)) =>
        val (pat, rep) = mergePattern(p1, p2)
        F.replace(c, pat, rep)
      }
      base.select(sym.as("sym"), F.col("cnt"))
    }

    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var sinceCkpt = 0
    while (learned.size < rounds) {
      val want = math.min(batch, rounds - learned.size)
      // over-fetch so disjoint selection usually fills the batch in one pass
      val top = words
        .select(F.split(F.btrim(F.col("sym"), F.lit(Sep)), Sep).as("syms"), F.col("cnt"))
        .where(F.size(F.col("syms")) >= 2)
        .select(F.expr(
          """explode(zip_with(slice(syms, 1, size(syms) - 1),
                              slice(syms, 2, size(syms) - 1),
                              (a, b) -> struct(a AS p1, b AS p2))) AS pr"""),
          F.col("cnt"))
        .groupBy(F.col("pr.p1").as("p1"), F.col("pr.p2").as("p2"))
        .agg(F.sum("cnt").as("n"))
        .orderBy(F.col("n").desc, F.col("p1"), F.col("p2"))
        .limit(math.max(want * 8, 16)).collect()
      if (top.isEmpty) {
        base.unpersist()
        return learned.toSeq.toDF("round", "p1", "p2", "cnt")
      }
      // greedy symbol-disjoint selection in (count desc, lex) order
      val sel = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      val used = scala.collection.mutable.Set.empty[String]
      var i = 0
      while (i < top.length && sel.size < want) {
        val (p1, p2, n) = (top(i).getString(0), top(i).getString(1), top(i).getLong(2))
        if (!used(p1) && !used(p2)) {
          sel += ((p1, p2, n)); used += p1; used += p2; used += (p1 + p2)
        }
        i += 1
      }
      sel.foreach { case (p1, p2, n) => learned += ((learned.size + 1, p1, p2, n)) }
      sel.foreach { case (p1, p2, _) => pending = (p1, p2) :: pending }
      sinceCkpt += sel.size
      // Lineage truncation cadence: materialize the accumulated replace chain
      // every `checkpointEvery` merges. localCheckpoint is EAGER: it runs
      // while `base` is still persisted, so the subsequent unpersist can
      // never force a recompute through truncated lineage.
      if (sinceCkpt >= checkpointEvery) {
        sinceCkpt = 0
        val next = words.localCheckpoint()
        base.unpersist()
        base = next
        pending = Nil
      }
    }
    base.unpersist()
    learned.toSeq.toDF("round", "p1", "p2", "cnt")
  }

  /** Apply learned merges in order and count the resulting BPE tokens per
   *  row — the encode half. Same SEP-delimited literal replace as training,
   *  so application is exactly the greedy rule the merges were learned
   *  under, for any Unicode symbol. */
  def tokenCounts(spark: SparkSession, docs: DataFrame, textCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    graft.Graft.register(spark)
    val sym0 = F.concat(F.lit(Sep),
      F.concat_ws(Sep, F.array_remove(F.split(F.col("w"), ""), "")),
      F.lit(Sep))
    val applied = merges.foldLeft(sym0) { case (acc, (p1, p2)) =>
      val (pat, rep) = mergePattern(p1, p2)
      F.replace(acc, pat, rep)
    }
    val counts = docs
      .withColumn("w", F.explode(F.expr(s"norm_tokens($textCol)")))
      .where(!F.col("w").contains(Sep))
      .withColumn("n_sym", F.size(F.split(F.btrim(applied, F.lit(Sep)), Sep)))
      .groupBy(docs.columns.map(F.col): _*)
      .agg(F.sum("n_sym").as("bpe_tokens"))
    // docs with zero tokens must surface with 0, not vanish in the explode
    docs.join(counts, docs.columns.toSeq, "left")
      .na.fill(0L, Seq("bpe_tokens"))
  }
}
