package graft.scratch

import org.apache.spark.sql.SparkSession

/** One-off scale probe: learn 256 BPE merges on sf0.1 documents with
 *  batching + lineage checkpoints; prints wall time. Run:
 *  sbt "Test/runMain graft.scratch.Bpe256Probe [sfDir] [merges] [batch]" */
object Bpe256Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val merges = args.lift(1).map(_.toInt).getOrElse(256)
    val batch = args.lift(2).map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.register(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val t0 = System.nanoTime()
    val m = graft.operators.BpeTrainer.learnMerges(
      spark, docs, "text", rounds = merges, batch = batch, checkpointEvery = 32)
    val rows = m.collect()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[bpe256] learned=${rows.length} merges in $sec%.1f s (batch=$batch)")
    println("[bpe256] last merges: " + rows.takeRight(5).map(r =>
      s"${r.getString(1)}+${r.getString(2)}(${r.getLong(3)})").mkString(", "))
    spark.stop()
  }
}
