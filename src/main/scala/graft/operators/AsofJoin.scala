package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: attach to each left row the most recent right row with
 * `right.ts <= left.ts`, per key — the standard event-enrichment join
 * (DuckDB `ASOF JOIN`, pandas `merge_asof`, kdb `aj`).
 *
 * A naive formulation is a range join (quadratic pair scan in Spark) or a
 * per-left-row correlated subquery. The scalable Spark shape is
 * UNION-TAG + RUNNING WINDOW:
 *
 *   1. tag right rows 0, left rows 1; union by name
 *   2. one shuffle: partition by key, sort by (ts, tag, payload)
 *   3. running `last(payload, ignoreNulls)` — each left row sees the
 *      latest right payload at or before its ts
 *   4. keep tag=1 rows
 *
 * ONE shuffle keyed by the join key, linear work, no range explosion — at
 * 100 TB this is a sort-merge pass, exactly how a cluster should do it.
 * Ties: a right row at exactly left.ts IS visible (tag 0 sorts first) —
 * inclusive semantics matching DuckDB's `ON l.ts >= r.ts`. Multiple right
 * rows on the same (key, ts) resolve deterministically to the greatest
 * payload struct.
 *
 * Left semantics: left rows with no prior right row keep NULL payload
 * columns (ASOF LEFT JOIN).
 */
object AsofJoin {

  /**
   * @param on       equi-key column names (present in both inputs)
   * @param leftTs   ordering column in `left`
   * @param rightTs  ordering column in `right`
   * @param payload  right columns to attach (other right columns dropped)
   * @param prefix   prepended to attached payload column names
   */
  def asof(left: DataFrame, right: DataFrame, on: Seq[String],
           leftTs: String, rightTs: String, payload: Seq[String],
           prefix: String = "asof_"): DataFrame = {
    require(payload.nonEmpty, "asof join needs at least one payload column")
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(_.startsWith("__asof")), "left already has __asof columns")

    // SQL as-of semantics (DuckDB `ON l.k = r.k AND l.ts >= r.ts`): a right
    // row with NULL ts or a NULL key value can never satisfy the predicate,
    // but unfiltered it would sort before every real row (nulls first) and
    // become a universally-visible marker / group with NULL left keys. Drop
    // such rows up front. (Left NULL-ts/key rows need no handling: they sort
    // before any surviving right row in their partition and keep NULL payload.)
    val rUsable = on.foldLeft(right.where(col(rightTs).isNotNull)) {
      (df, k) => df.where(col(k).isNotNull)
    }
    val rTagged = rUsable.select(
      on.map(col) ++ Seq(
        col(rightTs).as("__asof_ts"),
        struct(payload.map(col): _*).as("__asof_p"),
        lit(0).as("__asof_tag")): _*)
    val lTagged = left.select(
      leftCols.map(col) ++ Seq(
        col(leftTs).as("__asof_ts"),
        lit(1).as("__asof_tag")): _*)

    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val w = (if (on.isEmpty) Window.partitionBy() else Window.partitionBy(on.map(col): _*))
      .orderBy(col("__asof_ts"), col("__asof_tag"), col("__asof_p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("__asof_filled",
      last(col("__asof_p"), ignoreNulls = true).over(w))

    val attached: Seq[Column] = payload.map(p => col(s"__asof_filled.$p").as(s"$prefix$p"))
    filled.where(col("__asof_tag") === 1)
      .select(leftCols.map(col) ++ attached: _*)
  }
}
