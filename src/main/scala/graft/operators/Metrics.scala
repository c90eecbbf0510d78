package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-scale evaluation metrics for trained curation filters. */
object Metrics {

  /** Tie-corrected ROC AUC of `scoreCol` as a predictor of binary
    * `labelCol` (0/1), computed EXACTLY at any scale.
    *
    * Mann-Whitney group form: aggregate (pos_s, neg_s) per distinct
    * score, prefix-sum the negatives over ascending score through the
    * window-free [[Rank.withRunningTotal]], then
    * AUC = Σ_s pos_s · (2·cumneg_<s + neg_s) / (2·P·N). The score-group
    * frame is one row per distinct score — tiny after the aggregate — but
    * stays a dataframe end to end; integer arithmetic until the final
    * division makes the value bit-exact cross-engine, and ties get the
    * standard midrank correction instead of an arbitrary row_number
    * tie-break (a per-row rank-sum would be order-dependent under ties).
    *
    * AUC is undefined on single-class input (n_pos·n_neg = 0): rather
    * than silently propagating NULL/NaN into downstream threshold picks,
    * the plan raises an explicit error at execution time (`raise_error`
    * keeps the operator lazy — no extra eager count job).
    *
    * Returns one row: (auc rounded to 6, n_pos, n_neg). */
  def rocAuc(df: DataFrame, labelCol: Column, scoreCol: Column): DataFrame = {
    val scored = df.select(labelCol.cast("long").as("y"), scoreCol.as("score"))
    val g = scored.groupBy(col("score"))
      .agg(sum(col("y")).as("pos"), sum(lit(1L) - col("y")).as("neg"))
    val c = Rank.withRunningTotal(g, Seq(col("score").asc), col("neg"),
      totalCol = "cumneg")
    val tot = g.agg(sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"))
    c.agg(sum(col("pos") * (lit(2L) * (col("cumneg") - col("neg")) + col("neg")))
        .as("num2"))
      .crossJoin(broadcast(tot))
      .select(
        when(col("n_pos") > 0 && col("n_neg") > 0,
            round(col("num2") / (lit(2.0) * col("n_pos") * col("n_neg")), 6))
          .otherwise(raise_error(concat(
            lit("rocAuc: undefined on single-class input (n_pos="),
            col("n_pos"), lit(", n_neg="), col("n_neg"), lit(")"))))
          .as("auc"),
        col("n_pos"), col("n_neg"))
  }

  /** Recall\@k of an approximate k-NN result against an exact one — the
    * evaluation harness the whole ANN family (LSH / IVF / PQ / index
    * lifecycle) is judged by, as a first-class distributed operator
    * instead of spec-local arithmetic. Both inputs carry the family's
    * (id_a, id_b, …, rank) contract; rows past `k` are ignored so a
    * deeper result can be evaluated at a shallower cut.
    *
    * Per anchor, recall = |approx ∩ exact| / |exact| (anchors are the
    * EXACT side's — an anchor the approximate path dropped entirely scores
    * 0, it doesn't vanish from the denominator). The summary row reports
    * the micro-averaged recall (Σhits / Σtotal — one division, so the
    * figure replays bit-exactly across engines; with every anchor at the
    * same k it equals the macro mean), the minimum per-anchor recall (the
    * tail the mean hides), and the fraction of anchors with perfect
    * recall.
    *
    * Scale shape: one (id_a, id_b)-keyed semi-join at n·k rows and two
    * id_a aggregates — partial-agg shuffles, no window, nothing driver-
    * side. Returns one row: (n_anchors, recall_micro, min_recall,
    * perfect_frac). */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    val a = approx.filter(col("rank") <= k).select(col("id_a"), col("id_b"))
    val e = exact.filter(col("rank") <= k).select(col("id_a"), col("id_b"))
    val hits = e.join(a, Seq("id_a", "id_b"), "left_semi")
      .groupBy(col("id_a")).agg(count(lit(1)).as("hits"))
    val per = e.groupBy(col("id_a")).agg(count(lit(1)).as("total"))
      .join(hits, Seq("id_a"), "left")
      .select(col("id_a"), coalesce(col("hits"), lit(0L)).as("hits"),
        col("total"))
    per.agg(
      count(lit(1)).as("n_anchors"),
      round(sum(col("hits")).cast("double") / sum(col("total")), 6)
        .as("recall_micro"),
      round(min(col("hits").cast("double") / col("total")), 6).as("min_recall"),
      round(sum(when(col("hits") === col("total"), 1L).otherwise(0L))
        .cast("double") / count(lit(1)), 6).as("perfect_frac"))
  }
}
