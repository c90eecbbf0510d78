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
}
