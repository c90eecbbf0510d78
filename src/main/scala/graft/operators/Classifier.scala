package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine trained quality classifier — the role a fastText/logistic
  * model plays in web-corpus curation (CCNet-style: score every document
  * against a small labeled target, keep the confident slice). No ML
  * runtime: full-batch logistic regression IS a sequence of aggregates,
  * and Spark's aggregate is exactly the distributed primitive it needs.
  *
  * Each gradient-descent iteration is ONE map-side-combinable aggregate
  * over the feature frame — current weights travel into the scan as
  * literals (re-planned each iteration, so whole-stage codegen compiles
  * the sigmoid with constant weights), and (1 + nFeatures + 1) sums come
  * back to the driver. Driver state is the weight vector; iteration
  * count is a bounded constant. At corpus scale the skinny feature
  * projection (label + a few doubles) is persisted once, so K iterations
  * cost K scans of a few-GB cached column batch, not K scans of the
  * 100 TB text.
  *
  * Determinism: features are per-row closed-form expressions, so the only
  * cross-engine divergence in an ANSI replay is double-sum order inside
  * the gradient (~1e-12 relative per iteration) — far below the 6-decimal
  * rounding on emitted scores. That is what makes the trained model
  * DuckDB-oracle-checkable end to end (unrolled iteration CTEs).
  */
object Classifier {

  /** Fit logistic weights (bias +: one per feature) by `iters` full-batch
    * gradient steps at learning rate `lr`, from zero initialization.
    *
    * `df` must carry `labelCol` in {0,1}; features are arbitrary numeric
    * expressions over its columns. The feature projection is persisted
    * for the duration of the fit (K scans of the skinny frame) and
    * unpersisted before returning. */
  def logisticFit(
      df: DataFrame,
      labelCol: Column,
      featureCols: Seq[Column],
      iters: Int = 5,
      lr: Double = 1.0
  ): Array[Double] = {
    require(featureCols.nonEmpty, "logisticFit needs at least one feature")
    require(iters >= 1, "logisticFit needs at least one iteration")
    val feats = df.select(
      (labelCol.cast("double").as("__y") +:
        featureCols.zipWithIndex.map { case (c, i) => c.cast("double").as(s"__f$i") }): _*)
      .persist()
    try {
      var w = Array.fill(featureCols.size + 1)(0.0)
      for (_ <- 1 to iters) {
        val err = margin(w, featureCols.indices.map(i => col(s"__f$i"))) - col("__y")
        val aggs =
          (sum(err).as("g0") +:
            featureCols.indices.map(i => sum(err * col(s"__f$i")).as(s"g${i + 1}"))) :+
            count(lit(1)).as("n")
        val r = feats.agg(aggs.head, aggs.tail: _*).head()
        val n = r.getLong(w.length).toDouble
        w = w.zipWithIndex.map { case (wj, j) => wj - lr * r.getDouble(j) / n }
      }
      w
    } finally feats.unpersist(blocking = false)
  }

  /** Predicted probability column for `weights` over `featureCols`. */
  def logisticScore(weights: Array[Double], featureCols: Seq[Column]): Column =
    margin(weights, featureCols)

  /** sigmoid(bias + w · x) with the weights inlined as literals. */
  private def margin(w: Array[Double], fs: Seq[Column]): Column = {
    val z = fs.zipWithIndex.foldLeft(lit(w(0))) { case (acc, (f, i)) =>
      acc + lit(w(i + 1)) * f
    }
    lit(1.0) / (lit(1.0) + exp(-z))
  }
}
