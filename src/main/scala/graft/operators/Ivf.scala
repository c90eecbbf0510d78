package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) similarity index: k-means coarse quantizer + cluster-
  * pruned search — the classic scale path for ANN next to LSH.
  *
  * Execution shape at 100 TB:
  *  - training iterates assign → recenter; assignment is a native codegen'd
  *    argmin over the codebook (k × dim doubles — a few MB for k ≤ 4096),
  *    recentering is one `posexplode` + grouped average (single shuffle of
  *    (cluster, dim, value) triples). No driver-side data beyond the
  *    codebook itself.
  *  - the index is the corpus keyed by `cluster` — written out, that column
  *    is the partition key, so a query reads only `nprobe` clusters.
  *  - search = filter `cluster ∈ nprobe nearest` → exact rank of the
  *    candidate set with the native codegen'd cosine (scan cost ≈
  *    nprobe/k of the corpus).
  *
  * Everything is deterministic: initial centroids are picked by xxhash64
  * order, so training reproduces bit-identically.
  */
object Ivf {

  final case class Codebook(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
    def nearest(v: Array[Double], n: Int): Seq[Int] =
      centroids.indices
        .map(c => c -> sqDist(centroids(c), v))
        .sortBy { case (c, d) => (d, c) }
        .take(n).map(_._1)
  }

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Two-level search structure over a trained codebook — the learned twin
    * of the portable hierarchical rule
    * ([[graft.functions.VectorExpressions.PortableIvfAssign]]): the k
    * centroids are grouped into `S = ceil(sqrt(k))` clusters by a tiny
    * driver-side k-means over the CENTROIDS themselves, and a lookup scans
    * the S super-centroids then only the winning group's members —
    * O(√k·dims) instead of O(k·dims) per row. Used by
    * [[Similarity.semanticDedupKmeans]] above the flat-scan threshold,
    * where k ∝ n turns flat assignment into the measured O(n²) stage.
    * Unlike the contiguous-block portable split, groups here are SEMANTIC
    * (nearby centroids share a super-cell), so the two-level argmin tracks
    * the flat argmin closely — the hierarchical-parity spec measures the
    * agreement. */
  final case class Hier(supers: Array[Array[Double]], blocks: Array[Array[Int]],
      cb: Codebook) {
    /** Driver-side mirror of the scan expression: argmin over non-empty
      * super groups (lowest g ties), then argmin within the winner's member
      * block (lowest centroid index ties). */
    def nearest(v: Array[Double]): Int = {
      var g = -1; var gd = Double.MaxValue
      var i = 0
      while (i < supers.length) {
        if (blocks(i).nonEmpty) {
          val d = sqDist(supers(i), v)
          if (d < gd) { gd = d; g = i }
        }
        i += 1
      }
      var best = -1; var bd = Double.MaxValue
      for (c <- blocks(g)) {
        val d = sqDist(cb.centroids(c), v)
        if (d < bd) { bd = d; best = c }
      }
      best
    }
  }

  /** Group a codebook's centroids into ceil(sqrt(k)) super-cells with a
    * deterministic driver-side k-means (init = every ceil(k/S)-th centroid,
    * fixed iteration count; k centroids × a few dims — microseconds). */
  def hierarchy(cb: Codebook, iters: Int = 10): Hier = {
    val k = cb.k
    val s = { var b = math.sqrt(k.toDouble).toInt; while (b.toLong * b < k) b += 1; b }
    val dims = cb.centroids.head.length
    var supers = Array.tabulate(s)(j => cb.centroids((j.toLong * k / s).toInt).clone())
    var assign = new Array[Int](k)
    (1 to iters).foreach { _ =>
      assign = cb.centroids.map { c =>
        var g = 0; var gd = Double.MaxValue
        var i = 0
        while (i < s) { val d = sqDist(supers(i), c); if (d < gd) { gd = d; g = i }; i += 1 }
        g
      }
      val next = Array.fill(s)(new Array[Double](dims))
      val cnt = new Array[Int](s)
      for (ci <- 0 until k) {
        val g = assign(ci); cnt(g) += 1
        val c = cb.centroids(ci)
        var j = 0; while (j < c.length) { next(g)(j) += c(j); j += 1 }
      }
      for (g <- 0 until s) {
        if (cnt(g) > 0) { var j = 0; while (j < dims) { next(g)(j) /= cnt(g); j += 1 } }
        else next(g) = supers(g) // empty group keeps its centroid
      }
      supers = next
    }
    val blocks = Array.tabulate(s)(g => (0 until k).filter(assign(_) == g).toArray)
    Hier(supers, blocks, cb)
  }

  private def toDoubleArray(r: Row, field: String): Array[Double] =
    r.getAs[scala.collection.Seq[Float]](field).iterator.map(_.toDouble).toArray

  /** Deterministic k-means over an `Array[Float]` embedding column. */
  def train(
      df: DataFrame,
      vecCol: String,
      k: Int,
      iters: Int = 5,
      seed: Long = 1L
  ): Codebook = {
    // deterministic init: the k vectors with the smallest xxhash64(seed, vec)
    var centroids: Array[Array[Double]] = df
      .select(col(vecCol).as("v"))
      .withColumn("h", xxhash64(lit(seed), col("v")))
      .orderBy("h").limit(k)
      .collect().map(toDoubleArray(_, "v"))

    (1 to iters).foreach { _ =>
      val assigned = assign(df, vecCol, Codebook(centroids)).select("cluster", "v")
      // recenter: mean per (cluster, dim); empty clusters keep their centroid.
      // The collect is bounded at k × dim rows — codebook-sized, not corpus-sized.
      val means = assigned
        .select(col("cluster"), posexplode(col("v")))
        .groupBy("cluster", "pos").agg(avg(col("col").cast("double")).as("m"))
        .collect()
      val next = centroids.map(_.clone())
      means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      centroids = next
    }
    Codebook(centroids)
  }

  /** (…, v, cluster) assignment frame: argmin over the codebook as a native
    * scalar expression ([[graft.functions.VectorExpressions.NearestCentroid]])
    * — the scan stays columnar and whole-stage-codegen'd; no RDD conversion,
    * no per-row `Row` copies. Tie-break matches [[Codebook.nearest]]
    * (lowest cluster index). */
  def assign(df: DataFrame, vecCol: String, codebook: Codebook): DataFrame =
    df.withColumnRenamed(vecCol, "v")
      .withColumn("cluster",
        graft.functions.VectorExpressions.nearest_centroid(col("v"), codebook.centroids))

  /** Build the searchable index: corpus + cluster id (at rest this is
    * written partitioned by `cluster`). */
  def buildIndex(df: DataFrame, idCol: String, vecCol: String, codebook: Codebook): DataFrame =
    assign(df.select(col(idCol).as("id"), col(vecCol)), vecCol, codebook)
      .select(col("id"), col("v"), col("cluster"))

  /** Approximate top-k: probe the `nprobe` nearest clusters, exact-rank the
    * candidates with the native cosine. */
  def topK(
      index: DataFrame,
      codebook: Codebook,
      query: Seq[Float],
      k: Int,
      nprobe: Int = 4
  ): DataFrame = {
    val qd = query.iterator.map(_.toDouble).toArray
    val probes = codebook.nearest(qd, nprobe)
    val qn = math.sqrt(qd.iterator.map(x => x * x).sum)
    val qf = array(query.map(lit(_)): _*)
    index
      .filter(col("cluster").isin(probes: _*))
      .select(col("id"),
        round(Similarity.dot(col("v"), qf) /
          (Similarity.l2norm(col("v")) * lit(qn)), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)
  }
}
