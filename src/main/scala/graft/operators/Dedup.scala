package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed for
  * the 100 TB case:
  *
  *  - exact: one hash-aggregate shuffle on the dedup key.
  *  - MinHash + LSH: per-row signatures (scan-local), then one shuffle on
  *    (band, bucket) — candidate generation is O(near-dups), never O(N²).
  *  - SimHash: 64-bit signature per row, banded for Hamming-radius search.
  *  - n-gram Jaccard: inverted-index join with a hot-shingle cutoff so the
  *    shuffle stays bounded under Zipfian shingle frequencies.
  *
  * Signature computation is pure Catalyst expressions (higher-order functions
  * over token arrays) — no UDFs. Two execution-shape rules learned the hard
  * way and applied everywhere:
  *
  *  1. **Stage expensive array expressions as real projection steps.**
  *     Higher-order functions evaluate interpreted; an expression like
  *     `transform(seq(0,63), i -> f(shingles(text)))` re-evaluates the whole
  *     shingle pipeline (including the regex split) 64× per row. Separate
  *     `select`s materialize tokens → shingles → signature once per row, and
  *     `CollapseProject` keeps them apart because the references are non-cheap
  *     and multiply used.
  *  2. **Repartition before the signature stage.** A small corpus can arrive
  *     as one parquet split; signature computation is CPU-bound and must use
  *     every core. At scale the input is already wide — the repartition is
  *     then a cheap rebalance of an embarrassingly parallel stage.
  */
object Dedup {

  /** Exact dedup: keep the lowest id per distinct key; report copy count.
    * One shuffle on the key (map-side partial aggregation applies). */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Whitespace tokens of lowercased text. */
  private def toks(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Word n-gram shingles from a token-array column, distinct. */
  def shinglesFromTokens(tk: Column, n: Int): Column =
    array_distinct(
      when(size(tk) < n, array(concat_ws(" ", tk)))
        .otherwise(transform(sequence(lit(1), size(tk) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k => element_at(tk, i + k)): _*))))

  /** Word n-gram shingles of `text` (default 3-word shingles), distinct.
    * Prefer the staged [[shinglesFromTokens]] inside dataframe pipelines. */
  def shingles(text: Column, n: Int = 3): Column = shinglesFromTokens(toks(text), n)

  /** (id, shingles) projection, staged and repartitioned for the CPU-bound
    * signature stages that follow. */
  private def shingleFrame(df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int): DataFrame = {
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    df.select(col(idCol).as("id"), toks(col(textCol)).as("tk"))
      .repartition(parallelism)
      .select(col("id"), shinglesFromTokens(col("tk"), shingleLen).as("sh"))
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * minimum xxhash64 over the row's shingle set. Scan-local, no shuffle. */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(sh, s => xxhash64(i, s))))

  /** Estimated Jaccard from two signatures: fraction of agreeing slots. */
  def signatureSimilarity(a: Column, b: Column): Column =
    size(filter(zip_with(a, b, (x, y) => x === y), identity(_))) /
      size(a).cast("double")

  /** MinHash + LSH near-duplicate pairs.
    *
    * signatures → `bands` bands of `numHashes/bands` rows each → bucket id =
    * xxhash64(band slice) → self-join per (band, bucket) → distinct candidate
    * pairs → keep pairs whose signature similarity ≥ `threshold`.
    *
    * Returns (id_a, id_b, est_jaccard) with id_a < id_b.
    */
  def minhashLsh(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.7,
      shingleLen: Int = 3
  ): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    val sig = shingleFrame(df, idCol, textCol, shingleLen)
      .select(col("id"), minhashSignature(col("sh"), numHashes).as("sig"))
    // Self-joined below: persist so the signature pipeline (the expensive
    // part) runs once, not once per join side. At cluster scale this frame
    // would be checkpointed to storage instead.
    val banded = sig.select(
      col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      .persist()
    val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        signatureSimilarity(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .groupBy("id_a", "id_b")
      .agg(round(max("est_jaccard"), 6).as("est_jaccard"))
  }

  /** 64-bit SimHash from a token-array column: bit j of the signature is set
    * iff the sum over tokens of ±1 (sign of bit j of xxhash64(token)) is
    * positive. */
  def simhashFromTokens(tk: Column): Column = {
    val counters = aggregate(
      transform(tk, t => xxhash64(t)),
      array_repeat(lit(0), 64),
      (acc, h) =>
        zip_with(acc, sequence(lit(0), lit(63)),
          (c, j) => c + when(call_function("shiftright", h, j).bitwiseAND(1) === 1, 1)
            .otherwise(-1))
    )
    aggregate(
      zip_with(counters, sequence(lit(0), lit(63)),
        (c, j) => when(c > 0, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))),
      lit(0L),
      (acc, bit) => acc.bitwiseOR(bit))
  }

  /** SimHash of lowercased whitespace tokens of `text`. */
  def simhash(text: Column): Column = simhashFromTokens(toks(text))

  /** SimHash near-duplicate pairs within a Hamming radius, banded LSH over
    * 4×16-bit chunks (a pair within Hamming distance 3 of a 64-bit signature
    * must agree exactly on at least one 16-bit chunk). */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3
  ): DataFrame = {
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    val sig = df.select(col(idCol).as("id"), toks(col(textCol)).as("tk"))
      .repartition(parallelism)
      .select(col("id"), simhashFromTokens(col("tk")).as("sig"))
    val banded = sig.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(3)),
        b => call_function("shiftright", col("sig"), b * 16).bitwiseAND(0xffff))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
      .persist()
    val l = banded.select(col("band"), col("chunk"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("chunk"), col("id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy("id_a", "id_b").agg(min("hamming").as("hamming"))
  }

  /** Exact n-gram Jaccard similarity via inverted-index join.
    *
    * Explode distinct shingles → drop shingles shared by more than
    * `maxShingleFreq` docs (Zipf guard: a stopword shingle would otherwise
    * produce a quadratic bucket) → count shared shingles per pair →
    * `|A∩B| / (|A|+|B|-|A∩B|)`. Pairs sharing only dropped shingles can be
    * missed — that is the standard recall/cost dial.
    */
  def ngramJaccard(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.5,
      shingleLen: Int = 3,
      maxShingleFreq: Int = 1000
  ): DataFrame = {
    // Shuffle on a 64-bit shingle hash, not the shingle string: the window
    // count, the join key, and the exchange payload all shrink, and xxhash64
    // collisions are negligible for intersection counting.
    val sh = shingleFrame(df, idCol, textCol, shingleLen)
      .select(col("id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("shingle"))
      .select(col("id"), col("n_sh"), xxhash64(col("shingle")).as("sh_h"))
    val filtered = sh
      .withColumn("freq", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("sh_h")))
      .filter(col("freq") <= maxShingleFreq)
      .persist()
    val l = filtered.select(col("sh_h"), col("id").as("id_a"), col("n_sh").as("n_a"))
    val r = filtered.select(col("sh_h"), col("id").as("id_b"), col("n_sh").as("n_b"))
    l.join(r, Seq("sh_h"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count(lit(1)).as("inter"))
      .select(col("id_a"), col("id_b"),
        round(col("inter") / (col("n_a") + col("n_b") - col("inter")).cast("double"), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, candidates from
    * random-hyperplane LSH buckets (see [[Similarity.hyperplaneBucket]]) —
    * the same banded-join shape as MinHash, so no O(N²) scan. */
  def embeddingNearDups(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      planes: Int = 16,
      tables: Int = 4
  ): DataFrame = {
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    val sig = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .repartition(parallelism)
      .withColumn("norm", Similarity.l2norm(col("v")))
      .filter(col("norm") > 0)
    val banded = sig.select(col("id"), col("v"), col("norm"),
      posexplode(transform(sequence(lit(0), lit(tables - 1)),
        t => Similarity.hyperplaneBucket(col("v"), planes, t))))
      .withColumnRenamed("pos", "table").withColumnRenamed("col", "bucket")
      .persist()
    val l = banded.select(col("table"), col("bucket"), col("id").as("id_a"),
      col("v").as("v_a"), col("norm").as("norm_a"))
    val r = banded.select(col("table"), col("bucket"), col("id").as("id_b"),
      col("v").as("v_b"), col("norm").as("norm_b"))
    l.join(r, Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Similarity.dot(col("v_a"), col("v_b")) / (col("norm_a") * col("norm_b")), 6)
          .as("cosine"))
      .filter(col("cosine") >= threshold)
      .groupBy("id_a", "id_b").agg(max("cosine").as("cosine"))
  }
}
