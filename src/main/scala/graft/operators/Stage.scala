package graft.operators

import org.apache.spark.sql.DataFrame

/** Typed failure for an explicit `dims` argument that disagrees with the
  * data: a wrong width silently DEGRADES the vector family (truncated or
  * short-read sign dots mis-assign IVF cells, ADC subspaces misalign) with
  * no error at all — the quiet-recall trap every entry point now guards via
  * [[Stage.deriveDims]]. Carrying both figures lets a pipeline surface the
  * fix ("pass dims = sampled, or drop the argument") without string
  * parsing. */
final case class DimsMismatchException(explicitDims: Int, sampledDims: Int)
    extends IllegalArgumentException(
      s"explicit dims=$explicitDims disagrees with the data's vector width " +
        s"$sampledDims (first sampled row) — drop the dims argument to derive " +
        "it, or pass the true width")

/** Partitioning helpers shared by the corpus operators. */
object Stage {

  /** The cap every sized exchange in this codebase applies to its derived
    * partition count — conf-tied (`spark.graft.maxExchangeParts`, default
    * 65536) rather than a literal, because the cap is CLUSTER arithmetic:
    * the sizing discipline targets ≤ ~16–48 MB per task, so once a stage's
    * priced volume exceeds cap × target the per-task share grows past the
    * discipline silently. 65536 is unreachable headroom at the local
    * protocol (48 MB × 65536 ≈ 3 TB of priced volume per stage), but a
    * true 100 TB deployment whose winner volume exceeds that must RAISE
    * the conf — this knob is how, without a rebuild. */
  def maxExchangeParts(df: DataFrame): Long =
    df.sparkSession.conf.get("spark.graft.maxExchangeParts", "65536").toLong

  /** Derive the vector width from one sampled row — the dims = 0 default
    * of every public vector entry point — and FAIL FAST (typed
    * [[DimsMismatchException]]) when an explicit dims disagrees with the
    * sample: a silent mismatch degrades recall instead of erroring (the
    * old `dims = 64` defaults mis-assigned cells for any other width).
    * One bounded LIMIT-1 job per call; null rows are skipped so a leading
    * null cannot mis-derive. Empty inputs return the explicit dims (any
    * value yields the same empty result) unless `requireNonEmpty`. */
  def deriveDims(df: DataFrame, vecCol: String, dims: Int,
      requireNonEmpty: Boolean = false): Int = {
    import org.apache.spark.sql.functions.col
    val sampled = df.select(col(vecCol)).filter(col(vecCol).isNotNull)
      .head(1) match {
      case Array(r) => r.getSeq[Any](0).size
      case _ => 0
    }
    if (sampled == 0) {
      if (requireNonEmpty)
        throw new IllegalArgumentException(
          "cannot derive dims from an empty input")
      if (dims > 0) dims else 64
    } else if (dims > 0) {
      if (dims != sampled) throw DimsMismatchException(dims, sampled)
      dims
    } else sampled
  }

  /** Widen a frame to the session's default parallelism ONLY when it arrives
    * narrower — e.g. a small parquet table read as a single split, which
    * would otherwise serialize a CPU-bound signature stage onto one core.
    *
    * When the input is already at least as wide as the core count — the
    * normal case at cluster scale, where a 100 TB table arrives as tens of
    * thousands of splits — this is the identity: no exchange is inserted and
    * the downstream stage stays scan-local. An unconditional `repartition()`
    * here would shuffle the full corpus payload before any work, and would
    * *reduce* parallelism whenever the input has more splits than cores.
    *
    * The arrival width is ESTIMATED from analyzed-plan stats by replaying
    * the file-source split geometry (`bytes / min(maxPartitionBytes,
    * max(openCostInBytes, bytes/parallelism))`) instead of asking the
    * frame's RDD: `.rdd.getNumPartitions` runs the whole optimizer +
    * physical planner + DAG build for a sub-plan the main query then plans
    * AGAIN — measured ~90 ms of driver latency per call (vs ~8 ms for the
    * stats read), paid once per operator invocation and visible across the
    * sf0.1 headline. The projection's width-scaled estimate can undercount
    * the scan bytes, which only errs toward widening — a small exchange on
    * a frame that was at worst mid-sized. */
  def ensureWide(df: DataFrame): DataFrame =
    ensureWideImpl(df, d => d.repartition(d.sparkSession.sparkContext.defaultParallelism))

  /** [[ensureWide]] with a HASH-keyed widening exchange instead of the
    * round-robin one. Two reasons to prefer it when a natural key exists:
    * keyless `repartition(n)` first pays a local determinism sort of its
    * input (`spark.sql.execution.sortBeforeRepartition`, guide §2.5 —
    * measured 2× on q01's 600k-row lineitem arrival), and when `keys` is
    * the downstream window/aggregate key the exchange doubles as that
    * operator's required distribution, so no second exchange is planned
    * and — because an explicit-count repartition is not AQE-coalescible —
    * the per-group CPU behind it cannot be squeezed onto 1–4 tasks by the
    * byte-blind coalescer (the q23 pair-exchange lesson). Identity on
    * already-wide arrivals, exactly like [[ensureWide]]: at cluster scale
    * the operator keeps its ENSURE_REQUIREMENTS exchange and every AQE
    * adaptivity. `keys` must spread — a low-cardinality key would skew the
    * widened stage. */
  def ensureWideBy(df: DataFrame, keys: Seq[String]): DataFrame =
    ensureWideImpl(df, d => d.repartition(
      d.sparkSession.sparkContext.defaultParallelism,
      keys.map(org.apache.spark.sql.functions.col): _*))

  private def ensureWideImpl(df: DataFrame, widen: DataFrame => DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val conf = df.sparkSession.sessionState.conf
    val target = sc.defaultParallelism
    val analyzed = df.queryExecution.analyzed
    // an explicit upstream repartition at or above the target is proof of
    // width no estimate can contradict — honor it without planning
    val declaredWide = analyzed.exists {
      case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation =>
        r.numPartitions >= target
      case _ => false
    }
    if (declaredWide) return df
    val bytes = analyzed.stats.sizeInBytes
    if (bytes >= BigInt(conf.defaultSizeInBytes)) {
      // Unknown stats: non-file leaves (LogicalRDD, streaming sources)
      // default to spark.sql.defaultSizeInBytes (Long.MaxValue), so the
      // file-split geometry replay below says nothing about their width —
      // and its quotient would overflow Int. Streaming plans cannot take
      // the RDD round-trip at all (`df.rdd` throws AnalysisException on a
      // streaming Dataset — one of the two statless cases this branch
      // exists for); their micro-batch width is the source's to decide, so
      // pass them through unchanged. Batch statless plans ask the RDD
      // directly; the planner round-trip is the honest price.
      if (df.isStreaming) return df
      return if (df.rdd.getNumPartitions < target) widen(df) else df
    }
    val maxSplit = BigDecimal(conf.filesMaxPartitionBytes)
      .min(BigDecimal(conf.filesOpenCostInBytes).max(BigDecimal(bytes) / target))
    val estParts =
      if (maxSplit <= 0) target
      else (BigDecimal(bytes) / maxSplit).setScale(0, BigDecimal.RoundingMode.CEILING)
        .min(BigDecimal(Int.MaxValue)).toInt
    if (estParts < target) widen(df) else df
  }

  /** Whether every leaf of `df`'s analyzed plan carries a REAL size estimate.
    *
    * The idiom this replaces — comparing the frame's own
    * `analyzed.stats.sizeInBytes` against `spark.sql.defaultSizeInBytes` —
    * is unsound for PROJECTIONS of statless leaves: the size-only visitor
    * scales the leaf's Long.MaxValue sentinel by the output/child row-width
    * ratio, so a Project that narrows a LogicalRDD (or widens its types)
    * reports a huge-but-below-sentinel figure and the comparison calls it
    * "known". Consumers then trust a fabricated byte count — measured
    * consequence in knnJoinIvf: probeParts saturated at the 65536 cap and
    * the whole cached base re-exchanged, the exact pathological plan the
    * statless guard exists to prevent. Checking the LEAVES is structural:
    * a file-backed leaf propagates real file bytes, a LogicalRDD /
    * localCheckpoint / memory-stream leaf reports exactly the sentinel,
    * and no projection arithmetic has run yet at the leaf. */
  def statsKnown(df: DataFrame): Boolean = {
    val sentinel = BigInt(df.sparkSession.sessionState.conf.defaultSizeInBytes)
    !df.queryExecution.analyzed.collectLeaves()
      .exists(_.stats.sizeInBytes >= sentinel)
  }

  /** Join-side strategy for attaching a payload table (signatures, vectors)
    * to a skinny candidate-pair stream: BROADCAST when Catalyst's size
    * estimate says the payload fits comfortably on an executor — the
    * candidate stream then never re-shuffles with payload attached, the
    * decisive term when pairs ≫ payload rows — otherwise SHUFFLE_HASH,
    * which still keeps payload-laden rows out of every sort (a sort-merge
    * join would sort the pair stream with a full vector attached per row;
    * measured as tens of GB of sort spill at 500k vectors).
    *
    * The shuffle path rides [[sizedBuild]]: an UnsafeHashedRelation does
    * not spill, and `spark.sql.shuffle.partitions` is a session constant,
    * so a payload that grows 10× eventually hands each of the session's
    * partitions a build bigger than its execution-memory share and the
    * join dies with "can't acquire memory to build hash relation"
    * (measured: minhash signatures at 5M docs under 32 session
    * partitions). Pre-partitioning the build side on the join key with a
    * size-derived count keeps every build bounded; EnsureRequirements
    * aligns the probe side to the same count instead of the session
    * default.
    *
    * The estimate is Catalyst's `optimizedPlan.stats.sizeInBytes` — no
    * action, propagated from file sizes — so a 100 TB embedding table
    * correctly falls back to the shuffle path. `key` is the payload's
    * join column (every attach in this codebase keys on the payload id). */
  def attachSide(df: DataFrame, maxBroadcastBytes: Long = 256L * 1024 * 1024,
      key: String = "id"): DataFrame = {
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est <= maxBroadcastBytes) org.apache.spark.sql.functions.broadcast(df)
    else sizedBuild(df, Seq(key)).hint("SHUFFLE_HASH")
  }

  /** Pre-partition a SHUFFLE_HASH build side on its join keys so each
    * partition's hash relation stays inside a task's execution-memory
    * share at any payload size (hash relations cannot spill). Sized from
    * Catalyst's no-action size estimate with a 2× in-memory expansion,
    * floored at the session parallelism, capped at 65536.
    *
    * 16 MB of estimated bytes per partition (not 32): the relation itself
    * expands the raw bytes ~2-3×, and 32 concurrent unspillable builds
    * must coexist with the probe stage's other consumers — at 50M titles
    * the 32 MB target's attach builds died with "can't acquire memory to
    * build hash relation" on the protocol 8 GB heap; 16 MB keeps the
    * resident build set near ~1 GB at full concurrency. */
  def sizedBuild(df: DataFrame, keys: Seq[String],
      buildBytesPerPart: Long = 16L * 1024 * 1024): DataFrame =
    df.repartition(sizedBuildParts(df, buildBytesPerPart),
      keys.map(org.apache.spark.sql.functions.col): _*)

  /** The partition count [[sizedBuild]] would choose — exposed so a caller
    * can harmonize SEVERAL exchanges on one count: when probe and build
    * sides arrive hash-partitioned on the join key with different counts,
    * EnsureRequirements re-exchanges ONE side to the other's count, and if
    * the probe's (smaller) count wins, the build side's sizing is undone —
    * measured as a heap OOM building 94 MB hash relations at 5M docs.
    * Taking max(probe count, build count) for both sides keeps every
    * build bounded and costs the probe nothing. */
  def sizedBuildParts(df: DataFrame,
      buildBytesPerPart: Long = 16L * 1024 * 1024): Int = {
    val floor = df.sparkSession.sessionState.conf.numShufflePartitions
    val est = BigDecimal(df.queryExecution.optimizedPlan.stats.sizeInBytes) * 2
    val want = (est / BigDecimal(buildBytesPerPart)).toBigInt
      .min(BigInt(maxExchangeParts(df))).toInt
    math.max(floor, want)
  }
}
