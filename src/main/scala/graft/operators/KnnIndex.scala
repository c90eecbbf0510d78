package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent, incrementally-maintained IVF+PQ k-NN index — the production
  * 100 TB shape for a corpus that INGESTS embeddings continuously.
  *
  * [[graft.operators.Similarity.knnJoinIvf]] is the right one-shot join, but
  * it rebuilds both cell directories and retrains PQ per call: across an
  * ingest campaign that is O(n) of quantizer CPU per delta batch — O(n²)
  * total — for state that barely changes. This operator splits the
  * lifecycle the way an LSM-style table does:
  *
  *  - [[build]] runs ONCE per index generation: trains the PQ codebook on a
  *    deterministic sample, assigns every vector its md5-sign IVF cell
  *    ([[graft.functions.VectorExpressions.PortableIvfAssign]] — a pure
  *    function of the vector, which is what makes APPEND possible at all),
  *    and writes one directory row per cell — `(cell, mem: array<(id,
  *    code)>, vmem: array<(id, norm, v)>)` — as parquet partitioned by
  *    `bucket = cell mod 256`.
  *  - [[append]] ingests a delta batch with work ∝ |delta|: the STORED
  *    codebook encodes the new vectors (no retraining), the deterministic
  *    assign rule places them in the same cells the base run would have,
  *    and the grouped delta rows append as NEW FILES into the bucket
  *    layout — the base directories are never read, rewritten, or
  *    re-encoded. A cell touched by several batches simply owns several
  *    directory rows; [[knnJoinDelta]] merges them in its rank stage
  *    (top-k-of-top-ks is exact — any global top-k member is within the
  *    top-k of its own row).
  *  - [[knnJoinDelta]] answers "k nearest index members for every delta
  *    row" with ZERO base exchange: the delta's probe rows (id, vector,
  *    probed cell) BROADCAST, the stored directory streams scan-local
  *    through the join, and the per-cell ADC shortlist + exact rescore run
  *    inside the same pipelined projection
  *    ([[graft.functions.AnnExpressions.IvfPqCellShortlist]] /
  *    [[graft.functions.AnnExpressions.CellRescoreTopK]] — the knnJoinIvf
  *    expressions, unchanged). The only exchange is the rank merge of the
  *    winner arrays, ∝ |delta|·nprobe·k. When the delta outgrows the
  *    broadcast gate the join degrades to a cell-keyed SHUFFLE_HASH with
  *    the probes as the (sized) build — one member exchange, still never a
  *    vector-laden PAIR stream. Small deltas additionally prune the
  *    directory READ to the probed buckets (partition pruning on the
  *    bucket column — at 100 TB the bucket is the physical partition key
  *    and a trickle delta touches a handful of them).
  *
  * The quantizer-CPU account (the measured 2/3 of knnJoinIvf's wall): per
  * delta pass it is paid for |delta| rows only — assign + encode of the
  * base happened once at [[build]] and lives in the files.
  *
  * The rest of the LSM lifecycle:
  *
  *  - [[delete]] appends id tombstones to a side log — O(|ids|), no
  *    directory rewrite. [[knnJoinDelta]] honors the log logically
  *    (rescore deepened to `kCand`, tombstoned ids filtered before the
  *    rank cut — exact while live-members-per-probed-cell ≥ the shortlist
  *    depth; the LSM read-amplification story).
  *  - [[compact]] is the `EXECUTE optimize` analogue: merges each cell's
  *    accumulated per-batch directory rows back to ONE row, applies
  *    tombstones PHYSICALLY (then truncates the log), coalesces the
  *    bucket files, and — when occupancy has drifted past the build-time
  *    policy — RESPLITS to a new `nLists` while REUSING the stored
  *    codebook: PQ training (the expensive float-iterative piece of
  *    [[build]]) is never re-paid; only deterministic assign + encode CPU
  *    over the stored vectors plus one sized exchange. Crash-safe AND
  *    reader-safe via the generation-pointer swap (a fresh
  *    `members-gen-<N>` tree committed by atomically rewriting the tiny
  *    `CURRENT` pointer; superseded generations stay on disk for
  *    [[vacuum]]'s grace window so in-flight queries finish on a complete
  *    snapshot), and consistent under resplit because each generation is
  *    SELF-DESCRIBING: its `nl=<nLists>` partition level carries the one
  *    parameter its cells were computed with, so members and their
  *    nLists swap in the same pointer commit — there is no window where a
  *    stale `meta` row could aim probes at re-split cells.
  *
  * Like knnJoinIvf, the trained-PQ shortlist makes this family spec-gated
  * on recall; the oracle anchor is the portable twin
  * ([[graft.operators.Similarity.knnJoinIvfPqPortableIncremental]], q116),
  * whose pruning decisions replay exactly in ANSI SQL. */
object KnnIndex {

  /** Bucket fan-out of the stored layout: cells map to `cell mod Buckets`
    * physical partitions — few enough for directory listings, many enough
    * that a small delta's probed-bucket pruning skips most of the data. */
  val Buckets = 256

  /** Index metadata, persisted as two tiny parquet tables (`meta`,
    * `codebook`) next to the members — parquet rather than JSON so the
    * round-trip needs no parser and stays engine-readable. */
  final case class Meta(
      nLists: Int,
      dims: Int,
      m: Int,
      ks: Int,
      subDim: Int,
      codebooks: Array[Array[Array[Double]]])

  private def prep(df: DataFrame, idCol: String, vecCol: String,
      payloadCol: String = null): DataFrame = {
    val cols = Seq(col(idCol).cast("long").as("id"), col(vecCol).as("v")) ++
      Option(payloadCol).map(p => col(p).as("pay")).toSeq
    Stage.ensureWide(df.select(cols: _*))
      .withColumn("norm", graft.functions.VectorExpressions.l2_norm(col("v")))
      .filter(col("norm") > 0)
  }

  /** Train + write a fresh index generation at `path` (overwrites any
    * previous one). `nLists = 0` applies the knnJoinIvf occupancy-64
    * policy; `dims = 0` derives the width from one sampled row.
    *
    * `payloadCol`, when given, stores one per-member attribute (a label, a
    * source tag, a license class) INSIDE both directory columns —
    * `mem:(id, code, pay)` / `vmem:(id, norm, v, pay)` — so payload-aware
    * queries ([[hardNegativesDelta]]'s label gate) never attach-join
    * against the corpus, and payload-blind queries read the same tree
    * unchanged (the cell expressions derive member width from the
    * schema). Appends into a payload tree must supply the same column. */
  def build(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      nLists: Int = 0,
      m: Int = 8,
      ks: Int = 16,
      dims: Int = 0,
      payloadCol: String = null
  ): Meta = {
    val spark = df.sparkSession
    import spark.implicits._
    Generations.withMaintainerLease(spark, path) {
    val base = prep(df, idCol, vecCol, payloadCol)
    // family-wide dims rule (Stage.deriveDims): 0 derives from one sampled
    // row, an explicit width that disagrees raises a typed error
    val dimsActual = Stage.deriveDims(base, "v", dims, requireNonEmpty = true)
    val n = math.max(1L, base.count())
    val lists = if (nLists > 0) nLists else math.max(8L, n / 64L).toInt
    // a fresh generation invalidates every piece of the OLD one's
    // lifecycle state: stale tombstones would filter new members that
    // happen to reuse an id, and stale ingest markers would make
    // [[appendBatch]] silently drop a new campaign's batches whose engine
    // batch ids collide with the previous stream's
    val fsb = hadoopFs(spark, path)
    Seq("tombstones", "ingest_log", "staging").foreach(d =>
      fsb.delete(new org.apache.hadoop.fs.Path(s"$path/$d"), true))
    // deterministic ~64k-vector training sample, the knnJoinIvf recipe —
    // cached only for the duration of the m·(iters+1) training jobs
    val sampleEvery = math.max(1L, n / 65536L)
    val sampled = sampleEvery > 1L
    val sample =
      if (!sampled) base
      else base.filter(pmod(xxhash64(col("id")), lit(sampleEvery)) === 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pq =
      try Pq.train(sample.select(col("v")), "v", dimsActual, m, ks, iters = 3)
      finally if (sampled) sample.unpersist(false)
    val meta = Meta(lists, dimsActual, m, ks, pq.subDim,
      pq.codebooks.map(_.centroids))
    Seq((meta.nLists, meta.dims, meta.m, meta.ks, meta.subDim))
      .toDF("n_lists", "dims", "m", "ks", "sub_dim")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
    meta.codebooks.zipWithIndex.flatMap { case (cb, s) =>
      cb.zipWithIndex.flatMap { case (cent, c) =>
        cent.zipWithIndex.map { case (x, j) => (s, c, j, x) }
      }
    }.toSeq.toDF("sub", "code", "dim", "value")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/codebook")
    // a fresh GENERATION directory + pointer swap, not an in-place
    // overwrite: readers mid-query on the old tree keep a complete
    // snapshot until vacuum's grace window closes over it
    val gen = Generations.next(fsb, path)
    writeMembersTo(base, meta, n * rowBytes(meta) * 2,
      s"$path/members-gen-$gen", SaveMode.Overwrite)
    Generations.commit(fsb, path, gen)
    vacuum(spark, path)
    meta
    }
  }

  /** Estimated in-memory bytes of one directory member (vector + code +
    * struct overhead) — the unit the exchange sizing prices from. */
  private def rowBytes(meta: Meta): Long = meta.dims * 4L + meta.m * 4L + 140L

  /** Ingest a delta batch: encode + assign with the STORED codebook/rule
    * and append grouped directory rows into the bucket layout. Work —
    * quantizer CPU, exchange, bytes written — is ∝ |delta|; the base
    * directories are untouched. The assign rule's `nLists` is read from
    * the members tree itself (the `nl` partition level), so an append
    * after a resplitting [[compact]] lands in the re-split cells. */
  def append(df: DataFrame, idCol: String, vecCol: String, path: String,
      payloadCol: String = null): Meta = {
    val spark = df.sparkSession
    Generations.withMaintainerLease(spark, path) {
    val live = membersDir(spark, path)
    val meta = metaForIn(spark, path, live)
    requirePayloadParity(df, path, payloadCol)
    val base = prep(df, idCol, vecCol, payloadCol)
    val n = math.max(1L, base.count())
    writeMembersTo(base, meta, n * rowBytes(meta) * 2, live,
      SaveMode.Append, withCnt = storedHasCntIn(spark, live))
    meta
    }
  }

  /** Resolve the LIVE members tree for the index at `path` — the single
    * read point every reader and appender goes through, which is what
    * makes [[compact]] reader-safe: a compaction writes a NEW
    * `members-gen-<N>` directory beside the live one and commits it by
    * atomically swapping the tiny `CURRENT` pointer (temp + rename, the
    * ManifestSidecarFormat ordering), so a query that resolved the tree
    * before the commit keeps reading a complete, untouched generation
    * for as long as [[vacuum]]'s grace window (default 15 min,
    * `spark.graft.index.gcGraceMs`) keeps it on disk.
    *
    * Resolution order:
    *  1. `CURRENT`'s generation, when the file parses and its directory
    *     exists — the normal path (one FS read, no data job);
    *  2. a torn/missing `CURRENT` (the delete+rename commit has a
    *     sub-millisecond absent window; a tampered file is the crash-replay
    *     spec) falls back to the HIGHEST completely-written generation —
    *     `_SUCCESS` present (every generation is one parquet Overwrite) and
    *     not `_SUPERSEDED`-marked, then highest overall;
    *  3. the pre-generation legacy layout `path/members`.
    *
    * Machinery shared with the multimodal signature index —
    * [[graft.operators.Generations]]. */
  def membersDir(spark: SparkSession, path: String): String =
    Generations.resolve(spark, path)

  /** Garbage-collect superseded members generations — see
    * [[graft.operators.Generations.vacuum]]. Runs automatically at the
    * end of [[build]]/[[compact]]; callable standalone. */
  def vacuum(spark: SparkSession, path: String, graceMs: Long = -1L): Int =
    Generations.vacuum(spark, path, graceMs)

  /** The stored members tree's payload TYPE, when it carries one — read
    * from the `mem` struct's third field. One footer-schema read, no data
    * job. */
  private def storedPayloadTypeIn(spark: SparkSession,
      live: String): Option[org.apache.spark.sql.types.DataType] =
    spark.read.parquet(live).schema("mem").dataType match {
      case org.apache.spark.sql.types.ArrayType(
        s: org.apache.spark.sql.types.StructType, _) if s.length >= 3 =>
        Some(s.fields(2).dataType)
      case _ => None
    }

  private def storedPayloadType(spark: SparkSession,
      path: String): Option[org.apache.spark.sql.types.DataType] =
    storedPayloadTypeIn(spark, membersDir(spark, path))

  /** Does the stored members tree carry the r14 `cnt` column? Appends must
    * match it (mixed footers read arbitrarily); compact always upgrades. */
  private def storedHasCntIn(spark: SparkSession, live: String): Boolean =
    spark.read.parquet(live).columns.contains("cnt")

  /** An append whose payload presence — or TYPE — disagrees with the stored
    * tree would mix member-struct widths inside one parquet directory, and
    * with schema merging off, which footer wins is arbitrary: appended
    * members either silently lose their payload to a null or make every
    * read throw, and a later [[compact]] sampling the narrow schema would
    * DROP every stored payload during the rebuild. A type-mismatched
    * payload (a string into a long-payload tree) is the same hazard one
    * level down. Fail fast instead, all three ways. */
  private def requirePayloadParity(df: DataFrame, path: String,
      payloadCol: String): Unit = {
    val spark = df.sparkSession
    val stored = storedPayloadType(spark, path)
    require(stored.isDefined == (payloadCol != null),
      if (stored.isDefined)
        s"index at $path stores a member payload — append/appendBatch must " +
          "supply the same payloadCol"
      else
        s"index at $path was built without a payload column — rebuild with " +
          "build(payloadCol = ...) before appending payloads")
    stored.foreach { st =>
      val incoming = df.select(col(payloadCol)).schema.head.dataType
      require(st == incoming,
        s"index at $path stores a $st payload — appending a $incoming " +
          s"payload ('$payloadCol') would mix member-struct schemas in one " +
          "directory; cast the column or rebuild the index")
    }
  }

  private def hadoopFs(spark: SparkSession, path: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  /** Has `batchId` already been committed by [[appendBatch]]? */
  def ingestCommitted(spark: SparkSession, path: String, batchId: Long): Boolean =
    hadoopFs(spark, path).exists(
      new org.apache.hadoop.fs.Path(s"$path/ingest_log/batch-$batchId"))

  /** EXACTLY-ONCE [[append]]: ingest a delta batch under a caller-supplied
    * batch id (Structured Streaming's `foreachBatch` id — the unit the
    * engine replays after a failure). Returns false (and does nothing) when
    * the batch is already committed.
    *
    * A plain [[append]] is at-least-once under replay: a crash after its
    * files commit but before the caller records progress re-appends the
    * batch, and duplicate members mean duplicate ids in shortlists —
    * degraded answers, silently. This path makes the replay a no-op:
    *
    *  1. committed-marker check (`ingest_log/batch-<id>`) — a fully
    *     committed batch short-circuits;
    *  2. the grouped directory rows stage to `staging/batch-<id>`
    *     (Overwrite — a half-written staging tree from a crashed attempt is
    *     simply rewritten);
    *  3. any `ingest-b<id>-*` files a PARTIAL previous move left in the
    *     live tree are deleted (one FS glob, no data read);
    *  4. the staged files RENAME into the bucket layout under
    *     deterministic batch-scoped names (`ingest-b<id>-<seq>.parquet`) —
    *     metadata-only moves, no byte copy;
    *  5. the marker commits, the staging tree deletes.
    *
    * A crash between 4 and 5 replays 2–4 over the same deterministic names
    * — idempotent; a crash earlier leaves the live tree untouched. Work is
    * ∝ |delta| like [[append]] (one staging write + O(files) renames). */
  def appendBatch(df: DataFrame, idCol: String, vecCol: String, path: String,
      batchId: Long, payloadCol: String = null): Boolean = {
    val spark = df.sparkSession
    if (ingestCommitted(spark, path, batchId)) {
      // a crash between the marker commit and the staging delete leaves
      // the staged copy behind; the committed replay is where it gets
      // cleaned (the only code path guaranteed to run after such a crash)
      hadoopFs(spark, path).delete(
        new org.apache.hadoop.fs.Path(s"$path/staging/batch-$batchId"), true)
      return false
    }
    Generations.withMaintainerLease(spark, path) {
    val live = membersDir(spark, path)
    val meta = metaForIn(spark, path, live)
    requirePayloadParity(df, path, payloadCol)
    val base = prep(df, idCol, vecCol, payloadCol)
    val n = math.max(1L, base.count())
    val staging = s"$path/staging/batch-$batchId"
    writeMembersTo(base, meta, n * rowBytes(meta) * 2, staging,
      SaveMode.Overwrite, withCnt = storedHasCntIn(spark, live))
    val fs = hadoopFs(spark, path)
    val membersRoot = new org.apache.hadoop.fs.Path(live)
    val leftovers = fs.globStatus(new org.apache.hadoop.fs.Path(
      s"$live/nl=*/bucket=*/ingest-b$batchId-*.parquet"))
    if (leftovers != null) leftovers.foreach(st => fs.delete(st.getPath, false))
    val staged = fs.globStatus(new org.apache.hadoop.fs.Path(
      s"$staging/nl=*/bucket=*/*.parquet"))
    var seq = 0
    if (staged != null) staged.foreach { st =>
      val bucketDir = st.getPath.getParent
      val destDir = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(membersRoot, bucketDir.getParent.getName),
        bucketDir.getName)
      fs.mkdirs(destDir)
      fs.rename(st.getPath, new org.apache.hadoop.fs.Path(destDir,
        s"ingest-b$batchId-$seq.parquet"))
      seq += 1
    }
    val marker = new org.apache.hadoop.fs.Path(s"$path/ingest_log/batch-$batchId")
    fs.mkdirs(marker.getParent)
    fs.create(marker, true).close()
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    true
    }
  }

  /** Continuous ingest: a `foreachBatch` writer that [[appendBatch]]es
    * every micro-batch of an embedding STREAM into the stored index —
    * exactly-once end-to-end (the sink is idempotent per batch id, the
    * engine's checkpoint replays failed batches). With `verdictsDir` set,
    * each batch's [[dedupDelta]] keep/drop verdicts (threshold `tau`) also
    * land at `verdictsDir/batch=<id>` — the ingest-time dedup ledger,
    * itself idempotent (Overwrite per batch directory, checked
    * independently of the member marker so a crash between the two
    * completes on replay). Verdicts run AFTER the append, so a batch can
    * match both the stored corpus and its own earlier arrivals (the q87
    * ordering).
    *
    * The caller starts it with a checkpoint:
    * {{{
    * KnnIndex.ingestStream(embStream, "vec_id", "embedding", idxPath,
    *     verdictsDir = s"\$out/verdicts", tau = 0.9)
    *   .option("checkpointLocation", ckpt).start()
    * }}}
    *
    * Stop the query before running [[compact]] or [[build]] on the same
    * path (the single-maintainer contract — see [[compact]]). With
    * `maintainEvery` = N > 0 the contract is satisfied FROM INSIDE the
    * stream instead: every Nth batch ends with a [[maintain]] pass (the
    * measured-threshold policy), so the one writer the contract allows is
    * also the maintainer and a long-lived ingest stream never accumulates
    * the unmaintained fragmentation drift (the 50M campaign's 2.5→5.4 GB
    * per-batch spill trajectory — docs/bench_r15_notes.md). Concurrent
    * delta searches/mining on OTHER sessions stay safe across the policy's
    * compacts via the generation-pointer swap ([[Generations]]); a
    * replayed batch merely re-checks the policy (maintain is a health read
    * when thresholds aren't crossed — idempotent). */
  def ingestStream(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      verdictsDir: String = null,
      tau: Double = 0.9,
      k: Int = 8,
      nprobe: Int = 4,
      payloadCol: String = null,
      maintainEvery: Int = 0
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    emb.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      appendBatch(batch, idCol, vecCol, path, batchId, payloadCol)
      val spark = batch.sparkSession
      if (verdictsDir != null) {
        val done = new org.apache.hadoop.fs.Path(
          s"$verdictsDir/batch=$batchId/_SUCCESS")
        if (!hadoopFs(spark, verdictsDir).exists(done))
          dedupDelta(batch, idCol, vecCol, path, tau, k, nprobe)
            .write.mode(SaveMode.Overwrite)
            .parquet(s"$verdictsDir/batch=$batchId")
      }
      if (maintainEvery > 0 && (batchId + 1) % maintainEvery == 0)
        maintain(spark, path)
      ()
    }

  /** Continuous hard-negative mining: a `foreachBatch` writer that runs
    * [[hardNegativesDelta]] for every micro-batch of an anchor STREAM
    * against the stored label-payload index, landing each batch's mined
    * negatives at `outDir/batch=<id>` — the training-data shape where
    * anchors arrive as batches and each needs its contrastive negatives
    * attached before it ships. Idempotent per batch id (Overwrite into the
    * batch directory, `_SUCCESS`-checked), so the engine's replay after a
    * failure rewrites rather than duplicates. The index is read-only here —
    * safe to run beside [[ingestStream]] on a DIFFERENT index path; the
    * single-maintainer contract still applies to the index being mined
    * (don't [[compact]] it mid-stream). */
  def miningStream(
      anchors: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      path: String,
      outDir: String,
      k: Int = 5,
      nprobe: Int = 4
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    anchors.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val done = new org.apache.hadoop.fs.Path(s"$outDir/batch=$batchId/_SUCCESS")
      if (!hadoopFs(spark, outDir).exists(done))
        hardNegativesDelta(batch, idCol, vecCol, labelCol, path, k, nprobe)
          .write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$batchId")
      ()
    }

  /** Tombstone a set of member ids — O(|ids|) append to a side log, no
    * directory rewrite (the LSM delete). [[knnJoinDelta]] filters the ids
    * logically from that point on; [[compact]] applies them physically and
    * truncates the log. A tombstone wins over any append of the same id
    * (old generation or re-ingested) until the next compact — re-adding a
    * deleted id requires compacting first, the standard tombstone
    * semantics.
    *
    * A MAINTAINER operation like every mutator: a delete racing a
    * concurrent [[compact]] could land between compact's tombstone read
    * and its log truncation and be silently LOST — the lease turns that
    * race into a typed [[ConcurrentMaintainerException]]. */
  def delete(ids: DataFrame, idCol: String, path: String): Unit =
    Generations.withMaintainerLease(ids.sparkSession, path) {
      ids.select(col(idCol).cast("long").as("id")).distinct()
        .write.mode(SaveMode.Append).parquet(s"$path/tombstones")
    }

  /** Compact the index in place: one directory row per cell again (delta
    * appends leave one per (cell, batch)), tombstones applied physically,
    * files coalesced per bucket, and — with `nLists > 0` — the cell space
    * re-split under a new occupancy policy. The stored codebook is REUSED:
    * cell assignment and PQ codes are pure functions of the vector, so a
    * resplit pays deterministic assign/encode CPU and one sized exchange,
    * never the k-means retrain that makes [[build]] expensive. Work is
    * ∝ |stored bytes| — the amortized cost that keeps a long append
    * campaign's read path at its build-time shape.
    *
    * Crash-safe AND reader-safe (the generation-pointer swap): the
    * compacted tree is written as a fresh `members-gen-<N>` directory
    * beside the live one, committed by atomically swapping the tiny
    * `CURRENT` pointer (temp + rename), and only then is the tombstone
    * log deleted and the superseded generation handed to [[vacuum]],
    * which keeps it on disk for a grace window
    * (`spark.graft.index.gcGraceMs`, default 15 min). A crash at any
    * point leaves `CURRENT` aimed at a complete generation (a stranded
    * uncommitted tree is invisible to [[membersDir]] and GC'd later); a
    * crash before the log delete merely re-applies already-removed ids
    * (the anti-join of an absent id is a no-op). A READER concurrent with
    * the swap is safe end-to-end: it resolved the old tree through
    * [[membersDir]] before the commit and that tree stays complete and
    * untouched until its grace window closes — the r14 two-rename swap's
    * missing-tree window is gone.
    *
    * SINGLE-MAINTAINER CONTRACT (writers only, readers are now safe):
    * compact must not run concurrently with
    * [[append]]/[[appendBatch]]/[[ingestStream]] — a batch landing between
    * compact's read and its pointer swap lands in the generation being
    * superseded while its exactly-once marker survives, so the engine will
    * not replay it. Stop the ingest stream (or quiesce the appender)
    * first; this is the standard LSM coordination point, not a
    * crash-safety gap. The contract is now ENFORCED, not just documented:
    * every mutator runs under [[Generations.withMaintainerLease]], so the
    * racing writer gets a typed [[ConcurrentMaintainerException]] instead
    * of the silent member/tombstone loss above (an ingest stream with
    * `maintainEvery` set never hits it — the stream IS the maintainer). */
  def compact(spark: SparkSession, path: String, nLists: Int = 0): Meta =
    Generations.withMaintainerLease(spark, path) {
    val meta0 = metaFor(spark, path)
    val meta = if (nLists > 0) meta0.copy(nLists = nLists) else meta0
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    // residue from a PRE-generation (r14) crashed run: tmp is incomplete
    // by definition; an old tree survives only a crash between the two
    // renames, in which case the legacy live tree may be missing —
    // restore it first
    val legacyLive = new org.apache.hadoop.fs.Path(s"$path/members")
    val legacyTmp = new org.apache.hadoop.fs.Path(s"$path/members.compact.tmp")
    val legacyOld = new org.apache.hadoop.fs.Path(s"$path/members.compact.old")
    if (fs.exists(legacyOld)) {
      if (!fs.exists(legacyLive)) fs.rename(legacyOld, legacyLive)
      else fs.delete(legacyOld, true)
    }
    if (fs.exists(legacyTmp)) fs.delete(legacyTmp, true)
    val live = membersDir(spark, path)
    val stored = spark.read.parquet(live)
    // a payload tree re-compacts with its payload intact (the vmem element
    // carries it as the 4th field)
    val hasPay = stored.schema("vmem").dataType match {
      case org.apache.spark.sql.types.ArrayType(
        s: org.apache.spark.sql.types.StructType, _) => s.length >= 4
      case _ => false
    }
    val rowCols = Seq(col("r.id").as("id"), col("r.norm").as("norm"),
      col("r.v").as("v")) ++ (if (hasPay) Seq(col("r.pay").as("pay")) else Nil)
    val rows = stored
      .select(explode(col("vmem")).as("r"))
      .select(rowCols: _*)
    val kept = tombstonesDf(spark, path)
      .fold(rows)(ts => rows.join(ts, Seq("id"), "left_anti"))
    // size the rebuild exchange from the stored file bytes (×2 in-memory
    // expansion) — no count job over the base; a tombstone-heavy log only
    // overestimates, which costs nothing
    val bytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(live)).getLength * 2
    val gen = Generations.next(fs, path)
    writeMembersTo(kept, meta, bytes, s"$path/members-gen-$gen",
      SaveMode.Overwrite)
    Generations.commit(fs, path, gen)
    val ts = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    if (fs.exists(ts)) fs.delete(ts, true)
    vacuum(spark, path)
    meta
    }

  /** One directory row per (cell, batch): codes for the ADC shortlist and
    * vectors for the exact rescore as two parquet COLUMNS of the same row —
    * no exchange ever carries them (the delta probe join is scan-local /
    * broadcast-built), so the knnJoinIvf two-directory split buys nothing
    * at rest and one table keeps append atomicity per batch. The directory
    * exchange is sized by the knnJoinIvf discipline (collect_list state ≤
    * 16 MB of estimated member bytes per task).
    *
    * The tree is written `nl=<nLists>/bucket=<cell mod 256>/…`: the first
    * level makes the directory self-describing (see [[compact]]'s swap
    * consistency), the second is the pruning key.
    *
    * EVERY write coalesces by bucket before the partitioned write (one
    * extra exchange of the directory bytes, sized ~128 MB per write
    * task): the cell-hash agg output holds cells of every bucket in
    * every task, so an unaligned write opens a file per (task × bucket)
    * — measured 54k files for one 4M-member build generation, and every
    * subsequent members read (delta join, mining, health) paid the
    * listing + footer pass: the same probe batch cost 30.7 s against the
    * unaligned build layout vs 4.6 s against the ≤ 256-file compacted
    * tree at IDENTICAL mean_dir_rows = 1. A batch's files stay its own
    * per-batch increments (separate files per append regardless), which
    * compact later folds. */
  private def writeMembersTo(base: DataFrame, meta: Meta, dirBytes: Long,
      dest: String, mode: SaveMode,
      withCnt: Boolean = true): Unit = {
    val floor = base.sparkSession.sessionState.conf.numShufflePartitions
    val dirParts = math.max(floor,
      math.min(Stage.maxExchangeParts(base), dirBytes / (16L << 20)).toInt)
    val codes = array((0 until meta.m).map(s =>
      graft.functions.VectorExpressions.nearest_centroid(
        slice(col("v"), s * meta.subDim + 1, meta.subDim), meta.codebooks(s))): _*)
    val assignCell = graft.functions.VectorExpressions
      .portable_ivf_assign(col("v"), meta.nLists, meta.dims)
    // payload column, when prep attached one, rides both member structs
    // LAST — the cell expressions read (id, code)/(id, norm, v)
    // positionally and derive the true width from the schema, so
    // payload-blind readers see the same tree
    val hasPay = base.columns.contains("pay")
    val memStruct =
      if (hasPay) struct(col("id"), codes.as("code"), col("pay"))
      else struct(col("id"), codes.as("code"))
    val vmemStruct =
      if (hasPay) struct(col("id"), col("norm"), col("v"), col("pay"))
      else struct(col("id"), col("norm"), col("v"))
    val grouped = base
      .select(assignCell.as("cell"), memStruct.as("m0"), vmemStruct.as("v0"))
      .repartition(dirParts, col("cell"))
      .groupBy(col("cell"))
      .agg(collect_list(col("m0")).as("mem"), collect_list(col("v0")).as("vmem"))
      // cnt (this directory row's member count) rides as its own skinny
      // column so the compaction-policy read ([[health]]) scans (cell,
      // cnt) WITHOUT decoding the code/vector arrays — the full-stats
      // variant of that read cost ~30 s per call on a 4.5M-member tree,
      // turning a per-batch maintain() into the campaign's dominant term.
      // Appends into a pre-cnt tree keep the old schema (mixed footers
      // read arbitrarily — the payload-parity hazard); the next compact
      // upgrades the whole generation.
      .withColumn("cnt", size(col("mem")).cast("long"))
      .withColumn("bucket", pmod(col("cell"), lit(Buckets)))
      .withColumn("nl", lit(meta.nLists))
    val shaped =
      if (withCnt) grouped else grouped.drop("cnt")
    // Target ~128 MB parquet files. One file per bucket while the
    // generation fits Buckets × 128 MB; past that the write salts on
    // pmod(cell div Buckets, filesPerBucket) — still whole-cell-aligned
    // per file, and INDEPENDENT of the partition key `bucket = cell mod
    // Buckets` (a pmod(cell, filesPerBucket) salt is determined BY the
    // bucket whenever filesPerBucket shares a factor with Buckets — fully
    // degenerate at 2, 4, 8, the first values past the 32 GB threshold —
    // collapsing each directory back to ~1 oversized file). Within one
    // bucket the cells are bucket, bucket+Buckets, bucket+2·Buckets, …,
    // so `cell div Buckets` walks 0, 1, 2, … and the pmod spreads them
    // across exactly filesPerBucket files per directory per generation
    // (capping at Buckets tasks instead let files grow unbounded with the
    // corpus: the 50M build wrote ~150 MB files whose default-size row
    // groups of fat array columns OOMed 32 concurrent vectorized readers
    // on the protocol heap).
    val filesPerBucket = math.max(1L,
      (dirBytes + (128L << 20) * Buckets - 1) / ((128L << 20) * Buckets)).toInt
    val keyed =
      if (filesPerBucket <= 1) {
        val fileParts = math.max(1L, math.min(Buckets.toLong,
          dirBytes / (128L << 20))).toInt
        shaped.repartition(fileParts, col("bucket"))
      } else
        shaped.repartition(Buckets * filesPerBucket, col("bucket"),
          pmod(expr(s"cell div $Buckets"), lit(filesPerBucket)))
    // 8 MB row groups (down from parquet-mr's 128 MB default): the
    // vectorized reader decodes min(4096 rows, one row group) into
    // on-heap column vectors that no memory manager tracks, and a members
    // row is a whole cell directory (~20 KB of vector structs at the
    // occupancy-64 policy — CONSTANT in n), so default-size groups hand
    // each of 32 concurrent readers ~100+ MB of decoded array pages —
    // the measured 50M delta-join heap death at protocol heap (the
    // pre-r14 fragmented layout dodged it only by accident: near-empty
    // files meant near-empty reader batches). 8 MB groups ≈ 400 rows ≈
    // ~12 MB decoded per task; the fix rides in the TREE, so any stock
    // session reads it safely.
    // Concurrent partition writers instead of FileFormatWriter's
    // sort-by-partition-columns: each write task holds whole buckets (the
    // repartition above), so at most a handful of (nl, bucket) leaves are
    // open at once — but the default sort path buffers the task's ENTIRE
    // ~128 MB share through a spillable sorter whose 75 MB execution
    // slice (32 concurrent tasks, protocol heap) forces one spill
    // generation per task at 50M-class generations: the measured
    // 2.4–16 GB "one-time rewrite spill" on build/compact rows. With
    // concurrent writers the rows stream straight into the (8 MB
    // row-group) parquet writers and the sorter never materializes.
    // Writer memory is bounded: ≤ 32 open writers × one row group.
    val sess = base.sparkSession
    val prevWriters = sess.conf
      .get("spark.sql.maxConcurrentOutputFileWriters", "0")
    sess.conf.set("spark.sql.maxConcurrentOutputFileWriters", "32")
    try
      keyed.write.mode(mode)
        .option("parquet.block.size", String.valueOf(8L << 20))
        .partitionBy("nl", "bucket").parquet(dest)
    finally
      sess.conf.set("spark.sql.maxConcurrentOutputFileWriters", prevWriters)
  }

  /** The nLists the stored members were assigned with — read from the
    * LIVE tree's `nl=` partition level (one FS listing, no job), falling
    * back to the build-time `meta` row for a pre-resplit layout. */
  private def storedNLists(spark: SparkSession, live: String,
      fallback: Int): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(live), spark.sparkContext.hadoopConfiguration)
    val members = new org.apache.hadoop.fs.Path(live)
    if (!fs.exists(members)) fallback
    else fs.listStatus(members).iterator
      .map(_.getPath.getName)
      .collectFirst { case n if n.startsWith("nl=") => n.drop(3).toInt }
      .getOrElse(fallback)
  }

  /** [[readMeta]] with `nLists` overridden by the members tree's own
    * `nl=` level — what every operation that touches stored cells must
    * use, so a resplitting [[compact]]'s swap is the single source of
    * truth for the assign rule. Operators that read the tree resolve the
    * generation ONCE ([[membersDir]]) and pass it here, so one query
    * never mixes two generations' parameters. */
  private def metaForIn(spark: SparkSession, path: String,
      live: String): Meta = {
    val m = readMeta(spark, path)
    m.copy(nLists = storedNLists(spark, live, m.nLists))
  }

  private def metaFor(spark: SparkSession, path: String): Meta =
    metaForIn(spark, path, membersDir(spark, path))

  /** Index health introspection — the `\$files`/`\$manifests` analogue for
    * the stored directory tree, and the inputs a compaction policy reads:
    * one row of (cells, members, mean/max directory rows per cell — 1.0
    * means fully compacted, higher means append fragmentation the rank
    * stage re-merges on every query — mean/max cell occupancy vs the
    * nLists policy, parquet file count, pending tombstones). One
    * members-tree aggregate (codes column only — vectors never load) plus
    * two FS listings; nothing driver-side beyond the summary row. */
  def stats(spark: SparkSession, path: String): DataFrame = {
    val live = membersDir(spark, path)
    val members = spark.read.parquet(live)
    // the stored per-row count (r14+ trees) spares decoding the code
    // arrays; older trees fall back to size(mem)
    val cnt =
      if (members.columns.contains("cnt")) col("cnt")
      else size(col("mem")).cast("long")
    val perCell = members
      .select(col("cell"), cnt.as("batch_members"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("dir_rows"), sum(col("batch_members")).as("occ"))
    val tombs = tombstonesDf(spark, path)
      .map(_.distinct().count()).getOrElse(0L)
    val fs = hadoopFs(spark, path)
    val files = fs.globStatus(new org.apache.hadoop.fs.Path(
      s"$live/nl=*/bucket=*/*.parquet"))
    val nFiles = if (files == null) 0 else files.length
    perCell.agg(
      count(lit(1)).as("cells"),
      coalesce(sum(col("occ")), lit(0L)).as("members"),
      round(avg(col("dir_rows")), 3).as("mean_dir_rows"),
      max(col("dir_rows")).as("max_dir_rows"),
      round(avg(col("occ")), 2).as("mean_occupancy"),
      max(col("occ")).as("max_occupancy"))
      .withColumn("files", lit(nFiles))
      .withColumn("tombstones", lit(tombs))
      .withColumn("n_lists", lit(metaForIn(spark, path, live).nLists))
  }

  /** The compaction-policy inputs, extracted from one [[stats]] row:
    * append fragmentation (mean directory rows per cell — 1.0 when fully
    * compacted) and the pending-tombstone fraction of stored members. */
  final case class Health(
      cells: Long,
      members: Long,
      meanDirRows: Double,
      tombstones: Long) {
    def tombstoneFrac: Double =
      if (members <= 0) 0.0 else tombstones.toDouble / members
  }

  /** The policy read — CHEAP by construction: scans only the members
    * tree's (cell, cnt) columns (cnt is the stored per-row member count,
    * written since r14; older trees fall back to `size(mem)`, which
    * decodes the code arrays), plus the tiny tombstone log. Running the
    * full [[stats]] here was measured at ~30 s per call on a 4.5M-member
    * tree — a per-batch maintain() must cost milliseconds, not a scan of
    * every stored code. */
  def health(spark: SparkSession, path: String): Health = {
    val members = spark.read.parquet(membersDir(spark, path))
    val cnt =
      if (members.columns.contains("cnt")) col("cnt")
      else size(col("mem")).cast("long")
    val r = members.select(col("cell"), cnt.as("c"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("dir_rows"), sum(col("c")).as("occ"))
      .agg(count(lit(1)).as("cells"),
        coalesce(sum(col("occ")), lit(0L)).as("members"),
        avg(col("dir_rows")).as("mean_dir_rows"))
      .head()
    // distinct ids, not raw log rows: repeated delete() calls for the same
    // ids (or ids absent from the tree) would inflate tombstoneFrac and
    // fire shouldCompact prematurely — the log is tiny by design, so the
    // distinct costs nothing
    val tombs = tombstonesDf(spark, path).map(_.distinct().count()).getOrElse(0L)
    Health(r.getAs[Long]("cells"), r.getAs[Long]("members"),
      r.getAs[Double]("mean_dir_rows"), tombs)
  }

  /** Does the index need a [[compact]]? The stats-driven trigger of the
    * LSM lifecycle, with thresholds set from the measured
    * read-amplification curve (docs/corpusbench_local32.jsonl,
    * `knn_index_read_amp` rows — 4.5M base, 10 × 1% appends, 2 tombstone
    * batches, one fixed 50k-row probe batch re-measured per step):
    *
    *  - `maxMeanDirRows` (default 4.0): every probe×cell row re-runs the
    *    ADC shortlist (tables built per row) once per (cell, batch)
    *    directory row, and each append batch adds its own files per
    *    bucket, so delta-search wall grows ~linearly in mean_dir_rows:
    *    at 5M the same probe batch costs 4.6 s on a compacted tree,
    *    8.8 s at mean_dir_rows 3.8, 9.4 s at 5.0 (~2×), and the compact
    *    that resets it costs 25.9 s — ~5 fragmented-vs-compacted search
    *    deltas — so 4.0 amortizes within a handful of post-compact
    *    queries on any search-active campaign. (Before the bucket-aligned
    *    members write the same curve ran 4.6 → 77 s with a 91 s compact:
    *    the dominant term was the file-per-(task × bucket) write layout,
    *    now fixed at the writer — see [[writeMembersTo]].)
    *  - `maxTombstoneFrac` (default 0.02): pending tombstones deepen
    *    every delta rescore to the full shortlist (`rescoreK = cand` —
    *    the exactness contract), a modest wall term at default depths
    *    (within step noise on the curve: 7.1 s tombstoned vs 9.4 s not,
    *    at equal fragmentation) but an unbounded correctness debt — the
    *    filter stays exact only while `cand` covers each probed cell's
    *    SURVIVING members, so a growing log erodes the guarantee. The
    *    fraction threshold bounds that window without letting one tiny
    *    delete force a full rewrite.
    *
    * Pure read — one (cell, cnt) aggregate, no data rewrite. */
  def shouldCompact(spark: SparkSession, path: String,
      maxMeanDirRows: Double = 4.0,
      maxTombstoneFrac: Double = 0.02): Boolean = {
    val h = health(spark, path)
    h.meanDirRows > maxMeanDirRows ||
      (h.tombstones > 0 && h.tombstoneFrac > maxTombstoneFrac)
  }

  /** The policy face of [[compact]]: compacts IFF [[shouldCompact]]'s
    * thresholds are crossed, returning whether it ran. An ingest campaign
    * calls this between batches (quiesced — the single-maintainer
    * contract); the curve-measured thresholds mean the campaign pays the
    * compact exactly when continuing NOT to pay it costs more.
    *
    * Every call also [[vacuum]]s (a few FS ops): a generation superseded
    * by the PREVIOUS compact ages out as soon as its grace window closes,
    * instead of waiting for the next compact to happen by — on the 50M
    * campaign that wait held a second 12 GB tree on disk for 8 batches. */
  def maintain(spark: SparkSession, path: String,
      maxMeanDirRows: Double = 4.0,
      maxTombstoneFrac: Double = 0.02,
      nLists: Int = 0): Boolean = {
    val go = shouldCompact(spark, path, maxMeanDirRows, maxTombstoneFrac)
    if (go) compact(spark, path, nLists)
    else vacuum(spark, path)
    go
  }

  /** The tombstone log as a DataFrame, when any deletes are pending. */
  private def tombstonesDf(spark: SparkSession, path: String): Option[DataFrame] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/tombstones")))
      Some(spark.read.parquet(s"$path/tombstones"))
    else None
  }

  /** Load the persisted metadata + codebook. Two bounded driver collects
    * (5 scalars; m·ks·subDim codebook doubles — ~1k values at the
    * defaults). */
  def readMeta(spark: SparkSession, path: String): Meta = {
    val m0 = spark.read.parquet(s"$path/meta").head()
    val (nLists, dims, m, ks, subDim) =
      (m0.getInt(0), m0.getInt(1), m0.getInt(2), m0.getInt(3), m0.getInt(4))
    val cb = Array.fill(m, ks)(Array.empty[Double])
    spark.read.parquet(s"$path/codebook").collect().groupBy(r => (r.getInt(0), r.getInt(1)))
      .foreach { case ((s, c), rows) =>
        cb(s)(c) = rows.sortBy(_.getInt(2)).map(_.getDouble(3))
      }
    Meta(nLists, dims, m, ks, subDim, cb)
  }

  /** The broadcast gate both delta joins share: the 2 GB executor-fit want
    * CAPPED at spark.driver.maxResultSize (the vectorBroadcastGate rule —
    * the probe collect passes through the driver). */
  private def probeGate(spark: SparkSession): Long = {
    val mrs = spark.sparkContext.getConf
      .getSizeAsBytes("spark.driver.maxResultSize", "1g")
    if (mrs <= 0) 2L << 30 else math.min(2L << 30, mrs)
  }

  /** Estimated broadcast payload of the exploded probe stream —
    * nDelta·nprobe·fanout·cells rows of (id, vector, cell[, label]) at 2×
    * in-memory expansion; `rowOver` is the per-row non-vector overhead
    * (40 B plain; mining probes add the label's own width — see
    * [[probeRowOver]], never a flat constant: a wide string label priced
    * at a fixed 64 B would undercount the gate and push an oversized
    * exploded stream through the driver collect). */
  private def probeBytesFor(meta: Meta, nDelta: Long, nprobe: Int,
      cellsPerSuper: Int, rowOver: Long): Long = {
    val fanout = graft.functions.VectorExpressions.probeMidsPerTop(meta.nLists)
    nDelta * nprobe * fanout * cellsPerSuper * (meta.dims * 4L + rowOver) * 2
  }

  /** Per-probe-row non-vector overhead: 40 B plain; with a label, its
    * schema-priced width on top (the ivfJoinCore lblW rule —
    * `defaultSize + 8`, read from the STORED payload type, which analysis
    * requires to equal the mining labels' type). */
  private def probeRowOver(spark: SparkSession, path: String,
      payload: Boolean): Long =
    if (!payload) 40L
    else 40L + storedPayloadType(spark, path)
      .map(_.defaultSize + 8L).getOrElse(24L)

  /** The probe-attach route [[knnJoinDelta]] (payload = false) or
    * [[hardNegativesDelta]] (payload = true) will take for a delta of
    * `nDelta` rows — "broadcast_probes" or "shuffled_probes" — computed
    * from the SAME inputs the operators gate on (stored meta, the
    * maxResultSize-capped gate, the stored payload type's width), so
    * recorded evidence and scaladoc claims cannot drift from the executed
    * plan (the knnJoinAutoRoute move). */
  def deltaProbeRoute(spark: SparkSession, path: String, nDelta: Long,
      nprobe: Int = 4, cellsPerSuper: Int = 1, payload: Boolean = false): String = {
    val meta = metaFor(spark, path)
    val over = probeRowOver(spark, path, payload)
    if (probeBytesFor(meta, nDelta, nprobe, cellsPerSuper, over) <= probeGate(spark))
      "broadcast_probes"
    else "shuffled_probes"
  }

  /** k nearest INDEX members for every row of `newDf` — same
    * (id_a, id_b, cosine, rank) contract and same per-cell arithmetic as
    * [[graft.operators.Similarity.knnJoinIvf]], against the stored
    * directories. Call [[append]] first when the delta should also be able
    * to match itself (the incremental-dedup ingest shape); self-matches
    * are excluded by id inside the shortlist either way.
    *
    * `restrict`, when given, limits ANSWERS to members whose id is in the
    * frame (an allow-list — "search only the license-clean / same-language
    * subset"). It rides the tombstone machinery: the exact rescore deepens
    * to the full shortlist and disallowed ids are dropped before the rank
    * cut. The filter is exact when the shortlist covers the probed cells
    * (`kCand` ≥ members-per-probed-cell, the spec's setting); with a
    * PARTIAL shortlist, disallowed members that win ADC slots crowd
    * allowed ones out of the shortlist, so a heavily-disallowed corpus
    * needs `kCand` raised toward cell occupancy ÷ allowed-fraction — the
    * LSM read-amplification knob, same arithmetic as a tombstone-heavy
    * log.
    * Oracle anchor: [[graft.operators.Similarity
    * .knnJoinIvfPqPortableRestricted]] (q118) replays the same
    * shortlist→rescore→filter→rank decision order in ANSI SQL.
    *
    * `payloadIn`, when given, filters ANSWERS by the stored per-member
    * payload (set membership — "search only license-clean ∧ lang=en
    * members"): the payload rides each winner struct out of the cell
    * ([[graft.functions.AnnExpressions.CellRescorePayloadTopK]]), the
    * predicate evaluates scan-local on the flat winner stream (no attach
    * join of any kind), and the output gains a `payload_b` column. The
    * exactness contract is `restrict`'s verbatim — rescore deepens to the
    * full shortlist, the filter sits between rescore and the rank cut,
    * and a corpus where the allowed fraction is small needs `kCand`
    * raised toward occupancy ÷ allowed-fraction. Oracle anchor:
    * [[graft.operators.Similarity.knnJoinIvfPqPortablePayloadFiltered]]
    * (q124) — one more predicate over the q114 CTE prefix.
    *
    * `payloadWhere` is `payloadIn` generalized to ARBITRARY predicates
    * over a (possibly STRUCT-typed) stored payload — the production
    * filtered-ANN shape: "license IN (…) AND lang = 'en' AND
    * quality > q" as one Column over the output's `payload_b`
    * (e.g. `col("payload_b.lang") === "en" &&
    * col("payload_b.quality") > 0.25`). Same position, same plan (the
    * payload rides the winner struct; the predicate is a scan-local
    * filter on the flat winner stream — no attach join), same
    * deepened-rescore exactness contract: exact while `kCand` covers
    * each probed cell's ALLOWED members, so a highly-selective predicate
    * needs `kCand` raised toward occupancy ÷ allowed-fraction. Oracle
    * anchor: [[graft.operators.Similarity
    * .knnJoinIvfPqPortablePayloadWhere]] (q125) — the same conjunction
    * over the q114 CTE prefix.
    *
    * Plan shape: probes (delta × nprobe exploded cells, query vector
    * attached) BROADCAST while they fit the driver-capped gate — the
    * stored members then stream scan-local through one BroadcastHashJoin
    * and the whole shortlist→rescore pipeline runs inside that stage's
    * projection, so the base crosses NO exchange at any size. Past the
    * gate both sides exchange once on cell (probes the SHUFFLE_HASH
    * build, sized), which is the knnJoinIvf shape minus directory
    * construction. */
  def knnJoinDelta(
      newDf: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      k: Int,
      nprobe: Int = 4,
      kCand: Int = 0,
      cellsPerSuper: Int = 1,
      restrict: Option[DataFrame] = None,
      payloadIn: Option[Seq[Any]] = None,
      payloadWhere: Option[org.apache.spark.sql.Column] = None
  ): DataFrame = {
    val spark = newDf.sparkSession
    val wantPayload = payloadIn.isDefined || payloadWhere.isDefined
    // resolve the generation ONCE — meta, payload check, and the member
    // scan below all read the same snapshot even if a compact commits
    // mid-query (its superseded tree stays on disk for the grace window)
    val live = membersDir(spark, path)
    val meta = metaForIn(spark, path, live)
    if (wantPayload)
      require(storedPayloadTypeIn(spark, live).isDefined,
        s"index at $path was built without a payload column — " +
          "payloadIn/payloadWhere need build/append(payloadCol = ...)")
    val base = prep(newDf, idCol, vecCol)
    val nDelta = math.max(1L, base.count())
    val cand = math.max(k, if (kCand > 0) kCand else 4 * k)
    // pending deletes (and member allow-lists / payload predicates): deepen
    // the exact rescore to the full shortlist so dropped winners don't
    // promote unseen members — exact while `cand` covers the probed cells'
    // surviving members (see the restrict scaladoc), the LSM
    // read-amplification tradeoff compact() resets
    val tombs = tombstonesDf(spark, path)
    val rescoreK =
      if (tombs.isDefined || restrict.isDefined || wantPayload) cand
      else k
    val fanout = graft.functions.VectorExpressions.probeMidsPerTop(meta.nLists)
    val probes = base.select(col("id").as("id_a"), col("v").as("v_a"),
      explode_outer(graft.functions.VectorExpressions
        .portable_ivf_probe(col("v"), meta.nLists, meta.dims, nprobe, cellsPerSuper))
        .as("cell"))
      .filter(col("cell").isNotNull)
    val members = spark.read.parquet(live)
    // Bucket pruning for trickle deltas: the distinct probed-bucket set is
    // a bounded collect (≤ Buckets rows). Pushing it as a partition filter
    // prunes the member READ to the touched buckets — decisive when
    // |delta|·nprobe ≪ nLists; a no-op (and skipped) once every bucket is
    // probed.
    val probedBuckets = probes
      .select(pmod(col("cell"), lit(Buckets)).cast("int").as("bucket"))
      .distinct().collect().map(_.getInt(0))
    val pruned =
      if (probedBuckets.length < Buckets)
        members.filter(col("bucket").isin(probedBuckets.map(Integer.valueOf): _*))
      else members
    // Probe broadcast gate — the shared probeGate/probeBytesFor arithmetic
    // (deltaProbeRoute reports this exact decision to callers)
    val gate = probeGate(spark)
    val probeBytes = probeBytesFor(meta, nDelta, nprobe, cellsPerSuper,
      probeRowOver(spark, path, payload = false))
    val joined =
      if (probeBytes <= gate) pruned.join(broadcast(probes), Seq("cell"))
      else {
        // sized cell exchange: members priced at the 24 MB/task stream-
        // writer discipline (file stats — the members are source-backed),
        // probes at the 16 MB/task unspillable-build discipline
        val floor = spark.sessionState.conf.numShufflePartitions
        val memBytes = pruned.queryExecution.analyzed.stats.sizeInBytes
        val want = (memBytes / BigInt(24L << 20))
          .max(BigInt(probeBytes) / BigInt(16L << 20))
        val parts = math.max(floor,
          want.min(BigInt(Stage.maxExchangeParts(base))).toInt)
        pruned.repartition(parts, col("cell"))
          .join(probes.repartition(parts, col("cell")).hint("SHUFFLE_HASH"),
            Seq("cell"))
      }
    // payload-filter mode swaps in the payload rescore so each winner
    // struct carries the member's payload — the predicate then evaluates
    // on the flat winner stream with no attach join, the q118 position
    val shortlist = graft.functions.AnnExpressions.ivfpq_cell_shortlist(
      col("id_a"), col("v_a"), col("mem"), cand, meta.codebooks, meta.subDim)
    val perRow =
      if (!wantPayload)
        joined.select(col("id_a"),
          graft.functions.AnnExpressions.cell_rescore_topk(col("v_a"),
            shortlist, col("vmem"), rescoreK).as("tk"))
      else
        joined.select(col("id_a"),
          graft.functions.AnnExpressions.cell_rescore_payload_topk(col("v_a"),
            shortlist, col("vmem"), rescoreK).as("tk"))
    // rank merge of the per-(cell, batch-row) winner arrays — the delta's
    // only exchange on the broadcast path, ∝ |delta| winner structs
    val floor = spark.sessionState.conf.numShufflePartitions
    val rankParts = math.max(floor, math.min(Stage.maxExchangeParts(base),
      nDelta * nprobe * fanout * cellsPerSuper * rescoreK * 80L / (48L << 20)).toInt)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("id_a")).orderBy(col("cosine").desc, col("id_b").asc)
    val flatCols = Seq(col("id_a"), col("nb.id").as("id_b")) ++
      (if (wantPayload) Seq(col("nb.payload").as("payload_b")) else Nil) ++
      Seq(col("nb.cosine").as("cosine"))
    val flat = perRow
      .repartition(rankParts, col("id_a"))
      .select(col("id_a"), explode_outer(col("tk")).as("nb"))
      .filter(col("nb").isNotNull)
      .select(flatCols: _*)
    // tombstone filter before the rank cut — a file-backed anti-join the
    // planner broadcasts while the log is small (its normal state; a log
    // big enough to shuffle is the signal to compact)
    val liveFlat = tombs.fold(flat)(ts =>
      flat.join(ts.select(col("id").as("id_b")), Seq("id_b"), "left_anti"))
    // allow-list filter, same position: a semi-join the planner broadcasts
    // while the restriction is dim-sized; the rank below re-numbers over
    // the survivors (the deepened rescore supplied the depth)
    val allowedFlat = restrict.fold(liveFlat)(r =>
      liveFlat.join(r.select(col(r.columns.head).cast("long").as("id_b"))
        .distinct(), Seq("id_b"), "left_semi"))
    // payload predicate (set membership over the stored per-member
    // attribute — "search only license-clean ∧ lang=en members"), at the
    // exact restrict position: shortlist and rescore ran over ALL members
    // (deepened), the predicate filters the rescored winners, rank
    // re-numbers — so the exactness condition is restrict's verbatim.
    // A scan-local filter over the winner stream: the payload rode the
    // winner struct out of the cell, no join of any kind
    val paySet = payloadIn.fold(allowedFlat)(vals =>
      allowedFlat.filter(col("payload_b").isin(vals: _*)))
    // general predicate (set + range conjunctions over struct fields),
    // same position and same scan-local evaluation — the caller's Column
    // references `payload_b` (e.g. col("payload_b.lang") === "en")
    val payFlat = payloadWhere.fold(paySet)(pred => paySet.filter(pred))
    val outCols = Seq(col("id_a"), col("id_b")) ++
      (if (wantPayload) Seq(col("payload_b")) else Nil) ++
      Seq(col("cosine"), col("rank"))
    payFlat
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      // the anti-join moves its key first — restate the contract order
      .select(outCols: _*)
  }

  /** Hard-negative mining for an arriving batch against the STORED index —
    * [[graft.operators.Similarity.hardNegativesAnnCell]]'s in-cell label
    * gate on the [[knnJoinDelta]] lifecycle: for every delta row, the k
    * most-similar stored members carrying a DIFFERENT label, labels read
    * from the index's own payload column (a [[build]]/[[append]] with
    * `payloadCol` — no corpus attach join at any point; the gate runs
    * inside the ADC shortlist
    * ([[graft.functions.AnnExpressions.IvfPqCellShortlistLabel]]) so every
    * shortlist slot is a candidate negative, and label_b rides the winner
    * struct ([[graft.functions.AnnExpressions.CellRescorePayloadTopK]]).
    *
    * This is the production mining shape: the anchor stream (a training
    * batch needing negatives) is |delta|-sized, the corpus is the index,
    * and the probe side broadcasts under the knnJoinDelta gate — the
    * stored members cross ZERO exchange. Tombstones are honored the
    * knnJoinDelta way (deepened rescore + anti-join before the rank cut),
    * and `restrict` limits mined negatives to an id ALLOW-LIST ("mine
    * only from the license-clean subset") at the same position and with
    * the same exactness condition as [[knnJoinDelta]]'s — shortlist and
    * rescore over all members, filter, rank re-numbers. `payloadIn`
    * restricts mined negatives by CLASS (label_b set membership — "mine
    * only from classes {…}") at the same position: label_b already rides
    * the winner struct, so the predicate is a scan-local filter, and the
    * deepened-rescore exactness contract is restrict's verbatim.
    * Null-label anchors and members never pair.
    *
    * Oracle anchor: [[graft.operators.Similarity
    * .hardNegativesPortableIncremental]] (q121) replays the same
    * probe-restricted, label-gated decision order in ANSI SQL.
    *
    * Returns (id_a, label_a, id_b, label_b, cosine, rank), rank 1..k. */
  def hardNegativesDelta(
      newDf: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      path: String,
      k: Int,
      nprobe: Int = 4,
      kCand: Int = 0,
      cellsPerSuper: Int = 1,
      restrict: Option[DataFrame] = None,
      payloadIn: Option[Seq[Any]] = None
  ): DataFrame = {
    val spark = newDf.sparkSession
    // one generation snapshot per query, the knnJoinDelta rule
    val live = membersDir(spark, path)
    val meta = metaForIn(spark, path, live)
    val base = prep(newDf, idCol, vecCol, labelCol)
      .filter(col("pay").isNotNull)
    val nDelta = math.max(1L, base.count())
    val cand = math.max(k, if (kCand > 0) kCand else 4 * k)
    val tombs = tombstonesDf(spark, path)
    val rescoreK =
      if (tombs.isDefined || restrict.isDefined || payloadIn.isDefined) cand
      else k
    val fanout = graft.functions.VectorExpressions.probeMidsPerTop(meta.nLists)
    val probes = base.select(col("id").as("id_a"), col("pay").as("lbl_a"),
      col("v").as("v_a"),
      explode_outer(graft.functions.VectorExpressions
        .portable_ivf_probe(col("v"), meta.nLists, meta.dims, nprobe, cellsPerSuper))
        .as("cell"))
      .filter(col("cell").isNotNull)
    val members = spark.read.parquet(live)
    require(storedPayloadTypeIn(spark, live).isDefined,
      s"index at $path was built without a payload column — " +
        "hardNegativesDelta needs build/append(payloadCol = ...)")
    val probedBuckets = probes
      .select(pmod(col("cell"), lit(Buckets)).cast("int").as("bucket"))
      .distinct().collect().map(_.getInt(0))
    val pruned =
      if (probedBuckets.length < Buckets)
        members.filter(col("bucket").isin(probedBuckets.map(Integer.valueOf): _*))
      else members
    // same probe broadcast gate as knnJoinDelta, the label's probe-row
    // width priced in (shared probeGate/probeBytesFor arithmetic)
    val gate = probeGate(spark)
    val probeBytes = probeBytesFor(meta, nDelta, nprobe, cellsPerSuper,
      probeRowOver(spark, path, payload = true))
    val joined =
      if (probeBytes <= gate) pruned.join(broadcast(probes), Seq("cell"))
      else {
        val floor = spark.sessionState.conf.numShufflePartitions
        val memBytes = pruned.queryExecution.analyzed.stats.sizeInBytes
        val want = (memBytes / BigInt(24L << 20))
          .max(BigInt(probeBytes) / BigInt(16L << 20))
        val parts = math.max(floor,
          want.min(BigInt(Stage.maxExchangeParts(base))).toInt)
        pruned.repartition(parts, col("cell"))
          .join(probes.repartition(parts, col("cell")).hint("SHUFFLE_HASH"),
            Seq("cell"))
      }
    val perRow = joined.select(col("id_a"), col("lbl_a"),
      graft.functions.AnnExpressions.cell_rescore_payload_topk(col("v_a"),
        graft.functions.AnnExpressions.ivfpq_cell_shortlist_label(col("id_a"),
          col("lbl_a"), col("v_a"), col("mem"), cand, meta.codebooks,
          meta.subDim),
        col("vmem"), rescoreK).as("tk"))
    val floor = spark.sessionState.conf.numShufflePartitions
    val rankParts = math.max(floor, math.min(Stage.maxExchangeParts(base),
      nDelta * nprobe * fanout * cellsPerSuper * rescoreK * 100L / (48L << 20)).toInt)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("id_a")).orderBy(col("cosine").desc, col("id_b").asc)
    val flat = perRow
      .repartition(rankParts, col("id_a"))
      .select(col("id_a"), col("lbl_a"), explode_outer(col("tk")).as("nb"))
      .filter(col("nb").isNotNull)
      .select(col("id_a"), col("lbl_a").as("label_a"),
        col("nb.id").as("id_b"), col("nb.payload").as("label_b"),
        col("nb.cosine").as("cosine"))
    val liveFlat = tombs.fold(flat)(ts =>
      flat.join(ts.select(col("id").as("id_b")), Seq("id_b"), "left_anti"))
    // allow-list at the knnJoinDelta position: after rescore, before the
    // rank cut — rank re-numbers over allowed survivors
    val allowedFlat = restrict.fold(liveFlat)(r =>
      liveFlat.join(r.select(col(r.columns.head).cast("long").as("id_b"))
        .distinct(), Seq("id_b"), "left_semi"))
    // payload predicate at the same position ("mine negatives only from
    // classes in {…}"): label_b already rides the winner struct, so the
    // set-membership filter is scan-local — same deepened-rescore
    // exactness contract as restrict
    val payFlat = payloadIn.fold(allowedFlat)(vals =>
      allowedFlat.filter(col("label_b").isin(vals: _*)))
    payFlat
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id_a"), col("label_a"), col("id_b"), col("label_b"),
        col("cosine"), col("rank"))
  }

  /** Incremental semantic dedup — the [[graft.operators.Dedup
    * .incrementalMinhashDedup]] verdict contract on the EMBEDDING index:
    * classify an arriving batch against the stored corpus (and against its
    * own earlier arrivals) without ever pairing stored members together.
    * Call [[append]] with the batch FIRST (the ingest order); self-matches
    * are excluded by id inside the shortlist.
    *
    * A batch row is a duplicate when any of its k approximate nearest
    * neighbors clears `tau` and is either a STORED member or a LOWER-id
    * row of the same batch (the greedy leader rule — the min-id copy of a
    * within-batch group survives, [[graft.operators.Similarity
    * .semanticDedup]]'s ordering). Returns the q87 shape:
    * (id, dup_of_old, dup_of_new, kept) with -1 for no match. Work is
    * |delta|-driven end-to-end: one [[knnJoinDelta]] (zero base exchange
    * on the broadcast-probe path) plus |delta|-sized verdict joins.
    *
    * Like the native ANN family this is spec-gated (trained PQ shortlist);
    * its oracle anchor is [[graft.operators.Similarity
    * .semanticDedupIncrementalPortable]] (q117), which replays the same
    * verdict rule over the exact-arithmetic portable pipeline in ANSI
    * SQL. */
  def dedupDelta(
      newDf: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      tau: Double,
      k: Int = 8,
      nprobe: Int = 4
  ): DataFrame = {
    val deltaIds = newDf.select(col(idCol).cast("long").as("id"))
    val nn = knnJoinDelta(newDf, idCol, vecCol, path, k, nprobe)
    val qual = nn
      .join(deltaIds.select(col("id").as("id_b"), lit(1).as("b_new")),
        Seq("id_b"), "left")
      .filter(col("cosine") >= tau)
    val oldQ = qual.filter(col("b_new").isNull)
      .groupBy(col("id_a")).agg(min(col("id_b")).as("min_old"))
    val newQ = qual.filter(col("b_new") === 1 && col("id_b") < col("id_a"))
      .groupBy(col("id_a")).agg(min(col("id_b")).as("min_new"))
    deltaIds
      .join(oldQ, col("id") === oldQ("id_a"), "left").drop("id_a")
      .join(newQ, col("id") === newQ("id_a"), "left").drop("id_a")
      .select(col("id"),
        coalesce(col("min_old"), lit(-1L)).as("dup_of_old"),
        coalesce(col("min_new"), lit(-1L)).as("dup_of_new"),
        when(col("min_old").isNull && col("min_new").isNull, 1L).otherwise(0L)
          .as("kept"))
  }
}
