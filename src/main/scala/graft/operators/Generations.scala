package graft.operators

import org.apache.spark.sql.SparkSession

/** A second maintainer attempted a mutating index operation while another
  * holds the `_MAINTAINER` lease — the single-maintainer contract,
  * ENFORCED: without it two concurrent mutators corrupt silently (the
  * sharpest case: a [[graft.operators.KnnIndex.delete]] landing between a
  * concurrent compact's tombstone read and its log truncation is simply
  * LOST). Wait for the holder, or if it crashed the lease expires after
  * `spark.graft.index.leaseTtlMs` (default 30 min — size it above the
  * longest mutation; the 50M build measured ~250 s). */
final class ConcurrentMaintainerException(path: String, holder: String)
  extends RuntimeException(
    s"index at $path is being mutated by another maintainer ($holder); " +
      "wait for it to finish — a crashed holder's lease expires after " +
      "spark.graft.index.leaseTtlMs")

/** Generation-pointer lifecycle for an on-disk index members tree —
  * shared by [[graft.operators.KnnIndex]] (IVF+PQ directories) and
  * [[graft.multimodal.Multimodal]]'s banded signature index, both of
  * which rewrite their stored members wholesale on compaction and need
  * the swap to be READER-safe.
  *
  * Layout under an index root `path`:
  *  - `members-gen-<N>/` — one complete members tree per generation
  *    (whatever internal partitioning the index family writes);
  *  - `CURRENT` — a tiny text file holding the live generation number,
  *    committed by temp + rename (the ManifestSidecarFormat ordering);
  *  - `members/` — the pre-generation legacy layout, still resolvable.
  *
  * A compaction writes a fresh generation beside the live one and commits
  * it by swapping `CURRENT`; superseded trees stay on disk for
  * [[vacuum]]'s grace window so a query that resolved the old generation
  * before the commit finishes on a complete, untouched snapshot. This is
  * the reference's `EXECUTE optimize` swap discipline
  * (src/commands/bench.ts:201-249 rebuilds variants whole-table), made
  * concurrent-reader-safe.
  */
object Generations {

  val CurrentFile = "CURRENT"
  val SupersededFile = "_SUPERSEDED"
  val LeaseFile = "_MAINTAINER"

  private def leaseTtlMs(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.index.leaseTtlMs")
      .map(_.toLong).getOrElse(30L * 60 * 1000)

  /** Run `op` as the index's single MAINTAINER — the enforcement face of
    * the contract every mutating entry point documents. Acquire is an
    * atomic create-no-overwrite of `_MAINTAINER` (underscore-prefixed so
    * parquet readers ignore it; payload = the holder's JVM name for the
    * error message). A live lease raises [[ConcurrentMaintainerException]]
    * — typed, instead of the silent corruption two concurrent mutators
    * produce; a lease older than `spark.graft.index.leaseTtlMs` is
    * presumed crashed and broken (size the TTL above the longest
    * mutation — there is deliberately no heartbeat, one FS op per
    * mutation is the entire cost). Released on every exit, success or
    * throw. READERS never touch the lease: delta searches, mining and
    * health stay lease-free by construction (the generation pointer is
    * what makes them safe beside a compacting maintainer).
    *
    * Known limit, stated honestly: the stale-lease BREAK is
    * delete-then-create, not compare-and-swap (HDFS offers none), so two
    * maintainers recovering the same crashed holder simultaneously can
    * both acquire — a scenario that already requires two concurrent
    * mutators, i.e. the very contract violation the lease exists to
    * surface. The lease is a tripwire for the common accident (one stray
    * second writer), not a distributed lock service. */
  def withMaintainerLease[T](spark: SparkSession, path: String)(op: => T): T = {
    val fs = hadoopFs(spark, path)
    val root = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(root)) fs.mkdirs(root)
    val lease = new org.apache.hadoop.fs.Path(s"$path/$LeaseFile")
    def tryAcquire(): Boolean =
      try {
        val out = fs.create(lease, false)
        try out.write(java.lang.management.ManagementFactory
          .getRuntimeMXBean.getName
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    var acquired = tryAcquire()
    if (!acquired) {
      val staleOrGone =
        try System.currentTimeMillis() -
          fs.getFileStatus(lease).getModificationTime > leaseTtlMs(spark)
        catch { case _: java.io.FileNotFoundException => true }
      if (staleOrGone) {
        fs.delete(lease, false)
        acquired = tryAcquire()
      }
    }
    if (!acquired) {
      val holder =
        try {
          val in = fs.open(lease)
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        } catch { case scala.util.control.NonFatal(_) => "unknown" }
      throw new ConcurrentMaintainerException(path, holder)
    }
    try op finally fs.delete(lease, false)
  }

  private def hadoopFs(spark: SparkSession, path: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  /** Resolve the LIVE members tree for the index at `path` — the single
    * read point every reader and appender goes through. Resolution order:
    *  1. `CURRENT`'s generation, when the file parses and its directory
    *     exists — the normal path (one FS read, no data job); an
    *     unreadable CURRENT (torn write, checksum-sidecar mismatch) is
    *     the same as an unparseable one: fall back, don't throw;
    *  2. the HIGHEST completely-written generation — `_SUCCESS` present
    *     (every generation is one parquet Overwrite) and not
    *     `_SUPERSEDED`-marked, then highest overall;
    *  3. the pre-generation legacy layout `path/members`. */
  def resolve(spark: SparkSession, path: String): String = {
    val fs = hadoopFs(spark, path)
    val cur = new org.apache.hadoop.fs.Path(s"$path/$CurrentFile")
    val fromCurrent: Option[String] =
      try {
        if (!fs.exists(cur)) None
        else {
          val in = fs.open(cur)
          val txt =
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
            finally in.close()
          txt.toLongOption.map(n => s"$path/members-gen-$n")
            .filter(d => fs.exists(new org.apache.hadoop.fs.Path(d)))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    fromCurrent.orElse {
      val committed = scanned(fs, path).sorted(Ordering[Long].reverse)
        .map(n => s"$path/members-gen-$n")
        .filter(d => fs.exists(new org.apache.hadoop.fs.Path(s"$d/_SUCCESS")))
      committed.find(d =>
          !fs.exists(new org.apache.hadoop.fs.Path(s"$d/$SupersededFile")))
        .orElse(committed.headOption)
    }.getOrElse(s"$path/members")
  }

  /** Generation numbers of every `members-gen-*` directory on disk —
    * committed or not (one FS glob). */
  def scanned(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Seq[Long] =
    Option(fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$path/members-gen-*"))).toSeq.flatten
      .flatMap(_.getPath.getName.stripPrefix("members-gen-").toLongOption)

  /** The next unused generation number — past every directory on disk,
    * committed or crash-stranded, so a rewrite never collides with a
    * half-written tree a reader's fallback might otherwise observe. */
  def next(fs: org.apache.hadoop.fs.FileSystem, path: String): Long =
    scanned(fs, path).maxOption.getOrElse(-1L) + 1

  /** Commit generation `gen` as the live tree: write `CURRENT.tmp`, then
    * swap it in. The delete+rename pair (portable across Hadoop
    * FileSystems, which reject rename-onto-existing) has a sub-ms window
    * where `CURRENT` is absent — [[resolve]]'s fallback resolves the
    * highest committed generation there, which is exactly `gen`. */
  def commit(fs: org.apache.hadoop.fs.FileSystem, path: String,
      gen: Long): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(s"$path/$CurrentFile.tmp")
    val out = fs.create(tmp, true)
    try out.write(gen.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/$CurrentFile"), false)
    fs.rename(tmp, new org.apache.hadoop.fs.Path(s"$path/$CurrentFile"))
  }

  /** GC grace window before a superseded generation is deleted — long
    * enough for any query that resolved the old tree pre-commit to finish
    * reading it. Conf-tied like the exchange caps. */
  private def gcGraceMs(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.index.gcGraceMs")
      .map(_.toLong).getOrElse(15L * 60 * 1000)

  /** Garbage-collect superseded members generations — every on-disk tree
    * except the live one (older committed generations, crash-stranded
    * uncommitted ones, the legacy `members` layout after a migrating
    * compact). Two-phase so in-flight readers survive: an unmarked tree
    * first gets a `_SUPERSEDED` stamp (underscore-prefixed — parquet
    * readers ignore it), and only once the stamp is older than the grace
    * window (`graceMs`, default `spark.graft.index.gcGraceMs` = 15 min;
    * `0` deletes in the same pass) is the tree deleted. A MAINTAINER
    * operation like compact itself (must not race another writer), but
    * safe beside readers by construction. Returns trees deleted. */
  def vacuum(spark: SparkSession, path: String, graceMs: Long = -1L): Int = {
    val fs = hadoopFs(spark, path)
    val grace = if (graceMs >= 0) graceMs else gcGraceMs(spark)
    val live = resolve(spark, path)
    val legacy = s"$path/members"
    val candidates = scanned(fs, path).map(n => s"$path/members-gen-$n") ++
      (if (fs.exists(new org.apache.hadoop.fs.Path(legacy))) Seq(legacy) else Nil)
    val now = System.currentTimeMillis()
    var deleted = 0
    candidates.filterNot(_ == live).foreach { dir =>
      val marker = new org.apache.hadoop.fs.Path(s"$dir/$SupersededFile")
      if (!fs.exists(marker)) fs.create(marker, true).close()
      else if (now - fs.getFileStatus(marker).getModificationTime >= grace) {
        fs.delete(new org.apache.hadoop.fs.Path(dir), true)
        deleted += 1
      }
      if (grace <= 0 && fs.exists(new org.apache.hadoop.fs.Path(dir))) {
        fs.delete(new org.apache.hadoop.fs.Path(dir), true)
        deleted += 1
      }
    }
    deleted
  }
}
