package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_knnidx").toString

  private lazy val emb = sf("sf0.001", "embeddings").cache()

  test("build + append + delta join: exact parity with a full knnJoinIvf " +
      "rebuild when the shortlist covers whole cells") {
    val old = emb.filter($"vec_id" % 5 =!= 0)
    val neu = emb.filter($"vec_id" % 5 === 0)
    val path = tmpDir()
    KnnIndex.build(old, "vec_id", "embedding", path, nLists = 8)
    KnnIndex.append(neu, "vec_id", "embedding", path)
    // kCand ≥ any cell's occupancy ⇒ the trained-PQ shortlist cannot cut,
    // so both pipelines exact-rescore every probed-cell member: the stored
    // multi-batch directories must reproduce the one-shot rebuild's rows
    // EXACTLY (same cells — the assign rule is a pure function — same
    // probes, same rounded cosines, same ranks), restricted to the delta
    // anchors. This is the parity that makes "append instead of rebuild"
    // a storage decision, not a semantics change.
    val inc = KnnIndex.knnJoinDelta(neu, "vec_id", "embedding", path, k = 3,
        nprobe = 4, kCand = 100000)
      .as[(Long, Long, Double, Int)].collect().toSet
    val full = Similarity.knnJoinIvf(emb, "vec_id", "embedding", k = 3,
        nLists = 8, nprobe = 4, kCand = 100000)
      .filter($"id_a" % 5 === 0)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(inc == full, s"delta join diverged from the rebuild: " +
      s"only-inc=${(inc -- full).take(5)} only-full=${(full -- inc).take(5)}")
  }

  test("planted duplicates arriving as a delta find their stored originals at rank 1") {
    val path = tmpDir()
    KnnIndex.build(emb, "vec_id", "embedding", path, nLists = 8)
    val dup = emb.filter($"vec_id" < 3)
      .select(($"vec_id" + 10000).as("vec_id"), $"embedding")
    KnnIndex.append(dup, "vec_id", "embedding", path)
    val nn = KnnIndex.knnJoinDelta(dup, "vec_id", "embedding", path, k = 3,
        nprobe = 4)
      .as[(Long, Long, Double, Int)].collect()
    (0 until 3).foreach { i =>
      val top = nn.filter(p => p._1 == i + 10000 && p._4 == 1)
      assert(top.nonEmpty && top.head._2 == i && top.head._3 > 0.999,
        s"delta copy ${i + 10000}'s rank-1 neighbor should be stored $i, got ${top.toSeq}")
    }
    // only delta anchors answered; ranks are 1..k per anchor
    assert(nn.forall(_._1 >= 10000))
    nn.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.length))
    }
  }

  test("append writes new files only — the base generation's files are untouched") {
    val path = tmpDir()
    KnnIndex.build(emb.filter($"vec_id" % 5 =!= 0), "vec_id", "embedding",
      path, nLists = 8)
    def files(): Map[String, Long] = {
      val root = java.nio.file.Paths.get(KnnIndex.membersDir(spark, path))
      val out = scala.collection.mutable.Map[String, Long]()
      java.nio.file.Files.walk(root).forEach { p =>
        if (p.toString.endsWith(".parquet"))
          out(p.toString) = java.nio.file.Files.getLastModifiedTime(p).toMillis
      }
      out.toMap
    }
    val before = files()
    KnnIndex.append(emb.filter($"vec_id" % 5 === 0), "vec_id", "embedding", path)
    val after = files()
    assert(before.nonEmpty && after.size > before.size,
      s"append added no files (${before.size} -> ${after.size})")
    before.foreach { case (f, ts) =>
      assert(after.get(f).contains(ts), s"append rewrote base file $f")
    }
  }

  private def parquetFiles(path: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    java.nio.file.Files.walk(java.nio.file.Paths.get(path)).forEach { p =>
      if (p.toString.endsWith(".parquet")) out += p.toString
    }
    out.toSeq
  }

  private def deltaRows(path: String, neu: org.apache.spark.sql.DataFrame,
      k: Int = 3, kCand: Int = 100000): Set[(Long, Long, Double, Int)] =
    KnnIndex.knnJoinDelta(neu, "vec_id", "embedding", path, k = k,
      nprobe = 4, kCand = kCand)
      .as[(Long, Long, Double, Int)].collect().toSet

  test("compact folds per-batch directory rows to one per cell, merges " +
      "files, and changes no delta-join answer") {
    val path = tmpDir()
    val old = emb.filter($"vec_id" % 5 =!= 0)
    val neu = emb.filter($"vec_id" % 5 === 0)
    KnnIndex.build(old.filter($"vec_id" % 2 === 0), "vec_id", "embedding",
      path, nLists = 8)
    KnnIndex.append(old.filter($"vec_id" % 2 =!= 0), "vec_id", "embedding", path)
    KnnIndex.append(neu, "vec_id", "embedding", path)
    val before = deltaRows(path, neu)
    def members = KnnIndex.membersDir(spark, path)
    val rowsPerCellBefore = spark.read.parquet(members)
      .groupBy($"cell").count().agg(max($"count")).head().getLong(0)
    assert(rowsPerCellBefore > 1, "three batches should leave multi-row cells")
    val stBefore = KnnIndex.stats(spark, path).head()
    assert(stBefore.getDouble(2) > 1.0,
      s"stats should surface append fragmentation, got $stBefore")
    val filesBefore = parquetFiles(members).size
    assert(stBefore.getInt(6) == filesBefore,
      s"stats file count ${stBefore.getInt(6)} != walked $filesBefore")
    KnnIndex.compact(spark, path)
    val after = deltaRows(path, neu)
    assert(after == before, "compact changed delta-join answers")
    val perCell = spark.read.parquet(members).groupBy($"cell").count()
      .agg(max($"count")).head().getLong(0)
    assert(perCell == 1L, s"compact left $perCell rows in some cell")
    val filesAfter = parquetFiles(members).size
    assert(filesAfter < filesBefore,
      s"compact did not merge files ($filesBefore -> $filesAfter)")
    val stAfter = KnnIndex.stats(spark, path).head()
    assert(stAfter.getDouble(2) == 1.0 && stAfter.getLong(3) == 1L,
      s"stats should read fully-compacted, got $stAfter")
    assert(stAfter.getLong(7) == 0L, s"tombstone backlog after compact: $stAfter")
    assert(stAfter.getLong(1) == stBefore.getLong(1),
      s"member count changed across compact: $stBefore -> $stAfter")
  }

  test("compact(nLists) resplits the cell space with the STORED codebook: " +
      "append and delta join follow the new assign rule exactly") {
    val path = tmpDir()
    val old = emb.filter($"vec_id" % 5 =!= 0)
    val neu = emb.filter($"vec_id" % 5 === 0)
    KnnIndex.build(old, "vec_id", "embedding", path, nLists = 8)
    val meta = KnnIndex.compact(spark, path, nLists = 16)
    assert(meta.nLists == 16)
    // the members tree is self-describing: the append after the resplit
    // must land in 16-list cells, and the delta join must probe them
    KnnIndex.append(neu, "vec_id", "embedding", path)
    val inc = deltaRows(path, neu)
    // whole-cell shortlist ⇒ trained-PQ codes cannot cut, and the md5-sign
    // assign rule is a pure function of (vector, nLists): a fresh one-shot
    // rebuild at nLists=16 must agree row-for-row
    val full = Similarity.knnJoinIvf(emb, "vec_id", "embedding", k = 3,
        nLists = 16, nprobe = 4, kCand = 100000)
      .filter($"id_a" % 5 === 0)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(inc == full, s"resplit index diverged from an nLists=16 rebuild: " +
      s"only-inc=${(inc -- full).take(5)} only-full=${(full -- inc).take(5)}")
  }

  test("delete tombstones: filtered from the join immediately, applied " +
      "physically by compact, and the log is truncated") {
    val path = tmpDir()
    val gone = emb.filter($"vec_id" < 5).select($"vec_id")
    val keptBase = emb.filter($"vec_id" % 5 =!= 0 && $"vec_id" >= 5)
    KnnIndex.build(emb.filter($"vec_id" % 5 =!= 0), "vec_id", "embedding",
      path, nLists = 8)
    KnnIndex.delete(gone, "vec_id", path)
    val neu = emb.filter($"vec_id" % 5 === 0)
    val nn = deltaRows(path, neu)
    assert(nn.forall(_._2 >= 5), "tombstoned ids still surfaced as neighbors")
    // with the rescore deepened to the whole cell, dropping tombstones is
    // EXACT: identical to an index that never held them
    val path2 = tmpDir()
    KnnIndex.build(keptBase, "vec_id", "embedding", path2, nLists = 8)
    assert(nn == deltaRows(path2, neu),
      "tombstone filtering diverged from an index built without the ids")
    KnnIndex.compact(spark, path)
    val storedIds = spark.read.parquet(KnnIndex.membersDir(spark, path))
      .select(explode($"vmem.id").as("id")).as[Long].collect().toSet
    assert(gone.as[Long].collect().forall(!storedIds.contains(_)),
      "compact left tombstoned ids in the directory")
    assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$path/tombstones")),
      "compact did not truncate the tombstone log")
    assert(nn == deltaRows(path, neu), "answers changed across compact")
  }

  test("dedupDelta verdicts: planted copies fold by the q87 rule and match " +
      "the portable twin at whole-cell depth") {
    val path = tmpDir()
    val old = emb.filter($"vec_id" % 5 =!= 0)
    KnnIndex.build(old, "vec_id", "embedding", path, nLists = 8)
    // the arriving batch: a copy of stored 1 (id 20001), two mutual copies
    // of stored 2's vector (ids 20003/20004 — a new-new pair), and the
    // genuinely-new %5 rows
    val planted = emb.filter($"vec_id" === 1)
      .select(($"vec_id" + 20000).as("vec_id"), $"embedding")
      .union(emb.filter($"vec_id" === 2)
        .select(($"vec_id" + 20001).as("vec_id"), $"embedding"))
      .union(emb.filter($"vec_id" === 2)
        .select(($"vec_id" + 20002).as("vec_id"), $"embedding"))
    val neu = emb.filter($"vec_id" % 5 === 0)
      .select($"vec_id", $"embedding").union(planted)
    KnnIndex.append(neu, "vec_id", "embedding", path)
    val v = KnnIndex.dedupDelta(neu, "vec_id", "embedding", path,
        tau = 0.999, k = 1000, nprobe = 4)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(v(20001L) == ((1L, -1L, 0L)), s"copy of stored 1 got ${v(20001L)}")
    assert(v(20003L) == ((2L, -1L, 0L)), s"copy of stored 2 got ${v(20003L)}")
    assert(v(20004L) == ((2L, 20003L, 0L)),
      s"second copy should name stored 2 AND its lower-id twin, got ${v(20004L)}")
    // portable twin agreement on the SAME batch at whole-cell settings:
    // same probe rule, same rounded cosine, shortlist deep enough that
    // trained-vs-lattice PQ codes cannot cut — verdict sets must align on
    // the planted rows
    val p = Similarity.semanticDedupIncrementalPortable(old, neu,
        "vec_id", "embedding", tau = 0.999, nLists = 8, nprobe = 4,
        kCand = 100000)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    Seq(20001L, 20003L, 20004L).foreach { id =>
      assert(v(id) == p(id), s"native $id=${v(id)} != portable ${p(id)}")
    }
  }

  test("restricted delta join: answers limited to the allow-list, exact vs " +
      "the restricted brute force at whole-cell depth") {
    val path = tmpDir()
    KnnIndex.build(emb, "vec_id", "embedding", path, nLists = 8)
    val probes = emb.filter($"vec_id" % 5 === 0)
    val allowed = emb.filter($"vec_id" % 3 === 0).select($"vec_id")
    val res = KnnIndex.knnJoinDelta(probes, "vec_id", "embedding", path,
        k = 3, nprobe = 8, kCand = 100000, restrict = Some(allowed))
      .as[(Long, Long, Double, Int)].collect()
    assert(res.nonEmpty && res.forall(_._2 % 3 == 0),
      "disallowed ids surfaced through the restriction")
    // every cell probed + whole-cell rescore ⇒ the restriction is EXACT:
    // identical to brute-force cosine top-k over the allowed members only
    // (rank re-numbered over survivors — not a post-filter of the
    // unrestricted top-k, which would LOSE answers)
    val bf = Similarity.knnJoinExact(emb, "vec_id", "embedding", k = 100000)
      .filter($"id_a" % 5 === 0 && $"id_b" % 3 === 0)
      .as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1).toSeq.flatMap { case (a, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(3).zipWithIndex
          .map { case ((_, b, c, _), i) => (a, b, c, i + 1) }.toSeq
      }.toSet
    assert(res.toSet == bf, s"restricted join diverged from brute force: " +
      s"only-res=${(res.toSet -- bf).take(5)} only-bf=${(bf -- res.toSet).take(5)}")
  }

  test("appendBatch: committed replay is a no-op; a lost marker replays " +
      "onto the same deterministic files — never duplicate members") {
    val path = tmpDir()
    KnnIndex.build(emb.filter($"vec_id" % 5 =!= 0), "vec_id", "embedding",
      path, nLists = 8)
    val neu = emb.filter($"vec_id" % 5 === 0)
    assert(KnnIndex.appendBatch(neu, "vec_id", "embedding", path, 7L),
      "first appendBatch should commit")
    val files1 = parquetFiles(KnnIndex.membersDir(spark, path)).toSet
    assert(files1.exists(_.contains("ingest-b7-")),
      "batch files should carry the batch-scoped names")
    val rows1 = deltaRows(path, neu)
    // fully committed: the replay must not touch the tree
    assert(!KnnIndex.appendBatch(neu, "vec_id", "embedding", path, 7L))
    assert(parquetFiles(KnnIndex.membersDir(spark, path)).toSet == files1)
    // crash between the file moves and the marker commit: the marker is
    // missing but the files landed — the replay re-stages and re-renames
    // onto the SAME names, so the member set (and every answer) is stable
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$path/ingest_log/batch-7"))
    assert(KnnIndex.appendBatch(neu, "vec_id", "embedding", path, 7L),
      "replay after a lost marker should re-commit")
    assert(parquetFiles(KnnIndex.membersDir(spark, path)).toSet == files1,
      "replay changed the member file set")
    assert(deltaRows(path, neu) == rows1, "replay changed answers")
  }

  test("ingestStream: exactly-once micro-batch appends with a per-batch " +
      "verdict ledger (dup-of-stored, dup-of-earlier-batch, kept)") {
    implicit val sqlCtx = spark.sqlContext
    val path = tmpDir(); val out = tmpDir(); val ckpt = tmpDir()
    KnnIndex.build(emb.filter($"vec_id" % 5 =!= 0), "vec_id", "embedding",
      path, nLists = 8)
    def vecOf(id: Long): Seq[Float] =
      emb.filter($"vec_id" === id).head().getSeq[Float](1)
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])]
    val q = KnnIndex.ingestStream(mem.toDF().toDF("vec_id", "embedding"),
        "vec_id", "embedding", path, verdictsDir = out, tau = 0.999,
        k = 8, nprobe = 8)
      .option("checkpointLocation", ckpt).start()
    // batch 0: a copy of stored 1, and a genuinely-new vector (negated
    // stored 7 — cosine −1 to its source, ~0 to everything else)
    mem.addData((30000L, vecOf(1)), (30001L, vecOf(7).map(x => -x)))
    q.processAllAvailable()
    // batch 1: another copy of the same vector — by now BOTH the stored
    // original (id 1) and the batch-0 arrival (30000) are index members
    mem.addData((30002L, vecOf(1)))
    q.processAllAvailable()
    q.stop()
    val b0 = spark.read.parquet(s"$out/batch=0")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(b0(30000L) == ((1L, -1L, 0L)),
      s"batch-0 copy of stored 1 got ${b0(30000L)}")
    assert(b0(30001L) == ((-1L, -1L, 1L)),
      s"batch-0 fresh vector got ${b0(30001L)}")
    val b1 = spark.read.parquet(s"$out/batch=1")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(b1(30002L) == ((1L, -1L, 0L)),
      s"batch-1 copy should name the min stored id, got ${b1(30002L)}")
    // both batches are committed members under their batch-scoped names
    val files = parquetFiles(KnnIndex.membersDir(spark, path))
    assert(files.exists(_.contains("ingest-b0-")) &&
      files.exists(_.contains("ingest-b1-")),
      "streamed batches missing from the members tree")
    assert(KnnIndex.ingestCommitted(spark, path, 0L) &&
      KnnIndex.ingestCommitted(spark, path, 1L))
  }

  test("ingestStream(maintainEvery): the policy compacts from inside the " +
      "stream — the one permitted writer is the maintainer — and answers " +
      "match an unmaintained twin fed the same batches") {
    implicit val sqlCtx = spark.sqlContext
    val path = tmpDir(); val twin = tmpDir(); val ckpt = tmpDir()
    val old = emb.filter($"vec_id" % 5 =!= 0)
    KnnIndex.build(old, "vec_id", "embedding", path, nLists = 8)
    KnnIndex.build(old, "vec_id", "embedding", twin, nLists = 8)
    val gen0 = KnnIndex.membersDir(spark, path)
    val rest = emb.filter($"vec_id" % 5 === 0)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    val batches = rest.grouped(math.max(1, rest.length / 5)).toSeq
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])]
    val q = KnnIndex.ingestStream(mem.toDF().toDF("vec_id", "embedding"),
        "vec_id", "embedding", path, maintainEvery = 1)
      .option("checkpointLocation", ckpt).start()
    batches.zipWithIndex.foreach { case (b, i) =>
      mem.addData(b.toSeq)
      q.processAllAvailable()
      KnnIndex.appendBatch(b.toSeq.toDF("vec_id", "embedding"),
        "vec_id", "embedding", twin, i.toLong)
    }
    q.stop()
    // full-scope batches push mean_dir_rows past the 4.0 threshold by the
    // 4th-5th append, so the per-batch maintain pass must have compacted
    // (a new generation committed) and reset the drift
    assert(KnnIndex.membersDir(spark, path) != gen0,
      "the in-stream policy never compacted")
    val h = KnnIndex.health(spark, path)
    assert(h.meanDirRows <= 4.0, s"drift not reset: $h")
    val hTwin = KnnIndex.health(spark, twin)
    assert(hTwin.meanDirRows > 4.0,
      s"the twin should have accumulated fragmentation, got $hTwin")
    // whole-cell kCand ⇒ exact: the maintained tree must answer exactly
    // like the never-compacted twin holding the same member set
    val probe = emb.filter($"vec_id" % 5 === 0).limit(20)
    val a = KnnIndex.knnJoinDelta(probe, "vec_id", "embedding", path,
        k = 3, nprobe = 4, kCand = 100000)
      .as[(Long, Long, Double, Int)].collect().toSet
    val b = KnnIndex.knnJoinDelta(probe, "vec_id", "embedding", twin,
        k = 3, nprobe = 4, kCand = 100000)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(a == b, s"maintained/unmaintained answers diverged: " +
      s"only-a=${(a -- b).take(5)} only-b=${(b -- a).take(5)}")
  }

  test("maintainer lease: a second maintainer raises typed instead of " +
      "corrupting; a crashed holder's stale lease is broken; every mutator " +
      "releases on exit") {
    val path = tmpDir()
    KnnIndex.build(emb, "vec_id", "embedding", path, nLists = 8)
    // build acquired and released — no lease left behind
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$path/_MAINTAINER")))
    // simulate a LIVE concurrent maintainer (fresh lease file)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/_MAINTAINER"), "other-jvm".getBytes)
    val neu = emb.limit(5)
      .select(($"vec_id" + 90000).as("vec_id"), $"embedding")
    intercept[ConcurrentMaintainerException] {
      KnnIndex.append(neu, "vec_id", "embedding", path)
    }
    intercept[ConcurrentMaintainerException] {
      KnnIndex.appendBatch(neu, "vec_id", "embedding", path, 50L)
    }
    intercept[ConcurrentMaintainerException] {
      KnnIndex.delete(emb.limit(1).select($"vec_id"), "vec_id", path)
    }
    intercept[ConcurrentMaintainerException] {
      KnnIndex.compact(spark, path)
    }
    // readers never touch the lease: a delta search under a held lease
    val got = KnnIndex.knnJoinDelta(neu, "vec_id", "embedding", path,
      k = 1, nprobe = 4).count()
    assert(got > 0, "reads must proceed under a held lease")
    // a crashed maintainer's lease (older than the TTL) is broken and the
    // blocked mutation proceeds, releasing normally
    spark.conf.set("spark.graft.index.leaseTtlMs", "1")
    try {
      Thread.sleep(5)
      assert(KnnIndex.appendBatch(neu, "vec_id", "embedding", path, 51L),
        "a stale lease must be broken, not honored")
    } finally spark.conf.unset("spark.graft.index.leaseTtlMs")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$path/_MAINTAINER")),
      "the broken-then-reacquired lease must release on exit")
  }

  test("miningStream: per-batch negatives equal the batch operator; replayed " +
      "batches rewrite, never duplicate") {
    implicit val sqlCtx = spark.sqlContext
    val path = tmpDir(); val out = tmpDir(); val ckpt = tmpDir()
    KnnIndex.build(emb, "vec_id", "embedding", path, nLists = 8,
      payloadCol = "label")
    val anchors = emb.filter($"vec_id" < 40)
      .select($"vec_id", $"embedding", $"label").as[(Long, Seq[Float], Int)]
      .collect()
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float], Int)]
    val q = KnnIndex.miningStream(mem.toDF().toDF("vec_id", "embedding", "lbl"),
        "vec_id", "embedding", "lbl", path, out, k = 3, nprobe = 4)
      .option("checkpointLocation", ckpt).start()
    mem.addData(anchors.take(20).toSeq)
    q.processAllAvailable()
    mem.addData(anchors.drop(20).toSeq)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(s"$out/batch=0", s"$out/batch=1")
      .as[(Long, Int, Long, Int, Double, Int)].collect().toSet
    val direct = KnnIndex.hardNegativesDelta(emb.filter($"vec_id" < 40)
          .withColumnRenamed("label", "lbl"),
        "vec_id", "embedding", "lbl", path, k = 3, nprobe = 4)
      .as[(Long, Int, Long, Int, Double, Int)].collect().toSet
    assert(streamed == direct, s"stream/batch mining parity broke: " +
      s"only-stream=${(streamed -- direct).take(3)} only-batch=${(direct -- streamed).take(3)}")
    streamed.foreach(r => assert(r._2 != r._4, s"same-label pair leaked: $r"))
  }

  test("payload tree: hardNegativesDelta ≡ hardNegativesAnnCell when the " +
      "shortlist covers whole cells") {
    val path = tmpDir()
    KnnIndex.build(emb, "vec_id", "embedding", path, nLists = 8,
      payloadCol = "label")
    // the stored-index mining pass and the one-shot in-cell operator make
    // the same decisions (same assign rule, same label gate position, same
    // rescore arithmetic); with kCand covering every cell both are exact
    // within probed cells — rows must match exactly
    val delta = KnnIndex.hardNegativesDelta(emb, "vec_id", "embedding",
        "label", path, k = 3, nprobe = 4, kCand = 100000)
      .as[(Long, Int, Long, Int, Double, Int)].collect().toSet
    val oneShot = Similarity.hardNegativesAnnCell(emb, "vec_id", "embedding",
        "label", k = 3, nLists = 8, nprobe = 4, kCand = 100000)
      .as[(Long, Int, Long, Int, Double, Int)].collect().toSet
    assert(delta == oneShot, s"stored-index mining diverged: " +
      s"only-delta=${(delta -- oneShot).take(5)} only-one-shot=${(oneShot -- delta).take(5)}")
    delta.foreach(r => assert(r._2 != r._4, s"same-label pair leaked: $r"))
  }

  test("payload TYPE parity: appending a differently-typed payload into a " +
      "stored tree fails fast (mixed member-struct schemas in one parquet " +
      "directory read arbitrarily and compact would drop payloads)") {
    val path = tmpDir()
    KnnIndex.build(emb.filter($"vec_id" % 5 =!= 0), "vec_id", "embedding",
      path, nLists = 8, payloadCol = "label")
    val neu = emb.filter($"vec_id" % 5 === 0)
      .withColumn("label", $"label".cast("string"))
    val ex = intercept[IllegalArgumentException] {
      KnnIndex.append(neu, "vec_id", "embedding", path, payloadCol = "label")
    }
    assert(ex.getMessage.contains("payload"), ex.getMessage)
    // same-typed append still lands
    KnnIndex.append(emb.filter($"vec_id" % 5 === 0), "vec_id", "embedding",
      path, payloadCol = "label")
  }

  test("payload is optional to READERS: knnJoinDelta answers identically " +
      "over payload and plain trees") {
    val plain = tmpDir(); val pay = tmpDir()
    val old = emb.filter($"vec_id" % 5 =!= 0)
    val neu = emb.filter($"vec_id" % 5 === 0)
    KnnIndex.build(old, "vec_id", "embedding", plain, nLists = 8)
    KnnIndex.build(old, "vec_id", "embedding", pay, nLists = 8,
      payloadCol = "label")
    KnnIndex.append(neu, "vec_id", "embedding", plain)
    KnnIndex.append(neu, "vec_id", "embedding", pay, payloadCol = "label")
    assert(deltaRows(pay, neu) == deltaRows(plain, neu),
      "payload-blind reads must not see the payload column")
  }

  test("payload survives compact; tombstoned members are never mined as " +
      "negatives; a payload-less tree fails fast") {
    val path = tmpDir()
    val old = emb.filter($"vec_id" % 5 =!= 0)
    val neu = emb.filter($"vec_id" % 5 === 0)
    KnnIndex.build(old, "vec_id", "embedding", path, nLists = 8,
      payloadCol = "label")
    KnnIndex.append(neu, "vec_id", "embedding", path, payloadCol = "label")
    val before = KnnIndex.hardNegativesDelta(neu, "vec_id", "embedding",
        "label", path, k = 3, nprobe = 4, kCand = 100000)
      .as[(Long, Int, Long, Int, Double, Int)].collect().toSet
    KnnIndex.compact(spark, path)
    val after = KnnIndex.hardNegativesDelta(neu, "vec_id", "embedding",
        "label", path, k = 3, nprobe = 4, kCand = 100000)
      .as[(Long, Int, Long, Int, Double, Int)].collect().toSet
    assert(after == before, "compact changed mining answers (payload lost?)")
    // tombstone the current winners: none may be mined again
    val killed = before.map(_._3).take(20).toSeq
    KnnIndex.delete(killed.toDF("vec_id"), "vec_id", path)
    val mined = KnnIndex.hardNegativesDelta(neu, "vec_id", "embedding",
        "label", path, k = 3, nprobe = 4, kCand = 100000)
      .as[(Long, Int, Long, Int, Double, Int)].collect()
    mined.foreach(r => assert(!killed.contains(r._3),
      s"tombstoned member ${r._3} mined as a negative"))
    // a tree built without payload refuses label mining with a typed error
    val plain = tmpDir()
    KnnIndex.build(old, "vec_id", "embedding", plain, nLists = 8)
    val err = intercept[IllegalArgumentException] {
      KnnIndex.hardNegativesDelta(neu, "vec_id", "embedding", "label",
        plain, k = 3).collect()
    }
    assert(err.getMessage.contains("payload"))
    // ...and appends whose payload presence disagrees with the stored tree
    // fail fast BOTH ways (a mixed-width members directory would read
    // nondeterministically and compact would drop payloads silently)
    val e1 = intercept[IllegalArgumentException] {
      KnnIndex.append(neu, "vec_id", "embedding", plain, payloadCol = "label")
    }
    assert(e1.getMessage.contains("without a payload"))
    val e2 = intercept[IllegalArgumentException] {
      KnnIndex.append(neu, "vec_id", "embedding", path) // payload tree, no col
    }
    assert(e2.getMessage.contains("must supply"))
  }

  test("restricted mining: negatives limited to the allow-list, exact vs the " +
      "restricted brute force at whole-cell depth") {
    val path = tmpDir()
    KnnIndex.build(emb, "vec_id", "embedding", path, nLists = 8,
      payloadCol = "label")
    val allowed = emb.filter($"vec_id" % 3 === 0).select($"vec_id")
    val mined = KnnIndex.hardNegativesDelta(emb, "vec_id", "embedding",
        "label", path, k = 3, nprobe = 8, kCand = 100000,
        restrict = Some(allowed))
      .as[(Long, Int, Long, Int, Double, Int)].collect()
    assert(mined.nonEmpty)
    mined.foreach { r =>
      assert(r._3 % 3 == 0, s"disallowed member mined: $r")
      assert(r._2 != r._4, s"same-label pair leaked: $r")
    }
    // reference: the O(N²) different-label pairs, filtered to the
    // allow-list, re-ranked per anchor — nprobe = nLists and kCand over
    // occupancy make the index path exact within probed cells
    import org.apache.spark.sql.expressions.Window
    val wr = Window.partitionBy($"id_a").orderBy($"cosine".desc, $"id_b".asc)
    val ref = Similarity.hardNegatives(emb, "vec_id", "embedding", "label",
        k = 100000)
      .filter($"id_b" % 3 === 0)
      .withColumn("rank2", org.apache.spark.sql.functions.row_number().over(wr))
      .filter($"rank2" <= 3)
      .select($"id_a", $"label_a", $"id_b", $"label_b", $"cosine",
        $"rank2".as("rank"))
      .as[(Long, Int, Long, Int, Double, Int)].collect().toSet
    assert(mined.toSet == ref, s"restricted mining diverged: " +
      s"only-mined=${(mined.toSet -- ref).take(5)} only-ref=${(ref -- mined.toSet).take(5)}")
  }

  test("payload-predicate-filtered delta join: equals filter-then-re-rank " +
      "of the deep unfiltered join (the restrict exactness contract), " +
      "payload_b riding the output") {
    val path = tmpDir()
    val old = emb.filter($"vec_id" % 5 =!= 0)
    val neu = emb.filter($"vec_id" % 5 === 0)
    KnnIndex.build(old, "vec_id", "embedding", path, nLists = 8,
      payloadCol = "label")
    val allowed: Seq[Any] = Seq(0, 1, 2)
    val got = KnnIndex.knnJoinDelta(neu, "vec_id", "embedding", path, k = 3,
        nprobe = 4, kCand = 100000, payloadIn = Some(allowed))
      .as[(Long, Long, Int, Double, Int)].collect().toSet
    // independent reference: the unfiltered deep join (every rescored
    // member kept), labels ATTACHED by join, predicate, re-rank, cut —
    // the exact decision order the operator claims
    import org.apache.spark.sql.expressions.Window
    val deep = KnnIndex.knnJoinDelta(neu, "vec_id", "embedding", path,
      k = 100000, nprobe = 4, kCand = 100000)
    val labels = old.select($"vec_id".as("id_b"), $"label".as("payload_b"))
    val w = Window.partitionBy($"id_a").orderBy($"cosine".desc, $"id_b".asc)
    val ref = deep.drop("rank").join(labels, "id_b")
      .filter($"payload_b".isin(allowed: _*))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"id_a", $"id_b", $"payload_b", $"cosine", $"rank")
      .as[(Long, Long, Int, Double, Int)].collect().toSet
    assert(got == ref, s"payload filter diverged: only-got=" +
      s"${(got -- ref).take(5)} only-ref=${(ref -- got).take(5)}")
    assert(got.nonEmpty)
    got.foreach(r => assert(Seq(0, 1, 2).contains(r._3),
      s"disallowed payload leaked: $r"))
  }

  test("payload-filtered mining: hardNegativesDelta(payloadIn) equals " +
      "class-filter-then-re-rank of the unfiltered mining output") {
    val path = tmpDir()
    KnnIndex.build(emb, "vec_id", "embedding", path, nLists = 8,
      payloadCol = "label")
    val allowed: Seq[Any] = Seq(1, 3)
    val got = KnnIndex.hardNegativesDelta(emb, "vec_id", "embedding",
        "label", path, k = 2, nprobe = 4, kCand = 100000,
        payloadIn = Some(allowed))
      .as[(Long, Int, Long, Int, Double, Int)].collect().toSet
    import org.apache.spark.sql.expressions.Window
    val deep = KnnIndex.hardNegativesDelta(emb, "vec_id", "embedding",
      "label", path, k = 100000, nprobe = 4, kCand = 100000)
    val w = Window.partitionBy($"id_a").orderBy($"cosine".desc, $"id_b".asc)
    val ref = deep.drop("rank").filter($"label_b".isin(allowed: _*))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 2)
      .as[(Long, Int, Long, Int, Double, Int)].collect().toSet
    assert(got == ref)
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(Seq(1, 3).contains(r._4), s"disallowed class mined: $r")
      assert(r._2 != r._4, s"same-label pair leaked: $r")
    }
  }

  test("maintain: the stats-driven compaction trigger fires past the " +
      "thresholds — fragmented or tombstone-heavy trees compact, a fresh " +
      "tree does not") {
    val path = tmpDir()
    val old = emb.filter($"vec_id" % 5 =!= 0)
    val delta = emb.filter($"vec_id" % 5 === 0)
      .select(($"vec_id" + 100000).as("vec_id"), $"embedding")
    KnnIndex.build(old, "vec_id", "embedding", path, nLists = 8)
    assert(!KnnIndex.shouldCompact(spark, path),
      "a freshly built tree must not trigger")
    assert(!KnnIndex.maintain(spark, path))
    // append fragmentation: several delta batches → mean directory rows
    // per cell climbs past the threshold
    (0 until 5).foreach { i =>
      KnnIndex.append(delta.select(($"vec_id" + i * 1000).as("vec_id"),
        $"embedding"), "vec_id", "embedding", path)
    }
    assert(KnnIndex.health(spark, path).meanDirRows > 4.0)
    assert(KnnIndex.shouldCompact(spark, path), "fragmented tree must trigger")
    assert(KnnIndex.maintain(spark, path), "maintain must compact it")
    assert(!KnnIndex.shouldCompact(spark, path),
      "compaction must restore the tree below the trigger")
    assert(KnnIndex.health(spark, path).meanDirRows == 1.0)
    // tombstone pressure: delete ~20% of members → fraction crosses 2%
    KnnIndex.delete(old.filter($"vec_id" % 5 === 1).select($"vec_id"),
      "vec_id", path)
    assert(KnnIndex.health(spark, path).tombstoneFrac > 0.02)
    assert(KnnIndex.maintain(spark, path), "tombstone-heavy tree must compact")
    val h = KnnIndex.health(spark, path)
    assert(h.tombstones == 0, "compact must truncate the log")
    assert(!KnnIndex.shouldCompact(spark, path))
  }

  test("payloadWhere: set + range conjunction over a STRUCT payload equals " +
      "filter-then-re-rank of the deep unfiltered join, the struct riding " +
      "the output") {
    val path = tmpDir()
    val withPay = emb.withColumn("pay", struct($"label".as("cls"),
      round(pmod($"vec_id", lit(97L)) / lit(97.0), 6).as("q")))
    val old = withPay.filter($"vec_id" % 5 =!= 0)
    val neu = withPay.filter($"vec_id" % 5 === 0)
    KnnIndex.build(old, "vec_id", "embedding", path, nLists = 8,
      payloadCol = "pay")
    val pred = col("payload_b.cls").isin(0, 1, 2) && col("payload_b.q") > 0.25
    val got = KnnIndex.knnJoinDelta(neu, "vec_id", "embedding", path, k = 3,
        nprobe = 4, kCand = 100000, payloadWhere = Some(pred))
      .as[(Long, Long, (Int, Double), Double, Int)].collect().toSet
    // independent reference: the unfiltered deep join, the struct ATTACHED
    // by join, the same conjunction, re-rank, cut — the operator's claimed
    // decision order with the payload arriving a different way
    import org.apache.spark.sql.expressions.Window
    val deep = KnnIndex.knnJoinDelta(neu, "vec_id", "embedding", path,
      k = 100000, nprobe = 4, kCand = 100000)
    val pays = old.select($"vec_id".as("id_b"), $"pay".as("payload_b"))
    val w = Window.partitionBy($"id_a").orderBy($"cosine".desc, $"id_b".asc)
    val ref = deep.drop("rank").join(pays, "id_b")
      .filter(pred)
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"id_a", $"id_b", $"payload_b", $"cosine", $"rank")
      .as[(Long, Long, (Int, Double), Double, Int)].collect().toSet
    assert(got == ref, s"payloadWhere diverged: " +
      s"only-got=${(got -- ref).take(5)} only-ref=${(ref -- got).take(5)}")
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(Seq(0, 1, 2).contains(r._3._1), s"disallowed class answered: $r")
      assert(r._3._2 > 0.25, s"below-range quality answered: $r")
    }
  }

  test("reader-safe compact: delta searches looping CONCURRENTLY with the " +
      "generation-pointer swap never fail and never change answers") {
    val path = tmpDir()
    val old = emb.filter($"vec_id" % 5 =!= 0)
    val neu = emb.filter($"vec_id" % 5 === 0)
    KnnIndex.build(old.filter($"vec_id" % 2 === 0), "vec_id", "embedding",
      path, nLists = 8)
    KnnIndex.append(old.filter($"vec_id" % 2 =!= 0), "vec_id", "embedding", path)
    val expect = deltaRows(path, neu)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val iters = new java.util.concurrent.atomic.AtomicInteger(0)
    val reader = new Thread(() => {
      while (!stop.get()) {
        try {
          val got = deltaRows(path, neu)
          iters.incrementAndGet()
          if (got != expect)
            failures.add(new AssertionError(
              s"concurrent reader saw divergent answers: " +
                s"only-got=${(got -- expect).take(3)} " +
                s"only-expect=${(expect -- got).take(3)}"))
        } catch { case t: Throwable => failures.add(t); stop.set(true) }
      }
    })
    reader.start()
    try {
      // two full pointer swaps while the reader loops — under the r14
      // two-rename layout the reader would observe a missing members tree
      KnnIndex.compact(spark, path)
      KnnIndex.compact(spark, path)
    } finally {
      stop.set(true)
      reader.join(120000)
    }
    assert(failures.isEmpty,
      s"reader-during-compact failed after ${iters.get()} iterations: " +
        s"${Option(failures.peek()).map(_.toString)}")
    assert(iters.get() > 0, "the concurrent reader never completed a query")
    assert(deltaRows(path, neu) == expect, "answers changed across compacts")
  }

  test("torn CURRENT pointer: readers fall back to the highest committed " +
      "generation; stranded uncommitted trees are invisible; the next " +
      "compact repairs the pointer") {
    val path = tmpDir()
    KnnIndex.build(emb.filter($"vec_id" % 5 =!= 0), "vec_id", "embedding",
      path, nLists = 8)
    KnnIndex.append(emb.filter($"vec_id" % 5 === 0), "vec_id", "embedding", path)
    val neu = emb.filter($"vec_id" % 5 === 0)
    val expect = deltaRows(path, neu)
    KnnIndex.compact(spark, path)
    val live = KnnIndex.membersDir(spark, path)
    assert(live.contains("members-gen-"), s"expected a generation dir: $live")
    // a crash-stranded HIGHER generation with no _SUCCESS must stay
    // invisible to the resolver
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$path/members-gen-99/nl=8"))
    // torn CURRENT (simulated tamper — the temp+rename commit cannot
    // actually produce one): resolver falls back to the highest COMMITTED,
    // non-superseded generation, which is the compacted tree
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$path/CURRENT"),
      "garbage ".getBytes("UTF-8"))
    assert(KnnIndex.membersDir(spark, path) == live,
      "fallback must resolve the committed generation under a torn CURRENT")
    assert(deltaRows(path, neu) == expect,
      "answers changed under a torn CURRENT")
    // CURRENT deleted outright: same fallback
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$path/CURRENT"))
    assert(KnnIndex.membersDir(spark, path) == live)
    // the next maintainer pass recommits a parseable pointer
    KnnIndex.compact(spark, path)
    val repaired = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$path/CURRENT")), "UTF-8").trim
    assert(repaired.toLongOption.isDefined, s"pointer not repaired: $repaired")
    assert(deltaRows(path, neu) == expect, "answers changed after repair")
  }

  test("vacuum: superseded generations survive the grace window for " +
      "in-flight readers, then delete; the live tree is never touched") {
    val path = tmpDir()
    KnnIndex.build(emb.filter($"vec_id" % 5 =!= 0), "vec_id", "embedding",
      path, nLists = 8)
    val gen0 = KnnIndex.membersDir(spark, path)
    KnnIndex.append(emb.filter($"vec_id" % 5 === 0), "vec_id", "embedding", path)
    KnnIndex.compact(spark, path)
    val gen1 = KnnIndex.membersDir(spark, path)
    assert(gen0 != gen1)
    // default grace (15 min): the superseded tree is still on disk and
    // carries the _SUPERSEDED stamp compact's vacuum pass gave it
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(gen0)),
      "superseded generation deleted inside the grace window")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$gen0/_SUPERSEDED")))
    // a NON-compacting maintain() pass also vacuums, so a generation the
    // previous compact superseded ages out without waiting for the next
    // compact (grace forced to 0 via the conf for the test)
    spark.conf.set("spark.graft.index.gcGraceMs", "0")
    try {
      assert(!KnnIndex.maintain(spark, path), "fresh tree must not compact")
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(gen0)),
        "maintain() must vacuum the aged superseded generation")
    } finally spark.conf.unset("spark.graft.index.gcGraceMs")
    // grace 0 on a direct vacuum call: mark and delete in the same pass
    KnnIndex.compact(spark, path)
    val gen2 = KnnIndex.membersDir(spark, path)
    assert(gen2 != gen1)
    assert(KnnIndex.vacuum(spark, path, graceMs = 0L) >= 1)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(gen1)),
      "vacuum(grace=0) must delete the superseded generation")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(gen2)),
      "vacuum touched the live generation")
    val neu = emb.filter($"vec_id" % 5 === 0)
    assert(deltaRows(path, neu).nonEmpty, "live tree unreadable after vacuum")
  }

  test("meta round-trips: stored codebook equals the trained one") {
    val path = tmpDir()
    val written = KnnIndex.build(emb, "vec_id", "embedding", path, nLists = 8)
    val read = KnnIndex.readMeta(spark, path)
    assert(read.nLists == written.nLists && read.dims == written.dims &&
      read.m == written.m && read.ks == written.ks && read.subDim == written.subDim)
    assert(read.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      written.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
  }
}
