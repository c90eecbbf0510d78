package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = syntheticMedia(spark, 200).cache()

  test("synthetic media: deterministic, typed, all modalities present") {
    val a = media.collect().map(r => (r.media_id, r.media_type, r.bytes.toSeq))
    val b = syntheticMedia(spark, 200).collect().map(r => (r.media_id, r.media_type, r.bytes.toSeq))
    assert(a.toSeq == b.toSeq)
    val types = media.map(_.media_type).distinct().collect().toSet
    assert(types == Set("image", "audio", "video"))
  }

  test("extractFeatures: batched, deterministic, fixed dimension") {
    val f1 = extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.length == 200)
    assert(f1.forall(_.features.length == 16))
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
    // n_bytes round-trips the payload size
    val sizes = media.collect().map(r => r.media_id -> r.bytes.length.toLong).toMap
    f1.foreach(f => assert(f.n_bytes == sizes(f.media_id)))
  }

  test("imageDecode: real PNG and JPEG bytes decode to geometry + channel stats") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    // fixture 1: 80×40 solid red PNG; fixture 2: 32×64 solid gray JPEG
    def encode(w: Int, h: Int, rgb: Int, fmt: String): Array[Byte] = {
      val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, rgb)
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(im, fmt, bos), s"JDK lacks $fmt encoder")
      bos.toByteArray
    }
    val rows = Seq(
      MediaRow(1L, "image", encode(80, 40, 0xff0000, "png"), Some(80), Some(40), None),
      MediaRow(2L, "image", encode(32, 64, 0x808080, "jpg"), Some(32), Some(64), None),
      MediaRow(3L, "image", Array[Byte](1, 2, 3), None, None, None), // undecodable
      MediaRow(4L, "audio", Array[Byte](9, 9), None, None, Some(100L)))
    val ds = spark.createDataset(rows)(org.apache.spark.sql.Encoders.product[MediaRow])
    val got = extractFeatures(ds, imageDecode).collect().map(f => f.media_id -> f).toMap
    // red PNG: geometry decoded from the bytes, R mean 255, G/B mean 0, zero stddev
    val red = got(1L).features
    assert(red(0) == 80f && red(1) == 40f)
    assert(red(2) == 255f && red(3) == 0f && red(4) == 0f)
    assert(red(5) == 0f && red(6) == 0f && red(7) == 0f)
    // gray JPEG: geometry exact; channel means near 128 (JPEG is lossy)
    val gray = got(2L).features
    assert(gray(0) == 32f && gray(1) == 64f)
    Seq(gray(2), gray(3), gray(4)).foreach(m => assert(math.abs(m - 128f) < 8f, s"mean $m"))
    // luminance histogram sums to 1 for decoded images
    assert(math.abs(red.slice(8, 16).sum - 1f) < 1e-4)
    // undecodable image bytes and non-image rows fall back to the stub (16-dim)
    assert(got(3L).features.length == 16 && got(4L).features.length == 16)
    assert(got(3L).features(0) != 0f || got(3L).features(1) != 0f) // stub values, not geometry
  }

  test("imageNearDups: brightness-shifted copy pairs, distinct content does not") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    // seeded per-pixel pattern; `lift` adds uniform brightness (clip-free
    // range) — dHash compares neighbor gradients, so the lifted copy must
    // hash identically while a different seed flips ~half the bits
    def pattern(seed: Int, lift: Int): Array[Byte] = {
      val rnd = new scala.util.Random(seed)
      val im = new BufferedImage(40, 30, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 30; x <- 0 until 40) {
        val v = 40 + rnd.nextInt(150) + lift // ≤ 235 + 20 < 256: no clipping
        im.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(im, "png", bos))
      bos.toByteArray
    }
    val rows = Seq(
      MediaRow(1L, "image", pattern(11, 0), Some(40), Some(30), None),
      MediaRow(2L, "image", pattern(11, 20), Some(40), Some(30), None), // near-dup of 1
      MediaRow(3L, "image", pattern(99, 0), Some(40), Some(30), None),  // distinct
      MediaRow(4L, "audio", Array[Byte](9, 9), None, None, Some(100L)), // ignored
      MediaRow(5L, "image", Array[Byte](1, 2, 3), None, None, None))    // undecodable
    val ds = spark.createDataset(rows)(org.apache.spark.sql.Encoders.product[MediaRow])
    val pairs = imageNearDups(ds, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.contains((1L, 2L)), s"brightness-shifted copy not paired: $pairs")
    assert(pairs((1L, 2L)) == 0, s"gradient hash changed under uniform lift: $pairs")
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L),
      s"distinct content paired: $pairs")
    // hamming-0 identity: same bytes twice → the hashes agree exactly
    val h1 = Multimodal.dHash64(pattern(11, 0)).get
    assert(Multimodal.dHash64(pattern(11, 20)).get == h1, "lift changed dHash")
    assert(java.lang.Long.bitCount(Multimodal.dHash64(pattern(99, 0)).get ^ h1) > 10,
      "distinct pattern unexpectedly close in hash space")
  }

  test("audioNearDups: gain-scaled copy pairs at Hamming 0, different material does not") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val rate = 8000f
    def wav(seed: Int, gain: Double): Array[Byte] = {
      // seeded amplitude envelope over a tone: segment energies trace the
      // envelope; gain scales every energy by gain² so the rising/falling
      // comparisons — the hash bits — are untouched
      val rnd = new scala.util.Random(seed)
      val env = Array.fill(66)(0.1 + rnd.nextDouble() * 0.8)
      val nFrames = (rate * 0.5).toInt
      val pcm = new Array[Byte](nFrames * 2)
      (0 until nFrames).foreach { i =>
        val e = env(i * 66 / nFrames)
        val s = (math.sin(2 * math.Pi * 440 * i / rate) * e * gain * 32767).toInt.toShort
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(
        new AudioInputStream(new java.io.ByteArrayInputStream(pcm),
          new AudioFormat(rate, 16, 1, true, false), nFrames.toLong),
        AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val rows = Seq(
      MediaRow(1L, "audio", wav(7, 1.0), None, None, Some(500L)),
      MediaRow(2L, "audio", wav(7, 0.5), None, None, Some(500L)), // gain-scaled copy
      MediaRow(3L, "audio", wav(55, 1.0), None, None, Some(500L)), // different envelope
      MediaRow(4L, "image", Array[Byte](1), None, None, None))     // ignored
    val ds = spark.createDataset(rows)(org.apache.spark.sql.Encoders.product[MediaRow])
    val pairs = audioNearDups(ds, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.get((1L, 2L)).contains(0), s"gain-scaled copy not at Hamming 0: $pairs")
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L),
      s"different material paired: $pairs")
    val h1 = Multimodal.aHash64(wav(7, 1.0)).get
    assert(Multimodal.aHash64(wav(7, 0.25)).get == h1, "gain changed the envelope hash")
    assert(java.lang.Long.bitCount(Multimodal.aHash64(wav(55, 1.0)).get ^ h1) > 10,
      "different envelope unexpectedly close in hash space")
  }

  test("audioDecode: real WAV bytes decode to rate, duration, RMS, ZCR") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // fixture: 0.5 s of a 440 Hz sine at amplitude 0.8, 16-bit mono 8 kHz
    val rate = 8000f; val freq = 440.0; val amp = 0.8
    val nFrames = (rate * 0.5).toInt
    val pcm = new Array[Byte](nFrames * 2)
    (0 until nFrames).foreach { i =>
      val s = (math.sin(2 * math.Pi * freq * i / rate) * amp * 32767).toInt.toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm),
        new AudioFormat(rate, 16, 1, true, false), nFrames.toLong),
      AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    val rows = Seq(
      MediaRow(1L, "audio", wav, None, None, Some(500L)),
      MediaRow(2L, "audio", Array[Byte](9, 9, 9), None, None, Some(1L)), // undecodable
      MediaRow(3L, "image", Array[Byte](1), None, None, None))
    val ds = spark.createDataset(rows)(org.apache.spark.sql.Encoders.product[MediaRow])
    val got = extractFeatures(ds, audioDecode).collect().map(f => f.media_id -> f).toMap
    val f = got(1L).features
    assert(f(0) == rate && f(1) == 1f)
    assert(math.abs(f(2) - 0.5f) < 1e-3, s"duration ${f(2)}")
    assert(math.abs(f(3) - amp / math.sqrt(2)) < 0.01, s"rms ${f(3)}")
    assert(math.abs(f(4) - amp) < 0.01, s"peak ${f(4)}")
    // a 440 Hz tone crosses zero 2·440 times/s → ZCR ≈ 880/8000
    assert(math.abs(f(5) - 2 * freq / rate) < 0.01, s"zcr ${f(5)}")
    assert(f(7) < 0.05, s"a steady tone is not silent: ${f(7)}")
    // steady tone → energy spread evenly across the 8 segments
    f.slice(8, 16).foreach(e => assert(math.abs(e - 0.125f) < 0.01, s"segment $e"))
    // undecodable audio and non-audio rows fall back to the stub
    assert(got(2L).features.length == 16 && got(3L).features.length == 16)
    // dispatch sends each modality to its decoder: audio features match
    val dispatched = extractFeatures(ds, mediaDecode).collect()
      .map(x => x.media_id -> x).toMap
    assert(dispatched(1L).features.toSeq == f.toSeq)
  }

  test("sampleFrames: videos explode to N frames with monotonic offsets") {
    val frames = sampleFrames(media, framesPer = 4).collect().groupBy(_.media_id)
    val byType = media.collect().map(r => r.media_id -> r.media_type).toMap
    frames.foreach { case (id, fs) =>
      byType(id) match {
        case "video" =>
          assert(fs.length == 4)
          val offs = fs.sortBy(_.frame_index).map(_.offset_ms)
          assert(offs.zip(offs.tail).forall { case (a, b) => a <= b })
        case _ => assert(fs.length == 1 && fs.head.offset_ms == 0L)
      }
    }
  }

  test("withResizeTarget caps the longest side, preserves aspect") {
    val images = media.filter(_.media_type == "image").toDF()
    val resized = withResizeTarget(images, maxSide = 512)
      .select("width", "height", "target_width", "target_height").collect()
    resized.foreach { r =>
      val (w, h, tw, thh) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      assert(tw <= 512 && thh <= 512)
      assert(tw <= w && thh <= h) // never upscale
      // aspect preserved within rounding slack of the shorter target side
      val got = tw.toDouble / thh
      val want = w.toDouble / h
      assert(math.abs(got - want) / want < 0.2, s"aspect $got vs $want ($w x $h -> $tw x $thh)")
    }
  }

  test("repartitionForMedia scales partitions with payload bytes") {
    val df = media.toDF()
    val parts = repartitionForMedia(df, targetBytesPerTask = 16 * 1024).rdd.getNumPartitions
    assert(parts >= spark.sparkContext.defaultParallelism)
  }

  test("hashNearDups: multi-band-sharing pairs emit exactly once, Hamming " +
      "verified, pigeonhole bound respected") {
    import spark.implicits._
    // 1 & 2 identical (share ALL 4 bands — the duplicate hazard the
    // first-matching-band filter exists for); 3 at Hamming 2 from 1
    // (flips in bands 0 and 1, shares bands 2,3); 4 at Hamming 8 spread
    // 2-per-band (shares NO band → unreachable by construction even
    // though > maxHamming anyway); 5 unrelated
    val h1 = 0x0123456789abcdefL
    val rows = Seq(
      (1L, h1), (2L, h1),
      (3L, h1 ^ (1L << 3) ^ (1L << 17)),
      (4L, h1 ^ 0x0018001800180018L),
      (5L, 0x7edcba9876543210L)
    ).toDF("id", "hash")
    val got = hashNearDups(rows, maxHamming = 3, bands = 4)
      .as[(Long, Long, Int)].collect().sorted
    assert(got.toSeq == Seq((1L, 2L, 0), (1L, 3L, 2), (2L, 3L, 2)),
      s"got ${got.toSeq}")
    // no duplicate (id_a, id_b) rows even though (1,2) matched on 4 bands
    assert(got.map(p => (p._1, p._2)).distinct.length == got.length)
  }

  test("signature index lifecycle: nearDupDelta verdicts equal one-shot " +
      "hashNearDups over stored ∪ batch folded by the q87 rule; append " +
      "lands new files only; bucket pruning reads probed partitions") {
    import spark.implicits._
    val h1 = 0x0123456789abcdefL
    val h9 = 0x7edcba9876543210L
    // stored corpus: two distinct families + an unrelated singleton
    val stored = Seq((10L, h1), (11L, h1 ^ (1L << 5)), (20L, h9), (30L, 0x5555aaaa5555aaaaL))
      .toDF("id", "hash")
    // batch: 100 dups 10 (flip ≤ 3), 101 fresh, 102 dup of101 (same batch,
    // 1 flip), 103 dup of BOTH stored 20 and batch-lower 101? no — keep it
    // clean: 103 dups stored 20 only
    val fresh = 0x0f0f0f0f0f0f0f0fL
    val batch = Seq(
      (100L, h1 ^ (1L << 40)),            // dup of stored 10/11 family
      (101L, fresh),                      // fresh leader
      (102L, fresh ^ (1L << 2)),          // dup of batch-lower 101
      (103L, h9 ^ (1L << 60) ^ (1L << 7)) // dup of stored 20 (Hamming 2)
    ).toDF("id", "hash")
    val path = java.nio.file.Files.createTempDirectory("graft_sigidx").toString
    Multimodal.buildSigIndex(stored, path, bands = 4)
    val got = Multimodal.nearDupDelta(batch, path, maxHamming = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // independent reference: ONE hashNearDups over the union, folded by
    // the q87 rule (min stored match; min lower-id same-batch match)
    val pairs = Multimodal.hashNearDups(stored.unionByName(batch),
        maxHamming = 3, bands = 4)
      .as[(Long, Long, Int)].collect()
    val storedIds = Set(10L, 11L, 20L, 30L)
    def ref(d: Long): (Long, Long, Long, Long) = {
      val partners = pairs.collect {
        case (a, b, _) if a == d => b
        case (a, b, _) if b == d => a
      }
      val old = partners.filter(storedIds.contains).sorted.headOption.getOrElse(-1L)
      val nw = partners.filter(p => !storedIds.contains(p) && p < d)
        .sorted.headOption.getOrElse(-1L)
      (d, old, nw, if (old == -1L && nw == -1L) 1L else 0L)
    }
    assert(got == Seq(100L, 101L, 102L, 103L).map(ref), s"got $got")
    // the planted shape is actually exercised
    assert(got.map(v => (v._1, v._4)).toMap ==
      Map(100L -> 0L, 101L -> 1L, 102L -> 0L, 103L -> 0L))
    // append is ∝ |delta|: new files only, base untouched
    def files(): Set[String] = {
      val out = scala.collection.mutable.Set[String]()
      java.nio.file.Files.walk(java.nio.file.Paths.get(
          Multimodal.sigMembersDir(spark, path)))
        .forEach(p => if (p.toString.endsWith(".parquet")) out += p.toString)
      out.toSet
    }
    val before = files()
    Multimodal.appendSigIndex(batch, path)
    assert(files().size > before.size && before.subsetOf(files()))
    // the next batch now sees the appended one as stored
    val next = Seq((200L, fresh ^ (1L << 50))).toDF("id", "hash")
    val v2 = Multimodal.nearDupDelta(next, path, maxHamming = 3)
      .as[(Long, Long, Long, Long)].collect().head
    assert(v2 == ((200L, 101L, -1L, 0L)), s"got $v2")
    // bucket pruning: a 1-row delta's member read must scan fewer
    // partitions than the full tree (observable via the pruned plan)
    val plan = Multimodal.nearDupDelta(next, path, maxHamming = 3)
      .queryExecution.executedPlan.toString
    // FileSourceScanExec always prints "PartitionFilters: [...]" (empty
    // included) — assert the filter CONTENT references the composite
    // band/bucket key, so a pruning regression actually fails the test
    assert("PartitionFilters: \\[[^\\]]*(band|bucket)".r
        .findFirstIn(plan).isDefined,
      "probed-bucket pruning must reach the member scan as a non-empty " +
        s"band/bucket partition filter; plan:\n$plan")
  }

  test("sig-index maintenance: append fragmentation trips the file-count " +
      "trigger, compactSigIndex coalesces through a reader-safe generation " +
      "swap, and no delta verdict changes") {
    val path = java.nio.file.Files.createTempDirectory("graft_sigm").toString
    val rng = new scala.util.Random(7)
    val stored = (0 until 400)
      .map(i => (i.toLong, rng.nextLong())).toDF("id", "hash")
    Multimodal.buildSigIndex(stored, path, bands = 4)
    assert(!Multimodal.shouldCompactSig(spark, path),
      "a freshly built tree must not trigger")
    assert(!Multimodal.maintainSig(spark, path))
    val gen0 = Multimodal.sigMembersDir(spark, path)
    // 5 full-scope appends: each adds ≥1 file per touched directory, so
    // meanFilesPerDir climbs past the 4.0 threshold
    (0 until 5).foreach { b =>
      val batch = (0 until 400).map(i =>
        ((1000 + b * 1000 + i).toLong, rng.nextLong())).toDF("id", "hash")
      Multimodal.appendSigIndex(batch, path)
    }
    val frag = Multimodal.sigHealth(spark, path)
    assert(frag.meanFilesPerDir > 4.0, s"expected fragmentation, got $frag")
    assert(Multimodal.shouldCompactSig(spark, path))
    // a batch with one planted near-dup of a stored member: verdicts must
    // be identical before and after the compact
    val probeHash = stored.filter($"id" === 10L).head().getLong(1)
    val batch = Seq((90000L, probeHash ^ (1L << 13)), (90001L, rng.nextLong()))
      .toDF("id", "hash")
    val before = Multimodal.nearDupDelta(batch, path, maxHamming = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(before.head == ((90000L, 10L, -1L, 0L)), s"got $before")
    assert(Multimodal.maintainSig(spark, path), "maintain must compact")
    val gen1 = Multimodal.sigMembersDir(spark, path)
    assert(gen1 != gen0 && gen1.contains("members-gen-"),
      s"compact must commit a new generation: $gen0 -> $gen1")
    // superseded tree survives the default grace window for in-flight
    // readers (the shared Generations contract), then vacuums on demand
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(gen0)))
    val healed = Multimodal.sigHealth(spark, path)
    assert(healed.meanFilesPerDir <= 1.0 + 1e-9,
      s"compact left fragmentation: $healed")
    assert(healed.files < frag.files,
      s"compact did not merge files (${frag.files} -> ${healed.files})")
    assert(!Multimodal.shouldCompactSig(spark, path))
    val after = Multimodal.nearDupDelta(batch, path, maxHamming = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(after == before, "compactSigIndex changed delta verdicts")
    assert(graft.operators.Generations.vacuum(spark, path, graceMs = 0L) >= 1)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(gen0)))
    assert(Multimodal.nearDupDelta(batch, path, maxHamming = 3)
      .count() == before.size, "live tree unreadable after vacuum")
  }

  test("appendSigBatch: exactly-once — a committed batch short-circuits, a " +
      "lost marker replays onto the same file names, rows never duplicate") {
    val path = java.nio.file.Files.createTempDirectory("graft_sigb").toString
    val rng = new scala.util.Random(11)
    val stored = (0 until 200)
      .map(i => (i.toLong, rng.nextLong())).toDF("id", "hash")
    Multimodal.buildSigIndex(stored, path, bands = 4)
    val batch = (1000 until 1200)
      .map(i => (i.toLong, rng.nextLong())).toDF("id", "hash")
    def files(): Set[String] = {
      val out = scala.collection.mutable.Set[String]()
      java.nio.file.Files.walk(java.nio.file.Paths.get(
          Multimodal.sigMembersDir(spark, path)))
        .forEach(p => if (p.toString.endsWith(".parquet")) out += p.toString)
      out.toSet
    }
    def rows(): Long =
      spark.read.parquet(Multimodal.sigMembersDir(spark, path)).count()
    assert(Multimodal.appendSigBatch(batch, path, 0L))
    val f1 = files(); val r1 = rows()
    assert(f1.exists(_.contains("ingest-b0-")),
      "batch files must land under deterministic batch-scoped names")
    assert(!Multimodal.appendSigBatch(batch, path, 0L),
      "a committed batch must short-circuit")
    assert(files() == f1 && rows() == r1)
    // crash between the file moves and the marker commit: the replay
    // re-stages and re-renames onto the SAME names — member set stable
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$path/ingest_log/batch-0"))
    assert(Multimodal.appendSigBatch(batch, path, 0L),
      "replay after a lost marker should re-commit")
    assert(files() == f1, "replay changed the member file set")
    assert(rows() == r1, "replay duplicated member rows")
    assert(Multimodal.sigIngestCommitted(spark, path, 0L))
    // the shared maintainer lease guards the sig mutators too
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/_MAINTAINER"), "other-jvm".getBytes)
    intercept[graft.operators.ConcurrentMaintainerException] {
      Multimodal.appendSigBatch(batch, path, 1L)
    }
    intercept[graft.operators.ConcurrentMaintainerException] {
      Multimodal.compactSigIndex(spark, path)
    }
    // reads stay lease-free
    assert(Multimodal.nearDupDelta(batch, path, 3).count() == 200L)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$path/_MAINTAINER"))
  }

  test("deleteSig: tombstoned members stop being dup_of_old (survivor " +
      "re-judged), the policy fires on tombstoneFrac, compact applies " +
      "physically and truncates the log") {
    val path = java.nio.file.Files.createTempDirectory("graft_sigd").toString
    val rng = new scala.util.Random(17)
    val h1 = 0x0123456789abcdefL
    // stored: a two-member planted family at ids 10/11 + random singletons
    val stored = (0 until 400).map { i =>
      val h = if (i == 10) h1 else if (i == 11) h1 ^ (1L << 5)
        else rng.nextLong()
      (i.toLong, h)
    }.toDF("id", "hash")
    Multimodal.buildSigIndex(stored, path, bands = 4)
    val batch = Seq((9000L, h1 ^ (1L << 40))).toDF("id", "hash")
    def verdict(): (Long, Long, Long, Long) =
      Multimodal.nearDupDelta(batch, path, maxHamming = 3)
        .as[(Long, Long, Long, Long)].collect().head
    assert(verdict() == ((9000L, 10L, -1L, 0L)))
    // delete the min partner: the copy is re-judged against the SURVIVOR
    Multimodal.deleteSig(Seq(10L).toDF("id"), "id", path)
    assert(verdict() == ((9000L, 11L, -1L, 0L)),
      "after deleting 10, the surviving family member must be dup_of_old")
    // delete the survivor too: the copy becomes a keeper
    Multimodal.deleteSig(Seq(11L).toDF("id"), "id", path)
    assert(verdict() == ((9000L, -1L, -1L, 1L)),
      "with the whole stored family deleted the arrival must be kept")
    // 2 of 400 (0.5%) stays under the 2% frac — no policy fire yet
    assert(!Multimodal.shouldCompactSig(spark, path))
    // push past the threshold (10% of ids), policy fires on tombstoneFrac
    Multimodal.deleteSig((0L until 40L).toDF("id"), "id", path)
    assert(Multimodal.shouldCompactSig(spark, path),
      "10% tombstones must trip the policy")
    val before = verdict()
    assert(Multimodal.maintainSig(spark, path), "maintain must compact")
    // physically applied: 360 surviving ids × 4 bands; log truncated
    assert(spark.read.parquet(Multimodal.sigMembersDir(spark, path))
      .select($"id").distinct().count() == 360L)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$path/tombstones")))
    assert(!Multimodal.shouldCompactSig(spark, path))
    assert(verdict() == before, "compact changed the delta verdict")
  }

  test("sigIngestStream: verdicts-before-append micro-batch ingest — a " +
      "batch dup of an EARLIER batch's arrival matches it as stored; " +
      "maintainEvery fires the file-count policy mid-stream") {
    implicit val sqlCtx = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("graft_sigs").toString
    val out = java.nio.file.Files.createTempDirectory("graft_sigsv").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sigsc").toString
    val rng = new scala.util.Random(13)
    val stored = (0 until 400)
      .map(i => (i.toLong, rng.nextLong())).toDF("id", "hash")
    Multimodal.buildSigIndex(stored, path, bands = 4)
    val gen0 = Multimodal.sigMembersDir(spark, path)
    val hash10 = stored.filter($"id" === 10L).head().getLong(1)
    val fresh = 0x0f0f0f0f0f0f0f0fL
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val q = Multimodal.sigIngestStream(mem.toDF().toDF("id", "hash"), path,
        verdictsDir = out, maxHamming = 3, maintainEvery = 1)
      .option("checkpointLocation", ckpt).start()
    def filler(base: Long, n: Int): Seq[(Long, Long)] =
      (0 until n).map(i => (base + i, rng.nextLong()))
    // batch 0: a planted dup of stored 10, a fresh leader, full-scope filler
    mem.addData(Seq((10000L, hash10 ^ (1L << 9)), (10001L, fresh)) ++
      filler(11000L, 400))
    q.processAllAvailable()
    // batch 1: a dup of batch-0's fresh arrival — 10001 was APPENDED before
    // this batch's verdicts ran, so it matches as stored, not within-batch
    mem.addData(Seq((20000L, fresh ^ (1L << 3))) ++ filler(21000L, 400))
    q.processAllAvailable()
    // batches 2–5: full-scope filler climbs files/dir past the 4.0
    // threshold; the per-batch maintainSig pass must compact
    (2 to 5).foreach { b =>
      mem.addData(filler(b * 10000L + 1000L, 400))
      q.processAllAvailable()
    }
    q.stop()
    val b0 = spark.read.parquet(s"$out/batch=0")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(b0(10000L) == ((10L, -1L, 0L)), s"got ${b0(10000L)}")
    assert(b0(10001L) == ((-1L, -1L, 1L)), s"got ${b0(10001L)}")
    val b1 = spark.read.parquet(s"$out/batch=1")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(b1(20000L) == ((10001L, -1L, 0L)),
      s"the earlier batch's arrival must answer as STORED, got ${b1(20000L)}")
    (0L to 5L).foreach(b =>
      assert(Multimodal.sigIngestCommitted(spark, path, b), s"batch $b"))
    assert(Multimodal.sigMembersDir(spark, path) != gen0,
      "the in-stream policy never compacted")
    val h = Multimodal.sigHealth(spark, path)
    assert(h.meanFilesPerDir <= 4.0, s"drift not reset: $h")
    // the maintained tree still answers: one more planted dup round-trips
    val check = Multimodal.nearDupDelta(
      Seq((90000L, hash10 ^ (1L << 2))).toDF("id", "hash"), path, 3)
      .as[(Long, Long, Long, Long)].collect().head
    assert(check._2 == 10L && check._4 == 0L, s"got $check")
  }
}
