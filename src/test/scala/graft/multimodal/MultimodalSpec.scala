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
}
