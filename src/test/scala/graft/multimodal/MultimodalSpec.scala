package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("batched stub decode: histogram normalized, frame count = ceil(bytes/64)") {
    val feats = Multimodal.decodeFeatures(spark, sf).collect()
    assert(feats.length === 500)
    feats.foreach { f =>
      assert(math.abs(f.histogram.sum - 1.0) < 1e-9)
      assert(f.n_frames === ((f.n_bytes + 63) / 64).toInt)
    }
  }

  test("stub decode is deterministic across runs") {
    val a = Multimodal.decodeFeatures(spark, sf).collect().sortBy(_.media_id)
    val b = Multimodal.decodeFeatures(spark, sf).collect().sortBy(_.media_id)
    assert(a.map(_.histogram.toSeq).toSeq === b.map(_.histogram.toSeq).toSeq)
  }

  test("resize stub keeps every k-th byte") {
    val bytes = Array.tabulate(10)(_.toByte)
    assert(Multimodal.StubCodec.resize(bytes, 3).toSeq === Seq[Byte](0, 3, 6, 9))
  }

  test("frame dedup surfaces only duplicated frames, keeper is the earliest") {
    val frames = Multimodal.frameSample(spark, sf).collect()
      .map(r => (r.getString(2), r.getLong(0) * 100000L + r.getInt(1)))
    val byHash = frames.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rows = Multimodal.frameDedup(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(rows.nonEmpty, "corpus must contain duplicated frames")
    rows.foreach { case (h, n, keeper) =>
      assert(n === byHash(h).length.toLong && n > 1)
      assert(keeper === byHash(h).min)
    }
    // completeness: every hash with >1 occurrence is reported
    assert(rows.length === byHash.count(_._2.length > 1))
  }
}
