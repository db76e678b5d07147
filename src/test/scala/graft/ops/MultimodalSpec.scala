package graft.ops

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("binary payload attach + batched stub decode produce typed features") {
    val docs = graft.Tables.documents(spark, sf("sf0.001")).limit(100)
    val media = Multimodal.attachPayload(docs)
    val feats = Multimodal.decodeFeatures(media).collect()
    assert(feats.length == 100)
    assert(feats.forall(f => f.n_bytes > 0))
    assert(feats.filter(_.kind == "image").forall(f => f.width >= 64 && f.n_frames == 1))
    assert(feats.filter(_.kind == "audio").forall(f => f.width == 0 && f.n_frames >= 1))
    // deterministic: same payload → same checksum on re-run
    val again = Multimodal.decodeFeatures(media).collect()
    assert(feats.map(_.checksum).toSeq == again.map(_.checksum).toSeq)
  }

  test("resize emits payloads at the target size, preserving ids") {
    val docs = graft.Tables.documents(spark, sf("sf0.001")).limit(50)
    val media = Multimodal.attachPayload(docs)
    val resized = Multimodal.resize(media, 224, 224).collect()
    assert(resized.length == 50)
    val targetLen = 224 * 224 / 256 + 1
    assert(resized.forall(r => r.payload.length == targetLen &&
      r.width == 224 && r.height == 224))
    assert(resized.map(_.doc_id).sorted.toSeq ==
      media.collect().map(_.doc_id).sorted.toSeq)
  }

  test("frame sampling fans out every stride-th frame of video rows only") {
    val docs = graft.Tables.documents(spark, sf("sf0.001")).limit(60)
    val media = Multimodal.attachPayload(docs)
    val frames = Multimodal.frameSample(media, stride = 2).collect()
    val videos = Multimodal.decodeFeatures(media).filter(_.kind == "video").collect()
    assert(frames.map(_.doc_id).distinct.sorted.toSeq ==
      videos.map(_.doc_id).sorted.toSeq)
    val expected = videos.map(v => v.doc_id -> (0 until v.n_frames by 2).size).toMap
    val got = frames.groupBy(_.doc_id).map { case (k, v) => k -> v.length }
    assert(got == expected)
    // frame indices follow the stride
    assert(frames.forall(_.frame_idx % 2 == 0))
  }
}
