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
}
