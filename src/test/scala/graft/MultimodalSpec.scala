package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpecBase {

  test("media table carries opaque payload + typed metadata") {
    val media = Multimodal.mediaTable(spark, sf001)
    val row = media.filter(_.doc_id == 0L).head()
    assert(row.meta.nBytes === row.payload.length)
    assert(Set("image", "audio", "video").contains(row.meta.mediaType))
    assert(row.meta.sourceId === 0L)
  }

  test("featurize is partition-parallel, deterministic, fixed-width") {
    val media = Multimodal.mediaTable(spark, sf001)
    val f1 = Multimodal.featurize(media).collect().sortBy(_.doc_id)
    val f2 = Multimodal.featurize(media.repartition(7)).collect().sortBy(_.doc_id)
    assert(f1.length === media.count())
    assert(f1.toSeq === f2.toSeq) // partitioning must not change features
    assert(f1.forall(f => f.width >= 64 && f.height >= 64 && f.nFrames >= 1))
    assert(f1.filter(_.mediaType != "video").forall(_.nFrames === 1))
  }
}
