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

  test("fake decoder features derive from the md5 digest (oracle contract)") {
    val payload = "abc".getBytes("UTF-8")
    val h = java.security.MessageDigest.getInstance("MD5").digest(payload)
    def be32(off: Int): Long =
      ((h(off) & 0xffL) << 24) | ((h(off + 1) & 0xffL) << 16) |
        ((h(off + 2) & 0xffL) << 8) | (h(off + 3) & 0xffL)
    val f = Multimodal.FakeDecoder.decode(
      Multimodal.MediaMeta("video", payload.length, 7L), payload)
    assert(f.width === 64 + (be32(0) % 1024).toInt)
    assert(f.height === 64 + (be32(4) % 1024).toInt)
    assert(f.nFrames === 1 + (be32(8) % 120).toInt)
    assert(f.featNorm === be32(12).toDouble / 4294967296.0)
  }

  test("batched featurize (mapInPandas shape) equals the row-wise path") {
    val media = Multimodal.mediaTable(spark, sf001)
    val rowWise = Multimodal.featurize(media).collect().sortBy(_.doc_id)
    val batched = Multimodal.featurizeBatched(media, batchSize = 7)
      .collect().sortBy(_.doc_id)
    assert(batched.toSeq === rowWise.toSeq)
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
