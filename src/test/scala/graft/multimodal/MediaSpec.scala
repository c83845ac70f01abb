package graft.multimodal

import graft.SparkSpec

class MediaSpec extends SparkSpec {

  private lazy val media = Media.fromDocuments(spark, sfDir)

  test("fake media table carries typed metadata and binary payloads") {
    val r = media.head()
    assert(r.payload.nonEmpty)
    assert(Set("image", "audio", "video").contains(r.kind))
    assert(r.meta.mime == s"fake/${r.kind}")
    assert(r.meta.durationMs > 0)
  }

  test("fingerprints: FeatDim rows per record, deterministic across runs") {
    val n = media.count()
    val fp1 = Media.fingerprints(media).collect().sortBy(f => (f.mediaId, f.j))
    val fp2 = Media.fingerprints(media).collect().sortBy(f => (f.mediaId, f.j))
    assert(fp1.length == n * Media.FeatDim)
    assert(fp1.map(_.feat).toSeq == fp2.map(_.feat).toSeq)
    assert(fp1.forall(_.feat.matches("[0-9a-f]{12}")))
  }

  test("decode stub is deterministic and shaped like a decoder") {
    val px1 = Media.decodeStub("payload".getBytes, frame = 2, nPixels = 100)
    val px2 = Media.decodeStub("payload".getBytes, frame = 2, nPixels = 100)
    val other = Media.decodeStub("payload".getBytes, frame = 3, nPixels = 100)
    assert(px1.toSeq == px2.toSeq)
    assert(px1.toSeq != other.toSeq) // frames differ
    assert(px1.forall(p => p >= 0f && p < 1f))
  }

  test("resize pools to the requested side") {
    val frames = Media.resize(media, side = 4).collect()
    assert(frames.forall(_.pixels.length == 16))
  }

  test("frame sampling follows declared duration") {
    val frames = Media.sampleFrames(media, everyMs = 1000L, nPixels = 8).collect()
    val byId = frames.groupBy(_.mediaId)
    val metas = media.collect().map(r => r.mediaId -> r.meta.durationMs).toMap
    byId.foreach { case (id, fs) =>
      val expected = math.max((metas(id) / 1000L).toInt, 1)
      assert(fs.length == expected, s"media $id")
      assert(fs.map(_.frameIdx).sorted.toSeq == (0 until expected))
    }
  }

  test("payload repartition yields sensible partition count") {
    val repart = Media.repartitionByPayload(media, targetBytes = 4096)
    assert(repart.rdd.getNumPartitions >= 1)
    assert(repart.count() == media.count())
  }
}
