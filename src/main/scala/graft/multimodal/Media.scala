package graft.multimodal

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, processed in batched per-partition passes.
  *
  * Spark-side design (the part that must be real at 100 TB):
  *   - payloads live in a plain `binary` column next to a typed metadata
  *     struct — schema-on-read, no blob parsing at scan time;
  *   - all media transforms are `Dataset.mapPartitions` passes: one
  *     JVM-side batch per partition, so per-record overhead is amortized
  *     and a real decoder (JNI/FFI) would be initialized once per
  *     partition, not per row — the Scala analogue of `mapInPandas`;
  *   - media payloads skew partition sizes; `repartitionByPayload`
  *     rebalances by cumulative byte size before expensive passes.
  *
  * The DECODE step itself is a STUB: real image/audio codecs are not
  * available in this environment. [[decodeStub]] derives a deterministic
  * fake "decoded" frame from an md5 keystream over the payload — clearly
  * marked, and shaped exactly like a real decoder (bytes → fixed-size
  * numeric buffer), so swapping in a real codec changes one function.
  */
object Media {

  case class MediaMeta(mime: String, width: Int, height: Int, durationMs: Long)
  case class MediaRecord(mediaId: Long, kind: String,
                         payload: Array[Byte], meta: MediaMeta)
  case class MediaFingerprint(mediaId: Long, kind: String, j: Int, feat: String)
  case class DecodedFrame(mediaId: Long, frameIdx: Int, pixels: Array[Float])

  private def md5hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"$b%02x").mkString

  /** STUB decoder — stands in for a real codec (libjpeg/ffmpeg/...).
    * Deterministic: pixel k of frame f = byte k of md5(payload ++ f ++ k-block),
    * scaled to [0,1). Real decode would replace exactly this function. */
  def decodeStub(payload: Array[Byte], frame: Int, nPixels: Int): Array[Float] = {
    val out = new Array[Float](nPixels)
    var block = 0
    var filled = 0
    while (filled < nPixels) {
      val d = MessageDigest.getInstance("MD5")
      d.update(payload)
      d.update(s"|$frame|$block".getBytes(StandardCharsets.UTF_8))
      val h = d.digest()
      var i = 0
      while (i < h.length && filled < nPixels) {
        out(filled) = (h(i) & 0xff) / 256.0f
        filled += 1; i += 1
      }
      block += 1
    }
    out
  }

  /** Batched feature extraction: `FeatDim` md5-derived fingerprint words
    * per record. One digest instance per PARTITION (the batch shape that
    * matters for a real extractor). */
  val FeatDim = 8

  def fingerprints(media: Dataset[MediaRecord]): Dataset[MediaFingerprint] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init (stands for per-batch model/codec setup)
      val digest = MessageDigest.getInstance("MD5")
      it.flatMap { r =>
        (0 until FeatDim).iterator.map { j =>
          digest.reset()
          digest.update(r.payload)
          digest.update(s"|$j".getBytes(StandardCharsets.UTF_8))
          val hex = digest.digest().map(b => f"$b%02x").mkString.substring(0, 12)
          MediaFingerprint(r.mediaId, r.kind, j, hex)
        }
      }
    }
  }

  /** Batched resize: decode (stub) one frame and average-pool the fake
    * pixel buffer down to `side × side`. */
  def resize(media: Dataset[MediaRecord], side: Int): Dataset[DecodedFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val src = decodeStub(r.payload, frame = 0,
          nPixels = math.max(r.meta.width * r.meta.height, side * side))
        val pooled = new Array[Float](side * side)
        val stride = math.max(src.length / (side * side), 1)
        var i = 0
        while (i < pooled.length) {
          var s = 0.0f; var k = 0
          while (k < stride && i * stride + k < src.length) {
            s += src(i * stride + k); k += 1
          }
          pooled(i) = s / math.max(k, 1)
          i += 1
        }
        DecodedFrame(r.mediaId, 0, pooled)
      }
    }
  }

  /** Batched frame sampling: every `everyMs` milliseconds of the
    * (declared) duration, decode (stub) one frame of `nPixels`. */
  def sampleFrames(media: Dataset[MediaRecord], everyMs: Long,
                   nPixels: Int): Dataset[DecodedFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val frames = math.max((r.meta.durationMs / everyMs).toInt, 1)
        (0 until frames).iterator
          .map(f => DecodedFrame(r.mediaId, f, decodeStub(r.payload, f, nPixels)))
      }
    }
  }

  /** Rebalance partitions by cumulative payload size (media payloads are
    * heavily skewed; row-count partitioning starves/overloads workers). */
  def repartitionByPayload(media: Dataset[MediaRecord],
                           targetBytes: Long): Dataset[MediaRecord] = {
    // one cheap sizing pass; at scale this comes from table stats instead
    val n = math.max((media.rdd
      .map(_.payload.length.toLong).sum() / targetBytes).toInt, 1)
    media.repartition(n)
  }

  /** Deterministic fake media table derived from `documents` (payload =
    * UTF-8 text bytes) — lets specs and oracle queries exercise the full
    * plumbing without real codecs. */
  def fromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val kind = if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video"
        MediaRecord(id, kind, text.getBytes(StandardCharsets.UTF_8),
          MediaMeta(s"fake/$kind", width = 32, height = 32,
            durationMs = nChars * 10))
      }
  }
}
