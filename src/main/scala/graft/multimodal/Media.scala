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
  * DECODE has two tiers:
  *   - REAL for still images the JDK ships codecs for (PNG/JPEG/BMP/GIF
  *     via `javax.imageio`, no external libs): [[decodeImage]] produces
  *     the true luminance plane;
  *   - REAL for uncompressed audio the JDK ships readers for (WAV/AU/
  *     AIFF carrying PCM via `javax.sound.sampled`): [[decodeAudio]]
  *     produces the true mono sample buffer;
  *   - STUB for everything else (compressed audio/video codecs are not
  *     available in this environment): [[decodeStub]] derives a
  *     deterministic fake frame from an md5 keystream over the payload —
  *     clearly marked, and shaped exactly like a real decoder (bytes →
  *     fixed-size numeric buffer), so swapping in a codec changes one
  *     function.
  * [[decodeFrame]] dispatches: payloads ImageIO or the audio readers can
  * parse take the real path, the rest fall through to the stub.
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

  /** REAL image decode via the JDK's built-in ImageIO codecs (PNG, JPEG,
    * BMP, GIF — no external dependencies): payload bytes → (width,
    * height, row-major luminance plane in [0,1], ITU-R BT.601 integer
    * weights so the value is exactly reproducible). Returns None when no
    * installed codec recognizes the bytes. */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val out = new Array[Float](w * h)
      var y = 0; var i = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = ((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114
          out(i) = lum / 255000.0f
          i += 1; x += 1
        }
        y += 1
      }
      Some((w, h, out))
    }
  }

  /** REAL audio decode via the JDK's built-in `javax.sound.sampled`
    * readers (WAV/AU/AIFF carrying PCM — no external codecs): payload
    * bytes → mono sample array mapped to [0, 1] (16-bit PCM samples in
    * [-1, 1] remapped as (s+1)/2, channels averaged), so audio frames
    * ride the same numeric-buffer shape as image luminance planes.
    * Returns None when no installed reader recognizes the bytes —
    * compressed formats (mp3/aac) have no JDK codec and stay stubbed. */
  def decodeAudio(payload: Array[Byte]): Option[Array[Float]] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val src = in.getFormat
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels, src.getChannels * 2,
          src.getSampleRate, false)
        val pcm = AudioSystem.getAudioInputStream(target, in)
        val bytes = pcm.readAllBytes()
        val ch = math.max(1, src.getChannels)
        val nFrames = bytes.length / (2 * ch)
        val out = new Array[Float](nFrames)
        var f = 0
        while (f < nFrames) {
          var sum = 0f
          var c = 0
          while (c < ch) {
            val o = (f * ch + c) * 2
            val s = (((bytes(o + 1) & 0xff) << 8) | (bytes(o) & 0xff)).toShort
            sum += s / 32768.0f
            c += 1
          }
          out(f) = (sum / ch + 1.0f) / 2.0f
          f += 1
        }
        Some(out)
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** Decode dispatch: a payload a JDK codec understands yields its true
    * content — image luminance plane, or PCM audio samples (frame 0
    * only — stills have one frame; non-zero frames of a real video
    * would come from a video codec) — padded or truncated to
    * `nPixels`; anything else takes the deterministic stub. */
  def decodeFrame(payload: Array[Byte], frame: Int, nPixels: Int): Array[Float] =
    (if (frame == 0) decodeImage(payload).map(_._3).orElse(decodeAudio(payload))
     else None) match {
      case Some(px) =>
        if (px.length == nPixels) px
        else java.util.Arrays.copyOf(px, nPixels)
      case None => decodeStub(payload, frame, nPixels)
    }

  /** Batched feature extraction: `FeatDim` md5-derived fingerprint words
    * per record. One digest instance per PARTITION (the batch shape that
    * matters for a real extractor). */
  val FeatDim = 8

  def fingerprints(media: Dataset[MediaRecord]): Dataset[MediaFingerprint] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init (stands for per-batch model/codec setup).
      // r17 per-task-work pass (guide §1.2 step 2): md5(payload ++
      // "|j") shares the payload-length prefix across all FeatDim
      // words, so the payload is absorbed ONCE per record and the
      // per-j digests fork from the cloned mid-state (MD5 supports
      // clone()) — identical bytes out, FeatDim× less hashing. The
      // hex word comes from a nibble table over the first 6 bytes
      // instead of formatting all 16 through `f"%02x"` (a per-byte
      // format-string parse that dominated the old profile).
      val digest = MessageDigest.getInstance("MD5")
      val hexDigits = "0123456789abcdef".toCharArray
      it.flatMap { r =>
        digest.reset()
        digest.update(r.payload)
        val mid = digest.clone().asInstanceOf[MessageDigest]
        (0 until FeatDim).iterator.map { j =>
          val d = mid.clone().asInstanceOf[MessageDigest]
          d.update(s"|$j".getBytes(StandardCharsets.UTF_8))
          val out = d.digest()
          val sb = new java.lang.StringBuilder(12)
          var i = 0
          while (i < 6) {
            val b = out(i) & 0xff
            sb.append(hexDigits(b >>> 4)); sb.append(hexDigits(b & 0xf))
            i += 1
          }
          MediaFingerprint(r.mediaId, r.kind, j, sb.toString)
        }
      }
    }
  }

  /** Batched resize: decode one frame (real codec when available, stub
    * otherwise) and average-pool the pixel buffer down to `side × side`. */
  def resize(media: Dataset[MediaRecord], side: Int): Dataset[DecodedFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val src = decodeFrame(r.payload, frame = 0,
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
    * (declared) duration, decode one frame of `nPixels` (frame 0 real
    * when a codec matches; later frames always stub — stills have one). */
  def sampleFrames(media: Dataset[MediaRecord], everyMs: Long,
                   nPixels: Int): Dataset[DecodedFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val frames = math.max((r.meta.durationMs / everyMs).toInt, 1)
        (0 until frames).iterator
          .map(f => DecodedFrame(r.mediaId, f, decodeFrame(r.payload, f, nPixels)))
      }
    }
  }

  /** Perceptual difference-hash (dHash) of an image payload: decode the
    * luminance plane (real codec when available, stub with the declared
    * dims otherwise), average-pool onto a 9-wide × 8-tall grid, then
    * bit (row, c) = cell > its right neighbor — 64 bits. Re-encodes,
    * resizes and small edits flip few bits, so image near-dup is
    * hamming distance on 8-byte values: the curation-scale property
    * (a 100 TB image corpus dedups on a long column, never on pixels). */
  def dHash(payload: Array[Byte], metaW: Int, metaH: Int): Long = {
    val (w, h, px) = decodeImage(payload) match {
      case Some((rw, rh, p)) => (rw, rh, p)
      case None =>
        val (sw, sh) = (math.max(metaW, 9), math.max(metaH, 8))
        (sw, sh, decodeStub(payload, 0, sw * sh))
    }
    val grid = Array.ofDim[Float](8, 9)
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 9) {
        val (y0, y1) = (gy * h / 8, math.max((gy + 1) * h / 8, gy * h / 8 + 1))
        val (x0, x1) = (gx * w / 9, math.max((gx + 1) * w / 9, gx * w / 9 + 1))
        var s = 0.0f; var n = 0
        var y = y0
        while (y < y1 && y < h) {
          var x = x0
          while (x < x1 && x < w) { s += px(y * w + x); n += 1; x += 1 }
          y += 1
        }
        grid(gy)(gx) = if (n == 0) 0.0f else s / n
        gx += 1
      }
      gy += 1
    }
    var bits = 0L
    var i = 0
    while (i < 64) {
      val (r, c) = (i / 8, i % 8)
      if (grid(r)(c) > grid(r)(c + 1)) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** Per-record dHash as a batched partition pass. */
  def dHashes(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map(r => (r.mediaId, dHash(r.payload, r.meta.width, r.meta.height)))
    }.toDF("media_id", "dhash")
  }

  /** Image near-dup pairs at hamming ≤ `maxHamming` (≤ 3 guaranteed
    * recall): q29's banded pigeonhole on the 64-bit dHash — 4 bands of
    * 16 bits, equality-join candidates, bit_count(xor) verify. Never
    * an all-pairs join. */
  def imageNearDup(media: Dataset[MediaRecord], maxHamming: Int): DataFrame = {
    val fp = dHashes(media).persist()
    val bandCols = (0 until 4).map(j => struct(lit(j).as("band"),
      shiftright(col("dhash"), j * 16).bitwiseAND(lit(0xffffL)).as("bv")))
    val bands = fp.select(col("media_id"), col("dhash"),
        explode(array(bandCols: _*)).as("b"))
      .select(col("media_id"), col("dhash"),
        col("b.band").as("band"), col("b.bv").as("bv"))
    val ham = bit_count(col("a.dhash").bitwiseXOR(col("b.dhash")))
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
        ham.cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
      .orderBy(col("media_a"), col("media_b"))
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
