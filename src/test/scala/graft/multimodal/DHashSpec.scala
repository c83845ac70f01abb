package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import graft.SparkSpec
import graft.multimodal.Media.{MediaMeta, MediaRecord}

/** Perceptual dHash over REAL decoded images: a lightly-edited copy of
  * an image lands within hamming 3 of its original and the banded
  * near-dup join finds exactly that pair; a structurally different
  * image stays far away. */
class DHashSpec extends SparkSpec {
  import spark.implicits._

  /** 36×32 PNG: horizontal gradient + per-row offset (structured, so
    * pooling cells differ and the dHash has informative bits). */
  private def basePng(edit: Boolean): Array[Byte] = {
    val img = new BufferedImage(36, 32, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 36) {
      val v0 = (x * 7 + y * 3) & 0xff
      // the "edit": brighten one small corner block slightly
      val v = if (edit && x < 4 && y < 4) math.min(v0 + 24, 255) else v0
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Vertical-gradient PNG — different structure entirely. */
  private def otherPng(): Array[Byte] = {
    val img = new BufferedImage(36, 32, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 36) {
      val v = (255 - y * 8 + (x % 3) * 40) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("edited copy is within hamming 3; different image is not; join finds the pair") {
    val a = Media.dHash(basePng(edit = false), 36, 32)
    val b = Media.dHash(basePng(edit = true), 36, 32)
    val c = Media.dHash(otherPng(), 36, 32)
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(a, b) <= 3, s"edit moved ${ham(a, b)} bits")
    assert(ham(a, c) > 10, s"unrelated images only ${ham(a, c)} bits apart")

    val recs = Seq(
      MediaRecord(1L, "image", basePng(edit = false), MediaMeta("image/png", 36, 32, 0L)),
      MediaRecord(2L, "image", basePng(edit = true), MediaMeta("image/png", 36, 32, 0L)),
      MediaRecord(3L, "image", otherPng(), MediaMeta("image/png", 36, 32, 0L))).toDS()
    val pairs = Media.imageNearDup(recs, maxHamming = 3)
      .select("media_a", "media_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"saw $pairs")
  }

  test("dHash is deterministic and decode-path-stable") {
    val png = basePng(edit = false)
    assert(Media.dHash(png, 36, 32) == Media.dHash(png, 36, 32))
    // junk payload takes the stub path with declared dims, still deterministic
    val junk = "junk".getBytes("UTF-8")
    assert(Media.dHash(junk, 16, 16) == Media.dHash(junk, 16, 16))
  }
}
