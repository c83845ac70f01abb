package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import graft.SparkSpec
import graft.multimodal.Media.{MediaMeta, MediaRecord}

/** Real-codec decode path: a PNG generated in-test round-trips through
  * `Media.decodeImage` with exact luminance values, and the Dataset
  * `resize` pass takes the real path for image payloads while junk
  * payloads still fall back to the deterministic stub.
  */
class ImageDecodeSpec extends SparkSpec {
  import spark.implicits._

  /** 8×8 gradient PNG: pixel (x, y) has r=g=b = 16·(y·8+x) & 0xff. */
  private def gradientPng(): Array[Byte] = {
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) {
      val v = (16 * (y * 8 + x)) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeImage recovers exact dimensions and luminance from a PNG") {
    val Some((w, h, px)) = Media.decodeImage(gradientPng())
    assert(w == 8 && h == 8 && px.length == 64)
    // grayscale pixel v: luminance = v*(299+587+114)/255000 = v/255
    for (i <- 0 until 64) {
      val v = (16 * i) & 0xff
      assert(math.abs(px(i) - v / 255.0f) < 1e-6f, s"pixel $i")
    }
  }

  test("decodeImage rejects non-image bytes") {
    assert(Media.decodeImage("not an image at all".getBytes("UTF-8")).isEmpty)
  }

  test("resize takes the real path for PNGs and the stub for junk payloads") {
    val png = gradientPng()
    val recs = Seq(
      MediaRecord(1L, "image", png, MediaMeta("image/png", 8, 8, 0L)),
      MediaRecord(2L, "image", "junk-bytes".getBytes("UTF-8"),
        MediaMeta("fake/image", 8, 8, 0L))).toDS()
    val frames = Media.resize(recs, side = 8).collect().map(f => f.mediaId -> f).toMap
    // real path: pooled-by-1 == raw decode
    val Some((_, _, truth)) = Media.decodeImage(png)
    assert(frames(1L).pixels.toSeq == truth.toSeq)
    // stub path: exactly the md5-keystream frame
    assert(frames(2L).pixels.toSeq ==
      Media.decodeStub("junk-bytes".getBytes("UTF-8"), 0, 64).toSeq)
  }
}
