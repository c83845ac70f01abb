package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.scalatest.funsuite.AnyFunSuite

/** REAL audio decode: a PCM WAV synthesized with the JDK's own writer
  * round-trips through `Media.decodeAudio` with exact 16-bit sample
  * values, stereo channels average, and non-audio payloads still fall
  * through to the stub — the same two-tier contract the image path
  * keeps. (No Spark session needed: the decoder is a plain function.)
  */
class AudioDecodeSpec extends AnyFunSuite {

  /** Mono 16-bit little-endian PCM WAV from the given samples. */
  private def wav(samples: Array[Short], channels: Int = 1): Array[Byte] = {
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, channels, channels * 2, 8000f, false)
    val bytes = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      bytes(2 * i) = (s & 0xff).toByte
      bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val in = new AudioInputStream(new ByteArrayInputStream(bytes), fmt,
      samples.length / channels)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("mono PCM WAV decodes to the exact mapped samples") {
    val samples = Array[Short](0, 16384, -16384, 32767, -32768, 100, -1)
    val out = Media.decodeAudio(wav(samples))
    assert(out.isDefined, "JDK WAV reader must recognize its own output")
    val got = out.get
    assert(got.length == samples.length)
    samples.zip(got).foreach { case (s, g) =>
      val expect = (s / 32768.0f + 1.0f) / 2.0f
      assert(math.abs(g - expect) < 1e-6f, s"sample $s: got $g, want $expect")
    }
  }

  test("stereo channels average before the [0,1] mapping") {
    // frames: (L,R) = (1000, 3000), (-2000, 2000)
    val out = Media.decodeAudio(
      wav(Array[Short](1000, 3000, -2000, 2000), channels = 2))
    assert(out.isDefined)
    val got = out.get
    assert(got.length == 2)
    assert(math.abs(got(0) - ((2000 / 32768.0f + 1f) / 2f)) < 1e-6f)
    assert(math.abs(got(1) - 0.5f) < 1e-6f)
  }

  test("decodeFrame dispatch: WAV takes the real path, text stays stubbed") {
    val samples = Array.tabulate[Short](64)(i => (i * 512 - 16384).toShort)
    val w = wav(samples)
    val real = Media.decodeFrame(w, frame = 0, nPixels = 64)
    val expect0 = (samples(0) / 32768.0f + 1.0f) / 2.0f
    assert(math.abs(real(0) - expect0) < 1e-6f,
      "frame 0 of a WAV payload must be the true samples, not the stub")
    val text = "not audio at all".getBytes("UTF-8")
    assert(Media.decodeFrame(text, 0, 64)
      .sameElements(Media.decodeStub(text, 0, 64)),
      "unrecognized payloads must keep the deterministic stub")
    // non-zero frames still stub (a video codec's job, absent here)
    assert(Media.decodeFrame(w, 1, 64).sameElements(Media.decodeStub(w, 1, 64)))
  }
}
