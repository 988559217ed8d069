package graft.operators

import graft.SparkTestBase
import Multimodal.{MediaMeta, MediaRecord}

/** Spectral landmark fingerprints on ANALYTIC fixtures: bin-aligned
  * sines are window-periodic, so every signal window is the same
  * sample array — peak bins are knowable a priori, whole-window
  * shifts preserve the fingerprint EXACTLY (silence windows emit no
  * peaks), and distinct bin pairs produce (near-)disjoint hash sets.
  * This pins the shift-robustness the envelope hash lacks. */
class SpectralCodecSpec extends SparkTestBase {

  import spark.implicits._

  private def sineWav(bins: Seq[Int], windows: Int,
                      silenceWindows: Int = 0): Array[Byte] = {
    val w = SpectralCodec.WindowSize
    val n = windows * w
    val pcm = new Array[Short](silenceWindows * w + n)
    var i = 0
    while (i < n) {
      val t = i.toDouble / w
      val v = bins.map(b =>
        8000.0 * StrictMath.sin(2 * StrictMath.PI * b * t)).sum
      pcm(silenceWindows * w + i) =
        math.max(-32768L, math.min(32767L, StrictMath.round(v))).toShort
      i += 1
    }
    AudioCodec.encodeWav(8000, pcm)
  }

  test("fft: bin-aligned cosine concentrates at its bin") {
    val w = SpectralCodec.WindowSize
    val re = Array.tabulate(w)(i =>
      StrictMath.cos(2 * StrictMath.PI * 7 * i / w))
    val im = new Array[Double](w)
    SpectralCodec.fft(re, im)
    val mag = (0 until w / 2).map(b => re(b) * re(b) + im(b) * im(b))
    val rest = mag.zipWithIndex.filter(_._2 != 7).map(_._1).max
    assert(mag(7) > 1e6 * (rest + 1e-30), s"peak ${mag(7)} vs rest $rest")
  }

  test("fingerprint: exact invariance to whole-window shift") {
    val a = SpectralCodec.fingerprint(sineWav(Seq(7, 41), 8))
    val shifted = SpectralCodec.fingerprint(
      sineWav(Seq(7, 41), 8, silenceWindows = 2))
    assert(a != null && a.nonEmpty)
    assert(a.sameElements(shifted)) // silence windows emit no landmarks
    // the envelope hash does NOT survive the same shift — the gap
    // this operator closes
    val e1 = AudioCodec.segmentSums(sineWav(Seq(7, 41), 8), 64)
    val e2 = AudioCodec.segmentSums(sineWav(Seq(7, 41), 8, 2), 64)
    assert(java.lang.Long.bitCount(
      ImageCodec.aHashSums(e1) ^ ImageCodec.aHashSums(e2)) > 8)
  }

  test("fingerprint: distinct bin pairs share (almost) nothing") {
    val a = SpectralCodec.fingerprint(sineWav(Seq(7, 41), 8)).toSet
    val c = SpectralCodec.fingerprint(sineWav(Seq(19, 83), 8)).toSet
    val jac = a.intersect(c).size.toDouble / a.union(c).size
    assert(jac < 0.2, s"jaccard $jac") // rounding-noise peaks only
  }

  test("fingerprint: null for undecodable and sub-window payloads") {
    assert(SpectralCodec.fingerprint(null) == null)
    assert(SpectralCodec.fingerprint(Array[Byte](1, 2, 3)) == null)
    assert(SpectralCodec.fingerprint(
      AudioCodec.encodeWav(8000, new Array[Short](10))) == null)
  }

  test("encodeWav round-trips through the JDK decode") {
    val pcm = Array.tabulate(300)(i => ((i * 37) % 4096 - 2048).toShort)
    val back = AudioCodec.samples(AudioCodec.encodeWav(8000, pcm))
    assert(back.toSeq == pcm.map(_.toInt).toSeq)
  }

  test("audioFingerprintNearDups: shifted copy at 1.0, distinct clip out") {
    val none = MediaMeta(None, None, None, None)
    val media = Seq(
      MediaRecord(1L, "audio", sineWav(Seq(7, 41), 8), none),
      MediaRecord(2L, "audio", sineWav(Seq(7, 41), 8, 2), none),
      MediaRecord(3L, "audio", sineWav(Seq(19, 83), 8), none),
      MediaRecord(4L, "audio", Array[Byte](9), none), // dropped
      MediaRecord(5L, "image", sineWav(Seq(7, 41), 8), none) // wrong kind
    ).toDS()
    val pairs = Multimodal.audioFingerprintNearDups(media, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Double]("overlap")))
    assert(pairs.toSeq == Seq((1L, 2L, 1.0)))
  }
}
