package graft.operators

import java.io.ByteArrayInputStream
import javax.sound.sampled.AudioSystem

/** Real, pure-JVM audio decode for the multimodal operators — the
  * audio analog of [[ImageCodec]]: `javax.sound.sampled` ships with
  * the JDK and reads RIFF/WAVE PCM with no native dependency.
  *
  * Decoded features are defined in exact integer arithmetic so a
  * DuckDB oracle can predict them closed-form on synthetic PCM:
  *
  *  - samples are signed 16-bit little-endian PCM frames (the format
  *    is taken from the container's fmt chunk via AudioSystem, not
  *    assumed);
  *  - the sample sequence is divided into 8 segments by the
  *    sample->segment map `seg = i*8/n` (every sample lands in
  *    exactly one segment; n a multiple of 8 gives uniform segments);
  *  - multi-channel streams are processed over the INTERLEAVED frame
  *    sequence as stored (L R L R ...): segment sums mix channels and
  *    a zero crossing may span a channel boundary. This is a defined,
  *    deterministic feature of the interleaved stream — an engine
  *    recomputing it from the same PCM bytes gets the same values —
  *    not a per-channel analysis; deinterleave upstream if per-channel
  *    features are needed;
  *  - per segment the feature is the SUM OF ABSOLUTE sample values
  *    (a Long — no division, no floats, bit-exact on any engine);
  *  - plus the total absolute sum and the zero-crossing count
  *    (adjacent samples with strictly opposite signs).
  *
  * Undecodable payloads (no data chunk, compressed formats, corrupt
  * bytes) return null — corrupt media is data, not an error, at
  * corpus scale. Decode is per-row CPU inside `mapPartitions`, no
  * shuffle; parallelizes linearly with partitions.
  */
object AudioCodec {

  val Segments = 8

  final case class AudioFeatures(sampleRate: Int, channels: Int,
                                 nSamples: Long, segAbs: Array[Long],
                                 absTotal: Long, zeroCrossings: Long)

  /** Decode WAV PCM bytes via the JDK audio stack; null when the
    * stream is unreadable or not 16-bit PCM. */
  def decodePcm(bytes: Array[Byte]): AudioFeatures = {
    val sp = samples16(bytes)
    if (sp == null) return null
    val (fmt, data, n) = sp
    val segAbs = new Array[Long](Segments)
    var absTotal = 0L
    var crossings = 0L
    var prev = 0
    var i = 0
    while (i < n) {
      val s = sample(data, i, fmt.isBigEndian)
      val a = math.abs(s).toLong
      // Long arithmetic: i * Segments overflows Int at >= 2^28
      // samples (~537 MB of PCM), which would index negative
      segAbs((i.toLong * Segments / n).toInt) += a
      absTotal += a
      if (i > 0 && ((prev > 0 && s < 0) || (prev < 0 && s > 0)))
        crossings += 1
      prev = s
      i += 1
    }
    AudioFeatures(fmt.getSampleRate.toInt, fmt.getChannels, n.toLong,
      segAbs, absTotal, crossings)
  }

  /** Per-segment absolute-sum vector at ARBITRARY granularity — the
    * 64-segment form feeds the perceptual audio signature
    * ([[graft.operators.ImageCodec.aHashSums]] over these cells).
    * Same segment map `seg = i*nSeg/n` as the 8-segment features;
    * null for undecodable payloads. */
  def segmentSums(bytes: Array[Byte], nSeg: Int): Array[Long] = {
    val sp = samples16(bytes)
    if (sp == null) return null
    val (fmt, data, n) = sp
    val sums = new Array[Long](nSeg)
    var i = 0
    while (i < n) {
      sums((i.toLong * nSeg / n).toInt) +=
        math.abs(sample(data, i, fmt.isBigEndian)).toLong
      i += 1
    }
    sums
  }

  @inline private def sample(data: Array[Byte], i: Int,
                             bigEndian: Boolean): Int = {
    val lo = data(2 * i) & 0xFF
    val hi = data(2 * i + 1) & 0xFF
    (if (bigEndian) (lo << 8) | hi else (hi << 8) | lo).toShort.toInt
  }

  /** Minimal mono 16-bit little-endian WAV around the given samples —
    * encoder ∘ [[samples]] = identity (spec-locked), the JVM-side
    * sibling of the column-level fixture builder
    * [[Multimodal.wavBytesWithData]]. */
  def encodeWav(rate: Int, pcm: Array[Short]): Array[Byte] = {
    val dataLen = pcm.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      .putInt(16).putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    pcm.foreach(s => { buf.putShort(s); () })
    buf.array()
  }

  /** Decoded 16-bit samples as an Int array (interleaved stream order);
    * null when undecodable. The raw-sample face shared with
    * [[SpectralCodec]]. */
  private[operators] def samples(bytes: Array[Byte]): Array[Int] = {
    val sp = samples16(bytes)
    if (sp == null) return null
    val (fmt, data, n) = sp
    Array.tabulate(n)(i => sample(data, i, fmt.isBigEndian))
  }

  /** Shared 16-bit PCM extraction: (format, raw frames, sample count);
    * null when unreadable, not 16-bit, or empty. Never throws. */
  private def samples16(bytes: Array[Byte])
      : (javax.sound.sampled.AudioFormat, Array[Byte], Int) = {
    if (bytes == null || bytes.length == 0) return null
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16) return null
        val data = in.readAllBytes()
        val n = data.length / 2
        if (n == 0) null else (fmt, data, n)
      } finally in.close()
    } catch { case _: Exception => null }
  }
}
