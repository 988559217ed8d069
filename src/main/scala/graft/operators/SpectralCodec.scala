package graft.operators

/** Spectral audio fingerprinting — the TIME-SHIFT-ROBUST complement to
  * [[AudioCodec]]'s loudness-envelope signature (which a few hops of
  * leading silence completely rearranges). The classic landmark
  * recipe (Wang, "An Industrial-Strength Audio Search Algorithm",
  * ISMIR 2003 — the published Shazam design): per-window magnitude
  * spectra via a real FFT, a few PEAK bins per window, then
  * constellation hashes over (anchor bin, target bin, window delta)
  * pairs. Because hashes carry only bin identities and RELATIVE
  * window distance, a clip shifted by whole windows keeps its hash
  * set (new silence windows add a few spurious hashes; the original
  * constellation survives intact), so near-dup detection is overlap
  * on hash SETS — [[graft.plans.VectorOps.jaccard]] semantics, here
  * through codegen'd `array_intersect`/`array_union`.
  *
  * Everything is deterministic: rectangular windows, StrictMath
  * trigonometry in the FFT twiddles (fdlibm — bit-reproducible across
  * JVMs, unlike Math.sin's 1-ulp license), integer peak bins with
  * lower-bin tie-breaks. No decode state leaves the row: the per-row
  * cost is O(windows * W log W) CPU inside `mapPartitions`, and only
  * (id, hashes) ever shuffles.
  *
  * Scale note: a fingerprint is <= windows * peaks * fanout longs
  * (~hundreds) per clip regardless of duration bucketing upstream;
  * the dedup join ships hash arrays, never PCM.
  */
object SpectralCodec {

  val WindowSize = 256 // samples per FFT window (power of two)
  val PeaksPerWindow = 3
  val Fanout = 3 // targets paired with each anchor peak
  val MaxDeltaWindows = 4 // how far ahead targets may sit

  /** In-place iterative radix-2 Cooley-Tukey; n must be a power of
    * two. StrictMath twiddles for cross-JVM determinism. */
  private[operators] def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length && (n & (n - 1)) == 0, s"fft size $n not 2^k")
    // bit-reversal permutation
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * StrictMath.PI / len
      val wr = StrictMath.cos(ang)
      val wi = StrictMath.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val er = re(base + k); val ei = im(base + k)
          val or_ = re(base + k + len / 2); val oi = im(base + k + len / 2)
          val tr = or_ * cr - oi * ci
          val ti = or_ * ci + oi * cr
          re(base + k) = er + tr; im(base + k) = ei + ti
          re(base + k + len / 2) = er - tr; im(base + k + len / 2) = ei - ti
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Top peak bins per non-overlapping window: (window, bin) rows,
    * bins in 1..W/2-1 (DC and Nyquist excluded), strictly-greater
    * comparison with lower-bin tie-break — fully deterministic. An
    * all-zero (silence) window yields NO peaks rather than arbitrary
    * ties. */
  private[operators] def peaks(samples: Array[Int]): Array[(Int, Int)] = {
    val w = WindowSize
    val nWin = samples.length / w
    val out = Array.newBuilder[(Int, Int)]
    var win = 0
    while (win < nWin) {
      val re = new Array[Double](w)
      val im = new Array[Double](w)
      var i = 0
      while (i < w) { re(i) = samples(win * w + i).toDouble; i += 1 }
      fft(re, im)
      // magnitude^2 (monotone in magnitude; avoids the sqrt)
      val half = w / 2
      val mag = new Array[Double](half)
      var b = 1
      while (b < half) { mag(b) = re(b) * re(b) + im(b) * im(b); b += 1 }
      // top-k by (magnitude desc, bin asc); skip zero-magnitude bins
      var taken = 0
      val used = new Array[Boolean](half)
      while (taken < PeaksPerWindow) {
        var best = -1
        var bestMag = 0.0
        var bb = 1
        while (bb < half) {
          if (!used(bb) && mag(bb) > bestMag) { best = bb; bestMag = mag(bb) }
          bb += 1
        }
        if (best < 0) taken = PeaksPerWindow // silence: no more peaks
        else { used(best) = true; out += ((win, best)); taken += 1 }
      }
      win += 1
    }
    out.result()
  }

  /** Landmark hash: anchor each peak, pair with up to [[Fanout]]
    * subsequent peaks within [[MaxDeltaWindows]], pack
    * (anchorBin, targetBin, dt) into one long. Sorted distinct set —
    * the clip's fingerprint; null when the payload is undecodable or
    * shorter than one window. */
  def fingerprint(bytes: Array[Byte]): Array[Long] = {
    val s = AudioCodec.samples(bytes)
    if (s == null || s.length < WindowSize) return null
    val ps = peaks(s)
    val out = scala.collection.mutable.SortedSet.empty[Long]
    var i = 0
    while (i < ps.length) {
      val (aw, ab) = ps(i)
      var paired = 0
      var j = i + 1
      while (j < ps.length && paired < Fanout) {
        val (tw, tb) = ps(j)
        val dt = tw - aw
        if (dt > MaxDeltaWindows) j = ps.length // peaks are window-ordered
        else {
          if (dt >= 1) {
            out += (ab.toLong << 32) | (tb.toLong << 8) | dt.toLong
            paired += 1
          }
          j += 1
        }
      }
      i += 1
    }
    if (out.isEmpty) null else out.toArray
  }
}
