package graft.functions

/** 64-bit energy-delta audio fingerprint — the time-domain core of the
  * Haitsma & Kalker robust-hash family (CBMI'02 "A Highly Robust Audio
  * Fingerprinting System"): partition the clip into fixed-length
  * frames, compute per-frame signal energy, bit f = energy rises from
  * frame f to frame f+1. The full scheme thresholds band-energy deltas
  * after an FFT; the sign-of-delta skeleton is what gives the family
  * its robustness, and over one band it already has the property audio
  * corpus dedup needs: the fingerprint depends only on the ORDER of
  * frame energies, not their magnitude.
  *
  * INTEGER-EXACT by construction so the generator (source samples) and
  * the decode pipeline (WAV-parsed PCM) agree bit-for-bit: energies
  * are exact Long sums of 16-bit-sample squares (≤ 2³⁰ per sample ×
  * 2¹⁴ frame length — no overflow), comparisons are strict.
  * Invariances this buys (and the fixture exercises): an exact volume
  * doubling scales every energy by 4 — fingerprint unchanged; sparse
  * sample perturbations move frame energies by amounts small against
  * typical inter-frame gaps — only near-tied adjacent frames can flip,
  * so genuine re-encodes land at small Hamming distance while
  * unrelated clips sit near the random-64-bit expectation of 32.
  */
object AudioFingerprint {

  /** Samples per frame. */
  val FrameLen = 256

  /** Frames read (64 deltas → 64 bits). */
  val NumFrames = 65

  /** Mono samples a clip must carry. */
  val ClipSamples: Int = FrameLen * NumFrames

  /** Fingerprint over `sample(t)` (16-bit values, t < ClipSamples). */
  def fp64(sample: Int => Int): Long = {
    val e = new Array[Long](NumFrames)
    var f = 0
    while (f < NumFrames) {
      var s = 0L
      var t = f * FrameLen
      val end = t + FrameLen
      while (t < end) {
        val v = sample(t).toLong
        s += v * v
        t += 1
      }
      e(f) = s
      f += 1
    }
    var fp = 0L
    f = 0
    while (f < 64) {
      if (e(f + 1) > e(f)) fp |= (1L << f)
      f += 1
    }
    fp
  }
}
