package graft.functions

/** 64-bit clip fingerprint for video near-dup: sample every 2nd frame,
  * aHash each sampled frame ([[ImageHash.aHash64]]), and fold the
  * per-frame hashes by STRICT PER-BIT MAJORITY (bit b set iff more
  * than half the sampled frames set it; ties → 0). The majority fold
  * is the temporal-robustness move of the video-hashing family
  * (TMK/keyframe-hash dedup): real video frames are temporally
  * correlated, so per-bit frame counts concentrate at 0 or n and the
  * clip bit survives trims, re-encodes and dropped frames — the
  * mutations video near-dups actually carry — while an XOR or
  * concatenation fold would shatter under a single missing frame.
  *
  * INTEGER-EXACT: frame hashes are aHash64's integer arithmetic and
  * the fold is bit counting, so the generator (source pixels) and the
  * decode pipeline (ImageIO-decoded GIF frames) agree bit-for-bit —
  * provided the container round-trips pixels exactly, which the
  * grayscale-palette fixture contract guarantees and the generator
  * verifies at build time.
  */
object VideoHash {

  /** Sampled frame indices of an n-frame clip: 0, 2, 4, … */
  def sampledFrames(n: Int): Range = 0 until n by 2

  /** Strict per-bit majority over per-frame 64-bit hashes. */
  def majorityFold(hashes: Seq[Long]): Long = {
    val n = hashes.length
    require(n > 0, "majorityFold of zero frames")
    var fp = 0L
    var b = 0
    while (b < 64) {
      var cnt = 0
      var i = 0
      while (i < n) {
        if (((hashes(i) >>> b) & 1L) == 1L) cnt += 1
        i += 1
      }
      if (2 * cnt > n) fp |= (1L << b)
      b += 1
    }
    fp
  }
}
