package graft.functions

/** 64-bit AVERAGE perceptual hash (aHash) — the cheapest member of the
  * perceptual-hash family used for image near-dup detection at crawl
  * scale (the same role pHash/dHash play in LAION-style image corpus
  * dedup): downsample the gray image to an 8×8 grid of block means,
  * bit i = cell_i > global mean.
  *
  * INTEGER-EXACT by construction so the generator (source pixels) and
  * the decode pipeline (ImageIO-decoded pixels) agree bit-for-bit:
  * block boundaries are floor(i·w/8), block means and the global mean
  * are integer divisions, comparisons are strict. Invariances this
  * buys (and the fixture exercises): a uniform brightness shift moves
  * every cell and the mean by the same amount — hash unchanged; a few
  * perturbed pixels move block means by ≲1 intensity unit — only
  * cells within that margin of the mean can flip, so genuine variants
  * land at small Hamming distance while unrelated images sit near the
  * random-64-bit expectation of 32.
  */
object ImageHash {

  /** aHash over `gray(x, y)` ∈ [0, 255]; any dims ≥ 8×8. */
  def aHash64(gray: (Int, Int) => Int, w: Int, h: Int): Long = {
    require(w >= 8 && h >= 8, s"aHash needs >= 8x8 pixels, got ${w}x$h")
    val cells = new Array[Long](64)
    var cy = 0
    while (cy < 8) {
      val y0 = cy * h / 8
      val y1 = (cy + 1) * h / 8
      var cx = 0
      while (cx < 8) {
        val x0 = cx * w / 8
        val x1 = (cx + 1) * w / 8
        var s = 0L
        var n = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += gray(x, y); n += 1; x += 1 }
          y += 1
        }
        cells(cy * 8 + cx) = s / n
        cx += 1
      }
      cy += 1
    }
    var tot = 0L
    var i = 0
    while (i < 64) { tot += cells(i); i += 1 }
    val mean = tot / 64
    var hash = 0L
    i = 0
    while (i < 64) {
      if (cells(i) > mean) hash |= (1L << i)
      i += 1
    }
    hash
  }
}
