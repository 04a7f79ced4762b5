package graft.tools

import graft.{Fixtures, Sessions}
import graft.functions.ImageHash
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Writes `fixtures/media_neardup_images.parquet` (img_id, ah,
  * payload): a REAL-BMP image corpus with planted near-duplicate
  * variants — the input the perceptual-hash image dedup (q173) needs.
  *
  * Structure: [[NumBases]] base images (64×64 grayscale BMPs whose
  * pixels derive from splitmix64 — block-structured intensity +
  * per-pixel noise); base b emits `1 + mix(b) mod 3` copies with
  * consecutive ids:
  *
  *  - copy 0: the original;
  *  - copy 1: a UNIFORM +5 brightness shift — aHash-IDENTICAL by the
  *    invariance [[ImageHash.aHash64]] documents (planted dist-0
  *    pair, no clamping: base values stay inside [30, 225]);
  *  - copy 2: ~2.4% of pixels shifted ±24 — block means move ≲1
  *    intensity unit, so the variant lands at SMALL Hamming distance
  *    (planted near-dup) while distinct bases sit near the random
  *    expectation of 32 bits.
  *
  * The committed `ah` column is computed from the generator's OWN
  * source-pixel function — independent of the BMP encode → ImageIO
  * decode path q173 runs — so the spec's per-image equality check
  * (decoded hash == committed hash) proves byte-level decode
  * fidelity, and the q173 oracle recomputes the pair relation from
  * `ah` alone.
  */
object GenImageDedupFixture {
  val NumBases = 90
  val Dim = 64

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def copyCount(b: Long): Int =
    1 + math.floorMod(mix64(b * 7 + 3), 3).toInt

  /** First img_id of base b (copies are consecutive). */
  def firstId(b: Long): Long = (0L until b).map(copyCount(_).toLong).sum

  /** Gray value of copy k of base b at (x, y) — all-integer. */
  def grayAt(b: Long, k: Int, x: Int, y: Int): Int = {
    val block = 40 + math.floorMod(
      mix64(b * 64 + (y / 8).toLong * 8 + x / 8), 176).toInt
    val noise = math.floorMod(
      mix64(b * 4096L + y.toLong * Dim + x), 21).toInt - 10
    val v0 = block + noise // [30, 225]
    k match {
      case 0 => v0
      case 1 => v0 + 5 // uniform shift: aHash-invariant
      case _ =>
        val sel = mix64(b * 77770L + y.toLong * Dim + x)
        if (math.floorMod(sel, 41) == 0)
          v0 + (if ((sel & 1L) == 0L) 24 else -24) // [6, 249]
        else v0
    }
  }

  def expectedHash(b: Long, k: Int): Long =
    ImageHash.aHash64(grayAt(b, k, _, _), Dim, Dim)

  def render(b: Long, k: Int): Array[Byte] = {
    val img = new BufferedImage(Dim, Dim, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < Dim) {
      var x = 0
      while (x < Dim) {
        val v = grayAt(b, k, x, y)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, "bmp", out), "no bmp writer")
    out.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-gen-imgdedup", Some("4"))
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rows = (0L until NumBases.toLong).flatMap { b =>
      val id0 = firstId(b)
      (0 until copyCount(b)).map { k =>
        (id0 + k, expectedHash(b, k), render(b, k))
      }
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft-imgdedup")
    rows.toDF("img_id", "ah", "payload")
      .coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .map(_.getPath)
      .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS"))
      .head
    java.nio.file.Files.move(java.nio.file.Paths.get(part),
      java.nio.file.Paths.get(Fixtures.mediaNeardupImagesPath),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote ${rows.size} images to " +
      Fixtures.mediaNeardupImagesPath)
    spark.stop()
  }
}
