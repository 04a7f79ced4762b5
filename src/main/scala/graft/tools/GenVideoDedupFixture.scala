package graft.tools

import java.io.ByteArrayOutputStream
import java.awt.image.BufferedImage

import graft.{Fixtures, Sessions}
import graft.functions.{ImageHash, VideoHash}
import javax.imageio.{IIOImage, ImageIO}

/** Writes `fixtures/media_neardup_video.parquet` (vid_id, fp, payload):
  * a REAL animated-GIF corpus with planted near-duplicate variants —
  * the input the frame-sampled video dedup (q201) needs, completing
  * the image (GenImageDedupFixture) / audio (GenAudioDedupFixture)
  * modality triad.
  *
  * Structure: [[NumBases]] base clips (64×64 grayscale, 8–12 frames;
  * frames are TEMPORALLY CORRELATED — a per-base block pattern shared
  * by every frame plus sparse per-frame sparkle — so per-bit frame
  * counts concentrate and the majority fold is meaningful, like real
  * video); base b emits `1 + mix(b) mod 3` copies with consecutive
  * ids:
  *
  *  - copy 0: the original;
  *  - copy 1: a TEMPORAL TRIM — the last frame dropped (the classic
  *    video near-dup: re-encodes and cuts). The majority fold over
  *    the remaining sampled frames lands at SMALL Hamming distance
  *    (the generator REQUIREs ≤ [[Threshold]]);
  *  - copy 2: a uniform +8 brightness shift on every frame —
  *    fingerprint-IDENTICAL by aHash's shift invariance (values stay
  *    inside [40, 232]).
  *
  * GIF palettes hold 256 colors, so pixels are snapped to a 25-value
  * gray grid (40 + 8·k) and the JDK writer round-trips them exactly —
  * the generator VERIFIES this by decoding its own bytes and
  * requiring decoded fingerprint == source fingerprint for every
  * clip, failing the build otherwise. The committed `fp` column is
  * computed from the generator's OWN pixel function, so q201's spec
  * equality check proves byte-level GIF decode fidelity and the q201
  * oracle recomputes the pair relation from `fp` alone.
  */
object GenVideoDedupFixture {
  val NumBases = 50
  val Threshold = 10
  val Dim = 64

  private def mix64(z0: Long): Long = Mix64(z0)

  def copyCount(b: Long): Int =
    1 + math.floorMod(mix64(b * 13 + 9), 3).toInt

  /** First vid_id of base b (copies are consecutive). */
  def firstId(b: Long): Long = (0L until b).map(copyCount(_).toLong).sum

  /** Frames of the ORIGINAL clip of base b (copy 1 trims one). */
  def baseFrames(b: Long): Int = 8 + math.floorMod(mix64(b * 13 + 1), 5).toInt

  def framesOf(b: Long, k: Int): Int =
    if (k == 1) baseFrames(b) - 1 else baseFrames(b)

  /** Gray value of frame f of copy k of base b at (x, y) — snapped to
    * the 25-value palette grid 40 + 8·j, j ∈ [0, 24].
    */
  def grayAt(b: Long, k: Int, f: Int, x: Int, y: Int): Int = {
    // per-base block pattern shared by every frame (temporal identity)
    val block = 40 + 8 * math.floorMod(
      mix64(b * 512 + (y / 8).toLong * 8 + x / 8), 23).toInt // [40,216]
    // sparse per-frame sparkle: ~1.5% of pixels shift one grid step
    val sel = mix64(b * 9090909L + f.toLong * 4096 + y.toLong * Dim + x)
    val v0 =
      if (math.floorMod(sel, 64) == 0)
        block + (if ((sel & 1L) == 0L) 8 else -8) // [32, 224]
      else block
    if (k == 2) v0 + 8 else v0 // uniform shift: aHash-invariant
  }

  def frameHash(b: Long, k: Int, f: Int): Long =
    ImageHash.aHash64(grayAt(b, k, f, _, _), Dim, Dim)

  def expectedFp(b: Long, k: Int): Long =
    VideoHash.majorityFold(
      VideoHash.sampledFrames(framesOf(b, k)).map(frameHash(b, k, _)))

  def render(b: Long, k: Int): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < framesOf(b, k)) {
        val img = new BufferedImage(Dim, Dim, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < Dim) {
          var x = 0
          while (x < Dim) {
            val v = grayAt(b, k, f, x, y)
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      ios.close()
      writer.dispose()
    }
    out.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-gen-viddedup", Some("4"))
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val codec = new graft.operators.VideoHashCodec
    codec.open()
    val rows = (0L until NumBases.toLong).flatMap { b =>
      val id0 = firstId(b)
      val fps = (0 until copyCount(b)).map(expectedFp(b, _))
      fps.zipWithIndex.foreach { case (fp, k) =>
        val d = java.lang.Long.bitCount(fp ^ fps.head)
        require(d <= Threshold,
          s"planted variant escaped: base $b copy $k dist $d")
      }
      fps.zipWithIndex.map { case (fp, k) =>
        val payload = render(b, k)
        // GIF round-trip gate: the committed fp must be reproducible
        // from the BYTES through the same decode path q201 runs
        val decoded = codec.decodeFp(graft.operators.MediaAsset(
          id0 + k, "gif", payload)).fp
        require(decoded == fp,
          s"GIF round-trip not lossless: base $b copy $k " +
            s"decoded=$decoded expected=$fp")
        (id0 + k, fp, payload)
      }
    }
    codec.close()
    val tmp = java.nio.file.Files.createTempDirectory("graft-viddedup")
    rows.toDF("vid_id", "fp", "payload")
      .coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .map(_.getPath)
      .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS"))
      .head
    java.nio.file.Files.move(java.nio.file.Paths.get(part),
      java.nio.file.Paths.get(Fixtures.mediaNeardupVideoPath),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote ${rows.size} clips to " +
      Fixtures.mediaNeardupVideoPath)
    spark.stop()
  }
}
