package graft.tools

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import graft.{Fixtures, Sessions}
import graft.functions.AudioFingerprint
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Writes `fixtures/media_neardup_audio.parquet` (aud_id, fp, payload):
  * a REAL RIFF/WAVE corpus with planted near-duplicate variants — the
  * input the fingerprint audio dedup (q189) needs, built exactly like
  * [[GenImageDedupFixture]] builds the image one.
  *
  * Structure: [[NumBases]] base clips (mono 16-bit PCM, 65×256
  * samples, per-frame random amplitude + per-sample noise); base b
  * emits `1 + mix(b) mod 3` copies with consecutive ids:
  *
  *  - copy 0: the original;
  *  - copy 1: an EXACT ×2 volume scaling — fingerprint-IDENTICAL by
  *    the invariance [[AudioFingerprint]] documents (energies scale
  *    by 4, order preserved; amplitudes stay < 2¹⁴ so no clipping);
  *  - copy 2: ~1/16 of samples shifted ±1024 — frame energies move
  *    ≲10⁸ against typical inter-frame gaps of ~10⁹, so the variant
  *    lands at SMALL Hamming distance (planted near-dup; the
  *    generator REQUIREs ≤ [[Threshold]]) while distinct bases sit
  *    near the random expectation of 32 bits.
  *
  * The committed `fp` column is computed from the generator's OWN
  * sample function — independent of the WAV encode → javax.sound
  * decode path q189 runs — so the spec's per-clip equality check
  * (decoded fingerprint == committed fp) proves byte-level decode
  * fidelity, and the q189 oracle recomputes the pair relation from
  * `fp` alone.
  */
object GenAudioDedupFixture {
  val NumBases = 70
  val Threshold = 10
  val Rate = 8000

  private def mix64(z0: Long): Long = Mix64(z0)

  def copyCount(b: Long): Int =
    1 + math.floorMod(mix64(b * 11 + 5), 3).toInt

  /** First aud_id of base b (copies are consecutive). */
  def firstId(b: Long): Long = (0L until b).map(copyCount(_).toLong).sum

  /** 16-bit sample of copy k of base b at t — all-integer. The base
    * signal is an 8-sample square wave whose amplitude re-rolls each
    * frame (energy ≈ FrameLen·A², so adjacent-frame deltas are driven
    * by the amplitude sequence) plus per-sample noise.
    */
  def sampleAt(b: Long, k: Int, t: Int): Int = {
    val f = t / AudioFingerprint.FrameLen
    val amp = 64 + math.floorMod(mix64(b * 131 + f), 6000).toInt
    val sign = if ((t / 8) % 2 == 0) 1 else -1
    val noise = math.floorMod(mix64(b * 524287L + t), 129).toInt - 64
    val v0 = sign * amp + noise // |v0| ≤ 6128
    k match {
      case 0 => v0
      case 1 => v0 * 2 // exact scaling: fingerprint-invariant
      case _ =>
        val sel = mix64(b * 777700L + t)
        if (math.floorMod(sel, 16) == 0)
          v0 + (if ((sel & 1L) == 0L) 1024 else -1024)
        else v0
    }
  }

  def expectedFp(b: Long, k: Int): Long =
    AudioFingerprint.fp64(sampleAt(b, k, _))

  def render(b: Long, k: Int): Array[Byte] = {
    val n = AudioFingerprint.ClipSamples
    val pcm = new Array[Byte](n * 2)
    var t = 0
    while (t < n) {
      val s = sampleAt(b, k, t)
      pcm(2 * t) = (s & 0xff).toByte
      pcm(2 * t + 1) = ((s >> 8) & 0xff).toByte
      t += 1
    }
    val fmt = new AudioFormat(Rate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt,
      n.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-gen-auddedup", Some("4"))
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rows = (0L until NumBases.toLong).flatMap { b =>
      val id0 = firstId(b)
      val fps = (0 until copyCount(b)).map(expectedFp(b, _))
      fps.zipWithIndex.foreach { case (fp, k) =>
        val d = java.lang.Long.bitCount(fp ^ fps.head)
        require(d <= Threshold,
          s"planted variant escaped: base $b copy $k dist $d")
      }
      fps.zipWithIndex.map { case (fp, k) =>
        (id0 + k, fp, render(b, k))
      }
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft-auddedup")
    rows.toDF("aud_id", "fp", "payload")
      .coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .map(_.getPath)
      .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS"))
      .head
    java.nio.file.Files.move(java.nio.file.Paths.get(part),
      java.nio.file.Paths.get(Fixtures.mediaNeardupAudioPath),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote ${rows.size} clips to " +
      Fixtures.mediaNeardupAudioPath)
    spark.stop()
  }
}
