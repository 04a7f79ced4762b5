package graft.tools

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import graft.Sessions
import graft.operators.WavMath
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Generates `fixtures/media_audio.parquet` — REAL RIFF/WAVE payloads
  * for the audio decode path (q35/q130, `WavCodec`).
  *
  * Each row: (aud_id, true_channels, true_rate, true_frames,
  * true_dur_ms, true_rms_q, payload). The payload is an actual WAV
  * encoding (javax.sound.sampled, stock JDK) of deterministic 16-bit
  * PCM samples; the metadata columns are computed from the samples
  * BEFORE encoding (`WavMath.rmsQ` shared with the codec). Queries must
  * DECODE the byte stream and reproduce the metadata — the DuckDB
  * oracle reads only the metadata columns, so a hash match proves the
  * decode end-to-end. Writer-side JDK encoding also cross-validates
  * [[graft.operators.WavCodec]] against an independent WAV producer
  * (the synthetic q35 assets are read back from our own
  * [[graft.plans.WavWrap]] bytes; these are the JDK's).
  *
  * Deterministic: formats and samples derive from splitmix64 of the
  * asset id; the JDK WAV writer emits the canonical 44-byte header
  * with no timestamps, so the file is byte-stable across runs.
  */
object GenAudioFixture {
  val NumWavs = 100
  private val Rates = Array(8000, 16000, 22050, 44100)

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def channels(id: Long): Int = 1 + (mix64(id * 3 + 1) & 1L).toInt
  def rate(id: Long): Int =
    Rates((mix64(id * 3 + 2) & 0x7fffffffL).toInt % Rates.length)
  def frames(id: Long): Long =
    50L + (mix64(id * 3 + 3) & 0x7fffffffL) % 4000L

  /** Interleaved LE 16-bit PCM bytes + exact sum of sample squares. */
  def samples(id: Long): (Array[Byte], Long) = {
    val ch = channels(id)
    val n = (frames(id) * ch).toInt
    val bytes = new Array[Byte](n * 2)
    var sumSq = 0L
    var i = 0
    while (i < n) {
      val s = (mix64(id * 1000003L + i) & 0xffffL).toShort
      bytes(2 * i) = (s & 0xff).toByte
      bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
      sumSq += s.toLong * s
      i += 1
    }
    (bytes, sumSq)
  }

  def render(id: Long): Array[Byte] = {
    val fmt = new AudioFormat(rate(id).toFloat, 16, channels(id),
      true, false)
    val (pcm, _) = samples(id)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt,
      frames(id))
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-gen-audio", Some("4"))
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rows = (0L until NumWavs.toLong).map { id =>
      val (_, sumSq) = samples(id)
      val nSamples = frames(id) * channels(id)
      (id, channels(id), rate(id), frames(id),
        frames(id) * 1000L / rate(id),
        WavMath.rmsQ(sumSq, nSamples), render(id))
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft-audio")
    rows.toDF("aud_id", "true_channels", "true_rate", "true_frames",
        "true_dur_ms", "true_rms_q", "payload")
      .coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .map(_.getPath)
      .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS"))
      .head
    java.nio.file.Files.move(java.nio.file.Paths.get(part),
      java.nio.file.Paths.get(graft.Fixtures.mediaAudioPath),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote ${rows.size} wavs to " + graft.Fixtures.mediaAudioPath)
    spark.stop()
  }
}
