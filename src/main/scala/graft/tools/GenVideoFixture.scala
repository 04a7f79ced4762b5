package graft.tools

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.Sessions
import javax.imageio.{IIOImage, ImageIO}

/** Generates `fixtures/media_video.parquet` — REAL animated-GIF
  * payloads for the video decode path (q35/q49, `ImageIoCodec`).
  *
  * Each row: (vid_id, true_w, true_h, true_frames, payload). The
  * payload is an actual multi-frame GIF (javax.imageio writer in
  * sequence mode, stock JDK) of deterministic frames; the metadata
  * columns are the dimensions and FRAME COUNT the encoder was given.
  * Queries must DECODE the container and reproduce the metadata — the
  * frame count in particular requires a real multi-image scan of the
  * GIF structure (`getNumImages(allowSearch = true)`), the video
  * analog of the image/audio byte-level proofs.
  *
  * Deterministic: dimensions, frame counts and pixels derive from
  * splitmix64 of the video id; the JDK GIF writer emits no timestamps.
  */
object GenVideoFixture {
  val NumVideos = 80

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def dims(id: Long): (Int, Int) =
    (4 + (mix64(id * 5 + 1) & 0x7fffffff).toInt % 60,
      4 + (mix64(id * 5 + 2) & 0x7fffffff).toInt % 60)

  def frames(id: Long): Int =
    2 + (mix64(id * 5 + 3) & 0x7fffffff).toInt % 11

  def render(id: Long): Array[Byte] = {
    val (w, h) = dims(id)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < frames(id)) {
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y,
              (mix64(id * 7000003L + f.toLong * w * h + y.toLong * w + x)
                & 0xffffff).toInt)
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
    val spark = Sessions.build("graft-gen-video", Some("4"))
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rows = (0L until NumVideos.toLong).map { id =>
      val (w, h) = dims(id)
      (id, w, h, frames(id), render(id))
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft-video")
    rows.toDF("vid_id", "true_w", "true_h", "true_frames", "payload")
      .coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .map(_.getPath)
      .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS"))
      .head
    java.nio.file.Files.move(java.nio.file.Paths.get(part),
      java.nio.file.Paths.get(graft.Fixtures.mediaVideoPath),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote ${rows.size} gifs to " + graft.Fixtures.mediaVideoPath)
    spark.stop()
  }
}
