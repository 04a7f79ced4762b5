package graft.tools

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.Sessions
import javax.imageio.ImageIO

/** Generates `fixtures/media_images.parquet` — REAL image payloads for
  * the multimodal decode path (q35/q49, `ImageIoCodec`).
  *
  * Each row: (img_id, fmt 'bmp'|'png', true_w, true_h, payload). The
  * payload is an actual BMP/PNG encoding (java.awt + javax.imageio, all
  * in the stock JDK) of a deterministic RGB pattern; true_w/true_h are
  * the dimensions the encoder was given. Queries must DECODE the bytes
  * and reproduce the metadata — the DuckDB oracle reads only the
  * metadata columns, so a hash match proves the decode end-to-end.
  *
  * Deterministic: dimensions and pixels derive from splitmix64 of the
  * image id; the JDK's BMP/PNG writers emit no timestamps, so the file
  * is byte-stable across runs.
  */
object GenMediaFixture {
  val NumImages = 120

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def dims(id: Long): (Int, Int) =
    (3 + (mix64(id * 2 + 1) & 0x7fffffff).toInt % 78,
      3 + (mix64(id * 2 + 2) & 0x7fffffff).toInt % 78)

  def fmt(id: Long): String = if (id % 2 == 0) "bmp" else "png"

  def render(id: Long): Array[Byte] = {
    val (w, h) = dims(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          (mix64(id * 1000003 + y.toLong * w + x) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, fmt(id), out), s"no ${fmt(id)} writer")
    out.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-gen-media", Some("4"))
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rows = (0L until NumImages.toLong).map { id =>
      val (w, h) = dims(id)
      (id, fmt(id), w, h, render(id))
    }
    // single parquet FILE (not a part-directory) so DuckDB's
    // read_parquet('<path>') and Spark's read.parquet both open it
    val tmp = java.nio.file.Files.createTempDirectory("graft-media")
    rows.toDF("img_id", "fmt", "true_w", "true_h", "payload")
      .coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .map(_.getPath)
      .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS"))
      .head
    java.nio.file.Files.move(java.nio.file.Paths.get(part),
      java.nio.file.Paths.get(graft.Fixtures.mediaImagesPath),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote ${rows.size} images to " +
      graft.Fixtures.mediaImagesPath)
    spark.stop()
  }
}
