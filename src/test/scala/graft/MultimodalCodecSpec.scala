package graft

import graft.operators.{MediaAsset, MediaCodec, MediaFeatures, Multimodal}
import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.atomic.AtomicInteger

/** Static so executor-side increments are visible to the driver —
  * local-mode tasks share this JVM.
  */
object CodecCounters {
  val opens = new AtomicInteger(0)
  val closes = new AtomicInteger(0)
  val decodes = new AtomicInteger(0)
  def reset(): Unit = { opens.set(0); closes.set(0); decodes.set(0) }
}

/** A codec that records its lifecycle and refuses to decode unopened —
  * the contract a JNI/FFMPEG decoder would crash on if violated.
  */
final class CountingCodec extends MediaCodec {
  @transient private var isOpen = false
  override def open(): Unit = {
    CodecCounters.opens.incrementAndGet(); isOpen = true
  }
  def decode(a: MediaAsset): MediaFeatures = {
    require(isOpen, "decode called before open()")
    CodecCounters.decodes.incrementAndGet()
    Multimodal.decodeStub(a)
  }
  override def close(): Unit = {
    require(isOpen, "close called before open()")
    CodecCounters.closes.incrementAndGet(); isOpen = false
  }
}

/** Proves the decoder seam is real: expensive codec state initializes
  * once per partition (not per row), every row decodes through an
  * opened codec, and teardown runs when the partition drains.
  */
class MultimodalCodecSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("codec opens/closes once per partition, decodes once per row") {
    import spark.implicits._
    CodecCounters.reset()
    val assets = spark.range(0, 100)
      .map(i => MediaAsset(i,
        if (i % 3 == 0) "image" else "video",
        Array.fill((i % 17).toInt)(1: Byte)))
      .repartition(8)
    val out = Multimodal
      .extractFeatures(assets, () => new CountingCodec).collect()
    assert(out.length == 100)
    assert(CodecCounters.decodes.get == 100)
    // 100 round-robin rows over 8 partitions: every partition non-empty,
    // one codec init each — NOT one per row
    assert(CodecCounters.opens.get == 8, s"opens=${CodecCounters.opens}")
    assert(CodecCounters.closes.get == CodecCounters.opens.get)
  }

  test("stub decode is deterministic on payload bytes and media type") {
    val img = MediaAsset(1L, "image", Array.fill(130)(0: Byte))
    val vid = MediaAsset(2L, "video", Array.fill(130)(0: Byte))
    val fi = Multimodal.decodeStub(img)
    assert(fi == MediaFeatures(1L, "image", 130, 16 + 130 % 64,
      16 + (130 / 64) % 64, 1))
    assert(Multimodal.decodeStub(vid).n_frames == 1 + 130 % 7)
  }

  test("ImageIoCodec decodes real BMP and PNG bytes to the true " +
      "dimensions (fresh encodings, independent of the fixture)") {
    val codec = new graft.operators.ImageIoCodec
    codec.open()
    try {
      for ((fmt, w, h) <- Seq(("bmp", 7, 31), ("png", 64, 3),
        ("bmp", 80, 80), ("png", 1, 1))) {
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        img.setRGB(0, 0, 0x123456)
        val out = new java.io.ByteArrayOutputStream()
        assert(javax.imageio.ImageIO.write(img, fmt, out))
        val f = codec.decode(MediaAsset(9L, fmt, out.toByteArray))
        assert(f == MediaFeatures(9L, fmt, out.size(), w, h, 1),
          s"$fmt ${w}x$h decoded as $f")
      }
      // corrupt bytes must raise, not return garbage features
      intercept[Exception] {
        codec.decode(MediaAsset(10L, "png", Array.fill(40)(7: Byte)))
      }
    } finally codec.close()
  }

  test("distributed decode of the committed fixture reproduces the " +
      "encoder's metadata for every image, through the dispatch codec") {
    val feats = Multimodal.extractFeatures(
      Multimodal.loadRealImageAssets(spark).repartition(8),
      () => new graft.operators.DispatchCodec)
      .collect().map(f => f.doc_id -> f).toMap
    val meta = spark.read.parquet(Fixtures.mediaImagesPath).collect()
    assert(meta.length == graft.tools.GenMediaFixture.NumImages)
    meta.foreach { r =>
      val id = r.getAs[Long]("img_id") + Multimodal.RealImageIdBase
      val f = feats(id)
      assert(f.width == r.getAs[Int]("true_w") &&
        f.height == r.getAs[Int]("true_h") &&
        f.media_type == r.getAs[String]("fmt") &&
        f.n_frames == 1,
        s"img ${r.getAs[Long]("img_id")}: decoded $f vs metadata $r")
    }
    // the fixture is genuinely mixed-format
    assert(meta.count(_.getAs[String]("fmt") == "bmp") > 0)
    assert(meta.count(_.getAs[String]("fmt") == "png") > 0)
  }
}
