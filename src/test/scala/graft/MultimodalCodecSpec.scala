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

  test("WavCodec decodes real WAV bytes (fresh JDK encodings, " +
      "independent of the fixture) and WavWrap containers round-trip") {
    val codec = new graft.operators.WavCodec
    codec.open()
    try {
      // fresh JDK-encoded wav: 3 frames stereo 16 kHz, known samples
      val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 2,
        true, false)
      val samples = Array[Short](1000, -2000, 3000, -4000, 5000, -6000)
      val pcm = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 3)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      val f = codec.decodeAudio(
        graft.operators.MediaAsset(1L, "wav", out.toByteArray))
      val sumSq = samples.map(s => s.toLong * s).sum
      assert(f == graft.operators.AudioFeatures(1L, out.size(), 2, 16000,
        3, 3 * 1000L / 16000, graft.operators.WavMath.rmsQ(sumSq, 6)))

      // WavWrap container parses through the same JDK provider
      val data = Array[Byte](1, 2, 3) // odd length → padded to 4
      val wrapped = graft.plans.WavWrap.compute(data)
      val g = codec.decodeAudio(
        graft.operators.MediaAsset(2L, "audio", wrapped))
      assert(g.channels == 1 && g.sample_rate == 8000 && g.n_frames == 2,
        s"wrapped features: $g")
      assert(wrapped.length == 44 + 4)
      // empty payload still yields one decodable zero frame
      val e = codec.decodeAudio(graft.operators.MediaAsset(3L, "audio",
        graft.plans.WavWrap.compute(Array.empty[Byte])))
      assert(e.n_frames == 1 && e.rms_q == 0)

      // corrupt bytes must raise, not return garbage features
      intercept[Exception] {
        codec.decode(graft.operators.MediaAsset(4L, "wav",
          Array.fill(40)(7: Byte)))
      }
    } finally codec.close()
  }

  test("BmpWrap containers decode to the closed-form dimensions " +
      "through the real BMP reader") {
    val codec = new graft.operators.ImageIoCodec
    codec.open()
    try {
      for (n <- Seq(0, 1, 63, 64, 130, 4095)) {
        val data = Array.tabulate(n)(i => (i * 31 + 7).toByte)
        val wrapped = graft.plans.BmpWrap.compute(data)
        val (w, h) = graft.plans.BmpWrap.dims(n)
        val rowSize = (3 * w + 3) & ~3
        assert(wrapped.length == 54 + h * rowSize)
        val f = codec.decode(
          graft.operators.MediaAsset(5L, "image", wrapped))
        assert(f.width == w && f.height == h && f.n_frames == 1,
          s"len=$n decoded as $f (expected ${w}x$h)")
      }
    } finally codec.close()
  }

  test("property: BmpWrap and WavWrap containers round-trip through " +
      "the JDK decoders for 200 random payloads") {
    val codec = new graft.operators.ImageIoCodec
    val wav = new graft.operators.WavCodec
    codec.open(); wav.open()
    try {
      val rnd = new scala.util.Random(7)
      for (_ <- 1 to 200) {
        val n = rnd.nextInt(5000)
        val data = Array.fill(n)(rnd.nextInt().toByte)
        val (w, h) = graft.plans.BmpWrap.dims(n)
        val bf = codec.decode(graft.operators.MediaAsset(1L, "image",
          graft.plans.BmpWrap.compute(data)))
        assert(bf.width == w && bf.height == h, s"len=$n: $bf")
        val af = wav.decodeAudio(graft.operators.MediaAsset(2L, "audio",
          graft.plans.WavWrap.compute(data)))
        val frames = math.max(2, n + n % 2) / 2
        assert(af.channels == 1 && af.sample_rate == 8000 &&
          af.n_frames == frames, s"len=$n: $af")
      }
    } finally { codec.close(); wav.close() }
  }

  test("animated-GIF frame counting is a real multi-image scan " +
      "(fresh encodings + the committed fixture metadata)") {
    val codec = new graft.operators.ImageIoCodec
    codec.open()
    try {
      // fresh JDK-encoded animated GIF, independent of the fixture
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("gif").next()
      val out = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(out)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      for (f <- 0 until 7) {
        val img = new java.awt.image.BufferedImage(11, 5,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        img.setRGB(f % 11, f % 5, 0x00ff00)
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence(); ios.close(); writer.dispose()
      val f = codec.decode(
        graft.operators.MediaAsset(6L, "video", out.toByteArray))
      assert(f.width == 11 && f.height == 5 && f.n_frames == 7, s"$f")
    } finally codec.close()

    val feats = Multimodal.extractFeatures(
      Multimodal.loadRealVideoAssets(spark).repartition(4),
      () => new graft.operators.DispatchCodec)
      .collect().map(f => f.doc_id -> f).toMap
    val meta = spark.read.parquet(Fixtures.mediaVideoPath).collect()
    assert(meta.length == graft.tools.GenVideoFixture.NumVideos)
    meta.foreach { r =>
      val id = r.getAs[Long]("vid_id") + Multimodal.RealVideoIdBase
      val f = feats(id)
      assert(f.width == r.getAs[Int]("true_w") &&
        f.height == r.getAs[Int]("true_h") &&
        f.n_frames == r.getAs[Int]("true_frames"),
        s"gif ${r.getAs[Long]("vid_id")}: decoded $f vs metadata $r")
    }
    // genuinely multi-frame corpus
    assert(meta.map(_.getAs[Int]("true_frames")).max >= 10)
    assert(meta.map(_.getAs[Int]("true_frames")).distinct.length >= 5)
  }

  test("distributed decode of the committed wav fixture reproduces " +
      "the generator's metadata, through the dispatch codec") {
    val feats = Multimodal.extractFeatures(
      Multimodal.loadRealAudioAssets(spark).repartition(4),
      () => new graft.operators.DispatchCodec)
      .collect().map(f => f.doc_id -> f).toMap
    val meta = spark.read.parquet(Fixtures.mediaAudioPath).collect()
    assert(meta.length == graft.tools.GenAudioFixture.NumWavs)
    meta.foreach { r =>
      val id = r.getAs[Long]("aud_id") + Multimodal.RealAudioIdBase
      val f = feats(id)
      assert(f.width == r.getAs[Int]("true_channels") &&
        f.height == r.getAs[Int]("true_rate") &&
        f.n_frames == r.getAs[Long]("true_frames"),
        s"wav ${r.getAs[Long]("aud_id")}: decoded $f vs metadata $r")
    }
    // genuinely mixed formats: both channel counts, several rates
    assert(meta.map(_.getAs[Int]("true_channels")).distinct.length == 2)
    assert(meta.map(_.getAs[Int]("true_rate")).distinct.length >= 3)
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
