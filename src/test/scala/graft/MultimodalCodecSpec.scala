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
}
