package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Wraps raw bytes into a REAL canonical RIFF/WAVE container — 44-byte
  * PCM header (16-bit, mono, 8000 Hz) + the bytes as little-endian
  * sample data, zero-padded to frame (2-byte) alignment.
  *
  * This is how the synthetic `audio` assets in the multimodal tier
  * (q35/q49) become genuine WAV payloads that the javax.sound-based
  * [[graft.operators.WavCodec]] parses for real: header arithmetic is
  * pure byte surgery on lengths, so it belongs in a codegen'd
  * expression, and the oracle reproduces every decoded feature from
  * `octet_length(text)` alone (n_bytes = 44 + len + len%2, frames =
  * (len + len%2) / 2, channels = 1, rate = 8000).
  */
case class WavWrap(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType

  override def nullSafeEval(a: Any): Any =
    WavWrap.compute(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.WavWrap.compute($a);")

  override protected def withNewChildInternal(
      newChild: Expression): WavWrap = copy(child = newChild)
}

/** Wraps raw bytes into a REAL 24-bpp bottom-up BMP container whose
  * dimensions are the closed-form functions of the byte length the q35
  * oracle computes (w = 16 + n%64, h = 16 + (n/64)%64): 54-byte
  * header + h zero-padded pixel rows filled cyclically from the bytes.
  * Like [[WavWrap]] this turns the synthetic `image` assets into
  * genuinely decodable payloads — [[graft.operators.ImageIoCodec]]
  * parses the actual BITMAPINFOHEADER; total size is
  * 54 + h·((3w+3) & ~3), also closed-form for the oracle.
  */
case class BmpWrap(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType

  override def nullSafeEval(a: Any): Any =
    BmpWrap.compute(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.BmpWrap.compute($a);")

  override protected def withNewChildInternal(
      newChild: Expression): BmpWrap = copy(child = newChild)
}

object BmpWrap {
  val HeaderLen = 54

  def dims(n: Int): (Int, Int) = (16 + n % 64, 16 + (n / 64) % 64)

  def compute(data: Array[Byte]): Array[Byte] = {
    val n = data.length
    val (w, h) = dims(n)
    val rowSize = (3 * w + 3) & ~3
    val imgSize = h * rowSize
    val out = new Array[Byte](HeaderLen + imgSize)
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >>> 8) & 0xff).toByte
      out(off + 2) = ((v >>> 16) & 0xff).toByte
      out(off + 3) = ((v >>> 24) & 0xff).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >>> 8) & 0xff).toByte
    }
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    le32(2, HeaderLen + imgSize); le32(6, 0); le32(10, HeaderLen)
    le32(14, 40); le32(18, w); le32(22, h)
    le16(26, 1); le16(28, 24); le32(30, 0); le32(34, imgSize)
    le32(38, 2835); le32(42, 2835); le32(46, 0); le32(50, 0)
    // pixel rows: payload bytes cycled through the BGR triples (row
    // padding stays zero); an empty payload leaves a black image
    if (n > 0) {
      var y = 0
      var src = 0
      while (y < h) {
        val rowOff = HeaderLen + y * rowSize
        var x = 0
        while (x < 3 * w) {
          out(rowOff + x) = data(src % n)
          src += 1
          x += 1
        }
        y += 1
      }
    }
    out
  }
}

object WavWrap {
  val SampleRate = 8000
  val Channels = 1
  val BitsPerSample = 16
  val HeaderLen = 44

  /** Canonical 44-byte PCM WAV header + data, padded to even length
    * with a floor of ONE zero frame (an empty document still yields a
    * well-formed, decodable wav with n_frames ≥ 1 — downstream
    * frame-stride arithmetic divides by n_frames). Static so
    * interpreted eval and generated code share one body.
    */
  def compute(data: Array[Byte]): Array[Byte] = {
    val dataLen = math.max(2, data.length + (data.length & 1))
    val out = new Array[Byte](HeaderLen + dataLen)
    val blockAlign = Channels * BitsPerSample / 8
    val byteRate = SampleRate * blockAlign
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >>> 8) & 0xff).toByte
      out(off + 2) = ((v >>> 16) & 0xff).toByte
      out(off + 3) = ((v >>> 24) & 0xff).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >>> 8) & 0xff).toByte
    }
    def tag(off: Int, s: String): Unit = {
      var i = 0
      while (i < s.length) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    tag(0, "RIFF"); le32(4, 36 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16)
    le16(20, 1) // PCM
    le16(22, Channels); le32(24, SampleRate); le32(28, byteRate)
    le16(32, blockAlign); le16(34, BitsPerSample)
    tag(36, "data"); le32(40, dataLen)
    System.arraycopy(data, 0, out, HeaderLen, data.length)
    // the pad byte (if any) is already 0 from array init
    out
  }
}
