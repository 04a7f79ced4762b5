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
