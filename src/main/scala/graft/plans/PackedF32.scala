package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, LongType}

/** f32 PACKED VECTOR TIER (VERDICT r18 "What's missing" #4): the
  * µ-quantized embedding pipeline carries `array<double>` end to end,
  * which at 10⁹+ vectors is 2× the wire, cache, and scan bytes of f32
  * for no precision the µcos-quantized comparisons use — a µ
  * component is an INTEGER-valued double with |v| ≤ ~10⁶, and f32
  * represents every integer up to 2²⁴ = 16 777 216 EXACTLY, so the
  * pack is lossless BY CONSTRUCTION for quantized vectors (and
  * [[PackF32]] enforces that contract loudly: packing a non-integral
  * or out-of-range component is a precision-losing misuse, not a
  * cast).
  *
  * Layout: little-endian IEEE-754 binary32, 4 bytes per component —
  * a plain packed buffer any kernel (or external consumer) can mmap.
  * [[UcosPackedF32]] folds the whole µcos chain over two packed
  * buffers in ONE pass with no array allocation: exact integer dot
  * (float→double widening is exact; the products sum below 2⁵³),
  * correctly-rounded sqrt norms, the same divide·scale·floor tree as
  * [[graft.operators.Bitext.ucosCol]] — bit-identical results,
  * spec-pinned in PackedVectorSpec and oracle-checked by q236.
  */
case class PackF32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(v: Any): Any =
    PackedF32.pack(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.PackedF32.pack($v);")

  override protected def withNewChildInternal(
      newChild: Expression): PackF32 = copy(child = newChild)
}

case class UnpackF32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, false)

  override protected def nullSafeEval(b: Any): Any =
    PackedF32.unpack(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.plans.PackedF32.unpack($b);")

  override protected def withNewChildInternal(
      newChild: Expression): UnpackF32 = copy(child = newChild)
}

/** µcos over two packed-f32 µ-quantized buffers — dot and both norms
  * in one fused pass, no unpack allocation on the hot path.
  */
case class UcosPackedF32(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    PackedF32.ucos(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.PackedF32.ucos($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): UcosPackedF32 =
    copy(left = newLeft, right = newRight)
}

object PackedF32 {

  /** Largest magnitude f32 holds exactly for every integer: 2²⁴. */
  val MaxExact = 16777216.0

  def pack(v: ArrayData): Array[Byte] = {
    val n = v.numElements()
    val out = new Array[Byte](n * 4)
    var i = 0
    while (i < n) {
      // a null ELEMENT must hit the loud guard, not pack as 0.0f
      // (UnsafeArrayData zeroes null slots) or NPE without the
      // contract message (GenericArrayData) — r19 review finding
      if (v.isNullAt(i))
        throw new IllegalArgumentException(
          s"PackF32: null component at position $i — µ-quantized " +
            "vectors are dense; pack has no null spelling")
      val x = v.getDouble(i)
      if (x != Math.rint(x) || Math.abs(x) > MaxExact)
        throw new IllegalArgumentException(
          s"PackF32 is for µ-quantized integer components (|v| <= " +
            s"2^24); got $x — packing it to f32 would lose precision")
      val bits = java.lang.Float.floatToRawIntBits(x.toFloat)
      val o = i * 4
      out(o) = bits.toByte
      out(o + 1) = (bits >>> 8).toByte
      out(o + 2) = (bits >>> 16).toByte
      out(o + 3) = (bits >>> 24).toByte
      i += 1
    }
    out
  }

  private def floatAt(b: Array[Byte], i: Int): Float = {
    val o = i * 4
    java.lang.Float.intBitsToFloat(
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24))
  }

  def unpack(b: Array[Byte]): ArrayData = {
    require(b.length % 4 == 0,
      s"packed f32 buffer length ${b.length} not a multiple of 4")
    val n = b.length / 4
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = floatAt(b, i).toDouble; i += 1 }
    new GenericArrayData(out)
  }

  /** floor(dot/(‖a‖·‖b‖)·10⁶ + 0.5) — the exact [[graft.operators
    * .Bitext.ucosCol]] tree over packed buffers: dots are exact
    * integers (f32→f64 widening is exact; µ-component products sum
    * below 2⁵³), norms are correctly-rounded sqrts of exact integers,
    * and the final divide·scale·floor is the identical IEEE chain.
    */
  def ucos(a: Array[Byte], b: Array[Byte]): Long = {
    require(a.length == b.length,
      s"packed dims differ: ${a.length / 4} vs ${b.length / 4}")
    val n = a.length / 4
    var dab = 0.0
    var daa = 0.0
    var dbb = 0.0
    var i = 0
    while (i < n) {
      val xa = floatAt(a, i).toDouble
      val xb = floatAt(b, i).toDouble
      dab += xa * xb
      daa += xa * xa
      dbb += xb * xb
      i += 1
    }
    math.floor(dab / (math.sqrt(daa) * math.sqrt(dbb)) * 1000000.0
      + 0.5).toLong
  }
}
