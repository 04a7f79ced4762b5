package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact codec between a SHORT string and one long, so an aggregation
  * that must ferry a string payload through `min_by`/`max_by` keeps a
  * fully MUTABLE (primitive) aggregation buffer and stays on
  * `HashAggregateExec`. A string- or struct-typed buffer field is
  * immutable in UnsafeRow, which silently demotes the whole
  * partial/final pair to `SortAggregateExec` — a full sort of every
  * input row on each side of the exchange (two corpus sorts at 100 TB)
  * just to carry a few bytes per group.
  *
  * Domain — the bounded-domain contract, checked LOUDLY at pack time
  * rather than truncating silently:
  *
  *  - UTF-8 length ≤ 8 bytes;
  *  - no NUL byte (zero bytes are the pad, so an embedded NUL would
  *    not round-trip).
  *
  * Language tags are the intended payload: this data model's `lang`
  * column carries BCP-47 PRIMARY subtags — 2–8 ASCII alphanumerics by
  * grammar (RFC 5646 §2.2.1) — so the domain holds for it at any
  * corpus scale. A column carrying full multi-subtag tags (e.g.
  * `zh-Hant-TW`, 10 bytes) exceeds 8 bytes and fails LOUDLY at pack
  * time, by design; the extension path for a wider payload is a
  * second packed long (two `min_by` aggregates keep the buffer
  * primitive), never silent truncation. Bytes pack
  * big-endian from the most significant byte down, zero-padded, so
  * `UnpackStr8(PackStr8(s)) = s` exactly on the domain; the empty
  * string round-trips as 0L. Ordering of the packed longs is NOT part
  * of the contract — the long is a payload codec, not a sort key.
  * PackCodecSpec pins the round-trip and both domain rejections.
  */
case class PackStr8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    PackStr8.pack(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.PackStr8.pack($a);")

  override protected def withNewChildInternal(
      newChild: Expression): PackStr8 = copy(child = newChild)
}

object PackStr8 {
  /** Static helper shared by eval and generated code. */
  def pack(s: UTF8String): Long = {
    val b = s.getBytes
    if (b.length > 8)
      throw new IllegalArgumentException(
        s"PackStr8: value exceeds 8 UTF-8 bytes: '$s'")
    var h = 0L
    var i = 0
    while (i < b.length) {
      if (b(i) == 0)
        throw new IllegalArgumentException(
          "PackStr8: NUL byte in input does not round-trip")
      h |= (b(i) & 0xffL) << (56 - 8 * i)
      i += 1
    }
    h
  }

  /** Static helper shared by eval and generated code. */
  def unpack(h: Long): UTF8String = {
    var n = 0
    while (n < 8 && ((h >>> (56 - 8 * n)) & 0xffL) != 0) n += 1
    val b = new Array[Byte](n)
    var i = 0
    while (i < n) { b(i) = ((h >>> (56 - 8 * i)) & 0xffL).toByte; i += 1 }
    UTF8String.fromBytes(b)
  }
}

/** Inverse of [[PackStr8]] — see its domain note. */
case class UnpackStr8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(a: Any): Any =
    PackStr8.unpack(a.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.PackStr8.unpack($a);")

  override protected def withNewChildInternal(
      newChild: Expression): UnpackStr8 = copy(child = newChild)
}
