package graft.plans

import graft.functions.Bpe
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Token count of a text under a TRAINED byte-level BPE merge table
  * (Sennrich ACL'16 / GPT-2 byte-level BPE) — the in-row kernel that
  * turns every downstream token budget (packing, mix weights, pipeline
  * caps) from whitespace-split approximations into tokenizer-exact
  * counts. One fused pass per row inside whole-stage codegen: the
  * pre-tokenize + merge loop runs in [[graft.functions.Bpe]] statics;
  * the trained table rides the references array as a prebuilt
  * [[Bpe.Table]] (the SignBandCodes constant-table discipline — tasks
  * carry a handle, rows never touch boxed ArrayData).
  *
  * `left`/`right` are the merge pairs in rank order, exactly as the
  * committed `fixtures/bpe_merges.parquet` stores them (trained by
  * [[graft.tools.TrainBpe]]). Content-based equality (not array
  * identity) keeps canonicalized-plan equality and the persist cache
  * working across separately loaded fixture copies.
  */
case class BpeTokenCount(child: Expression, left: Array[Int],
    right: Array[Int]) extends UnaryExpression {
  require(left.length == right.length,
    s"rank-order merge arrays must align: ${left.length} vs ${right.length}")

  override def dataType: DataType = IntegerType

  @transient private lazy val table = new Bpe.Table(left, right)

  override protected def nullSafeEval(text: Any): Any =
    Bpe.countTokens(text.asInstanceOf[UTF8String].toString, table)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeTable", table,
      classOf[Bpe.Table].getName)
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = graft.functions.Bpe.countTokens(" +
        s"$text.toString(), $tableRef);")
  }

  override def equals(other: Any): Boolean = other match {
    case b: BpeTokenCount =>
      child == b.child && java.util.Arrays.equals(left, b.left) &&
        java.util.Arrays.equals(right, b.right)
    case _ => false
  }

  override def hashCode(): Int =
    31 * (31 * child.hashCode() + java.util.Arrays.hashCode(left)) +
      java.util.Arrays.hashCode(right)

  override protected def withNewChildInternal(
      newChild: Expression): BpeTokenCount = copy(child = newChild)
}
