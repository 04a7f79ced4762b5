package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-model lookup table for the in-row CCNet/DSIR scorer: token
  * → (raw count cr, smoothed-target count ct) plus the normalizing
  * constants. Content `fingerprint` stands in for the payload in plan
  * equality (the SignBandCodesBcast discipline — a handle's reference
  * identity can't canonicalize). At fixture scale this is the whole
  * corpus vocabulary; at 100 TB it is the trained top-K vocab + OOV
  * floor every production perplexity filter ships (CCNet's KenLM is
  * exactly such a frozen artifact).
  */
final class DsirModelTable(
    val counts: java.util.HashMap[String, Array[Long]],
    val nr: Long, val v: Long, val ntt: Long,
    val fingerprint: Long) extends Serializable

object DsirModelTable {
  /** Build from (token, cr, ct) triples + constants, fingerprinting
    * the full content so two separately collected copies of the same
    * model compare equal in plan canonicalization.
    */
  def build(rows: Iterable[(String, Long, Long)],
      nr: Long, v: Long, ntt: Long): DsirModelTable = {
    val m = new java.util.HashMap[String, Array[Long]](rows.size * 2)
    var fp = 0xcbf29ce484222325L // FNV-1a over a canonical rendering
    def mix(s: String): Unit = {
      var i = 0
      while (i < s.length) {
        fp ^= s.charAt(i); fp *= 0x100000001b3L; i += 1
      }
    }
    // fold tokens in sorted order so insertion order never changes
    // the fingerprint
    rows.toSeq.sortBy(_._1).foreach { case (t, cr, ct) =>
      m.put(t, Array(cr, ct))
      mix(t); mix(s":$cr:$ct;")
    }
    mix(s"#$nr/$v/$ntt")
    new DsirModelTable(m, nr, v, ntt, fp)
  }
}

object UnigramDsirScore {
  private val Ln2 = java.lang.StrictMath.log(2.0)
  private def log2(x: Double): Double = java.lang.StrictMath.log(x) / Ln2

  /** Per-document (bu, iwu, nt) in ONE text pass — the in-row twin of
    * the explode → join(model) → groupBy(doc_id) relational spelling
    * (TextAnalysis q162/q163): tokens are the non-empty single-space
    * splits of the lowercased text, out-of-vocabulary tokens are
    * skipped exactly as the inner model join drops them, bu/iwu are
    * the µunit floors of the average self-information and average
    * log-likelihood ratio. Summation runs in document token order —
    * deterministic for a given document, independent of partitioning
    * (the relational avg's partial-aggregation order is not; both
    * land inside the same one-floor rounding window the µunit
    * discipline documents).
    */
  def compute(text: UTF8String, t: DsirModelTable): InternalRow = {
    // lowercase via UTF8String — the SAME implementation Spark's
    // lower() uses (UTF8_BINARY collation path), so the in-row scorer
    // and the relational twin (unigramToks / SQL lower()) cannot
    // diverge from EACH OTHER. Note the shared implementation is
    // itself locale-stable only on its ASCII fast path: non-ASCII
    // strings fall to default-locale String.toLowerCase inside
    // UTF8String, so on a non-en JVM both sides shift together
    // relative to DuckDB's locale-independent lower() (İ, ß, final
    // sigma). Scorer≡twin is the contract here; cross-engine parity
    // additionally assumes ASCII corpora or an en/ROOT JVM locale,
    // which the fixtures and driver guarantee
    val s = text.toLowerCase.toString
    var sumBits = 0.0
    var sumLr = 0.0
    var n = 0L
    var i = 0
    val len = s.length
    while (i < len) {
      var j = s.indexOf(' ', i)
      if (j < 0) j = len
      if (j > i) {
        val c = t.counts.get(s.substring(i, j))
        if (c != null) {
          val pRaw = c(0).toDouble / t.nr
          sumBits += -log2(pRaw)
          sumLr += log2((c(1) + 1L).toDouble / (t.ntt + t.v)) - log2(pRaw)
          n += 1
        }
      }
      i = j + 1
    }
    if (n == 0L) new GenericInternalRow(Array[Any](0L, 0L, 0L))
    else new GenericInternalRow(Array[Any](
      math.floor(sumBits / n * 1e6 + 0.5d).toLong,
      math.floor(sumLr / n * 1e6 + 0.5d).toLong,
      n))
  }
}

/** struct(bu, iwu, nt) of a text under a frozen unigram DSIR model —
  * the STATELESS per-row scorer that lets the CCNet gate + DSIR
  * selection run inside streaming micro-batches (q176): no explode,
  * no per-doc_id aggregation state, the model rides the references
  * array as a prebuilt [[DsirModelTable]]. Content-based equality via
  * the table fingerprint.
  */
case class UnigramDsirScore(child: Expression, model: DsirModelTable)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("bu", LongType, nullable = false),
    StructField("iwu", LongType, nullable = false),
    StructField("nt", LongType, nullable = false)))

  override protected def nullSafeEval(text: Any): Any =
    UnigramDsirScore.compute(text.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("dsirModel", model,
      classOf[DsirModelTable].getName)
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = graft.plans.UnigramDsirScore.compute(" +
        s"$text, $tableRef);")
  }

  override def equals(other: Any): Boolean = other match {
    case o: UnigramDsirScore =>
      child == o.child && model.fingerprint == o.model.fingerprint
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(child,
      java.lang.Long.valueOf(model.fingerprint))

  override protected def withNewChildInternal(
      newChild: Expression): UnigramDsirScore = copy(child = newChild)
}
