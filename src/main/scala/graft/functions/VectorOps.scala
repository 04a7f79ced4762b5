package graft.functions

import graft.plans.{BigramCounts, ByteEntropy, CentroidTopK, DotProduct, L2Norm, MinHashSignature, PqAdcSum, PqCodes, PqLut, RollingHash, ShingleHashSet, ShingleSet, SignBandCodes, SignBandCodesBcast, SortedIntersectCount, SortedLongIntersectCount, TermCounts}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Column-level API over the native vector expressions. Registration is
  * per-session and idempotent; callers invoke `register` once (query
  * builders do it defensively) and use the Column helpers.
  */
object VectorOps {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_dot",
      exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_l2norm",
      exprs => L2Norm(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_quantize_micro",
      exprs => graft.plans.QuantizeMicro(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_pack_f32",
      exprs => graft.plans.PackF32(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_unpack_f32",
      exprs => graft.plans.UnpackF32(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_ucos_packed_f32",
      exprs => graft.plans.UcosPackedF32(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_rolling_hash",
      exprs => RollingHash(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_byte_entropy",
      exprs => ByteEntropy(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_sorted_intersect_count",
      exprs => SortedIntersectCount(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_minhash",
      exprs => {
        val k = exprs(1) match {
          case lit if lit.foldable => lit.eval(null) match {
            case n: Number => n.intValue()
            case other => throw new IllegalArgumentException(
              s"graft_minhash: numHashes must be an integer literal, " +
                s"got $other")
          }
          case _ => throw new IllegalArgumentException(
            "graft_minhash: numHashes must be a literal, not a column")
        }
        MinHashSignature(exprs(0), k)
      }, "built-in")
    reg.createOrReplaceTempFunction("graft_shingles",
      exprs => {
        val len = exprs(1) match {
          case lit if lit.foldable => lit.eval(null) match {
            case n: Number => n.intValue()
            case other => throw new IllegalArgumentException(
              s"graft_shingles: shingleLen must be an integer literal, " +
                s"got $other")
          }
          case _ => throw new IllegalArgumentException(
            "graft_shingles: shingleLen must be a literal, not a column")
        }
        ShingleSet(exprs(0), len)
      }, "built-in")
    reg.createOrReplaceTempFunction("graft_shingle_hashes",
      exprs => {
        val len = exprs(1) match {
          case lit if lit.foldable => lit.eval(null) match {
            case n: Number => n.intValue()
            case other => throw new IllegalArgumentException(
              s"graft_shingle_hashes: shingleLen must be an integer " +
                s"literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "graft_shingle_hashes: shingleLen must be a literal, not a column")
        }
        ShingleHashSet(exprs(0), len)
      }, "built-in")
    reg.createOrReplaceTempFunction("graft_sorted_long_intersect_count",
      exprs => SortedLongIntersectCount(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_term_counts",
      exprs => TermCounts(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_pq_adc_sum",
      exprs => {
        val k = exprs(2) match {
          case lit if lit.foldable => lit.eval(null) match {
            case n: Number => n.intValue()
            case other => throw new IllegalArgumentException(
              s"graft_pq_adc_sum: numCentroids must be an integer " +
                s"literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "graft_pq_adc_sum: numCentroids must be a literal, not a column")
        }
        PqAdcSum(exprs(0), exprs(1), k)
      }, "built-in")
    def intLit(name: String, arg: String)(e: org.apache.spark.sql
        .catalyst.expressions.Expression): Int = e match {
      case lit if lit.foldable => lit.eval(null) match {
        case n: Number => n.intValue()
        case other => throw new IllegalArgumentException(
          s"$name: $arg must be an integer literal, got $other")
      }
      case _ => throw new IllegalArgumentException(
        s"$name: $arg must be a literal, not a column")
    }
    reg.createOrReplaceTempFunction("graft_pq_codes",
      exprs => PqCodes(exprs(0), exprs(1),
        intLit("graft_pq_codes", "numCentroids")(exprs(2)),
        intLit("graft_pq_codes", "subDim")(exprs(3))), "built-in")
    reg.createOrReplaceTempFunction("graft_pq_lut",
      exprs => PqLut(exprs(0), exprs(1),
        intLit("graft_pq_lut", "numCentroids")(exprs(2)),
        intLit("graft_pq_lut", "subDim")(exprs(3))), "built-in")
    reg.createOrReplaceTempFunction("graft_centroid_topk",
      exprs => CentroidTopK(exprs(0), exprs(1), exprs(2),
        intLit("graft_centroid_topk", "k")(exprs(3))), "built-in")
    reg.createOrReplaceTempFunction("graft_centroid_mu_assign",
      exprs => graft.plans.CentroidMuAssign(exprs(0), exprs(1), exprs(2)),
      "built-in")
    reg.createOrReplaceTempFunction("graft_sub_l2_argmin",
      exprs => graft.plans.SubL2Argmin(exprs(0), exprs(1), exprs(2)),
      "built-in")
    reg.createOrReplaceTempFunction("graft_bigram_counts",
      exprs => BigramCounts(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_sign_band_codes",
      exprs => {
        // fold the packed plane literal to a PRIMITIVE double[] once
        // at plan construction — the expression must never touch a
        // boxed-element ArrayData on the per-row path (see
        // SignBandCodes' codegen note)
        val packed = exprs(1) match {
          case lit if lit.foldable => lit.eval(null) match {
            case a: org.apache.spark.sql.catalyst.util.ArrayData =>
              a.toDoubleArray()
            case other => throw new IllegalArgumentException(
              "graft_sign_band_codes: packed planes must be an array " +
                s"literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "graft_sign_band_codes: packed planes must be a literal, " +
              "not a column")
        }
        SignBandCodes(exprs(0), packed,
          intLit("graft_sign_band_codes", "bBits")(exprs(2)))
      }, "built-in")
    reg.createOrReplaceTempFunction("graft_winnow",
      exprs => graft.plans.Winnow(exprs(0),
        intLit("graft_winnow", "k")(exprs(1)),
        intLit("graft_winnow", "w")(exprs(2))), "built-in")
    reg.createOrReplaceTempFunction("graft_bloom_contains",
      exprs => {
        // fold the bitset literal to a PRIMITIVE long[] once at plan
        // construction (the SignBandCodes constant-table discipline)
        val bits = exprs(1) match {
          case lit if lit.foldable => lit.eval(null) match {
            case a: org.apache.spark.sql.catalyst.util.ArrayData =>
              a.toLongArray()
            case other => throw new IllegalArgumentException(
              "graft_bloom_contains: bitset must be an array literal, " +
                s"got $other")
          }
          case _ => throw new IllegalArgumentException(
            "graft_bloom_contains: bitset must be a literal, not a column")
        }
        graft.plans.BloomContains(exprs(0), bits,
          intLit("graft_bloom_contains", "numHashes")(exprs(2)))
      }, "built-in")
    reg.createOrReplaceTempFunction("graft_bpe_count",
      exprs => {
        // fold the rank-order merge arrays to PRIMITIVE int[] once at
        // plan construction (the constant-table discipline)
        def intArr(e: org.apache.spark.sql.catalyst.expressions
            .Expression, arg: String): Array[Int] = e match {
          case lit if lit.foldable => lit.eval(null) match {
            case a: org.apache.spark.sql.catalyst.util.ArrayData =>
              a.toIntArray()
            case other => throw new IllegalArgumentException(
              s"graft_bpe_count: $arg must be an int array literal, " +
                s"got $other")
          }
          case _ => throw new IllegalArgumentException(
            s"graft_bpe_count: $arg must be a literal, not a column")
        }
        graft.plans.BpeTokenCount(exprs(0), intArr(exprs(1), "left"),
          intArr(exprs(2), "right"))
      }, "built-in")
    reg.createOrReplaceTempFunction("graft_nfc",
      exprs => graft.plans.NfcNormalize(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_bpe_ids",
      exprs => {
        def intArr(e: org.apache.spark.sql.catalyst.expressions
            .Expression, arg: String): Array[Int] = e match {
          case lit if lit.foldable => lit.eval(null) match {
            case a: org.apache.spark.sql.catalyst.util.ArrayData =>
              a.toIntArray()
            case other => throw new IllegalArgumentException(
              s"graft_bpe_ids: $arg must be an int array literal, " +
                s"got $other")
          }
          case _ => throw new IllegalArgumentException(
            s"graft_bpe_ids: $arg must be a literal, not a column")
        }
        graft.plans.BpeEncodeIds(exprs(0), intArr(exprs(1), "left"),
          intArr(exprs(2), "right"))
      }, "built-in")
    reg.createOrReplaceTempFunction("graft_hashed_logit",
      exprs => {
        // fold the weight table to a PRIMITIVE long[] once at plan
        // construction (the constant-table discipline)
        val w = exprs(1) match {
          case lit if lit.foldable => lit.eval(null) match {
            case a: org.apache.spark.sql.catalyst.util.ArrayData =>
              a.toLongArray()
            case other => throw new IllegalArgumentException(
              "graft_hashed_logit: weights must be a long array " +
                s"literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "graft_hashed_logit: weights must be a literal, not a column")
        }
        val bias = exprs(2) match {
          case lit if lit.foldable => lit.eval(null) match {
            case n: Number => n.longValue()
            case other => throw new IllegalArgumentException(
              s"graft_hashed_logit: bias must be a long literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "graft_hashed_logit: bias must be a literal, not a column")
        }
        graft.plans.HashedLogit(exprs(0), w, bias)
      }, "built-in")
    reg.createOrReplaceTempFunction("graft_wav_wrap",
      exprs => graft.plans.WavWrap(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_bmp_wrap",
      exprs => graft.plans.BmpWrap(exprs.head), "built-in")
  }

  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
  def l2norm(a: Column): Column = call_function("graft_l2norm", a)

  /** Lossless f32 pack of a µ-quantized integer-component vector
    * (2× smaller storage/wire; see [[graft.plans.PackedF32]]).
    */
  def packF32(a: Column): Column = call_function("graft_pack_f32", a)
  def unpackF32(b: Column): Column =
    call_function("graft_unpack_f32", b)

  /** Fused µcos over two packed-f32 buffers — bit-identical to the
    * array-tier [[graft.operators.Bitext.ucosCol]] chain.
    */
  def ucosPackedF32(a: Column, b: Column): Column =
    call_function("graft_ucos_packed_f32", a, b)

  /** `floor(x·10⁶ + 0.5)` per component, kept as doubles — see
    * [[graft.plans.QuantizeMicro]] for the exact-integer-in-double
    * cross-engine determinism contract.
    */
  def quantizeMicro(a: Column): Column =
    call_function("graft_quantize_micro", a)
  def rollingHash(s: Column): Column =
    call_function("graft_rolling_hash", s)

  /** Shannon entropy (bits/char) of a string's byte distribution. */
  def byteEntropy(s: Column): Column =
    call_function("graft_byte_entropy", s)

  /** |a ∩ b| for duplicate-free arrays sorted in binary string order. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    call_function("graft_sorted_intersect_count", a, b)
  def minhash(arr: Column, numHashes: Int): Column =
    call_function("graft_minhash", arr,
      org.apache.spark.sql.functions.lit(numHashes))

  /** Distinct word-n-gram shingles of a pre-lowercased text. */
  def shingles(text: Column, shingleLen: Int): Column =
    call_function("graft_shingles", text,
      org.apache.spark.sql.functions.lit(shingleLen))

  /** Sorted distinct xxhash64 word-n-gram shingle hashes. */
  def shingleHashes(text: Column, shingleLen: Int): Column =
    call_function("graft_shingle_hashes", text,
      org.apache.spark.sql.functions.lit(shingleLen))

  /** |a ∩ b| for duplicate-free ascending long arrays. */
  def sortedLongIntersectCount(a: Column, b: Column): Column =
    call_function("graft_sorted_long_intersect_count", a, b)

  /** Per-doc `array<struct<t,tf>>` term frequencies, in-row. */
  def termCounts(text: Column): Column =
    call_function("graft_term_counts", text)

  /** Per-doc `array<struct<t,tf>>` adjacent-bigram frequencies. */
  def bigramCounts(text: Column): Column =
    call_function("graft_bigram_counts", text)

  /** Σ_m lut[m*numCentroids + codes[m]] — PQ asymmetric-distance sum. */
  def pqAdcSum(codes: Column, lut: Column, numCentroids: Int): Column =
    call_function("graft_pq_adc_sum", codes, lut,
      org.apache.spark.sql.functions.lit(numCentroids))

  /** All M PQ sub-codes of a vector vs a flattened constant codebook. */
  def pqCodes(v: Column, book: Column, numCentroids: Int,
      subDim: Int): Column =
    call_function("graft_pq_codes", v, book,
      org.apache.spark.sql.functions.lit(numCentroids),
      org.apache.spark.sql.functions.lit(subDim))

  /** Flattened M×K quantized ADC LUT of a query vector. */
  def pqLut(v: Column, book: Column, numCentroids: Int,
      subDim: Int): Column =
    call_function("graft_pq_lut", v, book,
      org.apache.spark.sql.functions.lit(numCentroids),
      org.apache.spark.sql.functions.lit(subDim))

  /** All L sign-band LSH codes vs a packed constant plane table. */
  def signBandCodes(v: Column, packed: Column, bBits: Int): Column =
    call_function("graft_sign_band_codes", v, packed,
      org.apache.spark.sql.functions.lit(bBits))

  /** [[signBandCodes]] with the plane table riding as a BROADCAST
    * handle — for fixtures past the task-binary comfort zone (q135's
    * packed τ=0.4 table is ~3.5 MB; as a plan constant it serialized
    * into every task). Takes [[graft.Fixtures.planesBroadcast]]'s
    * (handle, fingerprint, bBits) triple; bypasses the temp-function
    * registry because a broadcast cannot ride a SQL literal.
    */
  def signBandCodesBcast(v: Column,
      planes: (org.apache.spark.broadcast.Broadcast[Array[Double]],
        Long, Int)): Column =
    org.apache.spark.sql.GraftShims.column(SignBandCodesBcast(
      org.apache.spark.sql.GraftShims.expression(v),
      planes._1, planes._2, planes._3))

  /** Exact ≤8-byte NUL-free string ⟷ long codec so a `min_by` payload
    * keeps a primitive (mutable) aggregation buffer and the aggregate
    * plans as HashAggregate instead of SortAggregate — see
    * [[graft.plans.PackStr8]] for the checked bounded-domain contract
    * (BCP-47 language subtags are the intended payload). Direct
    * expression construction (no temp-function registry) so callers
    * need no per-session registration.
    */
  def packStr8(s: Column): Column =
    org.apache.spark.sql.GraftShims.column(graft.plans.PackStr8(
      org.apache.spark.sql.GraftShims.expression(s)))
  def unpackStr8(h: Column): Column =
    org.apache.spark.sql.GraftShims.column(graft.plans.UnpackStr8(
      org.apache.spark.sql.GraftShims.expression(h)))

  /** Top-k centroid ids by cosine vs a packed constant centroid table. */
  def centroidTopK(v: Column, nrm: Column, packed: Column, k: Int): Column =
    call_function("graft_centroid_topk", v, nrm, packed,
      org.apache.spark.sql.functions.lit(k))

  /** `struct<u, cid>` µcos-argmax training assignment vs a packed
    * `[cid, cn, cv…]` table — the production-K arm of
    * [[graft.operators.Kmeans.withAssignment]].
    */
  def centroidMuAssign(v: Column, nrm: Column, packed: Column): Column =
    call_function("graft_centroid_mu_assign", v, nrm, packed)

  /** `struct<d, cid>` per-subspace squared-L2 argmin vs a packed
    * `[sub, cid, cv…]` codebook — the production-K arm of
    * [[graft.operators.Kmeans.withPqAssignment]].
    */
  def subL2Argmin(sv: Column, sub: Column, packed: Column): Column =
    call_function("graft_sub_l2_argmin", sv, sub, packed)

  /** cosine(a, b) given precomputed norms — dot/(na*nb), matching the
    * lambda formulation bit-for-bit.
    */
  def cosine(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** Winnowing fingerprints (SIGMOD'03): distinct sorted selected
    * k-gram hashes under window length w — see [[graft.plans.Winnow]].
    */
  def winnow(text: Column, k: Int, w: Int): Column =
    call_function("graft_winnow", text,
      org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(w))

  /** Bloom membership probe of a long key against a constant bitset. */
  def bloomContains(key: Column, bits: Array[Long], numHashes: Int): Column =
    call_function("graft_bloom_contains", key,
      org.apache.spark.sql.functions.typedLit(bits.toSeq),
      org.apache.spark.sql.functions.lit(numHashes))

  /** Tokenizer-exact token count under a trained BPE merge table
    * (rank-order left/right pair arrays — see [[graft.plans.BpeTokenCount]]).
    */
  def bpeCount(text: Column, left: Array[Int], right: Array[Int]): Column =
    call_function("graft_bpe_count", text,
      org.apache.spark.sql.functions.typedLit(left.toSeq),
      org.apache.spark.sql.functions.typedLit(right.toSeq))

  /** Unicode NFC normalization (see [[graft.plans.NfcNormalize]]). */
  def nfc(text: Column): Column = call_function("graft_nfc", text)

  /** Tokenizer-exact token-ID sequence under a trained BPE merge table
    * (see [[graft.plans.BpeEncodeIds]]).
    */
  def bpeIds(text: Column, left: Array[Int], right: Array[Int]): Column =
    call_function("graft_bpe_ids", text,
      org.apache.spark.sql.functions.typedLit(left.toSeq),
      org.apache.spark.sql.functions.typedLit(right.toSeq))

  /** struct(bu, iwu, nt) per-document CCNet/DSIR score under a frozen
    * unigram model handle (see [[graft.plans.UnigramDsirScore]]) —
    * direct construction: a model-table handle cannot ride a SQL
    * literal, the [[signBandCodesBcast]] route.
    */
  def unigramDsirScore(text: Column,
      model: graft.plans.DsirModelTable): Column =
    org.apache.spark.sql.GraftShims.column(
      graft.plans.UnigramDsirScore(
        org.apache.spark.sql.GraftShims.expression(text), model))

  /** Integer µunit logit of the trained hashed-unigram quality
    * classifier (µunit weight table + bias — see
    * [[graft.plans.HashedLogit]] / [[graft.Fixtures.qualityClassifier]]).
    */
  def hashedLogit(text: Column, weights: Array[Long],
      biasMu: Long): Column =
    call_function("graft_hashed_logit", text,
      org.apache.spark.sql.functions.typedLit(weights.toSeq),
      org.apache.spark.sql.functions.lit(biasMu))

  /** Raw bytes → canonical PCM WAV container (16-bit mono 8 kHz). */
  def wavWrap(bytes: Column): Column =
    call_function("graft_wav_wrap", bytes)

  /** Raw bytes → real 24-bpp BMP with closed-form dimensions. */
  def bmpWrap(bytes: Column): Column =
    call_function("graft_bmp_wrap", bytes)
}
