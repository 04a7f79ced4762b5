package graft.functions

import graft.plans.{ByteEntropy, DotProduct, L2Norm, MinHashSignature, RollingHash, ShingleHashSet, ShingleSet, SortedIntersectCount, SortedLongIntersectCount}
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
  }

  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
  def l2norm(a: Column): Column = call_function("graft_l2norm", a)
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

  /** cosine(a, b) given precomputed norms — dot/(na*nb), matching the
    * lambda formulation bit-for-bit.
    */
  def cosine(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)
}
