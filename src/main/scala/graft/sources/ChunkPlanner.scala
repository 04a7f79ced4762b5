package graft.sources

import org.apache.spark.sql.types._

/** One planned range chunk over a numeric key: `[lower, upper)`, with the
  * final chunk closed `[lower, upper]` (reference `chunk.go:11-30`).
  */
final case class Chunk(lower: Long, upper: Long, closed: Boolean) {
  /** SQL predicate for a JDBC partitioned read (`chunk.go:73-94`). */
  def predicate(keyCol: String): String =
    if (closed) s"$keyCol >= $lower AND $keyCol <= $upper"
    else s"$keyCol >= $lower AND $keyCol < $upper"
}

/** Range-chunk planning, the reference's unit of read parallelism
  * (`chunk.go:34-70` planChunks, `chunk.go:96-150` eligibility).
  *
  * In the Spark build each chunk becomes one JDBC partition predicate
  * (→ one task), so `workers` maps to executor cores instead of a
  * goroutine semaphore (`migrate.go:65-120`). Eligibility rules are
  * ported verbatim: single-column signed-integer PK only; unsigned
  * bigint excluded (int64 overflow, `chunk.go:126-150`).
  *
  * Scale note (SURVEY §7.3): fixed-width chunks degrade on sparse/skewed
  * key spaces — `chunksByQuantiles` plans from sampled quantile bounds
  * instead, the 100 TB-safe path.
  */
object ChunkPlanner {
  val DefaultChunkSize: Long = 100000L // reference config.go:151-153

  /** Driver-side chunk-plan cap. Fixed-width chunking on a SPARSE key
    * space (snowflake/UUID-derived ids: range ≫ row count) would
    * otherwise materialize millions of chunk predicates on the driver —
    * (hi−lo)/chunkSize chunks regardless of actual rows. Past the cap
    * the chunk width widens so the plan stays bounded; each chunk just
    * covers more of the (mostly empty) key range. 10k partitions is
    * far past the task-count sweet spot for any single table load.
    */
  val MaxChunks: Int = 10000

  /** Spark types eligible as chunk keys (signed integral, ≤ 64-bit). */
  def eligibleKeyType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    // DecimalType(20,0) is the unsigned-bigint mapping — excluded, as in
    // the reference (chunk.go:126-150).
    case _ => false
  }

  /** Slice `[min, max]` into fixed-width chunks; overflow-safe near
    * Long.MaxValue. NULL min/max (empty table) → no chunks
    * (`chunk.go:152-185`).
    */
  def planChunks(min: Long, max: Long,
      chunkSize: Long = DefaultChunkSize): Seq[Chunk] = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(min <= max, s"min $min > max $max")
    // widen the chunk if the range would exceed MaxChunks partitions
    // (unsigned math: the full Long range divided by any positive width
    // stays representable)
    val width = {
      val spanChunks = java.lang.Long.divideUnsigned(max - min, chunkSize)
      if (java.lang.Long.compareUnsigned(spanChunks, MaxChunks.toLong) <= 0)
        chunkSize
      else
        // w ≤ 2^64/10^4 < 2^51, so +1 cannot overflow
        java.lang.Long.divideUnsigned(max - min, MaxChunks.toLong) + 1
    }
    planChunksAtWidth(min, max, width)
  }

  private def planChunksAtWidth(min: Long, max: Long,
      chunkSize: Long): Seq[Chunk] = {
    val out = Seq.newBuilder[Chunk]
    var lo = min
    var done = false
    while (!done) {
      // (max - lo) read as unsigned is the exact remaining width even when
      // the signed subtraction overflows (e.g. min = Long.MinValue).
      if (java.lang.Long.compareUnsigned(max - lo, chunkSize) < 0) {
        out += Chunk(lo, max, closed = true)
        done = true
      } else {
        out += Chunk(lo, lo + chunkSize, closed = false) // no overflow: lo+chunkSize <= max
        lo = lo + chunkSize
      }
    }
    out.result()
  }

  /** JDBC predicate array for `spark.read.jdbc(url, table, predicates,
    * props)` — one element per chunk/partition.
    */
  def jdbcPredicates(min: Long, max: Long, keyCol: String,
      chunkSize: Long = DefaultChunkSize): Array[String] =
    planChunks(min, max, chunkSize).map(_.predicate(keyCol)).toArray

  /** Skew-aware planning: chunk bounds from pre-sampled key quantiles
    * (e.g. `df.stat.approxQuantile`), producing ~equal-cardinality chunks
    * regardless of key-space sparsity. Bounds must be ascending and
    * include the global min/max.
    */
  def chunksByQuantiles(bounds: Seq[Long]): Seq[Chunk] = {
    require(bounds.size >= 2, "need at least [min, max]")
    require(bounds == bounds.sorted, "quantile bounds must be ascending")
    val distinct = bounds.distinct
    if (distinct.size == 1) Seq(Chunk(distinct.head, distinct.head, closed = true))
    else distinct.sliding(2).zipWithIndex.map { case (Seq(lo, hi), i) =>
      val last = i == distinct.size - 2
      Chunk(lo, hi, closed = last)
    }.toSeq
  }
}
