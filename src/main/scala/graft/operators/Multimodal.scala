package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media asset as it travels the pipeline: opaque binary payload +
  * typed metadata. Image/audio/video payloads are all `Array[Byte]` —
  * the engine never interprets them outside the decode stage.
  */
final case class MediaAsset(
    doc_id: Long, media_type: String, payload: Array[Byte])

/** Features extracted by the decoder. */
final case class MediaFeatures(
    doc_id: Long, media_type: String, n_bytes: Int,
    width: Int, height: Int, n_frames: Int)

/** The pluggable decoder seam: expensive codec state (JNI handles,
  * FFMPEG contexts, model weights) initializes in `open()` ONCE PER
  * PARTITION and is reused across that partition's rows — the batch
  * shape any real decoder needs. Implementations must be serializable
  * INSTANTIATION RECIPES (the factory closure ships to executors; the
  * opened state never crosses the wire).
  *
  * `MultimodalCodecSpec` proves the lifecycle: open/close called
  * exactly once per non-empty partition, decode once per row.
  */
trait MediaCodec extends Serializable {
  /** Per-partition init — allocate codec state here, not per row. */
  def open(): Unit = ()
  def decode(a: MediaAsset): MediaFeatures
  /** Per-partition teardown, called after the partition drains. */
  def close(): Unit = ()
}

/** The container has no image/audio codecs, so the default codec
  * derives deterministic fake dimensions from the byte length — the
  * ONLY thing to swap for a real decoder; schema, partitioning and the
  * oracle contract stay put.
  */
final class StubCodec extends MediaCodec {
  def decode(a: MediaAsset): MediaFeatures = Multimodal.decodeStub(a)
}

/** Multimodal-column plumbing (builder-prompt north star).
  *
  * Real part: the Spark-side shape — binary payload column, typed
  * `Dataset[MediaAsset]`, partition-parallel decode via `mapPartitions`
  * with a per-partition [[MediaCodec]] lifecycle, features re-joining
  * the relational surface as columns. Everything DOWNSTREAM of the
  * decode (resize arithmetic, frame-stride selection) is Column
  * expressions, so it stays inside whole-stage codegen instead of
  * round-tripping rows through the object decoder path.
  *
  * Stubbed part: [[StubCodec]] / [[decodeStub]] — deterministic on
  * payload bytes so the DuckDB oracle can reproduce the expected
  * features from octet lengths alone.
  */
object Multimodal {

  /** STUB decode math — replace via a real [[MediaCodec]]. */
  def decodeStub(a: MediaAsset): MediaFeatures = {
    val n = a.payload.length
    val frames = if (a.media_type == "video") 1 + n % 7 else 1
    MediaFeatures(a.doc_id, a.media_type, n,
      width = 16 + n % 64, height = 16 + (n / 64) % 64, n_frames = frames)
  }

  /** Typed decode stage: one codec instance per partition (opened
    * before the first row, closed when the partition drains), streaming
    * rows through it — never materializing the partition.
    */
  def extractFeatures(assets: Dataset[MediaAsset],
      codec: () => MediaCodec = () => new StubCodec)
      : Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      val c = codec()
      c.open()
      new Iterator[MediaFeatures] {
        private var closed = false
        def hasNext: Boolean = {
          val h = it.hasNext
          if (!h && !closed) { closed = true; c.close() }
          h
        }
        def next(): MediaFeatures = c.decode(it.next())
      }
    }
  }

  /** Fixture assets: documents' text bytes as opaque payloads with a
    * deterministic media_type assignment.
    */
  def loadAssets(s: SparkSession, dir: String): Dataset[MediaAsset] = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaAsset]
  }

  val q35Multimodal: QueryDef = QueryDef(
    "q35_multimodal",
    (s, dir) =>
      extractFeatures(loadAssets(s, dir)).toDF()
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
           |  CASE WHEN doc_id % 3 = 0 THEN 'image'
           |       WHEN doc_id % 3 = 1 THEN 'audio'
           |       ELSE 'video' END AS media_type,
           |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           |  CAST(16 + octet_length(encode(text)) % 64 AS INTEGER) AS width,
           |  CAST(16 + (octet_length(encode(text)) // 64) % 64 AS INTEGER)
           |    AS height,
           |  CAST(CASE WHEN doc_id % 3 = 2
           |       THEN 1 + octet_length(encode(text)) % 7
           |       ELSE 1 END AS INTEGER) AS n_frames
           |FROM documents ORDER BY doc_id""".stripMargin))

  /** Resize → frame-sample as COLUMN EXPRESSIONS over the decoded
    * features: fit into a 64×64 budget preserving aspect ratio with
    * integer arithmetic (no float rounding divergence), keep ≤4
    * evenly-strided frame ids serialized as "0,2,4" (a deterministic
    * scalar any downstream comparator can sort/hash). Pure arithmetic
    * needs no codec state, so unlike the decode it belongs in codegen,
    * not in `mapPartitions`.
    */
  def resizeAndSample(feats: Dataset[MediaFeatures]): DataFrame = {
    val longSide = greatest(col("width"), col("height"))
    def fit(side: String) =
      when(longSide <= 64, col(side))
        .otherwise(expr(s"$side * 64 div greatest(width, height)"))
        .cast("int")
    val stride = expr("(n_frames + 3) div 4")
    feats.toDF()
      .select(col("doc_id"), col("media_type"),
        fit("width").as("out_w"), fit("height").as("out_h"),
        concat_ws(",",
          transform(sequence(lit(0L), col("n_frames") - 1, stride),
            _.cast("string"))).as("sampled_frames"))
  }

  val q49MediaPipeline: QueryDef = QueryDef(
    "q49_media_pipeline",
    (s, dir) =>
      resizeAndSample(extractFeatures(loadAssets(s, dir)))
        .orderBy("doc_id"),
    Some("""WITH f AS (
           |  SELECT doc_id,
           |    CASE WHEN doc_id % 3 = 0 THEN 'image'
           |         WHEN doc_id % 3 = 1 THEN 'audio'
           |         ELSE 'video' END AS media_type,
           |    CAST(16 + octet_length(encode(text)) % 64 AS INTEGER) AS w,
           |    CAST(16 + (octet_length(encode(text)) // 64) % 64 AS INTEGER)
           |      AS h,
           |    CAST(CASE WHEN doc_id % 3 = 2
           |         THEN 1 + octet_length(encode(text)) % 7
           |         ELSE 1 END AS INTEGER) AS nf
           |  FROM documents)
           |SELECT doc_id, media_type,
           |  CAST(CASE WHEN greatest(w, h) <= 64 THEN w
           |       ELSE w * 64 // greatest(w, h) END AS INTEGER) AS out_w,
           |  CAST(CASE WHEN greatest(w, h) <= 64 THEN h
           |       ELSE h * 64 // greatest(w, h) END AS INTEGER) AS out_h,
           |  array_to_string(range(0, nf, (nf + 3) // 4), ',')
           |    AS sampled_frames
           |FROM f ORDER BY doc_id""".stripMargin))

  val all: Seq[QueryDef] = Seq(q35Multimodal, q49MediaPipeline)
}
