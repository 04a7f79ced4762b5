package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media asset as it travels the pipeline: opaque binary payload +
  * typed metadata. Image/audio/video payloads are all `Array[Byte]` —
  * the engine never interprets them outside the decode stage.
  */
final case class MediaAsset(
    doc_id: Long, media_type: String, payload: Array[Byte])

/** Features extracted by the (stubbed) decoder. */
final case class MediaFeatures(
    doc_id: Long, media_type: String, n_bytes: Int,
    width: Int, height: Int, n_frames: Int)

/** Multimodal-column plumbing (builder-prompt north star).
  *
  * Real part: the Spark-side shape — binary payload column, typed
  * `Dataset[MediaAsset]`, partition-parallel decode via `mapPartitions`
  * (one decoder instance per partition, the same batch shape a JNI/FFMPEG
  * or Pandas-UDF decoder needs), features re-joining the relational
  * surface as columns.
  *
  * Stubbed part: `decodeStub` — this container has no image/audio codecs,
  * so the decoder derives deterministic fake dimensions from the byte
  * length. The stub is the ONLY thing to swap for a real codec; schema,
  * partitioning and the oracle contract stay put.
  */
object Multimodal {

  /** STUB — replace with a real codec (e.g. javax.imageio / JNI ffmpeg).
    * Deterministic on payload bytes so the DuckDB oracle can reproduce
    * the expected features from octet lengths alone.
    */
  def decodeStub(a: MediaAsset): MediaFeatures = {
    val n = a.payload.length
    val frames = if (a.media_type == "video") 1 + n % 7 else 1
    MediaFeatures(a.doc_id, a.media_type, n,
      width = 16 + n % 64, height = 16 + (n / 64) % 64, n_frames = frames)
  }

  /** Typed decode stage: one decoder per partition, streaming batches. */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition decoder init would go here (expensive codec setup
      // amortized across the partition's rows)
      it.map(decodeStub)
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

  /** Decode → resize → frame-sample, the full media pipeline shape.
    * Resize fits into a 64×64 budget preserving aspect ratio with
    * integer arithmetic (no float rounding divergence); frame sampling
    * keeps ≤4 evenly-strided frames. Both stages run inside the same
    * per-partition decoder pass — at scale the expensive codec state is
    * initialized once per partition, not per row.
    */
  final case class MediaProcessed(
      doc_id: Long, media_type: String, out_w: Int, out_h: Int,
      sampled_frames: String)

  def resizeAndSample(feats: Dataset[MediaFeatures]): Dataset[MediaProcessed] = {
    import feats.sparkSession.implicits._
    feats.mapPartitions(_.map { f =>
      val longSide = math.max(f.width, f.height)
      val outW = if (longSide <= 64) f.width else f.width * 64 / longSide
      val outH = if (longSide <= 64) f.height else f.height * 64 / longSide
      val stride = (f.n_frames + 3) / 4
      // Frame ids serialize as "0,2,4" — a deterministic scalar keeps the
      // result sortable/hashable by any downstream comparator.
      MediaProcessed(f.doc_id, f.media_type, outW, outH,
        0L.until(f.n_frames.toLong).by(stride.toLong).mkString(","))
    })
  }

  val q49MediaPipeline: QueryDef = QueryDef(
    "q49_media_pipeline",
    (s, dir) =>
      resizeAndSample(extractFeatures(loadAssets(s, dir))).toDF()
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
