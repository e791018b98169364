package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: media as opaque `BINARY` columns plus typed
  * metadata, with decode/feature-extraction as partition-local batch
  * functions (north-star multimodal surface).
  *
  * The image/audio codecs aren't available in this container, so
  * [[decodeFeatures]] is a clearly-marked deterministic stub — but the
  * Spark-side plumbing is real: schema, binary payloads, batched
  * mapPartitions (one buffer reuse per partition, the same batch shape a
  * JNI/FFI decoder would want), and partition-count control so a 100 TB
  * media lake decodes with bounded memory per task.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String,            // "image" | "audio" | "video"
      payload: Array[Byte],    // opaque encoded bytes
      width: Int,
      height: Int,
      sample_rate: Int)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      feature: Array[Float])   // fixed-dim feature vector

  /** Build a media table from `documents` (payload = utf-8 bytes standing in
    * for encoded media — the plumbing is identical for real codecs). */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        col("text").cast("binary").as("payload"),
        (col("doc_id") % 640 + 1).cast("int").as("width"),
        (col("doc_id") % 480 + 1).cast("int").as("height"),
        lit(16000).as("sample_rate"))
      .as[MediaRecord]
  }

  /** STUB decode: a real build would call an image/audio codec here (the
    * batch shape — iterate a partition, reuse one scratch buffer — is what a
    * native decoder needs). The stub emits a deterministic 8-dim signature
    * of the payload bytes so tests can assert end-to-end plumbing.
    */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val acc = new Array[Float](8) // per-partition scratch, reused per row
      it.map { m =>
        java.util.Arrays.fill(acc, 0f)
        var i = 0
        while (i < m.payload.length) {
          acc(i % 8) += (m.payload(i) & 0xff) / 255f
          i += 1
        }
        MediaFeatures(m.media_id, m.kind, m.payload.length, acc.clone())
      }
    }
  }

  final case class Frame(
      media_id: Long,
      frame_idx: Int,
      ts_ms: Long,
      payload: Array[Byte])

  /** Frame sampling for video rows: one row per sampled frame at
    * `everyMs` spacing. The decoded-frame payload is a STUB (deterministic
    * byte slice) — real builds splice a codec here — but the explode shape,
    * schema, and timestamp math are the real plumbing: frames scale out as
    * rows, partitioned with their parent media. */
  def frameSample(
      media: Dataset[MediaRecord],
      everyMs: Long = 1000L,
      maxFrames: Int = 8): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val n = math.min(maxFrames, 1 + (m.payload.length % maxFrames))
      (0 until n).iterator.map { i =>
        val sliceLen = math.max(1, m.payload.length / math.max(n, 1))
        val from = math.min(i * sliceLen, math.max(m.payload.length - 1, 0))
        val until = math.min(from + sliceLen, m.payload.length)
        Frame(m.media_id, i, i * everyMs,
          java.util.Arrays.copyOfRange(m.payload, from, until))
      }
    }
  }

  /** Resize stub: rewrites the typed metadata (the real contract) and
    * fakes the payload transform deterministically (truncate ∝ area ratio).
    * Batch shape matches a native resizer: partition-local, buffer reuse. */
  def resize(
      media: Dataset[MediaRecord],
      newWidth: Int,
      newHeight: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val ratio =
          (newWidth.toLong * newHeight).toDouble /
            math.max(m.width.toLong * m.height, 1L)
        val newLen = math.max(1,
          math.min(m.payload.length, (m.payload.length * ratio).toInt))
        m.copy(
          width = newWidth, height = newHeight,
          payload = java.util.Arrays.copyOf(m.payload, newLen))
      }
    }
  }

  def defs: Seq[QueryDef] = Seq(
    // Binary-column metadata path — deterministic, so oracle-checked.
    QueryDef(
      "m01_binary_metadata",
      covers = "north-star multimodal",
      oracle = Some("""
        SELECT doc_id, strlen(text) AS n_bytes, md5(text) AS content_hash
        FROM documents ORDER BY doc_id"""),
      build = (s, d) =>
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            octet_length(col("text")).as("n_bytes"),
            md5(col("text").cast("binary")).as("content_hash"))
          .orderBy("doc_id")),

    // Full plumbing smoke: binary payloads → batched stub decode → per-kind
    // feature stats. Stub features aren't SQL-expressible → rows-only.
    QueryDef(
      "m02_media_features",
      covers = "north-star multimodal",
      oracle = None,
      build = (s, d) => {
        val feats: DataFrame = decodeFeatures(mediaTable(s, d)).toDF()
        feats
          .groupBy("kind")
          .agg(
            count(lit(1)).as("n"),
            sum(col("n_bytes")).as("total_bytes"),
            round(avg(element_at(col("feature"), 1)), 4).as("avg_f0"))
          .orderBy("kind")
      })
  )
}
