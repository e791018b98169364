package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Multimodal plumbing: opaque binary payloads + typed metadata through
  * batched partition-local transforms. Codecs are stubs; schemas, explode
  * shapes, and determinism are the real contract under test. */
class MultimodalSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("media table carries binary payloads with typed metadata") {
    val media = Multimodal.mediaTable(spark, dir)
    val df = media.toDF()
    assert(df.schema("payload").dataType.typeName == "binary")
    assert(df.count() > 0)
    assert(df.select("kind").distinct().count() == 3)
  }

  test("decodeFeatures emits fixed-dim features per record (stub decode)") {
    val media = Multimodal.mediaTable(spark, dir)
    val feats = Multimodal.decodeFeatures(media)
    val rows = feats.collect()
    assert(rows.length == media.count())
    assert(rows.forall(_.feature.length == 8))
    // deterministic: same input -> same features
    val again = Multimodal.decodeFeatures(media).collect()
    assert(rows.map(_.feature.toSeq).toSeq == again.map(_.feature.toSeq).toSeq)
  }

  test("frameSample explodes video rows into timestamped frames") {
    val media = Multimodal.mediaTable(spark, dir)
    val frames = Multimodal.frameSample(media, everyMs = 500L)
    val df = frames.toDF()
    val nVideos = media.filter(col("kind") === "video").count()
    assert(df.count() >= nVideos) // ≥1 frame per video
    assert(df.columns.toSet == Set("media_id", "frame_idx", "ts_ms", "payload"))
    val one = frames.filter(_.media_id >= 0).head()
    assert(one.ts_ms == one.frame_idx * 500L)
    assert(one.payload.nonEmpty)
    // frames only from videos
    assert(df.select("media_id").distinct().count() <= nVideos)
  }

  test("resize rewrites metadata and shrinks payloads proportionally") {
    val media = Multimodal.mediaTable(spark, dir)
    val resized = Multimodal.resize(media, 64, 48)
    val joined = media.toDF().select(col("media_id"),
        length(col("payload")).as("len0"))
      .join(resized.toDF().select(col("media_id"), col("width"),
        col("height"), length(col("payload")).as("len1")), "media_id")
    assert(joined.filter(col("width") =!= 64 || col("height") =!= 48).count() == 0)
    assert(joined.filter(col("len1") > col("len0")).count() == 0)
  }
}
