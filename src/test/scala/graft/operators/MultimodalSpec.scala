package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Multimodal plumbing: opaque binary payloads + typed metadata through
  * batched partition-local transforms. Image rows carry real PNGs (encode,
  * decode, and resize run through javax.imageio); audio rows carry real
  * RIFF/PCM16 WAVs (decoded through javax.sound.sampled); video decode
  * stays a deterministic seam. Schemas, explode shapes, and determinism
  * are the contract under test. */
class MultimodalSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("audio payloads are real WAVs whose decoded format matches metadata") {
    val audios = Multimodal.mediaTable(spark, dir)
      .filter(_.kind == "audio").collect()
    assert(audios.nonEmpty)
    audios.foreach { m =>
      assert(new String(m.payload.take(4), "US-ASCII") == "RIFF")
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(m.payload))
      assert(ais.getFormat.getSampleRate == m.sample_rate.toFloat)
      assert(ais.getFormat.getSampleSizeInBits == 16)
      ais.close()
    }
  }

  test("audio features are real waveform statistics") {
    val media = Multimodal.mediaTable(spark, dir).filter(_.kind == "audio")
    val feats = Multimodal.decodeFeatures(media).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val Array(n, sr, rms, peak, zcr, mean, mn, mx) = f.feature
      assert(n > 0 && sr == 16000f)
      // a sine-mix waveform: substantial energy, bounded by its peak
      assert(rms > 0.1f && rms <= peak && peak <= 1f)
      assert(zcr > 0f && zcr < 1f)
      assert(mn <= mean && mean <= mx)
      // clips truncate mid-period (down to 1/4 wave), so the mean is only
      // loosely centered — but DC offset stays well under the signal level
      assert(math.abs(mean) < 0.5f && math.abs(mean) < peak)
    }
  }

  test("image payloads are real PNGs whose decoded dims match the metadata") {
    val images = Multimodal.mediaTable(spark, dir)
      .filter(_.kind == "image").collect()
    assert(images.nonEmpty)
    images.foreach { m =>
      // PNG magic bytes
      assert((m.payload(0) & 0xff) == 0x89 && m.payload(1) == 'P'.toByte)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(m.payload))
      assert(img.getWidth == m.width && img.getHeight == m.height)
    }
  }

  test("image features are real pixel statistics") {
    val media = Multimodal.mediaTable(spark, dir).filter(_.kind == "image")
    val feats = Multimodal.decodeFeatures(media).collect()
    val byId = media.collect().map(m => m.media_id -> m).toMap
    feats.foreach { f =>
      val m = byId(f.media_id)
      assert(f.feature(0) == m.width.toFloat &&
        f.feature(1) == m.height.toFloat)
      // channel means and luminances land in [0,1], min ≤ mean ≤ max
      (2 until 8).foreach(i =>
        assert(f.feature(i) >= 0f && f.feature(i) <= 1f))
      assert(f.feature(6) <= f.feature(5) && f.feature(5) <= f.feature(7))
    }
  }

  test("media table carries binary payloads with typed metadata") {
    val media = Multimodal.mediaTable(spark, dir)
    val df = media.toDF()
    assert(df.schema("payload").dataType.typeName == "binary")
    assert(df.count() > 0)
    assert(df.select("kind").distinct().count() == 3)
  }

  test("decodeFeatures emits fixed-dim features per record, deterministically") {
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

  test("dhash: equal images hash equal, perturbed ones land within bits, " +
    "unrelated ones far") {
    // the synthetic pixel pattern has period 256 in id and the dims period
    // divides 768, so ids 768 apart produce IDENTICAL images — the dup
    // families m03 finds at sf0.1
    val a = Multimodal.dhash64(Multimodal.synthImage(5, 16, 12))
    val b = Multimodal.dhash64(Multimodal.synthImage(5 + 768, 16, 12))
    assert(a == b)
    // small perturbation: a few pixels nudged -> within the ≤6-bit gate
    val img = Multimodal.synthImage(5, 16, 12)
    val rgb = img.getRGB(3, 3)
    img.setRGB(3, 3, rgb ^ 0x040404)
    val h2 = Multimodal.dhash64(img)
    assert(java.lang.Long.bitCount(a ^ h2) <= 6,
      s"perturbed hamming ${java.lang.Long.bitCount(a ^ h2)}")
    // unrelated image: well past the gate
    val c = Multimodal.dhash64(Multimodal.synthImage(6, 16, 12))
    assert(java.lang.Long.bitCount(a ^ c) > 6,
      s"unrelated hamming ${java.lang.Long.bitCount(a ^ c)}")
  }

  test("m03 emits one well-formed decision per image") {
    // the synthetic images are striped gradients — a corpus RICH in true
    // perceptual near-dups — so components merge even at sf0.001; assert
    // the decision structure, not singleton-ness
    val q = Multimodal.defs.find(_.name == "m03_image_phash_dedup").get
    val out = q.build(spark, dir).collect()
    val nImages = Multimodal.mediaTable(spark, dir)
      .filter(_.kind == "image").count()
    assert(out.length == nImages)
    val byId = out.map(r => r.getAs[Long]("media_id") -> r).toMap
    out.foreach { r =>
      val (id, comp, keep) = (r.getAs[Long]("media_id"),
        r.getAs[Long]("component"), r.getAs[Int]("keep"))
      // representative = component min, kept exactly when representative
      assert(comp <= id)
      assert(keep == (if (comp == id) 1 else 0))
      // every dropped image points at a kept representative
      if (keep == 0) assert(byId(comp).getAs[Int]("keep") == 1)
    }
    // identical hashes always share a component (exact dups never split)
    out.groupBy(_.getAs[Long]("dhash")).values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("component")).distinct.length == 1)
    }
    // and some image survives
    assert(out.exists(_.getAs[Int]("keep") == 1))
  }

  test("decodeWavSamples: roundtrips PCM16 mono and rejects non-16-bit") {
    // encodeWav writes (v * 32767).toShort; decode must return s / 32768
    val wav = Multimodal.encodeWav(13L)
    val samples = Multimodal.decodeWavSamples(wav)
    assert(samples.length == (13L % 320 + 80).toInt)
    assert(samples.forall(s => s >= -1f && s <= 1f))
    val expect0 = ((0.6 * math.sin(0) + 0.3 * math.sin(0)) * 32767.0)
      .toShort / 32768f
    assert(samples(0) == expect0)
    // an 8-bit WAV must fail loudly, never silently misdecode
    val eight = wav.clone()
    eight(34) = 8 // bits-per-sample field of the canonical 44-byte header
    eight(32) = 1 // block align = 1 byte/frame
    assertThrows[IllegalArgumentException] {
      Multimodal.decodeWavSamples(eight)
    }
  }

  test("afp64: deterministic, near-dup tolerant, Nyquist-guarded") {
    val a = Multimodal.afp64Wav(Multimodal.encodeWav(13L))
    assert(a == Multimodal.afp64Wav(Multimodal.encodeWav(13L)))
    // near-dup: same waveform, mildly rescaled + dithered (same length —
    // at these ~10 ms clip lengths a LENGTH change is under-resolved by
    // design, see the docstring caveat)
    val samples = Multimodal.decodeWavSamples(Multimodal.encodeWav(13L))
    val perturbed = samples.zipWithIndex.map { case (s, i) =>
      s * 0.9f + (if (i % 7 == 0) 1e-4f else -1e-4f) }
    val near = Multimodal.afp64(perturbed, 16000f)
    assert(java.lang.Long.bitCount(a ^ near) <= 6,
      s"near-dup hamming ${java.lang.Long.bitCount(a ^ near)}")
    // unrelated pitch: well past the gate
    val other = Multimodal.afp64Wav(Multimodal.encodeWav(133L))
    assert(java.lang.Long.bitCount(a ^ other) > 6,
      s"unrelated hamming ${java.lang.Long.bitCount(a ^ other)}")
    // sub-6kHz rates alias the top bands -> rejected
    assertThrows[IllegalArgumentException] {
      Multimodal.afp64(Array(0f, 0.5f, -0.5f), 4000f)
    }
  }

  test("m04 decisions are structurally sound and pin to the fixture shape") {
    val q = Multimodal.defs.find(_.name == "m04_audio_afp_dedup").get
    val out = q.build(spark, dir).collect()
    val nAudio = Multimodal.mediaTable(spark, dir)
      .filter(_.kind == "audio").count()
    assert(out.length == nAudio)
    val byId = out.map(r => r.getAs[Long]("media_id") -> r).toMap
    out.foreach { r =>
      val (id, comp, keep) = (r.getAs[Long]("media_id"),
        r.getAs[Long]("component"), r.getAs[Int]("keep"))
      assert(comp <= id)
      assert(keep == (if (comp == id) 1 else 0))
      if (keep == 0) assert(byId(comp).getAs[Int]("keep") == 1)
    }
    assert(out.exists(_.getAs[Int]("keep") == 1))
  }

  test("m05: majority fingerprint is order-invariant, near-dup tolerant") {
    import spark.implicits._
    def clip(id: Long, frames: Seq[java.awt.image.BufferedImage]) =
      Multimodal.MediaRecord(id, "video",
        AviMjpeg.encode(16, 12, 4, frames), 16, 12, 0)
    def fingerprint(frames: Seq[java.awt.image.BufferedImage]): Long =
      Multimodal.videoPhashDedup(Seq(clip(1L, frames)).toDS(), 6)
        .collect().head.getAs[Long]("dhash")
    val base = (0 until 5).map(i => Multimodal.synthImage(100L + i, 16, 12))
    // frame ORDER must not matter: majority is a commutative aggregate
    assert(fingerprint(base) == fingerprint(base.reverse))
    // a one-pixel nudge in every frame: per-frame hashes move a few bits,
    // the majority moves at most that far
    val perturbed = (0 until 5).map { i =>
      val img = Multimodal.synthImage(100L + i, 16, 12)
      img.setRGB(3, 3, img.getRGB(3, 3) ^ 0x040404)
      img
    }
    val d = java.lang.Long.bitCount(fingerprint(base) ^ fingerprint(perturbed))
    assert(d <= 6, s"perturbed-clip hamming $d")
    // unrelated frames: far past the gate
    val other = (0 until 5).map(i => Multimodal.synthImage(7000L + i, 16, 12))
    val du = java.lang.Long.bitCount(fingerprint(base) ^ fingerprint(other))
    assert(du > 6, s"unrelated-clip hamming $du")
    // identical fingerprints collapse to one kept representative
    val out = Multimodal.videoPhashDedup(
      Seq(clip(10L, base), clip(11L, base.reverse), clip(12L, other))
        .toDS(), 6)
      .collect().sortBy(_.getAs[Long]("media_id"))
    assert(out.map(_.getAs[Long]("component")).toSeq == Seq(10L, 10L, 12L))
    assert(out.map(_.getAs[Int]("keep")).toSeq == Seq(1, 0, 1))
  }

  test("m05 decisions over the sf corpus are structurally sound") {
    val q = Multimodal.defs.find(_.name == "m05_video_phash_dedup").get
    val out = q.build(spark, dir).collect()
    val nVideo = Multimodal.mediaTable(spark, dir)
      .filter(_.kind == "video").count()
    assert(out.length == nVideo)
    val byId = out.map(r => r.getAs[Long]("media_id") -> r).toMap
    out.foreach { r =>
      val (id, comp, keep) = (r.getAs[Long]("media_id"),
        r.getAs[Long]("component"), r.getAs[Int]("keep"))
      assert(comp <= id)
      assert(keep == (if (comp == id) 1 else 0))
      if (keep == 0) assert(byId(comp).getAs[Int]("keep") == 1)
    }
  }

  test("m06s: streamed phash index equals the batch decode pass") {
    import spark.implicits._
    val q = graft.streaming.StreamQueries.defs
      .find(_.name == "m06s_stream_phash_index").get
    val streamed = q.build(spark, dir).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("dhash"))).toSeq
    val batch = Multimodal.mediaTable(spark, dir)
      .filter(_.kind == "image")
      .map(m => (m.media_id, Multimodal.dhash64(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(m.payload)))))
      .collect().sortBy(_._1).toSeq
    assert(streamed == batch)
  }

  test("resize rewrites metadata; images re-encode at the new dims") {
    val media = Multimodal.mediaTable(spark, dir)
    val resized = Multimodal.resize(media, 64, 48)
    assert(resized.toDF()
      .filter(col("width") =!= 64 || col("height") =!= 48).count() == 0)
    // images: the payload is a real PNG at the NEW dimensions
    resized.filter(_.kind == "image").take(5).foreach { m =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(m.payload))
      assert(img.getWidth == 64 && img.getHeight == 48)
    }
    // non-image: truncation seam never grows the payload
    val joined = media.toDF().select(col("media_id"), col("kind"),
        length(col("payload")).as("len0"))
      .join(resized.toDF().select(col("media_id"),
        length(col("payload")).as("len1")), "media_id")
    assert(joined.filter(col("kind") =!= "image")
      .filter(col("len1") > col("len0")).count() == 0)
  }

  test("m07 thumbnails cover every image at the target dims with " +
      "content-dependent pixel hashes") {
    val q = Multimodal.defs.find(_.name == "m07_thumbnail").get
    val out = q.build(spark, dir).collect()
    val nImages = Multimodal.mediaTable(spark, dir)
      .filter(_.kind == "image").count()
    assert(out.length == nImages)
    assert(out.forall(r =>
      r.getAs[Int]("width") == 16 && r.getAs[Int]("height") == 12))
    // hashes discriminate content (not a constant of the dims)
    assert(out.map(_.getAs[String]("pix_md5")).distinct.length > 1)
  }

  test("p05 media curation: deduped, gated, at most 10 kept per source") {
    val q = Multimodal.defs.find(_.name == "p05_media_curation").get
    val out = q.build(spark, dir).collect()
    assert(out.nonEmpty)
    // quota: rk is 1..10 and contiguous per source
    val bySource = out.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (src, rows) =>
      val rks = rows.map(_.getAs[Int]("rk")).sorted
      assert(rks.head == 1 && rks.last == rks.length && rks.length <= 10,
        s"$src quota ranks: ${rks.mkString(",")}")
    }
    // gate: every surviving image clears the pixel floor, and the pixel
    // count matches the deterministic synthesis dims
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val px = (id % 24 + 8) * (id % 16 + 8)
      assert(r.getAs[Long]("pixels") == px && px >= 200)
    }
    // dedup: only keep=1 representatives survive into the quota
    val kept = Multimodal.defs.find(_.name == "m03_image_phash_dedup").get
      .build(spark, dir).filter(col("keep") === 1)
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(out.forall(r => kept(r.getAs[Long]("doc_id"))))
  }
}
