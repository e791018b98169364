package graft

import org.apache.spark.sql.SparkSession

/** The untimed build of every PERSISTED ARTIFACT a deployment maintains
  * next to the corpus rather than rebuilding per query — shared by the
  * bench and the scale bench so the two can never drift apart on what
  * counts as a warm index (the r5 regression class: a silently missing
  * warm is indistinguishable from a slow engine):
  *
  * - bucketed-lake layout (q35 times the Exchange-free join);
  * - media payload synthesis (the media lake exists at scale; m02 times
  *   the DECODE operator);
  * - the per-modality fingerprint indexes (maintained at ingest — m06s
  *   is the image ingest path; m03/m04/m05 time the banding DEDUP);
  * - the MinHash signature frame (d03/d06/d08/p03) and vocabulary
  *   (q44/t08/t09) corpus indexes;
  * - the trained BPE rank table (t11 emits it, t12 consumes it);
  * - the bigram LM (t14s's broadcast model) — but NOT the per-doc LM
  *   score frame: t14 times the raw scoring path and p04's gate pays the
  *   memoized frame's build at first use (ADVICE r8 — pre-building it
  *   made t14's published time a checkpoint read while its DuckDB oracle
  *   scored inline);
  * - the PQ index pairs (corpus codes + query ADC tables), sampled AND
  *   trained codebooks — the FAISS artifacts s07/s09/s10 read.
  *
  * A failed artifact build must not kill the run, but it must be LOUD:
  * its consumers then carry the bootstrap inside their timed runs.
  */
object Warm {

  /** Which queries READ each artifact — a SUBSET bench (ScaleBench) only
    * builds the artifacts its timed subset consumes. Generous supersets
    * are safe (an unused warm costs untimed time, never honesty);
    * UNDER-listing a consumer is the r5 regression class (its timed run
    * silently pays the bootstrap), so when adding a query that reads a
    * persisted artifact, add it here. The full bench passes `only` empty
    * and builds everything, as before. */
  private val consumers: Map[String, Set[String]] = Map(
    "lake layout" -> Set("q35_bucketed_colocated_join", "q42_zorder_scan",
      "q48_compaction"),
    "media table" -> Set("m01_binary_metadata", "m02_media_features",
      "m03_image_phash_dedup", "m04_audio_afp_dedup",
      "m05_video_phash_dedup", "m06s_stream_phash_index", "m07_thumbnail",
      "p05_media_curation"),
    "phash index" -> Set("m03_image_phash_dedup", "m06s_stream_phash_index",
      "p05_media_curation"),
    "afp index" -> Set("m04_audio_afp_dedup"),
    "vhash index" -> Set("m05_video_phash_dedup"),
    "signature index" -> Set("d03_minhash_lsh", "d06_minhash_verified",
      "d08_decontaminate", "d14s_stream_sig_index", "d15_delta_dedup",
      "p03_corpus_curation"),
    "vocab index" -> Set("t08_vocab_topk", "t09_token_rarity",
      "t10_bm25_keywords", "q44_heavy_hitters_cms"),
    "bpe merges" -> Set("t11_bpe_train", "t12_bpe_apply",
      "t13s_stream_token_monitor"),
    "bigram lm" -> Set("t14_lm_quality", "t14s_stream_lm_gate",
      "p04_training_mix_pipeline", "p06_quantile_mix_pipeline"),
    "pq index" -> Set("s06_quantized_topk", "s07_ann_pq_topk",
      "s08_ann_recall_pq", "s09_ann_ivfpq_topk",
      "s10_ann_pq_trained_recall"),
  )

  /** Every warm-up step's label, for the spec that pins labels ==
    * consumers.keySet (so a new artifact can't silently lose its warm
    * under ScaleBench subsets, or fall into the unconditional-warm
    * fallback above). */
  private[graft] val labels: Seq[String] = Seq(
    "lake layout", "media table", "phash index", "afp index", "vhash index",
    "signature index", "vocab index", "bpe merges", "bigram lm", "pq index")

  private[graft] def consumerKeys: Set[String] = consumers.keySet

  def indexes(spark: SparkSession, sfDir: String, tag: String = "warm",
      only: Set[String] = Set.empty): Unit = {
    def warmed(what: String)(f: => Any): Unit = {
      // getOrElse, not apply (ADVICE r11): a warmed() label with no
      // consumers entry must not throw and kill the whole warm-up — warm
      // it unconditionally instead (an extra warm costs untimed time,
      // never honesty) and complain loudly so the map gets fixed.
      val who = consumers.getOrElse(what, {
        System.err.println(s"[$tag] index warm-up '$what' has no " +
          "Warm.consumers entry — warming unconditionally; add it to the map")
        Set.empty[String]
      })
      if (only.isEmpty || who.isEmpty || who.exists(only.contains))
        try { f; () } catch { case e: Throwable =>
          System.err.println(s"[$tag] index warm-up '$what' failed: ${e.getMessage}")
        }
    }
    warmed("lake layout")(operators.Lake.warmLayout(spark, sfDir))
    warmed("media table")(operators.Multimodal.mediaTable(spark, sfDir).count())
    warmed("phash index")(operators.Multimodal.phashFrame(spark, sfDir).count())
    warmed("afp index")(operators.Multimodal.afpFrame(spark, sfDir).count())
    warmed("vhash index")(operators.Multimodal.vhashFrame(spark, sfDir).count())
    warmed("signature index")(operators.Dedup.warmSignatureIndex(spark, sfDir))
    warmed("vocab index")(operators.TextAnalysis.warmVocabIndex(spark, sfDir))
    warmed("bpe merges")(operators.Tokenize.trainMerges(spark, sfDir))
    warmed("bigram lm")(operators.TextAnalysis.lmModelBroadcast(spark, sfDir))
    warmed("pq index")(operators.Similarity.warmPqIndex(spark, sfDir))
  }
}
