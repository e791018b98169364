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

  def indexes(spark: SparkSession, sfDir: String, tag: String = "warm"): Unit = {
    def warmed(what: String)(f: => Any): Unit =
      try { f; () } catch { case e: Throwable =>
        System.err.println(s"[$tag] index warm-up '$what' failed: ${e.getMessage}")
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
