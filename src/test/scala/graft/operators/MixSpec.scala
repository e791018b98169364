package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Training-mix construction: quota sampling and shard packing semantics
  * beyond what the sf oracles pin (budget/coverage invariants, plan shape). */
class MixSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("quota sample keeps at most the quota per source, deterministically") {
    val q = Mix.defs.find(_.name == "x01_quota_sample").get
    val out = q.build(spark, dir)
    val perSource = out.groupBy("source").count().collect()
    assert(perSource.nonEmpty)
    assert(perSource.forall(_.getLong(1) <= 10))
    // hashed A-Res keys: a second run is byte-identical (no rand())
    assert(out.collect().toSeq == q.build(spark, dir).collect().toSeq)
  }

  test("p06 quantile gate keeps exactly its rank-target fraction per source") {
    // the property that distinguishes it from p04's absolute threshold:
    // selectivity is (n·60 + 99) div 100 of each source's SCORED docs at
    // any corpus size — the gate can never starve as scores dilute
    val docs = graft.Tables.documents(spark, dir)
    val scored = TextAnalysis.lmScoredFrame(spark, dir)
      .select("doc_id", "score_milli")
    val scoredPerSource = docs.join(scored, "doc_id")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val gatedPerSource = Pipelines.quantileGate(docs, scored, pct = 60)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gatedPerSource.keySet == scoredPerSource.keySet,
      "every source with scored docs must survive the gate")
    gatedPerSource.foreach { case (src, n) =>
      val want = (scoredPerSource(src) * 60 + 99) / 100
      assert(n == want, s"source $src: gate kept $n, rank target is $want")
    }
  }

  test("shard manifest covers every document exactly once per source") {
    val q = Mix.defs.find(_.name == "x02_shard_manifest").get
    val out = q.build(spark, dir).collect()
    val docTotal = graft.Tables.documents(spark, dir).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == docTotal)
    // shards are consecutive from 0 within each source (greedy running sum)
    out.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      val shards = rows.map(_.getAs[Long]("shard")).sorted.toSeq
      assert(shards == (0L until shards.length.toLong),
        s"source $src shards not consecutive: $shards")
    }
  }

  test("split assignment is a pure function of doc_id (re-ingest stable)") {
    import spark.implicits._
    // the same hash thresholds, computed directly per doc
    val u = (col("doc_id") * lit(2654435761L)) % lit(4294967296L) /
      lit(4294967296.0)
    val full = graft.Tables.documents(spark, dir)
      .withColumn("split",
        when(u < 0.8, lit("train")).when(u < 0.9, lit("val"))
          .otherwise(lit("test")))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // drop half the corpus: every surviving doc keeps its split
    val half = graft.Tables.documents(spark, dir)
      .filter(col("doc_id") % 2 === 0)
      .withColumn("split",
        when(u < 0.8, lit("train")).when(u < 0.9, lit("val"))
          .otherwise(lit("test")))
      .select("doc_id", "split").as[(Long, String)].collect()
    assert(half.nonEmpty)
    half.foreach { case (id, s) => assert(full(id) == s) }
    // all three splits occur, train dominates
    val counts = full.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
  }

  test("mix weights are a probability distribution upweighting small sources") {
    val q = Mix.defs.find(_.name == "x04_mix_weights").get
    val rows = q.build(spark, dir).collect()
    val ps = rows.map(_.getAs[Double]("p_sample"))
    assert(math.abs(ps.sum - 1.0) < 1e-4)
    // α < 1: sampling probability per doc is HIGHER for smaller sources
    val byN = rows.map(r =>
      r.getAs[Long]("n_docs") -> r.getAs[Double]("p_sample"))
    for ((na, pa) <- byN; (nb, pb) <- byN if na < nb)
      assert(pa / na > pb / nb * 0.999,
        s"per-doc probability not favoring small source: ($na,$pa) ($nb,$pb)")
  }

  test("writeShards materializes the layout the manifest query plans") {
    val out = java.nio.file.Files.createTempDirectory("graft_shards_").toString
    val written = Mix.writeShards(spark, dir, out)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val planned = Mix.defs.find(_.name == "x02_shard_manifest").get
      .build(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(written == planned,
      s"written layout differs from planned manifest")
    // the layout is real partition directories a loader can list
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
    assert(dirs.nonEmpty && dirs.forall(_.getName.startsWith("source=")))
  }

  test("sequence packing is a contiguous concat-and-chunk per reader stream") {
    val q = Mix.defs.find(_.name == "x06_sequence_pack").get
    val out = q.build(spark, dir).collect()
    val docTotal = graft.Tables.documents(spark, dir).count()
    assert(out.length.toLong == docTotal) // every doc packed exactly once
    // offsets live inside a sequence; end never precedes start
    out.foreach { r =>
      val (so, eo) = (r.getAs[Long]("start_off"), r.getAs[Long]("end_off"))
      assert(so >= 0 && so < 256 && eo >= 0 && eo < 256)
      val (ss, es) = (r.getAs[Long]("start_seq"), r.getAs[Long]("end_seq"))
      assert(es > ss || (es == ss && eo >= so))
    }
    // within each (source, reader) stream the token stream is gapless:
    // doc n starts exactly one token after doc n-1 ends
    out.groupBy(r => (r.getAs[String]("source"), r.getAs[Int]("reader")))
      .foreach { case (_, rows) =>
        val ordered = rows.sortBy(_.getAs[Long]("doc_id"))
        ordered.sliding(2).foreach {
          case Array(a, b) =>
            val aEnd = a.getAs[Long]("end_seq") * 256 + a.getAs[Long]("end_off")
            val bStart =
              b.getAs[Long]("start_seq") * 256 + b.getAs[Long]("start_off")
            assert(bStart == aEnd + 1, s"gap between docs: $a -> $b")
          case _ => ()
        }
      }
    // the op is concat-and-chunk, not whole-doc binning: some document
    // actually straddles a 256-token boundary
    assert(out.exists(r =>
      r.getAs[Long]("end_seq") > r.getAs[Long]("start_seq")))
  }

  test("temperature resampling meets its targets within the threshold's ±1") {
    val q = Mix.defs.find(_.name == "x07_temperature_sample").get
    val rows = q.build(spark, dir).collect()
    assert(rows.nonEmpty)
    val nTotal = rows.map(_.getAs[Long]("n_docs")).sum
    rows.foreach { r =>
      val (n, target) = (r.getAs[Long]("n_docs"), r.getAs[Long]("target"))
      val (rep, frac) =
        (r.getAs[Long]("repeat_full"), r.getAs[Long]("n_frac"))
      assert(r.getAs[Long]("n_emitted") == rep * n + frac)
      assert(rep == target / n)
      // fractional epoch: hash-threshold selection from n docs never emits
      // more than the epoch's pool
      assert(frac >= 0 && frac <= n)
    }
    // α < 1 upweights small sources: smallest source is repeated at least
    // as many times per doc as the largest
    val smallest = rows.minBy(_.getAs[Long]("n_docs"))
    val largest = rows.maxBy(_.getAs[Long]("n_docs"))
    val perDoc = (r: org.apache.spark.sql.Row) =>
      r.getAs[Long]("n_emitted").toDouble / r.getAs[Long]("n_docs")
    assert(perDoc(smallest) >= perDoc(largest) * 0.999)
    // overall volume lands near N (each floor loses < 1 row per source)
    val emitted = rows.map(_.getAs[Long]("n_emitted")).sum
    assert(math.abs(emitted - nTotal) <= nTotal / 5,
      s"resampled volume $emitted far from corpus size $nTotal")
  }

  test("cluster pruning keeps a bounded per-cluster budget of best docs") {
    val q = graft.QueryDef.all.find(_.name == "x08_cluster_prune").get
    val out = q.build(spark, dir).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Int]("cell")).foreach { case (_, rows) =>
      assert(rows.length <= 8)
      // kept docs are ranked by quality (n_chars desc, doc_id asc)
      val ordered = rows.sortBy(_.getAs[Int]("rn"))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          val (qa, qb) = (a.getAs[Long]("n_chars"), b.getAs[Long]("n_chars"))
          assert(qa > qb ||
            (qa == qb && a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id")))
        case _ => ()
      }
      // a cluster never keeps more docs than it has
      assert(rows.length <= rows.head.getAs[Long]("csize"))
    }
    // every corpus embedding is accounted to exactly one cluster
    val popTotal = out.groupBy(_.getAs[Int]("cell"))
      .map(_._2.head.getAs[Long]("csize")).sum
    assert(popTotal == graft.Tables.embeddings(spark, dir).count())
  }

  test("importance scores rank target-language docs above the rest") {
    val q = Mix.defs.find(_.name == "x09_importance_resample").get
    val out = q.build(spark, dir).collect()
    assert(out.nonEmpty && out.length <= 50)
    // rn is dense from 1 in (score_milli desc, doc_id) order
    val ordered = out.sortBy(_.getAs[Long]("rn"))
    assert(ordered.map(_.getAs[Long]("rn")).toSeq ==
      (1L to out.length.toLong))
    ordered.sliding(2).foreach {
      case Array(a, b) =>
        val (sa, sb) =
          (a.getAs[Long]("score_milli"), b.getAs[Long]("score_milli"))
        assert(sa > sb ||
          (sa == sb && a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id")))
      case _ => ()
    }
    // the importance weights are trained toward lang='en': the top slice
    // must be en-enriched relative to the corpus base rate
    val topEn = out.count(_.getAs[String]("lang") == "en").toDouble / out.length
    val docs = graft.Tables.documents(spark, dir)
    val baseEn = docs.filter(col("lang") === "en").count().toDouble /
      docs.count()
    assert(topEn > baseEn,
      s"top-50 en share $topEn not above corpus base rate $baseEn")
  }

  test("shard totals respect the greedy budget bound") {
    // greedy running-sum packing: a shard's total can exceed the budget by
    // at most its final document (the one that crossed the boundary), so
    // every shard except a source's last must end at-or-past the budget
    // line while starting under it — equivalently, total_tokens < 512 + the
    // max single-doc token count of that source
    val q = Mix.defs.find(_.name == "x02_shard_manifest").get
    val out = q.build(spark, dir)
    val maxDoc = graft.Tables.documents(spark, dir)
      .select(max(size(split(col("text"), " ")))).head().getInt(0)
    val over = out.filter(col("total_tokens") >= lit(512 + maxDoc)).count()
    assert(over == 0)
  }
}
