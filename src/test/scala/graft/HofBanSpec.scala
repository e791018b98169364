package graft

import org.apache.spark.sql.catalyst.expressions.HigherOrderFunction
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.Exchange

/** The interpreted-HOF hot-path ban as a test (VERDICT r12 #6): t06's
  * "compute floor" adjudication hid a 2.4× win because its projection ran
  * `transform(sequence(...))` n-gram arrays — interpreted per element —
  * on the SCAN PATH, below the first exchange, where every corpus row pays
  * it. This spec walks every declared query's pre-AQE physical plan and
  * fails if a HigherOrderFunction expression appears in a scan-side node
  * (no Exchange beneath it) outside the adjudicated whitelist, so the t06
  * class can't regress silently.
  *
  * Post-aggregation HOFs (the V2Pipeline `transform(array_sort(
  * collect_list(...)))` sites) sit ABOVE an exchange and are excluded by
  * construction — the scope IS the rule: below the first exchange, per-row
  * work must be codegen (kernels: HashKernels, Bpe, LmKernel, ArrayMath,
  * RepetitionKernel).
  */
class HofBanSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  /** Adjudicated scan-side sites (round-13 audit, SCALE.md): sites where
    * the HOF's per-row work is bounded or its output strings ARE
    * downstream keys, so a kernel rewrite has no t06-style win to claim.
    * Keys are query names; values document the adjudication. */
  private val whitelist: Map[String, String] = Map(
    "d12_span_dedup" ->
      ("span STRINGS are the md5 group keys AND the clean-text output — " +
        "the allocation is the semantics, not HOF overhead (t14's " +
        "strings-are-keys class); spans are 10-token bounded"),
    "s04_ann_ivf_topk" ->
      ("array_sort over the FIXED coarse-centroid array (≤64 structs) on " +
        "the 10-row memoized query frame — bounded, once per build"),
    "s05_ann_recall_ivf" -> "same site as s04 (shared pqIndexSampled)",
    "s09_ann_ivfpq_topk" -> "same site as s04 (shared pqIndexSampled)",
    "s06_quantized_topk" ->
      ("the quantized VECTOR is data — every downstream dot consumes the " +
        "array, so the transform's output must materialize; 64 floats, " +
        "once per vector, never per pair"),
    "t14_lm_quality" ->
      ("bigram STRINGS are the LM model join keys (lmScoredFrameRaw) — " +
        "SCALE.md §fourth sweep adjudication: no kernel win available " +
        "when the strings must exist"),
    "p04_training_mix_pipeline" ->
      "pays the t14 LM frame build at first use per pass (same site)",
    "p06_quantile_mix_pipeline" -> "rides p04's LM frame (same site)",
    "e05_fact_density" ->
      ("sentence/fact extraction on the 5-survey × 4-paper eval harness — " +
        "row count is FIXED at any SF, the e-family's bounded posture"),
  )

  private def scanSideHofs(p: SparkPlan): Seq[String] = {
    // The boundary is the first KEYED shuffle (hash/range partitioning):
    // after it, row counts are post-aggregation/post-join-key shapes. A
    // RoundRobinPartitioning rebalance (Tables.documents spreads the
    // single-file corpus this way) and a BroadcastExchange (dim side of a
    // broadcast join) leave the streamed side's per-corpus-row semantics
    // intact — a HOF above them still runs once per corpus row, so they
    // are transparent to the scan-path scope.
    def hasExchange(n: SparkPlan): Boolean =
      n.collectFirst {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if !e.outputPartitioning.isInstanceOf[
              org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning] => e
      }.isDefined
    def isAgg(n: SparkPlan): Boolean =
      n.nodeName.contains("Aggregate")
    p.collect {
      // scan-side = nothing BENEATH this node shuffled yet: its expressions
      // run on unshuffled corpus rows. Includes the first Exchange itself
      // (its partitioning keys evaluate pre-shuffle); excludes everything
      // above the first shuffle. Aggregate nodes are excluded: their HOF
      // result expressions run per GROUP on collected arrays — the
      // adjudicated post-aggregation class (V2Pipeline's transform-over-
      // collect_list sites), which can sit directly above a checkpoint-
      // backed scan whose exchange happened before the checkpoint.
      case node if !isAgg(node) && node.children.forall(c => !hasExchange(c)) =>
        node.expressions.flatMap(_.collect {
          case h: HigherOrderFunction => s"${node.nodeName}: ${h.prettyName}"
        })
    }.flatten.distinct
  }

  test("no declared query runs an interpreted HOF below its first exchange") {
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    val skipped = scala.collection.mutable.ListBuffer.empty[String]
    val unneeded = scala.collection.mutable.ListBuffer.empty[String]
    // The 132 plan builds are independent driver-side analysis; run them
    // on a small pool (guide §2.6) — this audit alone was 1 min 56 s of
    // the suite wall run sequentially (artifacts/r15/test_profile_r15.log).
    // ResultMemo.bypass is THREAD-LOCAL, so it wraps each task, not the
    // loop; result buffers are appended under their own lock. Same 132
    // builds, same assertions.
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val futures = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      Future {
        operators.ResultMemo.bypass {
          try {
            val df = fn(spark, dir)
            val hofs = scanSideHofs(df.queryExecution.sparkPlan)
            if (hofs.nonEmpty && !whitelist.contains(name))
              offenders.synchronized {
                offenders += s"$name -> ${hofs.mkString("; ")}" }
            if (hofs.isEmpty && whitelist.contains(name))
              unneeded.synchronized { unneeded += name }
          } catch {
            // a query whose BUILD fails is the oracle gate's problem, not
            // this plan audit's — record and move on so one env hiccup
            // doesn't mask real offenders elsewhere
            case e: Throwable => skipped.synchronized {
              skipped += s"$name (${e.getClass.getSimpleName})" }
          }
        }
      }
    }
    try futures.foreach(f => Await.result(f, Duration.Inf))
    finally pool.shutdown()
    unneeded.foreach(n =>
      info(s"whitelist entry $n no longer needed (no scan-side HOF)"))
    if (skipped.nonEmpty) info(s"builds skipped: ${skipped.mkString(", ")}")
    // Skips must be NAMED, like the HOF whitelist — the old blanket "≤3"
    // tolerance would let a refactor that breaks exactly 1-3 query builds
    // pass this spec while silently shrinking the audit's coverage
    // (VERDICT r13 #3). Every declared query builds at HEAD, so the list
    // is empty; an environment-specific build failure goes here BY NAME
    // with its adjudication, never as a count allowance.
    val allowedBuildSkips: Set[String] = Set.empty
    val unexpected =
      skipped.filterNot(s => allowedBuildSkips.exists(s.startsWith))
    assert(unexpected.isEmpty,
      "query build(s) failed inside the HOF audit — the audit no longer " +
        "covers them; fix the build or name it in allowedBuildSkips with " +
        s"an adjudication: ${unexpected.mkString(", ")}")
    assert(offenders.isEmpty,
      "interpreted HOF on the scan path (the t06 class) — rewrite as a " +
        s"codegen kernel or adjudicate + whitelist:\n${offenders.mkString("\n")}")
  }
}
