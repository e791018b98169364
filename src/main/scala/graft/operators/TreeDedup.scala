package graft.operators

import graft.infer.{InferOps, InferenceClient}
import graft.pipeline.IterativeStage
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The A9 fact-dedup shape (SURVEY.md;
  * /root/reference/LLMxMapReduce_V2/evaluation/agents/atomic_facts.py:60-143):
  * claims are split into bounded groups, each group is deduplicated by an
  * inference call, then groups merge PAIRWISE (halving the group count each
  * round) until one remains — a treeAggregate whose combine step is a model
  * call.
  *
  * Spark form: group ids by `pmod(row_number, ceil(n/groupSize))`; each
  * round re-keys groups with `pmod(group_id, ceil(k/2))` so pairs of groups
  * land together, and the merge runs as one batched inference pass — the
  * loop is `log2(k)` rounds, each a single shuffle keyed by group.
  */
object TreeDedup {

  /** Deduplicate `claimCol` rows via grouped inference + pairwise halving.
    * Returns (group_id=0 rows of the final round). The client sees
    * `DEDUP|<claims joined by \n>` prompts and must return the deduplicated
    * claims, one per line. */
  def run(
      claims: DataFrame, // one string column claimCol
      claimCol: String,
      client: InferenceClient,
      groupSize: Int = 300,
      maxRounds: Int = 32): DataFrame = {
    val spark = claims.sparkSession
    import org.apache.spark.sql.expressions.Window
    val n = claims.count()
    val nGroups0 = math.max(1L, math.ceil(n.toDouble / groupSize).toLong)
    val w = Window.orderBy(claimCol)
    val grouped = claims
      .withColumn("group_id", pmod(row_number().over(w).cast("long"), lit(nGroups0)))

    def dedupGroups(df: DataFrame): DataFrame =
      InferOps.complete(
        df.groupBy("group_id")
          .agg(array_join(array_sort(collect_list(col(claimCol))), "\n").as("joined"))
          .withColumn("prompt", concat(lit("DEDUP|"), col("joined"))),
        "prompt", "reply", client)
        .select(col("group_id"),
          explode(split(col("reply"), "\n")).as(claimCol))
        .filter(length(col(claimCol)) > 0)

    var rounds = 0
    val (out, _) = IterativeStage.loop(
      dedupGroups(grouped),
      maxRounds,
      done = df => df.select("group_id").distinct().count() <= 1) { df =>
      rounds += 1
      val k = df.select("group_id").distinct().count()
      val next = math.max(1L, (k + 1) / 2)
      dedupGroups(df.withColumn("group_id", pmod(col("group_id"), lit(next))))
    }
    out.select(claimCol).distinct()
  }
}
