package graft.operators

import graft.infer.{InferOps, InferenceClient}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The A9 fact-dedup shape (SURVEY.md;
  * /root/reference/LLMxMapReduce_V2/evaluation/agents/atomic_facts.py:60-143):
  * claims are split into bounded groups, each group is deduplicated by an
  * inference call, then groups merge PAIRWISE (halving the group count each
  * round) until one remains — a treeAggregate whose combine step is a model
  * call.
  *
  * Spark form: the reference assigns groups by arrival order, which is
  * arbitrary (atomic_facts.py:60-75) — no ordering semantics are needed, so
  * group ids come from a hash of the claim (`pmod(xxhash64(claim), k0)`),
  * NOT a global-window row_number: a windowed assignment would sort the
  * entire corpus through one task, the one scale-killer a 100 TB dedup
  * cannot afford. Each round re-keys groups with `pmod(group_id, ceil(k/2))`
  * so pairs of groups land together, and the merge runs as one batched
  * inference pass — `ceil(log2(k0))` rounds, each a single shuffle keyed by
  * group.
  *
  * The halving schedule follows the *theoretical* group count (k0 = ceil(n /
  * groupSize), then ceil(k/2) per round) exactly as the reference halves its
  * group list by position — so the loop needs no per-round distinct-count
  * action at all.
  */
object TreeDedup {

  /** Theoretical halving schedule for `n` claims: (round, group count),
    * starting at round 0 with k0 = max(1, ceil(n / groupSize)) and halving
    * (ceil) until one group remains. `rounds(n, g).length - 1` is the number
    * of merge rounds — ceil(log2(k0)). */
  def rounds(n: Long, groupSize: Int): Seq[(Long, Long)] = {
    val k0 = math.max(1L, (n + groupSize - 1) / groupSize)
    val buf = scala.collection.mutable.ArrayBuffer((0L, k0))
    var k = k0
    var r = 0L
    while (k > 1) { r += 1; k = (k + 1) / 2; buf += ((r, k)) }
    buf.toSeq
  }

  /** Hash-based initial group assignment — one codegen'd projection, no
    * window, no sort, no shuffle (the shuffle happens at the groupBy). */
  private[operators] def assignGroups(
      claims: DataFrame, claimCol: String, k0: Long): DataFrame =
    claims.withColumn("group_id", pmod(xxhash64(col(claimCol)), lit(k0)))

  /** Deduplicate `claimCol` rows via grouped inference + pairwise halving.
    * Returns the surviving claims of the final round. The client sees
    * `DEDUP|<claims joined by \n>` prompts and must return the deduplicated
    * claims, one per line. */
  def run(
      claims: DataFrame, // one string column claimCol
      claimCol: String,
      client: InferenceClient,
      groupSize: Int = 300,
      maxRounds: Int = 32,
      knownCount: Option[Long] = None,
      checkpointEvery: Int = 8,
      fuseLevels: Int = 3): DataFrame = {
    val n = knownCount.getOrElse(claims.count())
    val schedule = rounds(n, groupSize)
    val k0 = schedule.head._2

    def dedupGroups(df: DataFrame): DataFrame =
      InferOps.complete(
        df.groupBy("group_id")
          .agg(array_join(array_sort(collect_list(col(claimCol))), "\n").as("joined"))
          .withColumn("prompt", concat(lit("DEDUP|"), col("joined"))),
        "prompt", "reply", client)
        .select(col("group_id"),
          explode(split(col("reply"), "\n")).as(claimCol))
        .filter(length(col(claimCol)) > 0)

    // Rounds chain lazily: each is one AQE shuffle stage keyed by group_id,
    // and the whole halving runs as a single job — a per-round eager
    // localCheckpoint costs a full job setup + block write per round, which
    // at log2(k0) sequential rounds dominated wall-clock (bench d07 measured
    // ~0.7 s/round of pure materialization overhead). Lineage still gets
    // truncated every `checkpointEvery` rounds so a 100 TB run with ~20+
    // rounds keeps bounded plan depth and stage-retry cost.
    //
    // Merge rounds run FUSED `fuseLevels` levels per shuffle (fusedMerge):
    // the remaining d07 cost is sequential stage count, not data volume
    // (VERDICT r03 #7). Each level's prompts depend only on the previous
    // level's replies of co-keyed groups, so a task can replay several
    // pairwise levels locally with byte-identical prompts to the unfused
    // schedule. fuseLevels bounds task intake to 2^F source groups — the
    // late, small rounds (where group counts have already collapsed) are
    // exactly the ones that fuse, so per-task memory stays bounded at scale.
    var cur = dedupGroups(assignGroups(claims, claimCol, k0))
    var sinceCkpt = 0
    schedule.drop(1).take(maxRounds).map(_._2)
      .grouped(fuseLevels).foreach { chunk =>
        cur = fusedMerge(cur, claimCol, client, chunk)
        sinceCkpt += 1
        if (sinceCkpt >= checkpointEvery) {
          cur = cur.localCheckpoint()
          sinceCkpt = 0
        }
      }
    cur.select(claimCol).distinct()
  }

  /** Replay `levels` pairwise-merge rounds in ONE shuffle: claims key by
    * their group id folded through every level, and each task re-runs the
    * exact per-level schedule locally — at each level, one DEDUP call per
    * merged group over the sorted union of its members' claims, feeding the
    * next level. Prompts are byte-identical to running the rounds as
    * separate shuffles (each unfused round is also one call per merged
    * group over the sorted union), so results are unchanged; the
    * shuffle/stage count drops by the fuse factor, which is what dominates
    * a log2(k0)-round dataflow. */
  private def fusedMerge(
      df: DataFrame,
      claimCol: String,
      client: InferenceClient,
      levels: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val lv = levels.toArray
    // the level constants ride in a closure, NOT literals: inlined constants
    // would make each pass's codegen a distinct source and Janino would
    // recompile the spine per pass (measured ~0.4 s/pass cold)
    val keyOf = udf((g: Long) => lv.foldLeft(g)((x, k) => x % k))
    val grouped = df
      .groupBy(keyOf(col("group_id")).as("gkey"))
      .agg(collect_list(struct(col("group_id"), col(claimCol))).as("items"))
    val outSchema = StructType(Seq(
      StructField("group_id", LongType),
      StructField(claimCol, StringType)))
    grouped.mapPartitions { rows =>
      rows.flatMap { row =>
        val gkey = row.getLong(0)
        val items = row.getSeq[Row](1)
        var groups: Seq[(Long, Seq[String])] = items
          .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)))
          .toSeq
        lv.foreach { k =>
          groups = groups.groupBy { case (g, _) => g % k }
            .toSeq.sortBy(_._1)
            .map { case (nk, members) =>
              nk -> client.complete(
                "DEDUP|" + members.flatMap(_._2).sorted.mkString("\n"))
                .split("\n").toSeq.filter(_.nonEmpty)
            }
        }
        // after folding every level, all of this task's claims share gkey
        groups.iterator.flatMap { case (_, cs) => cs.map(c => Row(gkey, c)) }
      }
    }(Encoders.row(outSchema))
  }
}
