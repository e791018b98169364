package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Driver-side iteration controller for the three loop shapes in the
  * reference (SURVEY.md §4 "custom pieces", §7 hard parts): the collapse
  * loop (A2), the skeleton-refine block cycle (D5), and pairwise dedup
  * halving (A9). Spark DAGs cannot cycle, so iteration is a driver loop —
  * with `localCheckpoint` per round to truncate lineage (otherwise plan depth
  * grows linearly with iterations and the optimizer re-analyzes the whole
  * history every round; at cluster scale use reliable `checkpoint`).
  */
object IterativeStage {

  /** Iterate `step` from `init` until `done` or `maxIter`, checkpointing each
    * round. Returns (result, iterations run). */
  def loop(
      init: DataFrame,
      maxIter: Int,
      done: DataFrame => Boolean)(
      step: DataFrame => DataFrame): (DataFrame, Int) = {
    var cur = init.localCheckpoint()
    var i   = 0
    while (i < maxIter && !done(cur)) {
      cur = step(cur).localCheckpoint()
      i += 1
    }
    (cur, i)
  }
}
