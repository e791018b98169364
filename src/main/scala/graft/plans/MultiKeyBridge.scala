package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational encoding of the reference's `MultiKeyDict` (SURVEY.md §1.1;
  * /root/reference/LLMxMapReduce_V2/src/data_structure/multi_key_dict.py:4-62):
  * a map keyed by a SET of bibkeys where any member key resolves to the
  * group's value. `MapType` can't express set-valued keys — the faithful
  * Spark form is a bridge table `(member_key, group_id)` plus an equi-join,
  * broadcast when the dimension is small (it always is: one row per paper).
  */
object MultiKeyBridge {

  /** groups: (group_id, keys: ARRAY<STRING>, ...payload) →
    * bridge (key, group_id). Raises no duplicates check here — the reference
    * allows a key in one group only; enforce with [[validate]]. */
  def bridge(groups: DataFrame): DataFrame =
    groups.select(explode(col("keys")).as("key"), col("group_id"))

  /** Any-member-key lookup: rows of `lookups` (must carry `key`) resolve to
    * their group_id; unknown keys get null (the dict's KeyError surface —
    * callers filter or fail on it). */
  def resolve(lookups: DataFrame, groups: DataFrame): DataFrame =
    lookups.join(broadcast(bridge(groups)), Seq("key"), "left")

  /** The reference's invariant: every member key belongs to exactly one
    * group. Returns offending keys (empty = valid). */
  def validate(groups: DataFrame): DataFrame =
    bridge(groups).groupBy("key").agg(countDistinct("group_id").as("n"))
      .filter(col("n") > 1)
}
