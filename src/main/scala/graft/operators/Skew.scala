package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot-key joins (the 100 TB survival kit the
  * builder prompt calls out; complements AQE's runtime skew-join split,
  * which only helps sort-merge joins after the fact).
  *
  * Salted join: replicate the small side `salt` times, scatter the big
  * side's hot keys across salt buckets, join on (key, salt). One hot key
  * that would hash to a single reducer now spreads across `salt` tasks.
  */
object Skew {

  /** Salted inner equi-join of `big` and `small` on `key`.
    * `big` rows get a random salt in [0, salt); `small` is exploded across
    * all salts (its row count multiplies by `salt` — keep it the dimension
    * side). Seeded rand keeps runs reproducible. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salt: Int = 8,
      seed: Long = 42L): DataFrame = {
    require(salt > 0)
    val salted  = big.withColumn("graft_salt",
      (rand(seed) * salt).cast("int"))
    val spread = small.withColumn("graft_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    salted.join(spread, Seq(key, "graft_salt")).drop("graft_salt")
  }

  def defs: Seq[QueryDef] = Seq(
    // Deliberately skewed join, bench-measured (VERDICT r03 #9): 90% of
    // event rows collapse onto ONE hot user, then join a per-user dimension
    // through saltedJoin — the hot key scatters across 8 salt buckets
    // instead of one reducer. The salt is invisible in the RESULT (it's
    // dropped before the aggregate), so the oracle is the plain join; the
    // scatter is pinned by SkewSpec's plan assertion.
    QueryDef(
      "q37_salted_skew_join",
      covers = "engine-complete (skew survival)",
      oracle = Some("""
        WITH ev AS (SELECT CASE WHEN event_id % 10 < 9 THEN 0
                                ELSE user_id END AS user_id, value
                    FROM events),
        dim AS (SELECT DISTINCT user_id, user_id % 5 AS seg FROM ev)
        -- total is an exact decimal STRING: value is 2dp money, and a float
        -- sum across 10M rows (or a decimal->double cast past 2^53/scale)
        -- diverges between engines at the 100x corpus
        SELECT seg, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS total
        FROM ev JOIN dim USING (user_id)
        GROUP BY seg ORDER BY seg"""),
      build = (s, d) => {
        val ev = Tables.events(s, d)
          .select(
            when(col("event_id") % 10 < 9, lit(0L))
              .otherwise(col("user_id")).as("user_id"),
            col("value"))
        val dim = ev.select("user_id").distinct()
          .withColumn("seg", pmod(col("user_id"), lit(5L)))
        saltedJoin(ev, dim, "user_id", salt = 8)
          .groupBy("seg")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).cast("string").as("total"))
          .orderBy("seg")
      })
  )
}
