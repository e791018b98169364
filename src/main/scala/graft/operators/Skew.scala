package graft.operators

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
}
