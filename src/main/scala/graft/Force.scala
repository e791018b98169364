package graft

import org.apache.spark.sql.DataFrame

/** The bench's full-evaluation action.
  *
  * A bare `count()` is NOT an honest way to time a query: Catalyst prunes
  * every column the aggregate doesn't reference — a projection-only query
  * (language-ID, fingerprinting, PII scrub) collapses to a parquet
  * footer count that reads zero bytes of text, and `EliminateSorts` drops
  * the determinism ORDER BY — while the DuckDB oracle on the other side of
  * the paired comparison computes everything. Found at the third-decade
  * corpus, where t01/t04 "ran" over 5M documents in 0.17 s; at the bench
  * SF the same hole hid inside the noise floor. (Whole-result-memoized
  * queries were never affected: their localCheckpoint materializes every
  * column before the count.)
  *
  * The noop sink consumes every output row AND column through the normal
  * write path — full evaluation, no driver materialization, no disk.
  */
object Force {
  def apply(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
}
