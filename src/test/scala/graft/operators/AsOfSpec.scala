package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** As-of join semantics on hand-built rows: inclusive same-ts match,
  * tie-break by the designated column, null when nothing precedes, and
  * per-key isolation. */
class AsOfSpec extends SparkTestBase {

  private def ts(min: Int) = new java.sql.Timestamp(min * 60_000L)

  test("asofJoin picks the latest right row at or before each left row") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, ts(10)), // after r at 5 -> matches id 52
      (1L, 101L, ts(5)),  // SAME ts as a right row -> inclusive match
      (1L, 102L, ts(1)),  // nothing precedes -> null
      (2L, 103L, ts(30))  // other key: only key-2 rows eligible
    ).toDF("user_id", "click_id", "ts")
    val right = Seq(
      (1L, 51L, ts(2)),
      (1L, 52L, ts(5)),
      (1L, 53L, ts(5)),  // tie on ts with 52 -> larger event_id wins
      (1L, 54L, ts(11)), // after every left row of key 1
      (2L, 61L, ts(29))
    ).toDF("user_id", "event_id", "ts")

    val got = AsOf.asofJoin(left, right, Seq("user_id"), "ts", "ts", "event_id")
      .select(col("click_id"), col("asof.event_id").as("view_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    assert(got == Map(
      100L -> Some(53L), // latest before minute 10 is the tie pair; 53 > 52
      101L -> Some(53L), // inclusive: same-minute views match
      102L -> None,      // no earlier view
      103L -> Some(61L)))
  }

  test("asofJoin carries the full matched right row") {
    import spark.implicits._
    val left  = Seq((1L, ts(10))).toDF("user_id", "ts")
    val right = Seq((1L, 9L, ts(4), "payload-x"))
      .toDF("user_id", "event_id", "ts", "tag")
    val row = AsOf.asofJoin(left, right, Seq("user_id"), "ts", "ts", "event_id")
      .select("asof.event_id", "asof.tag").head()
    assert(row.getLong(0) == 9L && row.getString(1) == "payload-x")
  }
}
