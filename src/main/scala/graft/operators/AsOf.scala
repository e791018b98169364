package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the latest right row with
  * `right.ts <= left.ts` on the same key. Spark has no native operator for
  * this (the canonical "operator the engine lacks" case); the classic
  * sort-merge formulation here is the union-window trick:
  *
  *   tag both sides → union → one window per key ordered by
  *   (ts, side, tiebreak) → running max of the tagged right payload →
  *   keep left rows.
  *
  * Scale shape: ONE shuffle on the join key (the union sorts within key
  * partitions); no range explosion, no per-row probe. At 100 TB this is
  * strictly better than the bucketed range join (q11 family) when the
  * predicate is "latest at or before" rather than a symmetric band.
  * Right-side ties on ts break by the greatest `tiebreak` value —
  * explicit, so results are total-order deterministic.
  */
object AsOf {

  /** Generic as-of join: returns `left` plus a nullable `asof` struct
    * holding the matched right row (null when no right row precedes).
    * Rows at equal ts match (inclusive <=). */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: Seq[String],
      leftTs: String,
      rightTs: String,
      tieBreak: String): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    // null slots need concrete types; derive them from the frames' schemas
    val lType = StructType(left.schema.fields)
    val rTagType = StructType(Seq(
      StructField(rightTs, right.schema(rightTs).dataType),
      StructField(tieBreak, right.schema(tieBreak).dataType),
      StructField("row", StructType(right.schema.fields))))
    val rTagged = right.select(
      key.map(right(_)) :+ right(rightTs).as("__ts") :+
        lit(0).as("__side") :+ lit(null).cast(lType).as("__l") :+
        struct(right(rightTs), right(tieBreak),
          struct(right.columns.map(right(_)): _*).as("row")).as("__r"): _*)
    val lTagged = left.select(
      key.map(left(_)) :+ left(leftTs).as("__ts") :+
        lit(1).as("__side") :+
        struct(left.columns.map(left(_)): _*).as("__l") :+
        lit(null).cast(rTagType).as("__r"): _*)
    // views sort before clicks at equal ts (side 0 < 1) → inclusive match
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc,
        col("__r").getField(tieBreak).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rTagged.unionByName(lTagged)
      .withColumn("__match", max(col("__r")).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*"), col("__match.row").as("asof"))
  }

  def defs: Seq[QueryDef] = Seq(
    // For every click event: the latest view event of the same user at or
    // before it (ties on ts break by the larger view event_id). The DuckDB
    // twin uses the same union-window formulation, so the operator's exact
    // tie/no-match semantics are hash-pinned.
    QueryDef(
      "q38_asof_join",
      covers = "engine-complete (as-of join)",
      oracle = Some("""
        WITH u AS (
          SELECT user_id, ts, 0 AS side, NULL::BIGINT AS click_id,
                 struct_pack(ts := ts, id := event_id) AS v
          FROM events WHERE event_type = 'view'
          UNION ALL
          SELECT user_id, ts, 1 AS side, event_id AS click_id, NULL AS v
          FROM events WHERE event_type = 'click'),
        w AS (
          SELECT *, max(v) OVER (
                   PARTITION BY user_id
                   ORDER BY ts, side, v.id NULLS FIRST
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mv
          FROM u)
        SELECT click_id, user_id, mv.id AS view_id
        FROM w WHERE side = 1
        ORDER BY click_id"""),
      build = (s, d) => {
        val ev = Tables.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("ts"))
        asofJoin(clicks, views, Seq("user_id"), "ts", "ts", "event_id")
          .select(col("click_id"), col("user_id"),
            col("asof.event_id").as("view_id"))
          .orderBy("click_id")
      })
  )
}
