package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType
import graft.Tables

/** As-of (nearest-earlier) joins — the temporal operator relational engines
  * bolt on (DuckDB ASOF JOIN, kdb aj, Flink temporal join), built Spark-
  * first.
  *
  * The naive formulation is an inequality join (left.ts >= right.ts) +
  * argmax — a cross-product per key that dies at scale. [[asofJoin]] is the
  * scalable pattern: union both sides tagged, ONE shuffle on (key), one
  * sort by (ts, side), then `last_value(right_cols, ignoreNulls) OVER
  * (... ROWS UNBOUNDED PRECEDING)` carries the latest right row forward
  * into each left row. Cost is the cost of a groupBy over left+right —
  * no quadratic blowup, AQE-friendly, skew handled like any hot-key
  * aggregation.
  */
object AsOf {

  /** Generic as-of join: for every `left` row, attach the columns of the
    * latest `right` row with `right.tsCol <= left.tsCol` and equal `key`.
    * `rightCols` are the right-side payload columns to carry (they must not
    * collide with left column names). Left rows with no earlier right row
    * keep nulls.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // union schema: key, ts, side tag, left payload (nulls on right rows),
    // right payload (nulls on left rows)
    val lTagged = left
      .withColumn("__side", lit(1))
      .select(Seq(col(key), col(tsCol).as("__ts"), col("__side")) ++
        leftCols.filterNot(c => c == key || c == tsCol).map(col) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rTagged = right
      .withColumn("__side", lit(0))
      .select(Seq(col(key), col(tsCol).as("__ts"), col("__side")) ++
        leftCols.filterNot(c => c == key || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(col): _*)
    // right rows sort BEFORE left rows at equal ts (side 0 < 1), so an
    // exactly-simultaneous right row is visible to the left row
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionByName(rTagged)
      .select(col("*") +:
        rightCols.map(c =>
          last(col(c), ignoreNulls = true).over(w).as(s"__asof_$c")): _*)
    carried.filter(col("__side") === 1)
      .select(Seq(col(key), col("__ts").as(tsCol)) ++
        leftCols.filterNot(c => c == key || c == tsCol).map(col) ++
        rightCols.map(c => col(s"__asof_$c").as(c)): _*)
  }

  /** For every purchase event: the user's most recent prior (or
    * simultaneous) click. The canonical attribution query.
    */
  def purchaseAttribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir).events
      .select(col("event_id"), col("user_id"), col("event_type"),
        (col("ts") / lit(1000000000L)).cast(LongType).as("sec"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("sec"), col("event_id"))
    // one click per (user, second) — max event_id — so the as-of carry has
    // a total order and is engine-reproducible even with same-second clicks
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("sec"))
      .agg(max(col("event_id")).as("click_id"))
      .withColumn("click_sec", col("sec"))
    asofJoin(purchases, clicks, "user_id", "sec",
      Seq("click_id", "click_sec"))
      .select(col("event_id"), col("user_id"), col("sec").as("purchase_sec"),
        col("click_id"), col("click_sec"),
        (col("sec") - col("click_sec")).as("gap_sec"))
      .orderBy(col("event_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> (purchaseAttribution _))

  /** DuckDB twin via the same window formulation (engine-neutral SQL; the
    * dedicated ASOF JOIN syntax would also work but ties break differently).
    */
  val oracles: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
        |    epoch_ms(ts)//1000 AS sec FROM events),
        |tagged AS (
        |  SELECT user_id, sec, 1 AS side, event_id,
        |    NULL::BIGINT AS click_id, NULL::BIGINT AS click_sec
        |  FROM ev WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, sec, 0 AS side, NULL::BIGINT AS event_id,
        |    max(event_id) AS click_id, sec AS click_sec
        |  FROM ev WHERE event_type = 'click' GROUP BY user_id, sec),
        |carried AS (
        |  SELECT *,
        |    last_value(click_id IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY sec, side ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS a_click_id,
        |    last_value(click_sec IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY sec, side ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS a_click_sec
        |  FROM tagged)
        |SELECT event_id, user_id, sec AS purchase_sec,
        |  a_click_id AS click_id, a_click_sec AS click_sec,
        |  sec - a_click_sec AS gap_sec
        |FROM carried WHERE side = 1 ORDER BY event_id""".stripMargin)
}
