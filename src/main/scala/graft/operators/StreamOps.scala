package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.streaming.EventStream

/** Batch entries for the streaming-shaped operators, wired into the
  * driver contract. `sessionize` is the custom-state op
  * (flatMapGroupsWithState); the oracle reproduces it with the SQL
  * gaps-and-islands pattern, so the stateful logic itself is
  * correctness-gated, not just row counts. */
object StreamOps {

  def sessionize(spark: SparkSession, dir: String): DataFrame =
    EventStream.sessionizeBatch(spark, dir)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("sum_value"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sessionize" -> sessionize)

  val oracles: Map[String, String] = Map(
    "sessionize" ->
      """WITH m AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER win IS NULL
        |           OR epoch_ns(ts) - epoch_ns(lag(ts) OVER win) > 1800 * 1000000000::BIGINT
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts)),
        |g AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM m)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS sum_value
        |FROM g GROUP BY user_id, sid""".stripMargin)
}
