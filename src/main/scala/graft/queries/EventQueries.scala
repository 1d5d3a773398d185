package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Event-time capability over the `events` stream table — windows,
  * sessionization, JSON projection, replay dedup (SURVEY.md §2.8: all
  * absent in the reference, declared engine extensions). Batch forms are
  * oracle-checked; the streaming forms of the same ops are exercised in
  * StreamingWindowSpec.
  */
object EventQueries {

  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // tumbling event-time window (1h) per type
    "ev_tumbling_hour" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("value_d"),
          countDistinct(col("user_id")).as("n_users"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n"), col("value_d"), col("n_users"))
        .orderBy("window_start", "event_type")),

    // sliding window: 1h size, 30m slide (each event lands in 2 windows)
    "ev_sliding_30m" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("value_d"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n"), col("value_d"))
        .orderBy("window_start", "event_type")),

    // session windows (30-minute inactivity gap) per user, batch form:
    // lag + cumulative-flag sessionization
    "ev_sessions_30m" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L, 1)
            .otherwise(0))
        .withColumn("session_idx",
          sum(col("new_session")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_idx")
        .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"), dsum(col("value")).as("value_d"))
        .orderBy("user_id", "session_idx")}),

    // scalar JSON projection + aggregate over extracted field
    "ev_json_props" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"),
          max(col("k")).as("max_k"), sum(col("k")).as("sum_k"))
        .orderBy("event_type")),

    // PageRank over a deterministic synthetic follow graph (both
    // engines derive edges u → (7u+3)%N and u → (13u+5)%N from the
    // dense user-id space, self-loops dropped — the congruences
    // 6u ≡ -3 and 12u ≡ -5 (mod N) have no solution for the testdata
    // N, so no node is dangling and the oracle can omit the dangling
    // term the operator carries). 3 damped iterations, rank rounded
    // before the top-30 cut
    // cohort retention: users bucketed by the week of their first event,
    // counted in every later week they act — the product-analytics
    // staple. Both aggregations combine map-side; the cohort join
    // shuffles only (user_id, week) rows, and since `weekly` is already
    // distinct per (user, week) the final count needs no countDistinct
    "ev_retention_cohorts" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("ts"))
      val first = ev.groupBy("user_id")
        .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
      val weekly = ev
        .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
        .distinct()
      weekly.join(first, "user_id")
        .withColumn("week_offset",
          (datediff(col("week"), col("cohort_week")) / 7).cast("int"))
        .groupBy("cohort_week", "week_offset")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_week", "week_offset")}),

    "ev_pagerank" -> ((s, d) => {
      // deliberately NO persists here: caching users/edges/output was
      // tried in r17 and measured 1.9× SLOWER in-JVM (DevPr A/B —
      // persist barriers serialize what the lazy plan runs as parallel
      // subtree stages over a cheap scan). The one change kept:
      // `n` is already on the driver, so it is passed down and the
      // operator skips its own recount of the node spine.
      val users = Tables.events(s, d).select(col("user_id")).distinct()
      val n = users.count() // 1 driver scalar: the edge modulus
      val edges = users.select(col("user_id").as("src"),
        explode(array(pmod(col("user_id") * 7 + 3, lit(n)),
          pmod(col("user_id") * 13 + 5, lit(n)))).as("dst"))
        .filter(col("src") =!= col("dst"))
        .dropDuplicates("src", "dst")
      graft.operators.Graph.pageRank(edges, "src", "dst", iters = 3,
        nodes = Some(users.select(col("user_id").as("id"))),
        nodesCount = Some(n))
        .withColumn("pr", round(col("pr"), 9))
        .orderBy(desc("pr"), col("id"))
        .limit(30)}),

    // as-of join: each event picks up the user's most recent signup
    // event at-or-before its timestamp (point-in-time state attach)
    "ev_asof_signup" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("signup_ts"),
          col("event_id").as("signup_event_id"))
      graft.operators.AsOfJoin.backward(
        ev.select("event_id", "user_id", "ts", "event_type"),
        signups, keys = Seq("user_id"),
        leftTs = "ts", rightTs = "signup_ts",
        rightCols = Seq("signup_event_id"), tieBreak = "signup_event_id")
        .select("event_id", "user_id", "event_type", "signup_event_id")
        .orderBy("event_id")}),

    // interval (band) join: clicks by the same user within 10 minutes
    // after each error — bucketed equi-join, never a nested loop
    "ev_range_follow" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id").as("err_user"),
          col("ts").as("err_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("clk_user"), col("ts").as("clk_ts"))
      val counts = graft.operators.RangeJoin.intervalJoin(
        errors, clicks, "err_ts", "clk_ts",
        lowerSec = 1, upperSec = 600, equiKeys = Seq("err_user" -> "clk_user"))
        .groupBy(col("err_id").as("event_id"))
        .agg(count(lit(1)).as("n_follow"))
      errors.select(col("err_id").as("event_id"))
        .join(counts, Seq("event_id"), "left")
        .withColumn("n_follow", coalesce(col("n_follow"), lit(0L)))
        .orderBy("event_id")}),

    // exact dedup under at-least-once replay: the doubled stream
    // converges to single-delivery counts
    "ev_dedup_replay" -> ((s, d) => {
      val ev = Tables.events(s, d)
      ev.unionByName(ev)
        .dropDuplicates("event_id")
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy("event_type")}),

    // conversion funnel: per user, purchases within 7 days of the FIRST
    // signup. The range predicate rides on a user_id equi-join (hash
    // join + residual), so at scale this is one shuffle of the two
    // pre-filtered event slices, never a time-range cross product; the
    // signup side is pre-aggregated to one row per user before joining
    "ev_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val signups = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("ts")).as("signup_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"))
      signups.join(purchases,
          signups("user_id") === purchases("user_id") &&
            col("p_ts") >= col("signup_ts") &&
            col("p_ts") <= col("signup_ts") + expr("INTERVAL 604800 SECONDS"),
          "left")
        .groupBy(signups("user_id").as("user_id"), col("signup_ts"))
        .agg(count(col("p_ts")).as("n_purchases_7d"))
        .select(col("user_id"), col("signup_ts"),
          col("n_purchases_7d"),
          (col("n_purchases_7d") > 0).as("converted"))
        .orderBy("user_id")})
  )

  def oracleSql: Map[String, String] = Map(
    "ev_tumbling_hour" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
        |       event_type, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_d,
        |       count(DISTINCT user_id) AS n_users
        |FROM events
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ev_sliding_30m" ->
      """SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
        |         - o * INTERVAL '30 minutes' AS window_start,
        |       event_type, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_d
        |FROM events CROSS JOIN (VALUES (0), (1)) AS offs(o)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ev_sessions_30m" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts,
        |    CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
        |           OR epoch_us(CAST(ts AS TIMESTAMP))
        |              - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
        |), sessions AS (
        |  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        |  FROM flagged)
        |SELECT user_id, session_idx,
        |       min(ts) AS session_start, max(ts) AS session_end,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_d
        |FROM sessions
        |GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,
    "ev_json_props" ->
      """SELECT event_type, count(*) AS n,
        |       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // trunc(min(ts)) == min(trunc(ts)) for a monotone truncation, so the
    // oracle takes min over pre-truncated weeks; // is DuckDB integer
    // division (offsets are exact multiples of 7 days)
    "ev_retention_cohorts" ->
      """WITH ev AS (
        |  SELECT user_id,
        |    date_trunc('week', CAST(ts AS TIMESTAMP)) AS week
        |  FROM events
        |), fst AS (
        |  SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id
        |), weekly AS (
        |  SELECT DISTINCT user_id, week FROM ev)
        |SELECT cohort_week,
        |  CAST(date_diff('day', cohort_week, week) // 7 AS INT) AS week_offset,
        |  count(*) AS n_users
        |FROM weekly JOIN fst USING (user_id)
        |GROUP BY cohort_week, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin,

    "ev_pagerank" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |cnt AS (SELECT count(*) AS n FROM u),
        |e0 AS (
        |  SELECT user_id AS src,
        |    (user_id * 7 + 3) % (SELECT n FROM cnt) AS dst FROM u
        |  UNION ALL
        |  SELECT user_id,
        |    (user_id * 13 + 5) % (SELECT n FROM cnt) FROM u),
        |e AS (SELECT DISTINCT src, dst FROM e0 WHERE src != dst),
        |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        |r0 AS (SELECT user_id AS id,
        |         (1::DOUBLE) / (SELECT n FROM cnt) AS r FROM u),
        |r1 AS (
        |  SELECT u.user_id AS id,
        |    (1::DOUBLE - 0.85::DOUBLE) / (SELECT n FROM cnt)
        |      + 0.85::DOUBLE * coalesce(c.s, 0::DOUBLE) AS r
        |  FROM u LEFT JOIN (
        |    SELECT e.dst, sum(r0.r / deg.deg) AS s
        |    FROM e JOIN r0 ON e.src = r0.id JOIN deg ON e.src = deg.src
        |    GROUP BY e.dst) c ON u.user_id = c.dst),
        |r2 AS (
        |  SELECT u.user_id AS id,
        |    (1::DOUBLE - 0.85::DOUBLE) / (SELECT n FROM cnt)
        |      + 0.85::DOUBLE * coalesce(c.s, 0::DOUBLE) AS r
        |  FROM u LEFT JOIN (
        |    SELECT e.dst, sum(r1.r / deg.deg) AS s
        |    FROM e JOIN r1 ON e.src = r1.id JOIN deg ON e.src = deg.src
        |    GROUP BY e.dst) c ON u.user_id = c.dst),
        |r3 AS (
        |  SELECT u.user_id AS id,
        |    (1::DOUBLE - 0.85::DOUBLE) / (SELECT n FROM cnt)
        |      + 0.85::DOUBLE * coalesce(c.s, 0::DOUBLE) AS r
        |  FROM u LEFT JOIN (
        |    SELECT e.dst, sum(r2.r / deg.deg) AS s
        |    FROM e JOIN r2 ON e.src = r2.id JOIN deg ON e.src = deg.src
        |    GROUP BY e.dst) c ON u.user_id = c.dst)
        |SELECT id, round(r, 9) AS pr FROM r3
        |ORDER BY pr DESC, id LIMIT 30""".stripMargin,

    "ev_asof_signup" ->
      """SELECT a.event_id, a.user_id, a.event_type, b.signup_event_id
        |FROM (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events) a
        |ASOF LEFT JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS signup_ts,
        |                       event_id AS signup_event_id
        |                FROM events WHERE event_type = 'signup') b
        |  ON a.user_id = b.user_id AND a.ts >= b.signup_ts
        |ORDER BY a.event_id""".stripMargin,
    "ev_range_follow" ->
      """SELECT e.event_id,
        |  (SELECT count(*) FROM events c
        |   WHERE c.event_type = 'click' AND c.user_id = e.user_id
        |     AND CAST(c.ts AS TIMESTAMP) >= CAST(e.ts AS TIMESTAMP) + INTERVAL 1 SECOND
        |     AND CAST(c.ts AS TIMESTAMP) <= CAST(e.ts AS TIMESTAMP) + INTERVAL 600 SECOND
        |  ) AS n_follow
        |FROM events e WHERE e.event_type = 'error'
        |ORDER BY e.event_id""".stripMargin,
    "ev_dedup_replay" ->
      """SELECT event_type, count(*) AS n FROM (
        |  SELECT DISTINCT event_id, event_type FROM (
        |    SELECT event_id, event_type FROM events
        |    UNION ALL SELECT event_id, event_type FROM events))
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "ev_funnel" ->
      """WITH s AS (
        |  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS signup_ts
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |p AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS p_ts
        |  FROM events WHERE event_type = 'purchase')
        |SELECT s.user_id, s.signup_ts,
        |  CAST(count(p.p_ts) AS BIGINT) AS n_purchases_7d,
        |  count(p.p_ts) > 0 AS converted
        |FROM s LEFT JOIN p
        |  ON p.user_id = s.user_id
        | AND p.p_ts >= s.signup_ts
        | AND p.p_ts <= s.signup_ts + INTERVAL 604800 SECONDS
        |GROUP BY s.user_id, s.signup_ts
        |ORDER BY s.user_id""".stripMargin
  )
}
