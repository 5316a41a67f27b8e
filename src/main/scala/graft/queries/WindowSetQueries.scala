package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Ewma
import QueryShared._

/** Set operations (U1-U3), window / time-series queries (W1-W8) and the
  * interactive SQL dashboard surface (§3.3) — split verbatim from
  * [[RelationalQueries]] at the ~500-line registry-hygiene threshold,
  * zero behavior change. Projection/filter, aggregation and join
  * entries remain in [[RelationalQueries]]. */
private[queries] object WindowSetQueries {

  val windowsAndSets: Seq[Q] = Seq(
    // ---------------------------------------------------------- U layer
    Q("u01_union_supertype",
      (s, d) => {
        val a = T(s, d, "nation")
          .select(col("n_nationkey").as("key"), col("n_name").as("label"))
        val b = T(s, d, "customer")
          .select(col("c_custkey").as("key"), col("c_name").as("label"),
            col("c_acctbal").as("bal"))
        a.unionByName(b, allowMissingColumns = true)
          .orderBy(col("key"), col("label"))
      },
      Some("""SELECT CAST(n_nationkey AS BIGINT) AS key, n_name AS label,
                     CAST(NULL AS DOUBLE) AS bal FROM nation
              UNION ALL
              SELECT c_custkey AS key, c_name AS label, c_acctbal AS bal FROM customer
              ORDER BY key, label""")),

    Q("u02_union_all_tagged",
      (s, d) => T(s, d, "orders").select(lit("orders").as("src"), col("o_orderkey").as("id"))
        .union(T(s, d, "lineitem").select(lit("lineitem").as("src"), col("l_orderkey").as("id")))
        .orderBy("src", "id"),
      Some("""SELECT 'orders' AS src, o_orderkey AS id FROM orders
              UNION ALL
              SELECT 'lineitem' AS src, l_orderkey AS id FROM lineitem
              ORDER BY src, id""")),

    Q("u03_union_distinct",
      (s, d) => T(s, d, "lineitem").select(col("l_returnflag").as("flag"))
        .union(T(s, d, "orders").select(col("o_orderstatus").as("flag")))
        .distinct()
        .orderBy("flag"),
      Some("""SELECT l_returnflag AS flag FROM lineitem
              UNION
              SELECT o_orderstatus AS flag FROM orders
              ORDER BY flag""")),

    // ---------------------------------------------------------- W layer
    Q("w01_ewma",
      (s, d) => Ewma.withEwma(T(s, d, "events"), "user_id",
          Seq("ts", "event_id"), "value", alpha = 0.05, outCol = "ewma")
        // no rounding: the sequential recurrence is bitwise-identical in
        // both engines (same op order, same constants); DuckDB's float
        // round() is approximate near boundaries, exact values are safer
        .select(col("user_id"), col("event_id"), col("ewma"))
        .orderBy("user_id", "event_id"),
      Some("""WITH RECURSIVE b AS (
                SELECT user_id, event_id, value,
                       row_number() OVER (PARTITION BY user_id
                         ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
                FROM events),
              r(user_id, event_id, rn, state, ewma) AS (
                SELECT user_id, event_id, rn,
                       CASE WHEN value IS NULL THEN 0.0::DOUBLE
                            ELSE (1.0::DOUBLE - 0.05::DOUBLE) * 0.0::DOUBLE + 0.05::DOUBLE * value END,
                       CASE WHEN value IS NULL THEN NULL
                            ELSE (1.0::DOUBLE - 0.05::DOUBLE) * 0.0::DOUBLE + 0.05::DOUBLE * value END
                FROM b WHERE rn = 1
                UNION ALL
                SELECT b.user_id, b.event_id, b.rn,
                       CASE WHEN b.value IS NULL THEN r.state
                            ELSE (1.0::DOUBLE - 0.05::DOUBLE) * r.state + 0.05::DOUBLE * b.value END,
                       CASE WHEN b.value IS NULL THEN NULL
                            ELSE (1.0::DOUBLE - 0.05::DOUBLE) * r.state + 0.05::DOUBLE * b.value END
                FROM r JOIN b ON b.user_id = r.user_id AND b.rn = r.rn + 1)
              SELECT user_id, event_id, ewma
              FROM r ORDER BY user_id, event_id""")),

    Q("w01b_ewma_catalyst",
      // same semantics as w01_ewma but via the native Catalyst
      // AggregateWindowFunction (SQL surface); proven bitwise-identical
      // to the mapPartitions operator in GraftFunctionsSpec
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        T(s, d, "events").createOrReplaceTempView("ewma_events_v")
        s.sql("""SELECT user_id, event_id,
                        ewma(value, 0.05) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ewma
                 FROM ewma_events_v ORDER BY user_id, event_id""")
      },
      Some("""WITH RECURSIVE b AS (
                SELECT user_id, event_id, value,
                       row_number() OVER (PARTITION BY user_id
                         ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
                FROM events),
              r(user_id, event_id, rn, state, ewma) AS (
                SELECT user_id, event_id, rn,
                       CASE WHEN value IS NULL THEN 0.0::DOUBLE
                            ELSE (1.0::DOUBLE - 0.05::DOUBLE) * 0.0::DOUBLE + 0.05::DOUBLE * value END,
                       CASE WHEN value IS NULL THEN NULL
                            ELSE (1.0::DOUBLE - 0.05::DOUBLE) * 0.0::DOUBLE + 0.05::DOUBLE * value END
                FROM b WHERE rn = 1
                UNION ALL
                SELECT b.user_id, b.event_id, b.rn,
                       CASE WHEN b.value IS NULL THEN r.state
                            ELSE (1.0::DOUBLE - 0.05::DOUBLE) * r.state + 0.05::DOUBLE * b.value END,
                       CASE WHEN b.value IS NULL THEN NULL
                            ELSE (1.0::DOUBLE - 0.05::DOUBLE) * r.state + 0.05::DOUBLE * b.value END
                FROM r JOIN b ON b.user_id = r.user_id AND b.rn = r.rn + 1)
              SELECT user_id, event_id, ewma
              FROM r ORDER BY user_id, event_id""")),

    // Segment-composed EWMA (the skew escape hatch: parallelism =
    // groups × chunks instead of groups — weekly time chunks here). The
    // composed op order (local fold from 0 carrying a running decay
    // product, entry states A·S + B, final a·S + b — no pow, no libm)
    // differs from the sequential recurrence by design, so the oracle
    // mirrors THAT order; EwmaSegmentedSpec separately pins equivalence
    // to the sequential operator (bitwise under exact arithmetic,
    // ≤ 1e-12 relative elsewhere).
    Q("w01c_ewma_segmented",
      (s, d) => Ewma.withEwmaSegmented(T(s, d, "events"), "user_id",
          Seq("ts", "event_id"), "value", alpha = 0.05, outCol = "ewma",
          chunkCol = expr("unix_micros(ts) div 604800000000"))
        .select(col("user_id"), col("event_id"), col("ewma"))
        .orderBy("user_id", "event_id"),
      Some("""WITH RECURSIVE b AS (
                SELECT user_id, event_id, value,
                       epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS chunk,
                       row_number() OVER (
                         PARTITION BY user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000
                         ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
                FROM events),
              l(user_id, chunk, event_id, rn, a, lb, value) AS (
                SELECT user_id, chunk, event_id, rn,
                       CASE WHEN value IS NULL THEN 1.0::DOUBLE
                            ELSE (1.0::DOUBLE - 0.05::DOUBLE) * 1.0::DOUBLE END,
                       CASE WHEN value IS NULL THEN 0.0::DOUBLE
                            ELSE (1.0::DOUBLE - 0.05::DOUBLE) * 0.0::DOUBLE + 0.05::DOUBLE * value END,
                       value
                FROM b WHERE rn = 1
                UNION ALL
                SELECT b.user_id, b.chunk, b.event_id, b.rn,
                       CASE WHEN b.value IS NULL THEN l.a
                            ELSE (1.0::DOUBLE - 0.05::DOUBLE) * l.a END,
                       CASE WHEN b.value IS NULL THEN l.lb
                            ELSE (1.0::DOUBLE - 0.05::DOUBLE) * l.lb + 0.05::DOUBLE * b.value END,
                       b.value
                FROM l JOIN b ON b.user_id = l.user_id AND b.chunk = l.chunk
                              AND b.rn = l.rn + 1),
              s AS (SELECT user_id, chunk, a AS ca, lb AS cb FROM l
                    QUALIFY row_number() OVER (PARTITION BY user_id, chunk
                      ORDER BY rn DESC) = 1),
              cs AS (SELECT user_id, chunk, ca, cb,
                            row_number() OVER (PARTITION BY user_id
                              ORDER BY chunk) AS crank
                     FROM s),
              e(user_id, crank, state) AS (
                SELECT user_id, 1, 0.0::DOUBLE FROM cs WHERE crank = 1
                UNION ALL
                SELECT cs.user_id, cs.crank + 1, cs.ca * e.state + cs.cb
                FROM e JOIN cs ON cs.user_id = e.user_id AND cs.crank = e.crank)
              SELECT l.user_id, l.event_id,
                     CASE WHEN l.value IS NULL THEN NULL
                          ELSE l.a * e.state + l.lb END AS ewma
              FROM l
              JOIN cs ON cs.user_id = l.user_id AND cs.chunk = l.chunk
              JOIN e ON e.user_id = l.user_id AND e.crank = cs.crank
              ORDER BY l.user_id, l.event_id""")),

    Q("w02_row_number",
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
        T(s, d, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       row_number() OVER (PARTITION BY o_custkey
                         ORDER BY o_totalprice DESC, o_orderkey) AS rn
                FROM orders) t
              WHERE rn <= 3 ORDER BY o_custkey, rn""")),

    Q("w03_sort_multi",
      (s, d) => T(s, d, "lineitem")
        .select("l_returnflag", "l_shipdate", "l_orderkey", "l_linenumber")
        .orderBy("l_returnflag", "l_shipdate", "l_orderkey", "l_linenumber")
        .limit(100),
      Some("""SELECT l_returnflag, l_shipdate, l_orderkey, l_linenumber
              FROM lineitem
              ORDER BY l_returnflag, l_shipdate, l_orderkey, l_linenumber
              LIMIT 100""")),

    Q("w05_topk",
      (s, d) => T(s, d, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")),

    Q("w06_spine_densify",
      (s, d) => {
        val spine = s.range(1).select(explode(sequence(
          lit("2024-01-01 00:00:00").cast("timestamp"),
          lit("2024-01-07 00:00:00").cast("timestamp"),
          expr("INTERVAL 1 HOUR"))).as("t"))
        val types = T(s, d, "events").select(col("event_type").as("et")).distinct()
        val grid = spine.crossJoin(broadcast(types))
        val actual = T(s, d, "events")
          .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
        grid.join(actual, col("t") === col("h") && col("et") === col("event_type"), "left")
          .select(col("t"), col("et"), coalesce(col("cnt"), lit(0L)).as("n"))
          .orderBy("t", "et")
      },
      Some("""WITH spine AS (SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                                           TIMESTAMP '2024-01-07 00:00:00',
                                                           INTERVAL 1 HOUR)) AS t),
                   types AS (SELECT DISTINCT event_type AS et FROM events),
                   actual AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, event_type,
                                     count(*) AS cnt
                              FROM events GROUP BY 1, 2)
              SELECT spine.t, types.et, coalesce(actual.cnt, 0) AS n
              FROM spine CROSS JOIN types
              LEFT JOIN actual ON spine.t = actual.h AND types.et = actual.event_type
              ORDER BY t, et""")),

    // LOCF gap-fill: carry the last observation forward over planted
    // holes ('view' rows masked to null on both sides — the sensor-dropout
    // shape). Values pass through unchanged (no arithmetic), hash-exact.
    Q("w07_locf_gapfill",
      (s, d) => graft.operators.TimeSeries.locf(
          T(s, d, "events").withColumn("value",
            when(col("event_type") === "view", lit(null)).otherwise(col("value"))),
          "user_id", "ts", "event_id", Seq("value"))
        .select(col("event_id"), col("user_id"), col("value"))
        .orderBy("event_id"),
      Some("""WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                      CASE WHEN event_type = 'view' THEN NULL ELSE value END AS value
                    FROM events)
              SELECT event_id, user_id,
                     last_value(value IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
              FROM e ORDER BY event_id""")),

    // Gap-based sessionization: new session when >30 min from the
    // previous event of the user — exact integer µs-gap compare + running
    // sum of session starts (see TimeSeries.sessionize)
    Q("w08_sessionize",
      (s, d) => graft.operators.TimeSeries.sessionize(
          T(s, d, "events"), "user_id", "ts", "event_id", gapSeconds = 1800L)
        .select(col("event_id"), col("user_id"), col("ts"), col("session_n"))
        .orderBy("user_id", "ts", "event_id"),
      Some("""WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
                   g AS (SELECT *,
                           CASE WHEN lag(ts) OVER w IS NULL
                                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                                THEN 1 ELSE 0 END AS ns
                         FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
              SELECT event_id, user_id, ts,
                     CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_n
              FROM g ORDER BY user_id, ts, event_id"""))
  )

  /** Interactive SQL surface — the reference's dashboard corpus (§3.3)
    * run as spark.sql over temp views. */
  val sqlSurface: Seq[Q] = Seq(
    Q("sql_timeseries_panel",
      (s, d) => SqlSurface.timeseriesPanel(s, d),
      Some("""SELECT make_timestamp(epoch_us(CAST(ts AS TIMESTAMP)) // 300000000 * 300000000) AS bucket,
                     count(*) AS n,
                     CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
              FROM events
              WHERE CAST(ts AS TIMESTAMP) BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-10 00:00:00'
              GROUP BY 1 ORDER BY bucket""")),

    Q("sql_pivot_panel",
      (s, d) => SqlSurface.pivotPanel(s, d),
      Some("""SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
                     max(event_id) FILTER (WHERE user_id % 4 = 0) AS lane_0,
                     max(event_id) FILTER (WHERE user_id % 4 = 1) AS lane_1,
                     max(event_id) FILTER (WHERE user_id % 4 = 2) AS lane_2,
                     max(event_id) FILTER (WHERE user_id % 4 = 3) AS lane_3
              FROM events GROUP BY 1 ORDER BY day""")),

    Q("sql_percent_panel",
      (s, d) => SqlSurface.percentPanel(s, d),
      Some("""SELECT (SELECT count(*) FROM events WHERE event_type = 'purchase') AS n_done,
                     (SELECT count(*) FROM events) AS n_all,
                     CAST((SELECT count(*) FROM events WHERE event_type = 'purchase') AS DOUBLE)
                       / CAST((SELECT count(*) FROM events) AS DOUBLE) AS frac""")),

    Q("sql_timeline_panel",
      (s, d) => SqlSurface.timelinePanel(s, d),
      Some("""SELECT event_id, user_id, event_type
              FROM events
              ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC
              LIMIT 5000"""))
  )
}
