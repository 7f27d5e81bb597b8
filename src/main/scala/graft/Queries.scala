package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** The engine's declared query inventory (SURVEY.md §2.12 Q1-Q20): every
  * reference capability restated as a batch query over the driver testdata,
  * each paired with ANSI SQL the DuckDB oracle can run on the same parquet.
  *
  * Conventions that make the oracle hash-compare work:
  *  - every computed column is aliased identically on both sides;
  *  - event time is epoch-micros longs on both sides ([[Tables.events]]
  *    normalizes whichever parquet shape `ts` carries — nanos-long or
  *    TIMESTAMP(MICROS) — to epoch-micros; `epoch_us(ts)` in DuckDB
  *    produces the same values exactly);
  *  - doubles that go through different summation orders are rounded.
  */
object Queries {

  type QueryFn = (SparkSession, String) => DataFrame

  /** One declared query: Spark definition + optional DuckDB oracle SQL.
    * `oracle == None` → the driver records a weaker rows-only check
    * (used only for ops whose hashing has no SQL equivalent). */
  final case class Entry(name: String, run: QueryFn, oracle: Option[String])

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** 1 hour / 10 days / 10 minutes in epoch-micros. */
  private val HourUs = 3600000000L
  private val TenDaysUs = 864000000000L
  private val TenMinUs = 600000000L

  // ---------------------------------------------------------------- core

  val core: Seq[Entry] = Seq(
    // Q1 — scan + projection (reference S1/P1/P3). Column pruning reaches the
    // parquet scan: ReadSchema lists exactly these four columns.
    Entry(
      "q01_project",
      (s, d) =>
        t(s, d, "lineitem")
          .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"),
      Some("""SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
              FROM lineitem""")),

    // Q2 — predicate stack (P6 contains, P13 timestamp compare, F4 equality);
    // all three push down to the parquet scan.
    Entry(
      "q02_filter",
      (s, d) =>
        t(s, d, "orders").filter(
          col("o_orderstatus") === "O" &&
            col("o_orderdate") >= lit("1995-01-01").cast("timestamp_ntz") &&
            col("o_orderpriority").contains("URGENT")),
      Some("""SELECT * FROM orders
              WHERE o_orderstatus = 'O'
                AND o_orderdate >= TIMESTAMP '1995-01-01'
                AND o_orderpriority LIKE '%URGENT%'""")),

    // Q3 — left equi-join enrichment (J1): broadcast hash join, no shuffle of
    // the fact side.
    Entry(
      "q03_enrich",
      (s, d) =>
        Enrichment.leftEnrich(
          t(s, d, "orders"), t(s, d, "customer"),
          "o_custkey", "c_custkey", Seq("c_name", "c_mktsegment")),
      Some("""SELECT o.*, c.c_name AS c_name, c.c_mktsegment AS c_mktsegment
              FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey""")),

    // Q4 — two-hop snowflake chain (J1 twice).
    Entry(
      "q04_dim_chain",
      (s, d) =>
        Enrichment.dimChain(
          t(s, d, "customer").select("c_custkey", "c_nationkey"),
          Seq(
            (t(s, d, "nation"), "c_nationkey", "n_nationkey", Seq("n_name", "n_regionkey")),
            (t(s, d, "region"), "n_regionkey", "r_regionkey", Seq("r_name"))))
          .select("c_custkey", "n_name", "r_name"),
      Some("""SELECT c.c_custkey, n.n_name AS n_name, r.r_name AS r_name
              FROM customer c
              LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
              LEFT JOIN region r ON n.n_regionkey = r.r_regionkey""")),

    // Q5 — interval-overlap join + clamp (J2/J3/P10): events as [ts, ts+1h)
    // sessions self-joined per user. Uses the range-bucketed equi-join form —
    // the plan that survives 100 TB (shuffle on (user, bucket), no BNLJ).
    Entry(
      "q05_interval_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val e1 = ev.select(
          col("user_id"), col("event_id").as("e1_id"),
          col("ts").as("t1_start"), (col("ts") + HourUs).as("t1_end"))
        val e2 = ev.select(
          col("user_id").as("u2"), col("event_id").as("e2_id"),
          col("ts").as("t2_start"), (col("ts") + HourUs).as("t2_end"))
        val joined = IntervalJoin.overlapJoinBucketed(
          e1, e2.withColumnRenamed("u2", "user_id"), Seq("user_id"),
          "t1_start", "t1_end", "t2_start", "t2_end", HourUs)
          .filter(col("e1_id") < col("e2_id"))
        IntervalJoin.clamped(joined, "t1_start", "t1_end", "t2_start", "t2_end")
          .select("user_id", "e1_id", "e2_id", "fact_start", "fact_end")
      },
      Some("""SELECT e1.user_id AS user_id, e1.event_id AS e1_id,
                     e2.event_id AS e2_id,
                     GREATEST(epoch_us(e1.ts), epoch_us(e2.ts)) AS fact_start,
                     LEAST(epoch_us(e1.ts) + 3600000000,
                           epoch_us(e2.ts) + 3600000000) AS fact_end
              FROM events e1 JOIN events e2
                ON e1.user_id = e2.user_id AND e1.event_id < e2.event_id
               AND epoch_us(e1.ts) < epoch_us(e2.ts) + 3600000000
               AND epoch_us(e1.ts) + 3600000000 > epoch_us(e2.ts)""")),

    // Q6 — OEE-analog metric (P7/P8/P9): per-part average as the "planned"
    // denominator, conditional zeroing, product metric. The per-part
    // aggregate (one row per part) is SHUFFLE_HASH-hinted into the join
    // back: at bench scale AQE turns the tiny build side into a broadcast
    // anyway, but at 100 TB the part dimension (hundreds of millions of
    // rows) exceeds any broadcast threshold and the unhinted fallback would
    // be a sort-merge join — i.e. a full SORT of the fact table. The hash
    // join needs no fact-side sort and its build side is bounded per task by
    // the partkey exchange. Plan pinned in PlanAudit + q06 spec.
    Entry(
      "q06_oee",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val avgQty = li.groupBy("l_partkey")
          .agg(avg("l_quantity").as("avg_qty"))
          .hint("shuffle_hash")
        val perf = (lit(1.0) - col("l_discount")) *
          (col("l_quantity") / expr("nullif(avg_qty, 0)"))
        val avail = when(col("l_linestatus") === "F", 1.0).otherwise(0.0)
        val qual = when(col("l_returnflag") === "R", 0.0).otherwise(1.0)
        li.join(avgQty, Seq("l_partkey"))
          .select(
            col("l_orderkey"), col("l_linenumber"),
            stableRound(perf, 6).as("perf"), avail.as("avail"), qual.as("qual"),
            stableRound(perf * avail * qual, 6).as("oee"))
      },
      Some("""WITH a AS (SELECT l_partkey, AVG(l_quantity) AS avg_qty
                         FROM lineitem GROUP BY l_partkey)
              SELECT l.l_orderkey AS l_orderkey, l.l_linenumber AS l_linenumber,
                     ROUND((1 - l.l_discount) * (l.l_quantity / NULLIF(a.avg_qty, 0)) + 1e-9, 6) AS perf,
                     CASE WHEN l.l_linestatus = 'F' THEN 1.0 ELSE 0.0 END AS avail,
                     CASE WHEN l.l_returnflag = 'R' THEN 0.0 ELSE 1.0 END AS qual,
                     ROUND((1 - l.l_discount) * (l.l_quantity / NULLIF(a.avg_qty, 0))
                           * (CASE WHEN l.l_linestatus = 'F' THEN 1.0 ELSE 0.0 END)
                           * (CASE WHEN l.l_returnflag = 'R' THEN 0.0 ELSE 1.0 END) + 1e-9, 6) AS oee
              FROM lineitem l JOIN a ON l.l_partkey = a.l_partkey""")),

    // Q7 — last-value-per-key compaction (A1): single hash agg with map-side
    // combine; shuffle size = #users, not #events.
    Entry(
      "q07_latest_by_key",
      (s, d) =>
        Compaction
          .latestByKey(
            Tables.events(s, d).select("user_id", "event_id", "ts"),
            Seq("user_id"), "ts")
          .select(
            col("user_id"), col("event_id").as("last_event_id"),
            col("ts").as("last_ts")),
      Some("""SELECT user_id, arg_max(event_id, ts) AS last_event_id,
                     epoch_us(MAX(ts)) AS last_ts
              FROM events GROUP BY user_id""")),

    // Q8 — running max per key (A2).
    Entry(
      "q08_running_max",
      (s, d) =>
        Tables.events(s, d).groupBy("user_id")
          .agg(max("ts").as("max_ts")),
      Some("""SELECT user_id, epoch_us(MAX(ts)) AS max_ts
              FROM events GROUP BY user_id""")),

    // Q9 — dynamic semi-join pruning (J4/F1, the "on-demand" idea): only
    // parts observed in recent shipments survive.
    Entry(
      "q09_semi_join",
      (s, d) =>
        OnDemand.semiFilter(
          t(s, d, "part"),
          t(s, d, "lineitem")
            .filter(col("l_shipdate") > lit("1996-01-01").cast("timestamp_ntz")),
          "p_partkey", "l_partkey"),
      Some("""SELECT p.* FROM part p
              WHERE EXISTS (SELECT 1 FROM lineitem l
                            WHERE l.l_partkey = p.p_partkey
                              AND l.l_shipdate > TIMESTAMP '1996-01-01')""")),

    // Q10 — anti-join eviction (J5/K5).
    Entry(
      "q10_anti_join",
      (s, d) =>
        OnDemand.antiFilter(
          t(s, d, "customer").select("c_custkey"),
          t(s, d, "orders"), "c_custkey", "o_custkey"),
      Some("""SELECT c.c_custkey FROM customer c
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_custkey = c.c_custkey)""")),

    // Q11 — retention horizon (F2): keep events within 10 days of the max.
    Entry(
      "q11_retention",
      (s, d) =>
        OnDemand.retainWithin(Tables.events(s, d), "ts", TenDaysUs),
      Some("""SELECT event_id, epoch_us(ts) AS ts, user_id, event_type,
                     value, props
              FROM events
              WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 10 DAY""")),

    // Q12 — CDC upsert semantics (K3/A3): newest write per (user, type) wins.
    Entry(
      "q12_cdc_upsert",
      (s, d) =>
        Compaction
          .latestByKey(
            Tables.events(s, d).select("user_id", "event_type", "value", "ts"),
            Seq("user_id", "event_type"), "ts"),
      Some("""SELECT user_id, event_type, arg_max(value, ts) AS value,
                     epoch_us(MAX(ts)) AS ts
              FROM events GROUP BY user_id, event_type""")),

    // Q13 — JSON field extraction (P2).
    Entry(
      "q13_json",
      (s, d) =>
        t(s, d, "events")
          .select(col("event_id"), get_json_object(col("props"), "$.k").as("k")),
      Some("""SELECT event_id, json_extract_string(props, '$.k') AS k
              FROM events""")),

    // Q14 — epoch cast round-trip + formatting (P4/P5).
    Entry(
      "q14_epoch_format",
      (s, d) =>
        Tables.events(s, d).select(
          col("event_id"),
          expr("ts div 1000").as("ts_ms"),
          date_format(timestamp_micros(col("ts")), "yyyy-MM-dd HH:mm:ss.SSS")
            .as("ts_str")),
      Some("""SELECT event_id, epoch_us(ts) // 1000 AS ts_ms,
                     strftime(make_timestamp(epoch_us(ts)),
                              '%Y-%m-%d %H:%M:%S.%g') AS ts_str
              FROM events""")),

    // Q15 — NaN normalization + ordered fold (P11/P12/A4): the reference's
    // unordered mkString made deterministic by ordering on event_id.
    Entry(
      "q15_nan_fold",
      (s, d) => {
        val ev = Tables.events(s, d)
        val noisy = when(col("value") < 50, lit(Double.NaN))
          .otherwise(col("value"))
        val clean = Oee.nanToZero(noisy)
        ev.select(
            col("user_id"), col("event_id"),
            format_string("%.3f", clean).as("s"),
            when(isnan(noisy), 1).otherwise(0).as("is_nan"))
          .groupBy("user_id")
          .agg(
            concat_ws(
              ",",
              transform(
                array_sort(collect_list(struct(col("event_id"), col("s")))),
                x => x.getField("s"))).as("folded"),
            count(when(col("is_nan") === 1, 1)).as("n_nan"))
      },
      Some("""SELECT user_id,
                     string_agg(printf('%.3f', CASE WHEN value < 50 THEN 0.0
                                                    ELSE value END),
                                ',' ORDER BY event_id) AS folded,
                     COUNT(*) FILTER (WHERE value < 50) AS n_nan
              FROM events GROUP BY user_id""")),

    // Q16 — general grouped aggregation (generalizes A4; TPC-H Q1 shape).
    Entry(
      "q16_group_agg",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            round(sum("l_quantity"), 4).as("sum_qty"),
            round(avg("l_extendedprice"), 4).as("avg_price"),
            count(lit(1)).as("cnt")),
      Some("""SELECT l_returnflag, l_linestatus,
                     ROUND(SUM(l_quantity), 4) AS sum_qty,
                     ROUND(AVG(l_extendedprice), 4) AS avg_price,
                     COUNT(*) AS cnt
              FROM lineitem GROUP BY l_returnflag, l_linestatus""")),

    // Q17 — tumbling-window aggregation (T1/T2 batch equivalent): 10-minute
    // buckets per user.
    Entry(
      "q17_window_agg",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(
            col("user_id"),
            expr(s"ts div $TenMinUs").as("bucket"))
          .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sum_value")),
      Some(s"""SELECT user_id, epoch_us(ts) // $TenMinUs AS bucket,
                      COUNT(*) AS cnt, ROUND(SUM(value), 4) AS sum_value
               FROM events GROUP BY 1, 2""")),

    // Q21 — session windows (§2.8/T2): Spark's built-in session_window
    // (merge events whose gaps are under 30 minutes; window end = last event
    // + gap) vs the classic gaps-and-islands formulation in DuckDB. A new
    // session starts when the gap is >= the threshold — session_window
    // treats touching-but-not-overlapping windows as separate.
    Entry(
      "q21_sessions",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(
            col("user_id"),
            session_window(timestamp_micros(col("ts")), "30 minutes").as("w"))
          .agg(count(lit(1)).as("cnt"))
          .select(
            col("user_id"), col("w.start").as("session_start"),
            col("w.end").as("session_end"), col("cnt")),
      Some("""WITH flagged AS (
                SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                             OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                >= INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_s
                FROM events),
              sess AS (
                SELECT user_id, ts,
                       SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) AS sid
                FROM flagged)
              SELECT user_id, MIN(ts) AS session_start,
                     MAX(ts) + INTERVAL 30 MINUTE AS session_end,
                     COUNT(*) AS cnt
              FROM sess GROUP BY user_id, sid""")),

    // Q22 — as-of join (temporal point lookup): each event picks up the
    // latest order of the same customer at-or-before the event time. The
    // oracle mirrors the same union+running-window formulation (testdata has
    // duplicate (custkey, orderdate) pairs, so the struct tie-break is what
    // makes BOTH sides deterministic — a native ASOF JOIN would not be).
    Entry(
      "q22_asof",
      (s, d) => {
        val ev = Tables.events(s, d).select("event_id", "user_id", "ts")
        val ord = t(s, d, "orders").select(
          col("o_custkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("o_t"),
          col("o_orderkey"), col("o_totalprice"))
        AsOfJoin.asOf(
          ev, ord, Seq("user_id"), Seq("o_custkey"), "ts", "o_t",
          Seq("o_orderkey", "o_totalprice"))
      },
      Some("""WITH r AS (SELECT o_custkey AS k, epoch_us(o_orderdate) AS t, 0 AS tag,
                                {'o_orderkey': o_orderkey, 'o_totalprice': o_totalprice} AS p,
                                CAST(NULL AS BIGINT) AS event_id
                         FROM orders),
                   l AS (SELECT user_id AS k, epoch_us(ts) AS t, 1 AS tag,
                                CAST(NULL AS STRUCT(o_orderkey BIGINT, o_totalprice DOUBLE)) AS p,
                                event_id
                         FROM events),
                   u AS (SELECT * FROM r UNION ALL SELECT * FROM l),
                   m AS (SELECT k, t, tag, event_id,
                                last_value(p IGNORE NULLS) OVER (
                                  PARTITION BY k ORDER BY t, tag, p
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mp
                         FROM u)
              SELECT event_id, k AS user_id, t AS ts,
                     mp.o_orderkey AS o_orderkey, mp.o_totalprice AS o_totalprice
              FROM m WHERE tag = 1""")),

    // Q24 — the SKEW-RESISTANT as-of join (AsOfJoin.asOfBucketed): same
    // semantics and same oracle as q22, but the running window partitions by
    // (customer, 30-day time bucket) with a carry pass across buckets, so a
    // hot customer cannot serialize one task at 100 TB. Output equality with
    // q22 is exactly what the shared oracle pins.
    Entry(
      "q24_asof_bucketed",
      (s, d) => {
        val ev = Tables.events(s, d).select("event_id", "user_id", "ts")
        val ord = t(s, d, "orders").select(
          col("o_custkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("o_t"),
          col("o_orderkey"), col("o_totalprice"))
        AsOfJoin.asOfBucketed(
          ev, ord, Seq("user_id"), Seq("o_custkey"), "ts", "o_t",
          Seq("o_orderkey", "o_totalprice"), bucketWidth = 3 * TenDaysUs)
      },
      Some("""WITH r AS (SELECT o_custkey AS k, epoch_us(o_orderdate) AS t, 0 AS tag,
                                {'o_orderkey': o_orderkey, 'o_totalprice': o_totalprice} AS p,
                                CAST(NULL AS BIGINT) AS event_id
                         FROM orders),
                   l AS (SELECT user_id AS k, epoch_us(ts) AS t, 1 AS tag,
                                CAST(NULL AS STRUCT(o_orderkey BIGINT, o_totalprice DOUBLE)) AS p,
                                event_id
                         FROM events),
                   u AS (SELECT * FROM r UNION ALL SELECT * FROM l),
                   m AS (SELECT k, t, tag, event_id,
                                last_value(p IGNORE NULLS) OVER (
                                  PARTITION BY k ORDER BY t, tag, p
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mp
                         FROM u)
              SELECT event_id, k AS user_id, t AS ts,
                     mp.o_orderkey AS o_orderkey, mp.o_totalprice AS o_totalprice
              FROM m WHERE tag = 1""")),

    // Q23 — grouped EXACT quantiles by distributed rank selection
    // ([[Quantiles.exactGroupedMulti]]): two balanced passes (range-slice
    // count, then rank-within-slice + interpolate), NO per-group value
    // buffer — the `percentile` built-in's ObjectHashAggregate holds every
    // group value in one buffer, an executor OOM by design with 3 groups at
    // 100 TB. Both value columns ride the SAME two exchanges (melted with a
    // column tag as an extra group key) instead of two independent two-pass
    // jobs. Same linear interpolation as `percentile`/`quantile_cont`, so
    // the oracle hash-matches. The one-pass approximate companion is the
    // mergeable sketch ([[graft.functions.Sketches.approxQuantiles]]).
    Entry(
      "q23_quantiles",
      (s, d) => {
        val li = t(s, d, "lineitem")
        Quantiles.exactGroupedMulti(
            li, Seq("l_returnflag"),
            Seq(
              "l_quantity" -> Seq("p25_qty" -> 0.25, "p50_qty" -> 0.5),
              "l_extendedprice" -> Seq("p90_price" -> 0.9)))
          .select(
            col("l_returnflag"),
            stableRound(col("p25_qty"), 6).as("p25_qty"),
            stableRound(col("p50_qty"), 6).as("p50_qty"),
            stableRound(col("p90_price"), 6).as("p90_price"))
      },
      Some("""SELECT l_returnflag,
                     ROUND(quantile_cont(l_quantity, 0.25) + 1e-9, 6) AS p25_qty,
                     ROUND(quantile_cont(l_quantity, 0.5) + 1e-9, 6) AS p50_qty,
                     ROUND(quantile_cont(l_extendedprice, 0.9) + 1e-9, 6) AS p90_price
              FROM lineitem GROUP BY l_returnflag""")),

    // Q25 — multi-level (ROLLUP) aggregation: detail + per-flag subtotal +
    // grand total in ONE pass. Spark expands the grouping sets inside a
    // single hash aggregate (partials map-side combined per set) — at 100 TB
    // this is strictly cheaper than the 3-query union users write instead;
    // `grouping_id()` and DuckDB's `GROUPING()` share bit semantics (bit =
    // column aggregated out), so the oracle hash-matches the NULL-filled
    // subtotal rows too.
    Entry(
      "q25_rollup",
      (s, d) =>
        t(s, d, "lineitem")
          .rollup("l_returnflag", "l_linestatus")
          .agg(
            grouping_id().as("gid"),
            round(sum("l_quantity"), 4).as("sum_qty"),
            round(avg("l_extendedprice"), 4).as("avg_price"),
            count(lit(1)).as("cnt")),
      Some("""SELECT l_returnflag, l_linestatus,
                     CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
                     ROUND(SUM(l_quantity), 4) AS sum_qty,
                     ROUND(AVG(l_extendedprice), 4) AS avg_price,
                     COUNT(*) AS cnt
              FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""")),

    // Q26 — pivot (long→wide): per-user sum of `value` per event type as
    // columns. The pivot values are DECLARED, not discovered — the
    // two-arg `pivot(col)` form runs an extra distinct scan + driver collect
    // just to learn the column list, which at 100 TB is a full pass of the
    // fact table before the real one. Declared values make it one hash
    // aggregate (pivot aggregates are map-side combined per (user, type)).
    Entry(
      "q26_pivot",
      (s, d) =>
        Tables.events(s, d)
          .groupBy("user_id")
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(round(sum("value"), 4)),
      Some("""SELECT user_id,
                     ROUND(SUM(value) FILTER (WHERE event_type = 'click'), 4) AS click,
                     ROUND(SUM(value) FILTER (WHERE event_type = 'error'), 4) AS error,
                     ROUND(SUM(value) FILTER (WHERE event_type = 'purchase'), 4) AS purchase,
                     ROUND(SUM(value) FILTER (WHERE event_type = 'signup'), 4) AS signup,
                     ROUND(SUM(value) FILTER (WHERE event_type = 'view'), 4) AS view
              FROM events GROUP BY user_id""")),

    // Q27 — inter-event gaps (lag): per-user avg/max time between
    // consecutive events, the classic engagement-cadence metric. The window
    // partitions by user — groups are user-sized (bounded, high-cardinality
    // key), the balanced case for windows; the (ts, event_id) tie-break
    // makes the lag deterministic under duplicate timestamps, and the GAP
    // multiset is tie-order-invariant anyway (consecutive diffs of the
    // sorted sequence).
    Entry(
      "q27_event_gaps",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
        Tables.events(s, d)
          .withColumn("_gap", col("ts") - lag("ts", 1).over(w))
          .groupBy("user_id")
          .agg(
            count(lit(1)).as("cnt"),
            count(col("_gap")).as("n_gaps"),
            // EXACT mean, reported in SECONDS: integer gap sum (lossless in
            // long) ÷ count ÷ 1e6, same operation order as the oracle, so
            // the doubles agree bit-for-bit. In µs the magnitude (~3e10)
            // puts 6 dp past double precision and ROUND itself diverges
            // across engines (DuckDB's ×10⁶ step overflows 2^53).
            operators.stableRound(
              sum(col("_gap")).cast("double") / count(col("_gap")) / 1000000.0,
              6).as("avg_gap_s"),
            max(col("_gap")).as("max_gap_us"))
      },
      Some("""WITH g AS (SELECT user_id, event_id,
                                epoch_us(ts) - lag(epoch_us(ts)) OVER (
                                  PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
                         FROM events)
              SELECT user_id, count(*) AS cnt, count(gap) AS n_gaps,
                     ROUND(CAST(sum(gap) AS DOUBLE) / count(gap) / 1000000.0 + 1e-9, 6) AS avg_gap_s,
                     max(gap) AS max_gap_us
              FROM g GROUP BY user_id""")),

    // Q28 — hopping (sliding) windows: 30-minute window every 10 minutes via
    // the built-in `window()` — each event lands in window÷slide = 3 epoch-
    // aligned windows (start ≡ 0 mod slide), the streaming-native windowing
    // T2 covers with tumbling only. Scale: window() EXPLODES each row into 3
    // before one hash aggregate — partial aggregation absorbs the 3× on the
    // map side, shuffle ∝ distinct (user, window) groups, no sort, no
    // window-function partition. The oracle replays the alignment rule
    // arithmetically (window = 3·slide exactly ⇒ every event is in exactly
    // the 3 windows ending at its slide bucket).
    Entry(
      "q28_hop_window",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(
            col("user_id"),
            window(timestamp_micros(col("ts")), "30 minutes", "10 minutes")
              .as("_w"))
          .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sum_value"))
          .select(
            col("user_id"), unix_micros(col("_w.start")).as("win_start"),
            col("cnt"), col("sum_value")),
      Some(s"""SELECT user_id,
                      (epoch_us(ts) // $TenMinUs - i) * $TenMinUs AS win_start,
                      COUNT(*) AS cnt, ROUND(SUM(value), 4) AS sum_value
               FROM events, (SELECT unnest(range(0, 3)) AS i) r
               GROUP BY 1, 2""")),

    // Q29 — Bloom-pruned exact semi join (J-family at scale): lineitems of
    // high-value orders. [[BloomJoin.semiPruned]] builds a Bloom filter over
    // the selective dim keys, broadcasts it, and rejects non-matching fact
    // rows INSIDE the scan stage before the exchange — the shuffle is sized
    // by the ~8% answer, not the 100% input. The exact left-semi join then
    // removes Bloom false positives, so rows are identical to the plain semi
    // join the oracle runs.
    Entry(
      "q29_bloom_semi",
      (s, d) =>
        BloomJoin.semiPruned(
          t(s, d, "lineitem"), "l_orderkey",
          t(s, d, "orders")
            .filter(col("o_totalprice") > 450000)
            .select("o_orderkey"),
          "o_orderkey"),
      Some("""SELECT l.* FROM lineitem l
              WHERE EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = l.l_orderkey
                              AND o.o_totalprice > 450000)"""))
      ,

    // Q30 — star-schema analytics (the TPC-H-Q5-shaped multi-join the
    // north-star "analytics engine" owes): revenue per nation over open
    // orders. Plan shape at 100 TB: the date predicate pushes to the orders
    // scan, fact⋈orders and ⋈customer shuffle on their keys (AQE sizes
    // them), nation broadcasts explicitly — three joins, ONE aggregate, no
    // window. Revenue = Σ price·(1−discount), rounded after the aggregate.
    Entry(
      "q30_star_join",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val o = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp_ntz"))
        val c = t(s, d, "customer")
        val n = t(s, d, "nation")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
              .as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some("""SELECT n.n_name AS n_name,
                     ROUND(SUM(l.l_extendedprice * (1.0 - l.l_discount)), 2) AS revenue,
                     COUNT(*) AS n_items
              FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              JOIN customer c ON o.o_custkey = c.c_custkey
              JOIN nation n ON c.c_nationkey = n.n_nationkey
              WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
              GROUP BY n.n_name""")),

    // Q31 — bounded time-RANGE rolling aggregate (§2.8's missing frame
    // kind): per customer, order count and spend over the trailing 30 days
    // INCLUDING the current order — a value-based frame (`rangeBetween` on
    // epoch seconds), not a row-count frame, so same-timestamp orders are
    // all in each other's frames on both engines identically. Scale: one
    // exchange on the partition key; frames are resolved by a per-key sort
    // + two pointers, never a per-row rescan. A pathologically hot key
    // serializes its partition like any keyed window — q24's (key, bucket)
    // split applies if one customer dominates (not a TPC-H shape).
    Entry(
      "q31_rolling_range",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val o = t(s, d, "orders").select(
          col("o_custkey"), col("o_orderkey"),
          (unix_micros(col("o_orderdate").cast("timestamp")) / 1000000L)
            .cast("long").as("t"),
          col("o_totalprice"))
        val w = Window.partitionBy("o_custkey").orderBy(col("t"))
          .rangeBetween(-30L * 86400, 0)
        o.select(
          col("o_custkey"), col("o_orderkey"), col("t"),
          count(lit(1)).over(w).as("n_30d"),
          round(sum(col("o_totalprice")).over(w) + lit(1e-9), 6).as("sum_30d"))
      },
      Some("""WITH o AS (SELECT o_custkey, o_orderkey,
                                epoch(o_orderdate)::BIGINT AS t, o_totalprice
                         FROM orders)
              SELECT o_custkey, o_orderkey, t,
                     COUNT(*) OVER w AS n_30d,
                     ROUND(SUM(o_totalprice) OVER w + 1e-9, 6) AS sum_30d
              FROM o
              WINDOW w AS (PARTITION BY o_custkey ORDER BY t
                           RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)""")),

    // Q32 — per-column data profile (ingest diagnostic): null count, exact
    // distinct cardinality, range, mean for the fact table's numeric
    // columns — ONE corpus pass (single aggregate, stack unpivot), never a
    // pass per column.
    Entry(
      "q32_profile",
      (s, d) =>
        operators.Profiling.numericProfile(
          t(s, d, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")),
      Some(Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").map(c =>
        s"""SELECT '$c' AS col_name,
                   COUNT(*) - COUNT($c) AS n_nulls,
                   COUNT(DISTINCT $c) AS n_distinct,
                   CAST(MIN($c) AS DOUBLE) AS vmin,
                   CAST(MAX($c) AS DOUBLE) AS vmax,
                   ROUND(AVG($c) + 1e-9, 6) AS mean
            FROM lineitem""").mkString(" UNION ALL ")))
  )

  def all: Seq[Entry] = core ++ QueriesExt.all

  def byName: Map[String, QueryFn] =
    all.map(e => e.name -> e.run).toMap

  def oracles: Map[String, String] =
    all.flatMap(e => e.oracle.map(o => e.name -> o.linesIterator
      .map(_.trim).filter(_.nonEmpty).mkString(" "))).toMap
}
