package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.graph.Triangles

/** Advanced analytics beyond the reference's own surface: sessionization,
  * hierarchical rollups, exact percentiles, as-of alignment. Each maps to
  * a built-in Spark shape (SURVEY §7.3 preference (a): compose built-ins)
  * and carries a DuckDB oracle.
  */
object Advanced extends QueryPack {

  override val queries: Map[String, Q] = Map(

    // Semi-structured extraction: pull a typed field out of the JSON props
    // payload and aggregate — the standard ingest-time shape for
    // property-bag columns (get_json_object is codegen'd; the JSON never
    // leaves the scan stage as a string payload wider than needed).
    "q58_json_extract" -> Q(
      (s, d) => Tables.events(s, d)
        .select(col("event_type"),
          // try_cast both here and in the oracle: a malformed or
          // fractional k becomes NULL (excluded from the aggregates) in
          // BOTH engines instead of throwing in one (Spark ANSI cast
          // errors; DuckDB ::BIGINT errors)
          expr("try_cast(get_json_object(props, '$.k') AS bigint)").as("k"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n"), sum(col("k")).as("sum_k"),
             min(col("k")).as("min_k"), max(col("k")).as("max_k")),
      Some("""
        SELECT event_type, count(k) AS n, sum(k)::BIGINT AS sum_k,
               min(k) AS min_k, max(k) AS max_k
        FROM (SELECT event_type, TRY_CAST(props->>'k' AS BIGINT) AS k
              FROM events)
        GROUP BY 1""")),

    // Sessionization: gaps-and-islands with a 30-minute inactivity timeout.
    // One shuffle on user_id; the session id is a running sum of gap flags
    // — the batch shape of Structured Streaming's session_window.
    "q25_sessionize" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .withColumn("gap",
            when(unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
                   > 30L * 60 * 1000000, 1L).otherwise(0L))
          .withColumn("session_id", sum(col("gap")).over(wRun))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
               round(sum(col("value")), 2).as("session_value"),
               date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
               ((unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
                 .cast("long") / lit(1000000L)).cast("long").as("duration_s"))
      },
      Some("""
        WITH flagged AS (
          SELECT user_id, ts, event_id, value,
                 CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30*60*1000000
                      THEN 1 ELSE 0 END AS gap
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sessions AS (
          SELECT *, sum(gap) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    ::BIGINT AS session_id
          FROM flagged)
        SELECT user_id, session_id, count(*) AS n_events,
               round(sum(value), 2) AS session_value,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS duration_s
        FROM sessions GROUP BY 1, 2""")),

    // Hierarchical ROLLUP: revenue at (flag, status), (flag), and grand
    // total in one pass — Spark expands grouping sets, two-phase agg.
    "q26_rollup" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_extendedprice")), 2).as("revenue"),
             count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
                coalesce(col("l_linestatus"), lit("ALL")).as("status"),
                col("revenue"), col("n")),
      Some("""
        SELECT coalesce(l_returnflag, 'ALL') AS flag,
               coalesce(l_linestatus, 'ALL') AS status,
               round(sum(l_extendedprice), 2) AS revenue, count(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)""")),

    // Exact interpolated percentiles per group (both engines implement the
    // same linear-interpolation definition: rank = p·(n−1)).
    "q27_percentiles" -> Q(
      (s, d) => Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(round(expr("percentile(value, 0.5)"), 4).as("p50"),
             round(expr("percentile(value, 0.9)"), 4).as("p90"),
             round(expr("percentile(value, 0.99)"), 4).as("p99")),
      Some("""
        SELECT event_type,
               round(quantile_cont(value, 0.5), 4)  AS p50,
               round(quantile_cont(value, 0.9), 4)  AS p90,
               round(quantile_cont(value, 0.99), 4) AS p99
        FROM events GROUP BY event_type""")),

    // As-of (backward) alignment: for every purchase, the value of the
    // same user's LATEST strictly-earlier click. Implemented without a
    // range join: one windowed last-non-null with a RANGE frame ending at
    // -1 µs over the unioned, time-ordered stream — shuffle on user_id
    // only, no quadratic candidate set. (DuckDB side uses its native
    // ASOF JOIN — same strictly-earlier semantics.)
    "q29_asof_join" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("tsu"))
          .rangeBetween(Window.unboundedPreceding, -1)
        Tables.events(s, d)
          .withColumn("tsu", unix_micros(col("ts")))
          .withColumn("click_v", when(col("event_type") === "click", col("value")))
          .withColumn("last_click", last(col("click_v"), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("value"), col("last_click"))
      },
      Some("""
        WITH clicks AS (SELECT user_id, ts, value FROM events
                        WHERE event_type = 'click'),
             purch  AS (SELECT user_id, ts, event_id, value FROM events
                        WHERE event_type = 'purchase')
        SELECT p.event_id, p.user_id, p.value, c.value AS last_click
        FROM purch p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts > c.ts""")),

    // Interval-point RANGE JOIN, binned into an equi-join (RangeJoin
    // scaladoc has the construction and skew levers): orders "open" at
    // each weekly probe instant — interval = [orderdate, orderdate +
    // (1..30 key-derived days)], probes = the Monday spine over the
    // order range. The oracle states the bare non-equi join; the Spark
    // side must NOT (that plans as a nested loop) — binning is the
    // scale path, and the 7-day bin matches the probe grid so each
    // interval replicates ≤ 6 times.
    "q107_interval_join" -> Q(
      (s, d) => {
        val orders = Tables.orders(s, d)
        val iv = orders.select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderdate").as("s"),
          timestamp_add("DAY", (col("o_orderkey") % 30 + 1).cast("int"),
            col("o_orderdate")).as("e"))
        val pts = graft.core.TimeUtil.spineOver(orders, "o_orderdate", "week", "7 days")
          .select(col("ts").as("p"))
        graft.ops.RangeJoin.intervalPointJoin(iv, pts, "s", "e", "p",
            binSeconds = 7L * 86400L)
          .groupBy(date_format(col("p"), "yyyy-MM-dd").as("week"))
          .agg(count(lit(1)).as("n_open"),
            round(sum(col("o_totalprice")), 2).as("open_value"))
      },
      Some("""
        WITH bounds AS (SELECT date_trunc('week', min(o_orderdate)) AS lo,
                               date_trunc('week', max(o_orderdate)) AS hi
                        FROM orders),
        pts AS (SELECT unnest(generate_series(lo, hi, INTERVAL 7 DAY)) AS p
                FROM bounds),
        iv AS (SELECT o_orderkey, o_totalprice, o_orderdate AS s,
                      o_orderdate + (o_orderkey % 30 + 1) * INTERVAL 1 DAY AS e
               FROM orders)
        SELECT strftime(p, '%Y-%m-%d') AS week, count(*)::BIGINT AS n_open,
               round(sum(o_totalprice), 2) AS open_value
        FROM pts JOIN iv ON iv.s <= pts.p AND pts.p <= iv.e
        GROUP BY 1""")),

    // Interval-INTERVAL overlap join, same binning with the
    // first-shared-bin residual giving exactly-once pairs without a
    // post-join distinct: order fulfillment windows vs 10-day monthly
    // audit windows.
    "q108_overlap_join" -> Q(
      (s, d) => {
        val orders = Tables.orders(s, d)
        val iv = orders.select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderdate").as("s"),
          timestamp_add("DAY", (col("o_orderkey") % 30 + 1).cast("int"),
            col("o_orderdate")).as("e"))
        val audits = graft.core.TimeUtil
          .spineOver(orders, "o_orderdate", "month", "1 month")
          .select(col("ts").as("w_start"),
            timestamp_add("DAY", lit(9), col("ts")).as("w_end"))
        graft.ops.RangeJoin.intervalOverlapJoin(iv, audits,
            "s", "e", "w_start", "w_end", binSeconds = 7L * 86400L)
          .groupBy(date_format(col("w_start"), "yyyy-MM-dd").as("audit_month"))
          .agg(count(lit(1)).as("n_overlap"),
            round(sum(col("o_totalprice")), 2).as("overlap_value"))
      },
      Some("""
        WITH bounds AS (SELECT date_trunc('month', min(o_orderdate)) AS lo,
                               date_trunc('month', max(o_orderdate)) AS hi
                        FROM orders),
        aud AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS ws
                FROM bounds),
        audw AS (SELECT ws, ws + 9 * INTERVAL 1 DAY AS we FROM aud),
        iv AS (SELECT o_orderkey, o_totalprice, o_orderdate AS s,
                      o_orderdate + (o_orderkey % 30 + 1) * INTERVAL 1 DAY AS e
               FROM orders)
        SELECT strftime(ws, '%Y-%m-%d') AS audit_month,
               count(*)::BIGINT AS n_overlap,
               round(sum(o_totalprice), 2) AS overlap_value
        FROM audw JOIN iv ON iv.s <= audw.we AND audw.ws <= iv.e
        GROUP BY 1""")),

    // Robust per-user outliers by MEDIAN ABSOLUTE DEVIATION (the
    // classical robust z: |x − med| > 3·1.4826·MAD — mean/stddev-based
    // z-scores are poisoned by the very outliers they hunt; median/MAD
    // have a 50% breakdown point). Numeric determinism: values snap to
    // the micro grid FIRST, and both median passes run over
    // integer-valued inputs DOUBLED at each interpolation (×2 at the
    // median, ×2 again at the MAD) so every intermediate stays an
    // integer-valued double — (a+b)/2 and a+(b−a)·0.5 are then the same
    // exact fp value and the two engines' interpolated quantiles agree
    // bit-for-bit, which a raw-double median cannot promise at the ulp.
    // Shape: two grouped exact percentiles + a join-back, all on the
    // user_id layout (one exchange each, partial-agg'd); at 100 TB the
    // exact per-group sort-agg gives way to the bounded-histogram walk
    // (q78/q88 machinery) — same outputs on micro ints.
    "q109_mad_outliers" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("value"),
            floor(col("value") * 1e6 + 0.5).cast("long").as("vm"))
        val med = ev.groupBy("user_id")
          .agg(expr("2 * percentile(vm, 0.5)").as("med2"))
        val dev = ev.join(med, Seq("user_id"))
          .withColumn("adev2", abs(col("vm") * 2 - col("med2")))
        val mad = dev.groupBy("user_id")
          .agg(expr("2 * percentile(adev2, 0.5)").as("mad4"))
        dev.join(mad, Seq("user_id"))
          .filter(col("mad4") > 0 && col("adev2") * 2 > lit(4.4478) * col("mad4"))
          .select(col("event_id"), col("user_id"), col("value"),
            round(col("adev2") * 2 / (lit(1.4826) * col("mad4")), 4).as("robust_z"))
      },
      Some("""
        WITH ev AS (SELECT event_id, user_id, value,
                           floor(value * 1e6 + 0.5)::BIGINT AS vm FROM events),
        med AS (SELECT user_id, 2 * quantile_cont(vm, 0.5) AS med2
                FROM ev GROUP BY 1),
        dev AS (SELECT e.event_id, e.user_id, e.value,
                       abs(2 * e.vm - m.med2) AS adev2
                FROM ev e JOIN med m USING (user_id)),
        mad AS (SELECT user_id, 2 * quantile_cont(adev2, 0.5) AS mad4
                FROM dev GROUP BY 1)
        SELECT d.event_id, d.user_id, d.value,
               round(2 * d.adev2 / (1.4826 * m.mad4), 4) AS robust_z
        FROM dev d JOIN mad m USING (user_id)
        WHERE m.mad4 > 0 AND 2 * d.adev2 > 4.4478 * m.mad4""")),

    // Sequential FUNNEL (view → click-after-view → purchase-after-click):
    // each stage is the min timestamp STRICTLY AFTER the previous
    // stage's — the order-sensitive semantics a per-type min cannot
    // express (a click before the first view must not count). Three
    // chained user-keyed aggregates; every exchange is on user_id, so
    // the layout is paid once and reused. Timestamps compare as µs ints
    // in both engines (events.ts floor-truncates to µs on the Spark
    // side; epoch_us truncates the ns payload in the oracle).
    "q110_funnel" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d).select(col("user_id"),
          col("event_type"), unix_micros(col("ts")).as("tu"))
        val v = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("tu")).as("t_view"))
        val c = ev.filter(col("event_type") === "click")
          .join(v, Seq("user_id")).filter(col("tu") > col("t_view"))
          .groupBy("user_id").agg(min(col("tu")).as("t_click"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(c, Seq("user_id")).filter(col("tu") > col("t_click"))
          .groupBy("user_id").agg(min(col("tu")).as("t_purchase"))
        v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
          .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"))
      },
      Some("""
        WITH ev AS (SELECT user_id, event_type, epoch_us(ts)::BIGINT AS tu
                    FROM events),
        v AS (SELECT user_id, min(tu) AS t_view FROM ev
              WHERE event_type = 'view' GROUP BY 1),
        c AS (SELECT e.user_id, min(e.tu) AS t_click
              FROM ev e JOIN v USING (user_id)
              WHERE e.event_type = 'click' AND e.tu > v.t_view GROUP BY 1),
        p AS (SELECT e.user_id, min(e.tu) AS t_purchase
              FROM ev e JOIN c USING (user_id)
              WHERE e.event_type = 'purchase' AND e.tu > c.t_click GROUP BY 1)
        SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
        FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)""")),

    // Weekly RETENTION cohorts: users bucketed by the week of their
    // first event; n_active distinct users per (cohort, week offset).
    // First-event-week derivation and the activity scan share one user_id
    // exchange; the cohort matrix itself is bounded (weeks × offsets).
    "q111_retention" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
        val f = ev.groupBy("user_id").agg(min(col("w")).as("cw"))
        ev.join(f, Seq("user_id"))
          .groupBy(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
            expr("datediff(w, cw) div 7").cast("long").as("week_offset"))
          .agg(countDistinct(col("user_id")).as("n_active"))
      },
      Some("""
        WITH ev AS (SELECT user_id, date_trunc('week', ts) AS w FROM events),
        f AS (SELECT user_id, min(w) AS cw FROM ev GROUP BY 1)
        SELECT strftime(f.cw, '%Y-%m-%d') AS cohort_week,
               (date_diff('day', f.cw, e.w) // 7)::BIGINT AS week_offset,
               count(DISTINCT e.user_id)::BIGINT AS n_active
        FROM ev e JOIN f USING (user_id)
        GROUP BY 1, 2""")),

    // Weighted user co-occurrence graph: users sharing >= 4 distinct
    // (event_type, hour) activity buckets become an edge — the blocked
    // pair discipline (pairs enumerated only within a bucket, one
    // pair-keyed count shuffle; graph/Triangles.scala has the hub-bucket
    // cap note for the 100 TB shape). Hour bucket is integer
    // micros-div-3600e6: engine-portable, no timestamp rendering.
    "q113_cooccur_edges" -> Q(
      (s, d) => Triangles.coOccurrenceEdges(
        Tables.events(s, d).select(col("user_id"),
          col("event_type"),
          expr("unix_micros(ts) div 3600000000").as("hb")),
        "user_id", Seq("event_type", "hb"), minShared = 4L)
        .select(col("a").as("user_a"), col("b").as("user_b"), col("shared")),
      Some("""
        WITH b AS (
          SELECT DISTINCT event_type, epoch_us(ts) // 3600000000 AS hb,
                 user_id
          FROM events)
        SELECT a.user_id AS user_a, c.user_id AS user_b,
               count(*)::BIGINT AS shared
        FROM b a JOIN b c USING (event_type, hb)
        WHERE a.user_id < c.user_id
        GROUP BY 1, 2 HAVING count(*) >= 4""")),

    // OCCUPANCY-CAPPED co-occurrence graph (graph/Triangles.scala): the
    // q113 edge builder with the hub-bucket cap in the QUERY DEFINITION
    // — SCALE.md F10's documented 100 TB dial as a first-class,
    // oracle-checked operator (a bucket holding more than 40 distinct
    // users carries crowd-size signal, not pairwise behavior, and its
    // cap² term is what densifies the fixed-calendar graph). The cap
    // binds at sf0.1 (27 of 3600 buckets dropped; cap-constant
    // corruption FAILs there) and is inert below (sf0.01 max occupancy
    // 10) — the q208 binding precedent, covered by the 3-SF check.
    "q210_cooccur_capped" -> Q(
      (s, d) => Triangles.coOccurrenceEdges(
        Tables.events(s, d).select(col("user_id"),
          col("event_type"),
          expr("unix_micros(ts) div 3600000000").as("hb")),
        "user_id", Seq("event_type", "hb"), minShared = 4L,
        maxOccupancy = 40L)
        .select(col("a").as("user_a"), col("b").as("user_b"), col("shared")),
      Some("""
        WITH b AS (
          SELECT DISTINCT event_type, epoch_us(ts) // 3600000000 AS hb,
                 user_id
          FROM events),
        keep AS (SELECT event_type, hb FROM b
                 GROUP BY 1, 2 HAVING count(*) <= 40),
        bk AS (SELECT b.* FROM b JOIN keep USING (event_type, hb))
        SELECT a.user_id AS user_a, c.user_id AS user_b,
               count(*)::BIGINT AS shared
        FROM bk a JOIN bk c USING (event_type, hb)
        WHERE a.user_id < c.user_id
        GROUP BY 1, 2 HAVING count(*) >= 4""")),

    // Per-user triangle participation over the q113 graph — local
    // community structure (PageRank q77 is the centrality view; this is
    // the clustering view). Degree-ordered orientation bounds the wedge
    // join at E^1.5 on ANY degree distribution — the hub-safe triangle
    // algorithm (scaladoc cites the construction). The oracle enumerates
    // ordered triangles with a 3-way self-join and unpivots the corners.
    "q114_triangle_counts" -> Q(
      (s, d) => Triangles.triangleCounts(
        Triangles.coOccurrenceEdges(
          Tables.events(s, d).select(col("user_id"),
            col("event_type"),
            expr("unix_micros(ts) div 3600000000").as("hb")),
          "user_id", Seq("event_type", "hb"), minShared = 4L),
        "a", "b")
        .select(col("node").as("user_id"), col("n_triangles")),
      Some("""
        WITH b AS (
          SELECT DISTINCT event_type, epoch_us(ts) // 3600000000 AS hb,
                 user_id
          FROM events),
        e AS (
          SELECT a.user_id AS a, c.user_id AS b
          FROM b a JOIN b c USING (event_type, hb)
          WHERE a.user_id < c.user_id
          GROUP BY 1, 2 HAVING count(*) >= 4),
        tri AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
          JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b)
        SELECT user_id, count(*)::BIGINT AS n_triangles
        FROM (SELECT x AS user_id FROM tri UNION ALL
              SELECT y FROM tri UNION ALL
              SELECT z FROM tri)
        GROUP BY 1""")),

    // Per-user value trend by EXACT-INTEGER least squares: x = hours
    // since the user's first event (bounded small), y = centi-value
    // (2-dp inputs snap exactly), slope = (n·Σxy − Σx·Σy)/(n·Σxx − Σx²)
    // with every sum an exact long — both engines divide the SAME two
    // integers, so the rounded double is bit-identical (the q109/PageRank
    // integer-numerics doctrine). One user-keyed exchange serves both
    // the min-window and the aggregation; degenerate single-hour users
    // yield NULL (zero denominator) in both engines.
    "q116_value_trend" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("tu"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("yc"))
          .withColumn("x",
            expr("(tu - min(tu) OVER (PARTITION BY user_id)) div 3600000000"))
        ev.groupBy("user_id")
          .agg(count(lit(1)).as("n_events"), sum(col("x")).as("sx"),
            sum(col("yc")).as("sy"), sum(col("x") * col("yc")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
          .select(col("user_id"), col("n_events"),
            when(col("n_events") * col("sxx") - col("sx") * col("sx") === 0,
              lit(null).cast("double"))
              .otherwise(round(
                (col("n_events") * col("sxy") - col("sx") * col("sy")).cast("double") /
                  (col("n_events") * col("sxx") - col("sx") * col("sx")).cast("double"),
                6)).as("slope_centi_per_h"))
      },
      Some("""
        WITH ev AS (
          SELECT user_id,
                 (epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY user_id))
                   // 3600000000 AS x,
                 floor(value * 100 + 0.5)::BIGINT AS yc
          FROM events),
        agg AS (
          SELECT user_id, count(*)::BIGINT AS n_events,
                 sum(x)::BIGINT AS sx, sum(yc)::BIGINT AS sy,
                 sum(x * yc)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx
          FROM ev GROUP BY 1)
        SELECT user_id, n_events,
               CASE WHEN n_events * sxx - sx * sx = 0 THEN NULL
                    ELSE round((n_events * sxy - sx * sy)::DOUBLE
                               / (n_events * sxx - sx * sx)::DOUBLE, 6)
               END AS slope_centi_per_h
        FROM agg""")),

    // Partition-level store checksums (anti-entropy / sync verification,
    // the operational complement to K5's versioned-put): one
    // order-independent 60-bit XOR of a canonical row rendering per
    // monthly partition. XOR is commutative — no sort, no collect,
    // constant per-group state, each partition verifiable independently
    // at any scale — and 2-dp quantities snap to centi-ints so the
    // rendering never hits float formatting.
    "q117_store_checksum" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .select(date_format(col("l_shipdate"), "yyyy-MM").as("yyyymm"),
          conv(substring(md5(concat_ws("|",
            col("l_orderkey"), col("l_linenumber"),
            floor(col("l_quantity") * 100 + lit(0.5)).cast("long"),
            date_format(col("l_shipdate"), "yyyy-MM-dd"))), 1, 15), 16, 10)
            .cast("long").as("h"))
        .groupBy("yyyymm")
        .agg(expr("bit_xor(h)").as("checksum"), count(lit(1)).as("n_rows")),
      Some("""
        SELECT strftime(l_shipdate, '%Y-%m') AS yyyymm,
               bit_xor(('0x' || substr(md5(
                 l_orderkey || '|' || l_linenumber || '|' ||
                 floor(l_quantity * 100 + 0.5)::BIGINT || '|' ||
                 strftime(l_shipdate, '%Y-%m-%d')), 1, 15))::BIGINT)
                 AS checksum,
               count(*) AS n_rows
        FROM lineitem GROUP BY 1""")),

    // Per-user EWMA level over the LAST 64 events (α = 0.05 — slow decay, so the window-boundary weights stay visibly nonzero after nano snapping; a fast decay would make the cutoff dead code): the
    // bounded-memory streaming smoother, unrolled so each
    // rank-from-newest carries a literal decay weight. The weight
    // tables are ONE driver-side multiply fold rendered into both
    // engines as nano-unit longs (Trend.ewmaWeightsNano — never a
    // cross-engine pow); terms micro-snap per row, the per-user sum is
    // an exact integer.
    "q159_ewma_level" -> Q(
      (s, d) => graft.ops.Trend.ewmaLastK(Tables.events(s, d), "user_id",
          "value", Seq(col("ts"), col("event_id")), alpha = 0.05, k = 64)
        .select(col("user_id"), col("n_events"), col("ewma_micro")),
      Some {
        val (body, tail) = graft.ops.Trend.ewmaWeightsNano(0.05, 64)
        val bodyL = body.mkString("[", ", ", "]")
        val tailL = tail.mkString("[", ", ", "]")
        s"""
        WITH ranked AS (
          SELECT user_id, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rk,
                 count(*) OVER (PARTITION BY user_id) AS n_events
          FROM events),
        wtd AS (
          SELECT user_id, n_events,
                 CASE WHEN rk = least(n_events, 64)
                      THEN $tailL[rk] ELSE $bodyL[rk] END AS wn,
                 value
          FROM ranked WHERE rk <= 64)
        SELECT user_id, max(n_events)::BIGINT AS n_events,
               sum(floor(value * wn / 1000.0 + 0.5)::BIGINT)::BIGINT
                 AS ewma_micro
        FROM wtd GROUP BY 1"""
      }),

    // Per-user CUSUM changepoint: the split k maximizing
    // |n·P_k − k·T| over centi-snapped values — n·k·|mean-shift| with
    // every intermediate an exact integer, ties to the smallest k, one
    // division at the normalized emit (Trend.cusumChangepoint).
    "q160_cusum_changepoint" -> Q(
      (s, d) => graft.ops.Trend.cusumChangepoint(Tables.events(s, d),
        "user_id", floor(col("value") * 100 + lit(0.5)).cast("long"),
        Seq(col("ts"), col("event_id"))),
      Some("""
        WITH ev AS (
          SELECT user_id,
                 floor(value * 100 + 0.5)::BIGINT AS xc,
                 row_number() OVER w AS rn,
                 sum(floor(value * 100 + 0.5)::BIGINT) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
                 count(*) OVER (PARTITION BY user_id) AS n,
                 sum(floor(value * 100 + 0.5)::BIGINT) OVER (
                   PARTITION BY user_id) AS t
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        interior AS (
          SELECT user_id, n, rn, abs(n * p - rn * t) AS absd, t
          FROM ev WHERE rn < n)
        SELECT user_id, n::BIGINT AS n_events, rn::BIGINT AS cp_k,
               absd::BIGINT AS dmax,
               floor(absd::DOUBLE * 1e6 / (n::DOUBLE * t::DOUBLE) + 0.5)::BIGINT
                 AS cusum_micro
        FROM interior
        QUALIFY row_number() OVER (PARTITION BY user_id
                                   ORDER BY absd DESC, rn) = 1""")),

    // FIRST-ORDER MARKOV transition matrix of event types: per-user
    // event sequences yield (prev → next) counts and row-normalized
    // transition probabilities — the behavioral-model summary every
    // funnel/attribution analysis starts from. One user-keyed window +
    // two integer aggregations; the division happens once per matrix
    // cell.
    "q170_event_transitions" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val seq = Tables.events(s, d)
          .withColumn("nxt", lead(col("event_type"), 1).over(w))
          .filter(col("nxt").isNotNull)
          .groupBy(col("event_type").as("prev_type"),
            col("nxt").as("next_type"))
          .agg(count(lit(1)).as("n"))
        val tot = seq.groupBy(col("prev_type")).agg(sum(col("n")).as("tn"))
        seq.join(tot, Seq("prev_type"))
          .select(col("prev_type"), col("next_type"), col("n"),
            floor(col("n").cast("double") * lit(1e6)
              / col("tn").cast("double") + lit(0.5)).cast("long")
              .as("p_micro"))
      },
      Some("""
        WITH seq AS (SELECT user_id, event_type,
                            lead(event_type) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS nxt
                     FROM events),
        c AS (SELECT event_type AS prev_type, nxt AS next_type,
                     count(*)::BIGINT AS n
              FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
        tot AS (SELECT prev_type, sum(n)::BIGINT AS tn FROM c GROUP BY 1)
        SELECT prev_type, next_type, n,
               floor(n::DOUBLE * 1e6 / tn::DOUBLE + 0.5)::BIGINT AS p_micro
        FROM c JOIN tot USING (prev_type)""")),

    // INTER-ARRIVAL TIME distribution: per event type, a log₂-bucketed
    // histogram of the gap (seconds) to the user's previous event —
    // the latency/cadence profile. The bucket is integer bit-length
    // (the q83 rho trick: length(bin(g)) — immune to fp log2 at exact
    // powers of two); gap 0 keeps its own bucket.
    "q171_interarrival_hist" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .withColumn("gap_s",
            ((unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
              / lit(1000000L)).cast("long"))
          .filter(col("gap_s").isNotNull)
          .withColumn("bucket",
            when(col("gap_s") === 0, lit(0L))
              .otherwise(length(bin(col("gap_s"))).cast("long")))
          .groupBy(col("event_type"), col("bucket"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""
        WITH g AS (SELECT event_type,
                          (epoch_us(ts) - epoch_us(lag(ts) OVER (
                             PARTITION BY user_id ORDER BY ts, event_id)))
                            // 1000000 AS gap_s
                   FROM events),
        b AS (SELECT event_type,
                     CASE WHEN gap_s = 0 THEN 0
                          ELSE length(bin(gap_s)) END::BIGINT AS bucket
              FROM g WHERE gap_s IS NOT NULL)
        SELECT event_type, bucket, count(*)::BIGINT AS n
        FROM b GROUP BY 1, 2""")),

    // VIEW→PURCHASE CONVERSION LATENCY: per converting user, the delay
    // from first view to first purchase (purchase strictly after the
    // view), with the q171 log₂ bucket — the funnel-latency table a
    // conversion analysis reads. One user-keyed aggregation.
    "q174_conversion_latency" -> Q(
      (s, d) => Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "view",
            unix_micros(col("ts")))).as("v"),
          min(when(col("event_type") === "purchase",
            unix_micros(col("ts")))).as("p"))
        .filter(col("v").isNotNull && col("p").isNotNull && col("p") > col("v"))
        .withColumn("latency_s",
          ((col("p") - col("v")) / lit(1000000L)).cast("long"))
        .withColumn("bucket",
          when(col("latency_s") === 0, lit(0L))
            .otherwise(length(bin(col("latency_s"))).cast("long")))
        .select(col("user_id"), col("latency_s"), col("bucket")),
      Some("""
        WITH f AS (SELECT user_id,
                          min(CASE WHEN event_type = 'view'
                                   THEN epoch_us(ts) END) AS v,
                          min(CASE WHEN event_type = 'purchase'
                                   THEN epoch_us(ts) END) AS p
                   FROM events GROUP BY 1)
        SELECT user_id, (p - v) // 1000000 AS latency_s,
               CASE WHEN (p - v) // 1000000 = 0 THEN 0
                    ELSE length(bin((p - v) // 1000000)) END::BIGINT AS bucket
        FROM f WHERE v IS NOT NULL AND p IS NOT NULL AND p > v""")),

    // TOP BEHAVIORAL PATHS: third-order event-type sequences
    // (consecutive triples per user) with share of all observed
    // triples — the path-mining summary above q170's first-order
    // matrix. The path dimension is |types|³-bounded by construction.
    "q175_event_paths" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val c = Tables.events(s, d)
          .withColumn("e2", lead(col("event_type"), 1).over(w))
          .withColumn("e3", lead(col("event_type"), 2).over(w))
          .filter(col("e3").isNotNull)
          .select(concat_ws(">", col("event_type"), col("e2"), col("e3"))
            .as("path"))
          .groupBy(col("path")).agg(count(lit(1)).as("n"))
        c.crossJoin(broadcast(c.agg(sum(col("n")).as("tot"))))
          .select(col("path"), col("n"),
            floor(col("n").cast("double") * lit(1e6)
              / col("tot").cast("double") + lit(0.5)).cast("long")
              .as("share_micro"))
      },
      Some("""
        WITH s AS (SELECT user_id, event_type,
                          lead(event_type, 1) OVER w AS e2,
                          lead(event_type, 2) OVER w AS e3
                   FROM events
                   WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        c AS (SELECT event_type || '>' || e2 || '>' || e3 AS path,
                     count(*)::BIGINT AS n
              FROM s WHERE e3 IS NOT NULL GROUP BY 1),
        t AS (SELECT sum(n)::BIGINT AS tot FROM c)
        SELECT path, n,
               floor(n::DOUBLE * 1e6 / tot::DOUBLE + 0.5)::BIGINT
                 AS share_micro
        FROM c CROSS JOIN t""")),

    // KAPLAN-MEIER conversion survival (ops/Survival.scala): time to
    // first purchase with right-censoring at each user's last event —
    // the unbiased conversion curve (naive funnel rates count not-yet
    // converters as failures). ln S(t) as exact integer sums of
    // micro-snapped per-step terms; windows over the guarded day
    // histogram only.
    "q180_km_survival" -> Q(
      (s, d) => graft.ops.Survival.kaplanMeier(Tables.events(s, d),
        "user_id", "ts", col("event_type") === "purchase"),
      Some("""
        WITH pu AS (SELECT user_id, min(epoch_us(ts)) AS t0,
                           min(CASE WHEN event_type = 'purchase'
                                    THEN epoch_us(ts) END) AS tp,
                           max(epoch_us(ts)) AS tl
                    FROM events GROUP BY 1),
        dur AS (SELECT CASE WHEN tp IS NOT NULL
                            THEN (tp - t0) // 86400000000
                            ELSE (tl - t0) // 86400000000 END AS dur_days,
                       CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
                FROM pu),
        hist AS (SELECT dur_days, sum(ev)::BIGINT AS d,
                        sum(1 - ev)::BIGINT AS c
                 FROM dur GROUP BY 1),
        t AS (SELECT sum(d + c)::BIGINT AS n_total FROM hist),
        r AS (SELECT dur_days, d, c,
                     n_total - coalesce(sum(d + c) OVER
                       (ORDER BY dur_days ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS n_risk
              FROM hist CROSS JOIN t),
        tm AS (SELECT *, CASE WHEN d = 0 THEN 0
                              WHEN d = n_risk THEN -1000000000000000
                              ELSE floor(ln((n_risk - d)::DOUBLE
                                            / n_risk::DOUBLE)
                                         * 1e6 + 0.5)::BIGINT END AS term
               FROM r)
        SELECT dur_days, n_risk::BIGINT AS n_risk, d, c,
               sum(term) OVER (ORDER BY dur_days ROWS BETWEEN UNBOUNDED
                               PRECEDING AND CURRENT ROW)::BIGINT
                 AS ln_surv_micro
        FROM tm""")),

    // RFM SEGMENTATION (recency / frequency / monetary quintiles) — the
    // classic customer-value census, built on Calibrate.cumeDist's
    // guarded-histogram machinery three times (never a per-metric corpus
    // sort): each metric maps to its exact ties-inclusive cumulative
    // fraction, quintile = ceil(5·pct) in integer arithmetic, recency
    // flipped so 5 = most recent. Monetary SCORES on whole units (the
    // histogram-boundedness contract) while the output keeps exact
    // centi-units.
    "q182_rfm_segments" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        val maxTs = ev.agg(max(unix_micros(col("ts"))).as("t_max"))
        val users = ev.groupBy(col("user_id"))
          .agg(max(unix_micros(col("ts"))).as("t_last"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("freq"),
            coalesce(sum(when(col("event_type") === "purchase",
              floor(col("value") * lit(100) + lit(0.5)).cast("long"))),
              lit(0L)).as("mon_centi"))
          .crossJoin(broadcast(maxTs))
          .withColumn("rec_days", expr("(t_max - t_last) div 86400000000"))
          .select(col("user_id"), col("rec_days"), col("freq"),
            col("mon_centi"))
          .withColumn("g", lit("all"))
          .localCheckpoint(true) // three cumeDist passes share one frame
        val withR = graft.text.Calibrate.cumeDist(users, "g", col("rec_days"))
          .withColumnRenamed("pct_micro", "pct_r")
          .drop("score_micro", "n_group")
        val withF = graft.text.Calibrate.cumeDist(withR, "g", col("freq"))
          .withColumnRenamed("pct_micro", "pct_f")
          .drop("score_micro", "n_group")
        val withM = graft.text.Calibrate.cumeDist(withF, "g",
            expr("mon_centi div 100"))
          .withColumnRenamed("pct_micro", "pct_m")
          .drop("score_micro", "n_group")
        withM
          .withColumn("r", lit(6L) - expr("(pct_r * 5 + 999999) div 1000000"))
          .withColumn("f", expr("(pct_f * 5 + 999999) div 1000000"))
          .withColumn("m", expr("(pct_m * 5 + 999999) div 1000000"))
          .select(col("user_id"), col("rec_days"), col("freq"),
            col("mon_centi"), col("r"), col("f"), col("m"),
            concat(col("r"), col("f"), col("m")).as("segment"))
      },
      Some("""
        WITH mx AS (SELECT max(epoch_us(ts)) AS t_max FROM events),
        u AS (SELECT user_id,
                     (t_max - max(epoch_us(ts))) // 86400000000 AS rec_days,
                     sum(CASE WHEN event_type = 'purchase' THEN 1
                              ELSE 0 END)::BIGINT AS freq,
                     coalesce(sum(CASE WHEN event_type = 'purchase'
                       THEN floor(value * 100 + 0.5)::BIGINT END), 0)::BIGINT
                       AS mon_centi
              FROM events CROSS JOIN mx GROUP BY user_id, t_max),
        n AS (SELECT count(*)::BIGINT AS n FROM u),
        p AS (SELECT user_id, rec_days, freq, mon_centi,
                     floor((count(*) OVER (ORDER BY rec_days RANGE BETWEEN
                        UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE
                       * 1e6 / n::DOUBLE + 0.5)::BIGINT AS pct_r,
                     floor((count(*) OVER (ORDER BY freq RANGE BETWEEN
                        UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE
                       * 1e6 / n::DOUBLE + 0.5)::BIGINT AS pct_f,
                     floor((count(*) OVER (ORDER BY mon_centi // 100
                        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE
                       * 1e6 / n::DOUBLE + 0.5)::BIGINT AS pct_m
              FROM u CROSS JOIN n)
        SELECT user_id, rec_days, freq, mon_centi,
               6 - (pct_r * 5 + 999999) // 1000000 AS r,
               (pct_f * 5 + 999999) // 1000000 AS f,
               (pct_m * 5 + 999999) // 1000000 AS m,
               concat((6 - (pct_r * 5 + 999999) // 1000000)::VARCHAR,
                 ((pct_f * 5 + 999999) // 1000000)::VARCHAR,
                 ((pct_m * 5 + 999999) // 1000000)::VARCHAR) AS segment
        FROM p""")),

    // BOT-REGULARITY FLAG: per-user squared coefficient of variation of
    // inter-event gaps — scripted clients fire on near-fixed intervals
    // (CV² ≈ 0) where humans are bursty (CV² ≳ 1); the standard traffic-
    // hygiene gate before any engagement metric. Exact rational:
    // CV² = (n·Σg² − S²)/S² on second-snapped integer gaps (µs gaps
    // squared would overflow BIGINT at calendar spans), one user-keyed
    // window + one aggregation, flag at CV² < 0.01.
    "q186_bot_regularity" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .withColumn("nxt", lead(unix_micros(col("ts")), 1).over(w))
          .filter(col("nxt").isNotNull)
          .withColumn("gap_s", expr("(nxt - unix_micros(ts)) div 1000000"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_gaps"), sum(col("gap_s")).as("sg"),
            sum(col("gap_s") * col("gap_s")).as("sg2"))
          .filter(col("n_gaps") >= 4 && col("sg") > 0)
          .withColumn("cv2_micro",
            floor((col("n_gaps") * col("sg2") - col("sg") * col("sg"))
              .cast("double") * lit(1e6)
              / (col("sg") * col("sg")).cast("double") + lit(0.5))
              .cast("long"))
          .withColumn("is_regular", (col("cv2_micro") < 10000L).cast("int"))
          .select(col("user_id"), col("n_gaps"), col("cv2_micro"),
            col("is_regular"))
      },
      Some("""
        WITH g AS (SELECT user_id,
                          (lead(epoch_us(ts)) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) - epoch_us(ts))
                            // 1000000 AS gap_s
                   FROM events),
        u AS (SELECT user_id, count(*)::BIGINT AS n_gaps,
                     sum(gap_s)::BIGINT AS sg,
                     sum(gap_s * gap_s)::BIGINT AS sg2
              FROM g WHERE gap_s IS NOT NULL GROUP BY 1)
        SELECT user_id, n_gaps,
               floor((n_gaps * sg2 - sg * sg)::DOUBLE * 1e6
                     / (sg * sg)::DOUBLE + 0.5)::BIGINT AS cv2_micro,
               (floor((n_gaps * sg2 - sg * sg)::DOUBLE * 1e6
                      / (sg * sg)::DOUBLE + 0.5) < 10000)::INT AS is_regular
        FROM u WHERE n_gaps >= 4 AND sg > 0""")),

    // 3-CORE of the q113 co-occurrence graph (graph/KCore.scala): the
    // cohesive-community filter — nodes keeping ≥ 3 neighbors INSIDE
    // the surviving subgraph after 3 peels (fixed unrolled rounds, the
    // q77 oracle-mirrorable iteration discipline; equal survivor counts
    // across budgets ⇒ converged). Each peel: one degree aggregation +
    // two semi joins on the shrinking edge frame.
    "q188_kcore" -> Q(
      (s, d) => graft.graph.KCore.peel(
        Triangles.coOccurrenceEdges(
          Tables.events(s, d).select(col("user_id"), col("event_type"),
            expr("unix_micros(ts) div 3600000000").as("hb")),
          "user_id", Seq("event_type", "hb"), minShared = 4L),
        "a", "b", k = 3, rounds = 3)
        .select(col("node").as("user_id"), col("deg")),
      Some("""
        WITH b AS (
          SELECT DISTINCT event_type, epoch_us(ts) // 3600000000 AS hb,
                 user_id
          FROM events),
        e0 AS (
          SELECT a.user_id AS a, c.user_id AS b
          FROM b a JOIN b c USING (event_type, hb)
          WHERE a.user_id < c.user_id
          GROUP BY 1, 2 HAVING count(*) >= 4),
        k0 AS (SELECT node FROM (SELECT a AS node FROM e0 UNION ALL
                                 SELECT b FROM e0)
               GROUP BY 1 HAVING count(*) >= 3),
        e1 AS (SELECT a, b FROM e0
               WHERE a IN (SELECT node FROM k0)
                 AND b IN (SELECT node FROM k0)),
        k1 AS (SELECT node FROM (SELECT a AS node FROM e1 UNION ALL
                                 SELECT b FROM e1)
               GROUP BY 1 HAVING count(*) >= 3),
        e2 AS (SELECT a, b FROM e1
               WHERE a IN (SELECT node FROM k1)
                 AND b IN (SELECT node FROM k1)),
        k2 AS (SELECT node FROM (SELECT a AS node FROM e2 UNION ALL
                                 SELECT b FROM e2)
               GROUP BY 1 HAVING count(*) >= 3),
        e3 AS (SELECT a, b FROM e2
               WHERE a IN (SELECT node FROM k2)
                 AND b IN (SELECT node FROM k2))
        SELECT node AS user_id, count(*)::BIGINT AS deg
        FROM (SELECT a AS node FROM e3 UNION ALL SELECT b FROM e3)
        GROUP BY 1""")),

    // THEIL-SEN robust value trend per user (Theil 1950 / Sen 1968, the
    // median-of-pairwise-slopes estimator): q116's least squares is
    // yanked around by a single outlier purchase; the Theil-Sen slope
    // has a 29% breakdown point. Slopes are micro-snapped from exact
    // integer (Δcenti, Δhour) pairs; the median is the exact
    // ⌈n/2⌉-th order statistic under a deterministic total order.
    // Scale shape: the pair term is PER-USER quadratic (events per
    // user is calendar-bounded for typical users — the q74 within-cell
    // discipline); the rank window partitions by user over those
    // bounded pair sets. SCALE PATH (VERDICT r16 #5): a power user at
    // 100× makes its partition a hub bucket — q227_theilsen_sampled is
    // the capped dispatch (Trend.theilSen cap = 30, the q71 md5-rank
    // subsample), bounding every partition at cap·(cap−1)/2 pairs.
    "q195_theilsen_trend" -> Q(
      (s, d) => graft.ops.Trend.theilSen(theilSenEvents(s, d)),
      Some("""
        WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
                           floor(value * 100 + 0.5)::BIGINT AS yc
                    FROM events),
        base AS (SELECT e.user_id, e.event_id,
                        (e.tus - t.t0) // 3600000000 AS x, e.yc
                 FROM ev e JOIN (SELECT user_id, min(tus) AS t0
                                 FROM ev GROUP BY 1) t USING (user_id)),
        sl AS (SELECT a.user_id,
                      floor((b.yc - a.yc)::DOUBLE * 1e6
                            / (b.x - a.x)::DOUBLE + 0.5)::BIGINT
                        AS slope_micro,
                      a.event_id AS e1, b.event_id AS e2
               FROM base a JOIN base b
                 ON a.user_id = b.user_id AND a.x < b.x),
        r AS (SELECT user_id, slope_micro,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY slope_micro, e1, e2) AS rn,
                     count(*) OVER (PARTITION BY user_id) AS np
              FROM sl)
        SELECT user_id, np::BIGINT AS n_pairs,
               slope_micro AS ts_slope_micro
        FROM r WHERE rn = (np + 1) // 2""")),

    // SAMPLED THEIL-SEN (VERDICT r16 #5 — q195's scale dispatch as a
    // first-class oracle-checked operator, the q113→q210 capped-variant
    // precedent): deterministic md5-rank top-30 events per user (the
    // q71 subsample idiom) BEFORE pair enumeration, so a hub user costs
    // 435 pairs instead of quadratic blowup; x re-bases on the sampled
    // min (div-hour bucketing is shift-sensitive — contract shared with
    // the oracle). The cap BINDS at every gate SF (~67 events/user), so
    // cap-constant corruption fails the 3-SF check.
    "q227_theilsen_sampled" -> Q(
      (s, d) => graft.ops.Trend.theilSen(theilSenEvents(s, d), cap = 30),
      Some("""
        WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
                           floor(value * 100 + 0.5)::BIGINT AS yc
                    FROM events),
        samp AS (SELECT user_id, event_id, tus, yc FROM (
                   SELECT *, row_number() OVER (PARTITION BY user_id
                     ORDER BY ('0x' || substr(md5('tssample|' || event_id), 1, 8))::BIGINT,
                              event_id) AS srn
                   FROM ev) WHERE srn <= 30),
        base AS (SELECT e.user_id, e.event_id,
                        (e.tus - t.t0) // 3600000000 AS x, e.yc
                 FROM samp e JOIN (SELECT user_id, min(tus) AS t0
                                   FROM samp GROUP BY 1) t USING (user_id)),
        sl AS (SELECT a.user_id,
                      floor((b.yc - a.yc)::DOUBLE * 1e6
                            / (b.x - a.x)::DOUBLE + 0.5)::BIGINT
                        AS slope_micro,
                      a.event_id AS e1, b.event_id AS e2
               FROM base a JOIN base b
                 ON a.user_id = b.user_id AND a.x < b.x),
        r AS (SELECT user_id, slope_micro,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY slope_micro, e1, e2) AS rn,
                     count(*) OVER (PARTITION BY user_id) AS np
              FROM sl)
        SELECT user_id, np::BIGINT AS n_pairs,
               slope_micro AS ts_slope_micro
        FROM r WHERE rn = (np + 1) // 2""")),

    // TIME-WINDOWED CONVERSION FUNNEL: did the user purchase within
    // 24 h of their FIRST view (the attribution-window form of q110's
    // unconstrained funnel)? One user aggregation for the anchor, one
    // windowed min over qualifying purchases; latency carried for the
    // converting rows, NULL for the rest.
    "q196_windowed_funnel" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        val v = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id"))
          .agg(min(unix_micros(col("ts"))).as("v0"))
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), unix_micros(col("ts")).as("pt"))
        v.join(p, Seq("user_id"), "left")
          .withColumn("qual",
            when(col("pt") > col("v0") &&
              col("pt") <= col("v0") + lit(86400000000L), col("pt")))
          .groupBy(col("user_id"))
          .agg(min(col("qual")).as("p0"), max(col("v0")).as("v0"))
          .select(col("user_id"),
            col("p0").isNotNull.cast("int").as("converted"),
            expr("(p0 - v0) div 1000000").as("latency_s"))
      },
      Some("""
        WITH v AS (SELECT user_id, min(epoch_us(ts)) AS v0
                   FROM events WHERE event_type = 'view' GROUP BY 1),
        p AS (SELECT user_id, epoch_us(ts) AS pt
              FROM events WHERE event_type = 'purchase'),
        j AS (SELECT v.user_id, v.v0,
                     min(CASE WHEN p.pt > v.v0
                               AND p.pt <= v.v0 + 86400000000
                              THEN p.pt END) AS p0
              FROM v LEFT JOIN p ON p.user_id = v.user_id
              GROUP BY 1, 2)
        SELECT user_id, (p0 IS NOT NULL)::INT AS converted,
               (p0 - v0) // 1000000 AS latency_s
        FROM j""")),

    // CUPED-ADJUSTED A/B READOUT (Deng et al. 2013, the standard
    // experimentation variance-reduction): users deterministically
    // hash-bucketed into two arms; the post-period value metric is
    // adjusted by the pre-period covariate, ȳ_cuped = ȳ_arm −
    // θ·(x̄_arm − x̄), θ = cov(x,y)/var(x) pooled. The period split is
    // the exact µs midpoint of the observed range (no calendar
    // literal to drift when testdata regenerates). Every moment is an
    // exact integer sum; θ and the means are one mirrored double tail.
    "q197_cuped_readout" -> Q(
      (s, d) => {
        val sp = s
        val ev = Tables.events(sp, d)
          .select(col("user_id"), unix_micros(col("ts")).as("tus"),
            floor(col("value") * lit(100) + lit(0.5)).cast("long").as("vc"))
        val mid = ev.agg(expr("min(tus) + (max(tus) - min(tus)) div 2")
          .as("mid"))
        val users = ev.crossJoin(broadcast(mid))
          .groupBy(col("user_id"))
          .agg(sum(when(col("tus") < col("mid"), col("vc")).otherwise(0L))
            .as("x"),
            sum(when(col("tus") >= col("mid"), col("vc")).otherwise(0L))
              .as("y"))
          .withColumn("arm", pmod(graft.text.TextOps.gramHash64(sp,
            col("user_id").cast("string")), lit(2L)))
          .localCheckpoint(true) // pooled moments + per-arm sums share it
        val pooled = users.agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
        val arms = users.groupBy(col("arm"))
          .agg(count(lit(1)).as("n_users"), sum(col("x")).as("ax"),
            sum(col("y")).as("ay"))
        val nD = col("n").cast("double")
        val den = nD * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double")
        arms.crossJoin(broadcast(pooled))
          .withColumn("theta",
            when(den > 0.0, (nD * col("sxy").cast("double") -
              col("sx").cast("double") * col("sy").cast("double")) / den)
              .otherwise(lit(0.0)))
          .withColumn("mean_raw_micro",
            floor(col("ay").cast("double") * lit(1e4)
              / col("n_users").cast("double") + lit(0.5)).cast("long"))
          .withColumn("mean_cuped_micro",
            floor((col("ay").cast("double") / col("n_users").cast("double")
              - col("theta") * (col("ax").cast("double")
                / col("n_users").cast("double")
                - col("sx").cast("double") / nD)) * lit(1e4) + lit(0.5))
              .cast("long"))
          .select(col("arm"), col("n_users"), col("mean_raw_micro"),
            col("mean_cuped_micro"))
      },
      Some("""
        WITH ev AS (SELECT user_id, epoch_us(ts) AS tus,
                           floor(value * 100 + 0.5)::BIGINT AS vc
                    FROM events),
        mid AS (SELECT min(tus) + (max(tus) - min(tus)) // 2 AS mid FROM ev),
        u AS (SELECT user_id,
                     sum(CASE WHEN tus < mid THEN vc ELSE 0 END)::BIGINT AS x,
                     sum(CASE WHEN tus >= mid THEN vc ELSE 0 END)::BIGINT AS y,
                     ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT % 2
                       AS arm
              FROM ev CROSS JOIN mid GROUP BY user_id),
        pooled AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
                          sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy,
                          sum(x * x)::BIGINT AS sxx
                   FROM u),
        arms AS (SELECT arm, count(*)::BIGINT AS n_users,
                        sum(x)::BIGINT AS ax, sum(y)::BIGINT AS ay
                 FROM u GROUP BY 1)
        SELECT arm, n_users,
               floor(ay::DOUBLE * 1e4 / n_users::DOUBLE + 0.5)::BIGINT
                 AS mean_raw_micro,
               floor((ay::DOUBLE / n_users::DOUBLE
                      - (CASE WHEN n::DOUBLE * sxx::DOUBLE
                                   - sx::DOUBLE * sx::DOUBLE > 0
                              THEN (n::DOUBLE * sxy::DOUBLE
                                    - sx::DOUBLE * sy::DOUBLE)
                                   / (n::DOUBLE * sxx::DOUBLE
                                      - sx::DOUBLE * sx::DOUBLE)
                              ELSE 0 END)
                        * (ax::DOUBLE / n_users::DOUBLE
                           - sx::DOUBLE / n::DOUBLE)) * 1e4 + 0.5)::BIGINT
                 AS mean_cuped_micro
        FROM arms CROSS JOIN pooled""")),

    // FORECAST BACKTEST via MASE (Hyndman & Koehler 2006, the scale-
    // free forecast-accuracy standard): per event type, does a weekly
    // seasonal-naive forecast (count = same type, 7 rows back) beat the
    // plain naive (yesterday's count)? mase < 1e6 micro ⇒ weekly
    // seasonality is real signal a capacity planner should model.
    // Exact integer |error| sums over the (type × epoch-day) frame —
    // bounded partitions (calendar days), rows where either lag is
    // undefined excluded from BOTH sums so the ratio compares like for
    // like. Lags are ROW lags over observed days (gap days absent from
    // both forecasts identically — documented).
    "q199_mase_backtest" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        daily
          .withColumn("l1", lag(col("n"), 1).over(w))
          .withColumn("l7", lag(col("n"), 7).over(w))
          .filter(col("l1").isNotNull && col("l7").isNotNull)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"),
            sum(abs(col("n") - col("l1"))).as("sum_e1"),
            sum(abs(col("n") - col("l7"))).as("sum_e7"))
          .withColumn("mase_micro",
            when(col("sum_e1") > 0,
              floor(col("sum_e7").cast("double") * lit(1e6)
                / col("sum_e1").cast("double") + lit(0.5)).cast("long")))
      },
      Some("""
        WITH daily AS (SELECT event_type,
                              epoch_us(ts) // 86400000000 AS day,
                              count(*)::BIGINT AS n
                       FROM events GROUP BY 1, 2),
        lagged AS (SELECT event_type, n,
                          lag(n, 1) OVER w AS l1, lag(n, 7) OVER w AS l7
                   FROM daily
                   WINDOW w AS (PARTITION BY event_type ORDER BY day))
        SELECT event_type, count(*)::BIGINT AS n_days,
               sum(abs(n - l1))::BIGINT AS sum_e1,
               sum(abs(n - l7))::BIGINT AS sum_e7,
               CASE WHEN sum(abs(n - l1)) > 0
                    THEN floor(sum(abs(n - l7))::DOUBLE * 1e6
                               / sum(abs(n - l1))::DOUBLE + 0.5)::BIGINT
               END AS mase_micro
        FROM lagged WHERE l1 IS NOT NULL AND l7 IS NOT NULL
        GROUP BY 1""")),

    // EVENT-TYPE LIFT MATRIX (market-basket association over user-day
    // baskets): lift(a,b) = P(a,b)/(P(a)·P(b)) — which behaviors
    // co-occur beyond chance within a user's day. Basket = distinct
    // (user, epoch-day); the pair join is |types|²-bounded per basket.
    // n_ab·N and n_a·n_b are exact integer products; one division.
    "q200_event_lift" -> Q(
      (s, d) => {
        val b = Tables.events(s, d)
          .select(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day"),
            col("event_type")).distinct()
          .localCheckpoint(true) // marginals, pairs and N share it
        val n = b.select(col("user_id"), col("day")).distinct().count()
        val marg = b.groupBy(col("event_type")).agg(count(lit(1)).as("na"))
        val pairs = b.as("a").join(b.as("b"),
            col("a.user_id") === col("b.user_id") &&
              col("a.day") === col("b.day") &&
              col("a.event_type") < col("b.event_type"))
          .groupBy(col("a.event_type").as("et_a"),
            col("b.event_type").as("et_b"))
          .agg(count(lit(1)).as("n_ab"))
        pairs
          .join(marg.select(col("event_type").as("et_a"), col("na")), Seq("et_a"))
          .join(marg.select(col("event_type").as("et_b"),
            col("na").as("nb")), Seq("et_b"))
          .select(col("et_a"), col("et_b"), col("n_ab"),
            floor((col("n_ab") * lit(n)).cast("double") * lit(1e6)
              / (col("na") * col("nb")).cast("double") + lit(0.5))
              .cast("long").as("lift_micro"))
      },
      Some("""
        WITH b AS (SELECT DISTINCT user_id,
                          epoch_us(ts) // 86400000000 AS day, event_type
                   FROM events),
        n AS (SELECT count(*)::BIGINT AS n
              FROM (SELECT DISTINCT user_id, day FROM b)),
        marg AS (SELECT event_type, count(*)::BIGINT AS na
                 FROM b GROUP BY 1),
        pairs AS (SELECT a.event_type AS et_a, c.event_type AS et_b,
                         count(*)::BIGINT AS n_ab
                  FROM b a JOIN b c
                    ON a.user_id = c.user_id AND a.day = c.day
                   AND a.event_type < c.event_type
                  GROUP BY 1, 2)
        SELECT et_a, et_b, n_ab,
               floor((n_ab * n.n)::DOUBLE * 1e6
                     / (ma.na * mb.na)::DOUBLE + 0.5)::BIGINT AS lift_micro
        FROM pairs
        JOIN marg ma ON ma.event_type = et_a
        JOIN marg mb ON mb.event_type = et_b
        CROSS JOIN n""")),

    // LOG-RANK TEST between hash cohorts (ops/Survival.scala): do the
    // two q197 arms convert on the same clock? The survival-curve
    // comparison that reads q180's machinery as a hypothesis test —
    // |z| > 1.96 rejects equal hazards. On hash-split cohorts the null
    // is TRUE by construction, so the expected |z| is small — the
    // honest A/A-test reading an experimentation stack starts from.
    "q201_logrank_test" -> Q(
      (s, d) => graft.ops.Survival.logRank(
        Tables.events(s, d)
          .withColumn("arm", pmod(graft.text.TextOps.gramHash64(s,
            col("user_id").cast("string")), lit(2L))),
        "user_id", "ts", col("event_type") === "purchase", col("arm")),
      Some("""
        WITH pu AS (SELECT user_id, min(epoch_us(ts)) AS t0,
                           min(CASE WHEN event_type = 'purchase'
                                    THEN epoch_us(ts) END) AS tp,
                           max(epoch_us(ts)) AS tl,
                           max(('0x' || substr(md5(user_id::VARCHAR), 1, 15))
                               ::BIGINT % 2) AS cohort
                    FROM events GROUP BY 1),
        dur AS (SELECT cohort,
                       CASE WHEN tp IS NOT NULL
                            THEN (tp - t0) // 86400000000
                            ELSE (tl - t0) // 86400000000 END AS dur_days,
                       CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
                FROM pu),
        hist AS (SELECT dur_days, cohort, sum(ev)::BIGINT AS d,
                        count(*)::BIGINT AS m
                 FROM dur GROUP BY 1, 2),
        day AS (SELECT dur_days, sum(d)::BIGINT AS d_all,
                       sum(m)::BIGINT AS m_all,
                       sum(CASE WHEN cohort = 1 THEN d ELSE 0 END)::BIGINT
                         AS d1,
                       sum(CASE WHEN cohort = 1 THEN m ELSE 0 END)::BIGINT
                         AS m1
                FROM hist GROUP BY 1),
        tot AS (SELECT sum(m_all)::BIGINT AS n_tot,
                       sum(m1)::BIGINT AS n1_tot FROM day),
        risk AS (SELECT dur_days, d_all, d1,
                        n_tot - coalesce(sum(m_all) OVER
                          (ORDER BY dur_days ROWS BETWEEN UNBOUNDED
                           PRECEDING AND 1 PRECEDING), 0) AS n,
                        n1_tot - coalesce(sum(m1) OVER
                          (ORDER BY dur_days ROWS BETWEEN UNBOUNDED
                           PRECEDING AND 1 PRECEDING), 0) AS n1
                 FROM day CROSS JOIN tot),
        contrib AS (
          SELECT CASE WHEN d_all = 0 OR n <= 1 THEN 0
                      ELSE floor((d1::DOUBLE - d_all::DOUBLE * n1::DOUBLE
                                  / n::DOUBLE) * 1e6 + 0.5)::BIGINT
                 END AS oe_micro,
                 CASE WHEN d_all = 0 OR n <= 1 THEN 0
                      ELSE floor(d_all::DOUBLE * (n1::DOUBLE / n::DOUBLE)
                                 * (1.0 - n1::DOUBLE / n::DOUBLE)
                                 * (n - d_all)::DOUBLE / (n - 1)::DOUBLE
                                 * 1e6 + 0.5)::BIGINT
                 END AS v_micro
          FROM risk)
        SELECT sum(oe_micro)::BIGINT AS oe_sum_micro,
               sum(v_micro)::BIGINT AS v_sum_micro,
               CASE WHEN sum(v_micro) > 0
                    THEN floor(sum(oe_micro)::DOUBLE
                               / sqrt(sum(v_micro)::DOUBLE / 1e6)
                               + 0.5)::BIGINT
               END AS z_micro
        FROM contrib""")),

    // RAYLEIGH DIURNAL-UNIFORMITY TEST (circular statistics — Rayleigh
    // 1880; Mardia's standard form): is an event type's time-of-day
    // distribution uniform around the 24 h clock, or does it have a
    // daily rhythm? θ = 2π·(µs-of-day)/86400e6; R = |Σe^{iθ}|/n, the
    // Rayleigh statistic z = n·R² with z ≳ 3 rejecting uniformity at
    // p < .05 — the circular test that catches diurnal structure a
    // linear histogram χ² dilutes across bins. Per-row cos/sin
    // micro-snap before the integer sums (the ln doctrine extended to
    // the other transcendentals); the |·|² tail runs on identical
    // doubles from identical longs in one mirrored op sequence.
    "q206_rayleigh_diurnal" -> Q(
      (s, d) => {
        val theta = (pmod(unix_micros(col("ts")), lit(86400000000L))
          .cast("double") / lit(86400000000.0)) * lit(TwoPi)
        Tables.events(s, d)
          .select(col("event_type"),
            floor(cos(theta) * lit(1e6) + lit(0.5)).cast("long").as("c"),
            floor(sin(theta) * lit(1e6) + lit(0.5)).cast("long").as("sn"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
            sum(col("sn")).as("ss"))
          .withColumn("r_micro",
            floor(sqrt(col("sc").cast("double") * col("sc").cast("double")
              + col("ss").cast("double") * col("ss").cast("double"))
              / col("n").cast("double") + lit(0.5)).cast("long"))
          .withColumn("z_micro",
            floor((col("sc").cast("double") * col("sc").cast("double")
              + col("ss").cast("double") * col("ss").cast("double"))
              / (col("n").cast("double") * lit(1e6)) + lit(0.5)).cast("long"))
          .withColumn("nonuniform", (col("z_micro") > 3000000L).cast("int"))
          .select(col("event_type"), col("n"), col("r_micro"),
            col("z_micro"), col("nonuniform"))
      },
      Some("""
        WITH th AS (SELECT event_type,
                           ((epoch_us(ts) % 86400000000)::DOUBLE
                            / 86400000000.0) * (2 * pi()) AS theta
                    FROM events),
        sn AS (SELECT event_type,
                      floor(cos(theta) * 1e6 + 0.5)::BIGINT AS c,
                      floor(sin(theta) * 1e6 + 0.5)::BIGINT AS s
               FROM th),
        agg AS (SELECT event_type, count(*)::BIGINT AS n,
                       sum(c)::BIGINT AS sc, sum(s)::BIGINT AS ss
                FROM sn GROUP BY 1)
        SELECT event_type, n,
               floor(sqrt(sc::DOUBLE * sc::DOUBLE + ss::DOUBLE * ss::DOUBLE)
                     / n::DOUBLE + 0.5)::BIGINT AS r_micro,
               floor((sc::DOUBLE * sc::DOUBLE + ss::DOUBLE * ss::DOUBLE)
                     / (n::DOUBLE * 1e6) + 0.5)::BIGINT AS z_micro,
               (floor((sc::DOUBLE * sc::DOUBLE + ss::DOUBLE * ss::DOUBLE)
                      / (n::DOUBLE * 1e6) + 0.5) > 3000000)::INT
                 AS nonuniform
        FROM agg""")),

    // BENFORD FIRST-DIGIT AUDIT (Newcomb 1881 / Benford 1938, the
    // classic forensic-accounting screen): first significant digits of
    // purchase amounts against log₁₀(1+1/d), per-digit χ² contribution.
    // The digit comes from the CENTI-integer's decimal string (fp log10
    // at powers of ten would be engine-fragile); the Benford table is
    // ONE driver-computed micro literal rendered into both engines (the
    // q154 shared-literal doctrine, so the law's constants cannot
    // drift). Synthetic uniform-ish values SHOULD flag — the spec pins
    // that a genuinely log-uniform sample passes.
    "q202_benford_audit" -> Q(
      (s, d) => {
        val ben = benfordMicro
        val benDf = {
          import s.implicits._
          ben.zipWithIndex.map { case (p, i) => (i + 1L, p) }
            .toDF("digit", "benford_micro")
        }
        val obs = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(floor(col("value") * lit(100) + lit(0.5)).cast("long")
            .as("vc"))
          .filter(col("vc") >= 1)
          .withColumn("digit",
            substring(col("vc").cast("string"), 1, 1).cast("long"))
          .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
        val tot = obs.agg(sum(col("n_obs")).as("n"))
        benDf.join(obs, Seq("digit"), "left").na.fill(0L, Seq("n_obs"))
          .crossJoin(broadcast(tot))
          .withColumn("share_micro",
            floor(col("n_obs").cast("double") * lit(1e6)
              / col("n").cast("double") + lit(0.5)).cast("long"))
          .withColumn("chi2_contrib_micro", {
            val e = col("n").cast("double") *
              col("benford_micro").cast("double") / lit(1e6)
            floor((col("n_obs").cast("double") - e)
              * (col("n_obs").cast("double") - e) / e * lit(1e6) + lit(0.5))
              .cast("long")
          })
          .select(col("digit"), col("n_obs"), col("share_micro"),
            col("benford_micro"), col("chi2_contrib_micro"))
      },
      Some(s"""
        WITH ben AS (SELECT * FROM (VALUES ${benfordMicro.zipWithIndex
          .map { case (p, i) => s"(${i + 1}, ${p}::BIGINT)" }
          .mkString(", ")}) AS t(digit, benford_micro)),
        obs AS (SELECT (substr((floor(value * 100 + 0.5)::BIGINT)::VARCHAR,
                               1, 1))::BIGINT AS digit,
                       count(*)::BIGINT AS n_obs
                FROM events
                WHERE event_type = 'purchase'
                  AND floor(value * 100 + 0.5)::BIGINT >= 1
                GROUP BY 1),
        tot AS (SELECT sum(n_obs)::BIGINT AS n FROM obs)
        SELECT ben.digit, coalesce(obs.n_obs, 0)::BIGINT AS n_obs,
               floor(coalesce(obs.n_obs, 0)::DOUBLE * 1e6 / n::DOUBLE
                     + 0.5)::BIGINT AS share_micro,
               ben.benford_micro,
               floor((coalesce(obs.n_obs, 0)::DOUBLE
                      - n::DOUBLE * ben.benford_micro::DOUBLE / 1e6)
                     * (coalesce(obs.n_obs, 0)::DOUBLE
                        - n::DOUBLE * ben.benford_micro::DOUBLE / 1e6)
                     / (n::DOUBLE * ben.benford_micro::DOUBLE / 1e6)
                     * 1e6 + 0.5)::BIGINT AS chi2_contrib_micro
        FROM ben LEFT JOIN obs USING (digit) CROSS JOIN tot"""))
  )

  /** The pre-projected Theil-Sen event frame (user_id, event_id, tus,
    * yc) shared by q195 (exact) and q227 (sampled) so the snapping and
    * column contract cannot drift between the two faces. */
  private def theilSenEvents(s: org.apache.spark.sql.SparkSession,
                             d: String): org.apache.spark.sql.DataFrame =
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tus"),
        floor(col("value") * lit(100) + lit(0.5)).cast("long").as("yc"))

  /** Benford first-digit probabilities log₁₀(1+1/d), micro-snapped on
    * the driver ONCE and rendered into both the engine literal frame
    * and the oracle VALUES list (the q154 shared-literal doctrine). */
  private def benfordMicro: Seq[Long] =
    (1 to 9).map(dd => math.floor(math.log10(1.0 + 1.0 / dd) * 1e6 + 0.5).toLong)

  /** 2π as ONE Scala double rendered identically into the oracle
    * (`2 * pi()` computes the same IEEE value — java Math.PI and
    * DuckDB pi() are the same 3.141592653589793). */
  private val TwoPi: Double = 2 * math.Pi
}
