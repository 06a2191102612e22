package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.queries.Q._

/** Standard relational surface (SURVEY §2.4): the reference implements no
  * general-purpose SQL operators, so scans, joins, aggregations, windows,
  * sorts/limits, set ops and scalar functions come from Spark built-ins —
  * exercised here over the replicated star schema exactly as a user of the
  * engine would query their replicas.
  *
  * Scale notes are per query: dimension joins are explicitly broadcast,
  * filters/projections are written to push into the parquet scan, and
  * aggregations rely on partial (map-side) aggregation.
  */
object StandardQueries {

  private val dec = DecimalType(18, 2)

  val all: Map[String, Entry] = Map(

    // TPC-H Q1 shape: one scan, map-side partial agg on a 6-value grouping
    // key; shuffles 6 rows per partition regardless of input size.
    "q01_pricing_summary" -> entry(
      (s, dir) => {
        val li = tbl(s, dir, "lineitem")
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
            sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_base_price"),
            sum((col("l_extendedprice").cast(dec) *
              (lit(1).cast(dec) - col("l_discount").cast(dec)))).cast("double").as("sum_disc_price"),
            count(lit(1)).as("count_order"))
          .withColumn("avg_qty", col("sum_qty") / col("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        | count(*) AS count_order,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // TPC-H Q6 shape: predicate + column pruning must reach the scan
    // (PushedFilters on l_shipdate/l_discount/l_quantity; ReadSchema of 3
    // columns). No shuffle at all beyond the final single-row agg.
    "q02_filter_pushdown" -> entry(
      (s, dir) => {
        val li = tbl(s, dir, "lineitem")
        li.filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
            col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
            col("l_quantity") < 24)
          .agg(
            sum((col("l_extendedprice").cast(dec) * col("l_discount").cast(dec)))
              .cast("double").as("revenue"),
            count(lit(1)).as("n"))
      },
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        | count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin),

    // Fact⋈dim join: customer is the small side → broadcast hash join, no
    // shuffle of orders. At 100 TB orders this stays a map-side join.
    "q03_join_agg" -> entry(
      (s, dir) => {
        val o = tbl(s, dir, "orders")
        val c = tbl(s, dir, "customer")
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast(dec)).cast("double").as("total"))
          .orderBy(col("c_mktsegment"))
      },
      """SELECT c_mktsegment, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),

    // Star join through 3 dimension hops; every dim side broadcast, so the
    // only shuffle is the final tiny group-by.
    "q04_multi_join" -> entry(
      (s, dir) => {
        val li = tbl(s, dir, "lineitem")
        val su = tbl(s, dir, "supplier")
        val na = tbl(s, dir, "nation")
        val re = tbl(s, dir, "region")
        li.join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(na), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(re), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            sum((col("l_extendedprice").cast(dec) *
              (lit(1).cast(dec) - col("l_discount").cast(dec)))).cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("r_name"), col("n_name"))
      },
      """SELECT r_name, n_name,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin),

    // Window top-N per group: rank shuffles once on the partition key; the
    // filter keeps the window state bounded (top-3).
    "q05_window_topn" -> entry(
      (s, dir) => {
        val o = tbl(s, dir, "orders")
        val c = tbl(s, dir, "customer")
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select(col("c_mktsegment"), col("rnk"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("c_mktsegment"), col("rnk"))
      },
      """SELECT c_mktsegment, rnk, o_orderkey, o_totalprice FROM (
        | SELECT c_mktsegment, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        | FROM orders JOIN customer ON o_custkey = c_custkey)
        |WHERE rnk <= 3 ORDER BY c_mktsegment, rnk""".stripMargin),

    // Grouping sets / rollup — Spark expands to a single shuffle with a
    // grouping-id column, not one pass per set.
    "q06_rollup" -> entry(
      (s, dir) => {
        tbl(s, dir, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
            col("n"), col("sum_qty"))
          .orderBy(col("returnflag"), col("linestatus"))
      },
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        | coalesce(l_linestatus, 'ALL') AS linestatus,
        | count(*) AS n,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin),

    // Ranking window family: ntile / percent_rank / cume_dist over a
    // deterministic total order (unique tiebreak). One window, one sort.
    "q21_ranking_windows" -> entry(
      (s, dir) => {
        tbl(s, dir, "orders").createOrReplaceTempView("q21_orders")
        s.sql("""
          SELECT o_custkey, n,
                 ntile(4)       OVER w AS quartile,
                 percent_rank() OVER w AS pr,
                 cume_dist()    OVER w AS cd
          FROM (SELECT o_custkey, count(*) AS n
                FROM q21_orders GROUP BY o_custkey)
          WINDOW w AS (ORDER BY n, o_custkey)
          ORDER BY o_custkey""")
      },
      """SELECT o_custkey, n,
        | ntile(4)       OVER w AS quartile,
        | percent_rank() OVER w AS pr,
        | cume_dist()    OVER w AS cd
        |FROM (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey)
        |WINDOW w AS (ORDER BY n, o_custkey)
        |ORDER BY o_custkey""".stripMargin),

    // Unpivot (wide → long) via the stack generator — the UNION-ALL-free
    // form: one scan emits all measure rows.
    "q22_unpivot" -> entry(
      (s, dir) => {
        tbl(s, dir, "lineitem").createOrReplaceTempView("q22_lineitem")
        s.sql("""
          SELECT l_orderkey, l_linenumber, metric, val
          FROM (
            SELECT l_orderkey, l_linenumber,
                   stack(3,
                     'quantity', CAST(l_quantity AS DOUBLE),
                     'extendedprice', CAST(l_extendedprice AS DOUBLE),
                     'discount', CAST(l_discount AS DOUBLE)) AS (metric, val)
            FROM q22_lineitem)
          WHERE l_orderkey % 50 = 0
          ORDER BY l_orderkey, l_linenumber, metric, val""")
      },
      """SELECT l_orderkey, l_linenumber, metric, val FROM (
        |  SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
        |         CAST(l_quantity AS DOUBLE) AS val FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'extendedprice',
        |         CAST(l_extendedprice AS DOUBLE) FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'discount',
        |         CAST(l_discount AS DOUBLE) FROM lineitem)
        |WHERE l_orderkey % 50 = 0
        |ORDER BY l_orderkey, l_linenumber, metric, val""".stripMargin),

    // Correlated scalar subqueries: orders strictly above their
    // customer's average order value. Division-free form (price·n > sum)
    // keeps the comparison in exact decimal arithmetic on both engines.
    // Catalyst decorrelates both subqueries into aggregates + joins — no
    // per-row re-execution survives in the physical plan.
    "q19_correlated_sub" -> entry(
      (s, dir) => {
        tbl(s, dir, "orders").createOrReplaceTempView("q19_orders")
        s.sql("""
          SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS total
          FROM q19_orders o
          WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
                (SELECT count(*) FROM q19_orders i
                 WHERE i.o_custkey = o.o_custkey)
              > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2)))
                 FROM q19_orders i WHERE i.o_custkey = o.o_custkey)
          ORDER BY o_orderkey""")
      },
      """SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS total
        |FROM orders o
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
        |      (SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
        |    > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |       FROM orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin),

    // Lateral join: per-customer top order (ORDER BY + LIMIT inside the
    // correlated subquery) — the row-generator join form the reference
    // has no analogue for; Catalyst rewrites it to a ranked window.
    "q20_lateral_topk" -> entry(
      (s, dir) => {
        tbl(s, dir, "orders").createOrReplaceTempView("q20_orders")
        tbl(s, dir, "customer").createOrReplaceTempView("q20_customer")
        s.sql("""
          SELECT c.c_custkey, l.o_orderkey, l.total
          FROM q20_customer c, LATERAL (
            SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS total
            FROM q20_orders o WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) l
          ORDER BY c_custkey""")
      },
      """SELECT c.c_custkey, l.o_orderkey, l.total
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS total
        |  FROM orders o WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) l
        |ORDER BY c_custkey""".stripMargin),

    // Recursive CTE (Spark 4 WITH RECURSIVE): calendar fill — every 1995
    // month with its order count/revenue, zero-order months included.
    // The recursion bounds are literals on purpose: each recursion level
    // is a Spark job, so a data-dependent bound belongs in one cheap
    // pre-computed aggregate, never inside the iterated plan.
    "q23_recursive_calendar" -> entry(
      (s, dir) => {
        tbl(s, dir, "orders").createOrReplaceTempView("q23_orders")
        s.sql("""
          WITH RECURSIVE m(mon) AS (
            SELECT DATE '1995-01-01'
            UNION ALL
            SELECT CAST(mon + INTERVAL '1' MONTH AS DATE) FROM m
            WHERE mon < DATE '1995-12-01')
          SELECT date_format(mon, 'yyyy-MM') AS month,
                 count(o_orderkey) AS n_orders,
                 CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0)
                   AS DOUBLE) AS revenue
          FROM m LEFT JOIN q23_orders
            ON CAST(date_trunc('month', o_orderdate) AS DATE) = mon
          GROUP BY mon ORDER BY month""")
      },
      """WITH RECURSIVE m(mon) AS (
        |  SELECT DATE '1995-01-01'
        |  UNION ALL
        |  SELECT CAST(mon + INTERVAL 1 MONTH AS DATE) FROM m
        |  WHERE mon < DATE '1995-12-01')
        |SELECT strftime(mon, '%Y-%m') AS month,
        |       count(o_orderkey) AS n_orders,
        |       CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0)
        |         AS DOUBLE) AS revenue
        |FROM m LEFT JOIN orders
        |  ON CAST(date_trunc('month', o_orderdate) AS DATE) = mon
        |GROUP BY mon ORDER BY month""".stripMargin),

    // Time-interval RANGE window: 7-day trailing revenue per customer.
    // Value-based frames need no tiebreak for determinism (peers share
    // the frame); the sum stays in exact decimal until the final cast.
    "q24_trailing_window" -> entry(
      (s, dir) => {
        tbl(s, dir, "orders").createOrReplaceTempView("q24_orders")
        s.sql("""
          SELECT o_orderkey,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
                   AS DOUBLE) AS trailing7
          FROM q24_orders ORDER BY o_orderkey""")
      },
      """SELECT o_orderkey,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate
        |   RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
        |   AS DOUBLE) AS trailing7
        |FROM orders ORDER BY o_orderkey""".stripMargin),

    // TPC-H Q3 (shipping priority): selective dim filter broadcast into
    // the fact join, partial-agg before the group shuffle, top-10 via
    // TakeOrderedAndProject (no global sort materialization).
    "q25_tpch_q3" -> entry(
      (s, dir) => {
        val c = tbl(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
        val o = tbl(s, dir, "orders")
          .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val l = tbl(s, dir, "lineitem")
          .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(sum(col("l_extendedprice").cast(dec) *
            (lit(1).cast(dec) - col("l_discount").cast(dec)))
            .cast("double").as("revenue"))
          .select(col("l_orderkey"),
            unix_micros(col("o_orderdate").cast("timestamp")).as("orderdate_us"),
            col("o_orderpriority"), col("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      """SELECT l_orderkey, epoch_us(o_orderdate) AS orderdate_us,
        | o_orderpriority,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |   (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin),

    // TPC-H Q5 (local supplier volume): a star of four broadcast dims
    // around the lineitem fact, with the customer-nation = supplier-
    // nation constraint closing the snowflake. One fact shuffle total.
    "q26_tpch_q5" -> entry(
      (s, dir) => {
        val r = tbl(s, dir, "region").filter(col("r_name") === "ASIA")
        val n = tbl(s, dir, "nation")
        val sup = tbl(s, dir, "supplier")
        val c = tbl(s, dir, "customer")
        val o = tbl(s, dir, "orders")
        val l = tbl(s, dir, "lineitem")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(c),
            col("o_custkey") === col("c_custkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(sum(col("l_extendedprice").cast(dec) *
            (lit(1).cast(dec) - col("l_discount").cast(dec)))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      """SELECT n_name,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |   (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin),

    // Salted join (ext.Skew.saltedJoin): the q03 fact⋈dim aggregate
    // computed through an explicitly salted shuffle join — identical
    // result to the unsalted plan, hot customer keys spread over 8
    // reducers. The oracle is the plain join: salting must be invisible.
    "q27_salted_join" -> entry(
      (s, dir) => {
        val o = tbl(s, dir, "orders")
        val c = tbl(s, dir, "customer")
          .withColumnRenamed("c_custkey", "o_custkey")
        graft.ext.Skew.saltedJoin(o, c, key = "o_custkey", salt = 8,
            saltSource = col("o_orderkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast(dec)).cast("double").as("total"))
          .orderBy(col("c_mktsegment"))
      },
      """SELECT c_mktsegment, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),

    // NOT EXISTS anti-join: customers with no big order. Catalyst plans a
    // (broadcast) anti hash join — the complement plan shape to q14's
    // semi-join; never a per-row subquery.
    "q28_not_exists_antijoin" -> entry(
      (s, dir) => {
        val c = tbl(s, dir, "customer")
        val o = tbl(s, dir, "orders")
          .filter(col("o_totalprice") > 400000)
          .select(col("o_custkey"))
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin),

    // LOCF gap fill (last observation carried forward): every event row
    // carries the user's most recent purchase value — last_value with
    // IGNORE NULLS over an unbounded-preceding frame, the standard
    // sparse-to-dense fill. One window per user, no self-join.
    "q29_locf_fill" -> entry(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        tbl(s, dir, "events")
          .withColumn("purchase_val",
            when(col("event_type") === "purchase", col("value")))
          .select(col("event_id"), col("user_id"), col("event_type"),
            last(col("purchase_val"), ignoreNulls = true).over(w)
              .as("last_purchase_val"))
          .orderBy(col("event_id"))
      },
      """SELECT event_id, user_id, event_type,
        | last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |   OVER (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_val
        |FROM events ORDER BY event_id""".stripMargin),

    // Explicit GROUPING SETS (beyond rollup's prefix hierarchy): two
    // independent aggregation grains in one shuffle with a grouping-id —
    // not one pass per set.
    "q18_grouping_sets" -> entry(
      (s, dir) => {
        tbl(s, dir, "orders").createOrReplaceTempView("q18_orders")
        s.sql("""
          SELECT coalesce(o_orderstatus, 'ALL') AS status,
                 coalesce(o_orderpriority, 'ALL') AS priority,
                 count(*) AS n,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          FROM q18_orders
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
          ORDER BY status, priority""")
      },
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS priority,
        | count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY status, priority""".stripMargin),

    // Set operations (INTERSECT / EXCEPT) — hash-based distinct set ops at
    // user-day granularity.
    "q07_setops" -> entry(
      (s, dir) => {
        val ev = tbl(s, dir, "events")
        def userDays(t: String) =
          ev.filter(col("event_type") === t)
            .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
        userDays("purchase").intersect(userDays("click")).except(userDays("error"))
          .orderBy(col("user_id"), col("day"))
      },
      """(SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'purchase'
        | INTERSECT SELECT DISTINCT user_id, CAST(ts AS DATE) FROM events WHERE event_type = 'click')
        |EXCEPT SELECT DISTINCT user_id, CAST(ts AS DATE) FROM events WHERE event_type = 'error'
        |ORDER BY user_id, day""".stripMargin),

    // Global sort + limit → TakeOrderedAndProject (per-partition top-K +
    // driver merge of K·partitions rows, never a full sort at scale).
    "q08_sort_limit" -> entry(
      (s, dir) => {
        tbl(s, dir, "lineitem")
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
          .limit(10)
      },
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin),

    // Scalar function surface — pure projection, stays in one codegen stage.
    "q09_scalar_functions" -> entry(
      (s, dir) => {
        tbl(s, dir, "part").select(
          col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          length(col("p_name")).cast("long").as("name_len"),
          substring(col("p_type"), 1, 5).as("type_prefix"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
          floor(col("p_retailprice")).cast("long").as("price_floor"),
          (col("p_size") + 1).cast("long").as("size_plus"))
          .orderBy(col("p_partkey"))
      },
      """SELECT p_partkey, upper(p_name) AS name_upper,
        | CAST(length(p_name) AS BIGINT) AS name_len,
        | substring(p_type, 1, 5) AS type_prefix,
        | p_brand || ':' || p_type AS brand_type,
        | CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
        | CAST(p_size + 1 AS BIGINT) AS size_plus
        |FROM part ORDER BY p_partkey""".stripMargin),

    // Distinct aggregation (exact). The approximate HLL path
    // (approx_count_distinct) is demonstrated rows-only in x12 — sketches
    // are not oracle-comparable across engines.
    "q11_distinct_agg" -> entry(
      (s, dir) => {
        tbl(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("n_users"),
            countDistinct(col("user_id"), col("ts").cast("date")).as("n_user_days"),
            count(lit(1)).as("n"))
          .orderBy(col("event_type"))
      },
      """SELECT event_type,
        | count(DISTINCT user_id) AS n_users,
        | count(DISTINCT (user_id, CAST(ts AS DATE))) AS n_user_days,
        | count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),

    // Event-time tumbling-window aggregation — the batch twin of the
    // streaming `window()` agg (Structured Streaming runs the identical
    // expression with a watermark; see StreamingPipelineSpec).
    "q12_windowed_agg" -> entry(
      (s, dir) => {
        tbl(s, dir, "events")
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(round(col("value") * 100).cast("long")).as("sum_cents"))
          .select(unix_micros(col("w.start")).as("window_us"),
            col("event_type"), col("n"), col("sum_cents"))
          .orderBy(col("window_us"), col("event_type"))
      },
      """SELECT epoch_us(date_trunc('hour', ts)) AS window_us, event_type,
        | count(*) AS n,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events GROUP BY 1, 2 ORDER BY window_us, event_type""".stripMargin),

    // Skew mitigation: two-phase salted aggregation — identical result to
    // the direct group-by (the oracle IS the direct group-by), but the
    // first shuffle spreads each hot key over `salt` buckets so no single
    // reducer owns a whole key. The technique for power-law keys at 100 TB.
    "q13_salted_agg" -> entry(
      (s, dir) => {
        graft.ext.Skew.saltedAgg(
            tbl(s, dir, "events"), keyCol = "event_type", salt = 8,
            aggs = Seq(
              ("n", count(lit(1)), "sum"),
              ("sum_cents", sum(round(col("value") * 100).cast("long")), "sum"),
              ("max_cents", max(round(col("value") * 100).cast("long")), "max")))
          .orderBy(col("event_type"))
      },
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
        | CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS max_cents
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),

    // EXISTS / semi-join: customers with at least one urgent order —
    // left_semi never duplicates or widens rows.
    "q14_exists_semijoin" -> entry(
      (s, dir) => {
        val c = tbl(s, dir, "customer")
        val o = tbl(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin),

    // Pivot-style conditional aggregation: one pass, one shuffle — the
    // scalable form of PIVOT (explicit columns, no second metadata pass).
    "q15_conditional_pivot" -> entry(
      (s, dir) => {
        val ev = tbl(s, dir, "events")
        def cnt(t: String) =
          sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t")
        ev.groupBy(col("user_id"))
          .agg(cnt("click"), cnt("view"), cnt("purchase"), cnt("signup"), cnt("error"))
          .orderBy(col("user_id"))
      },
      """SELECT user_id,
        | CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        | CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        | CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        | CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        | CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),

    // Range join, bucketed: purchases within 1 hour after each signup.
    // The naive theta-join explodes; bucketing time into join-width bins
    // and joining each signup to its bin and the next bounds the fan-out
    // to two buckets per row — the scalable range-join decomposition.
    "q16_range_join" -> entry(
      (s, dir) => {
        val ev = tbl(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val hourUs = 3600L * 1000000L
        val signups = ev.filter(col("event_type") === "signup")
          .withColumn("bucket",
            explode(array(floor(col("us") / hourUs), floor(col("us") / hourUs) + 1)))
          .select(col("user_id"), col("event_id").as("s_id"),
            col("us").as("s_us"), col("bucket"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .withColumn("bucket", floor(col("us") / hourUs))
          .select(col("user_id"), col("us").as("p_us"), col("bucket"))
        signups.join(purchases, Seq("user_id", "bucket"))
          .filter(col("p_us") >= col("s_us") && col("p_us") - col("s_us") <= hourUs)
          .groupBy(col("s_id"))
          .agg(count(lit(1)).as("n_purchases_1h"))
          .orderBy(col("s_id"))
      },
      """SELECT s.event_id AS s_id, count(*) AS n_purchases_1h
        |FROM events s JOIN events p
        |  ON p.user_id = s.user_id
        | AND p.event_type = 'purchase' AND s.event_type = 'signup'
        | AND epoch_us(p.ts) >= epoch_us(s.ts)
        | AND epoch_us(p.ts) - epoch_us(s.ts) <= 3600000000
        |GROUP BY s.event_id ORDER BY s_id""".stripMargin),

    // As-of join: for each purchase, the user's most recent prior (or
    // simultaneous) signup. Composed from built-ins (SURVEY §7.3
    // preference order): union both streams, one per-user window pass,
    // last non-null carry-forward — one shuffle, no point lookups. The
    // oracle uses DuckDB's native ASOF JOIN.
    "q17_asof_join" -> entry(
      (s, dir) => {
        val ev = tbl(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            col("event_type"), unix_micros(col("ts")).as("us"))
        val tagged = ev.filter(col("event_type") === "signup")
          .select(col("user_id"), col("event_id"), col("us"),
            lit(0).as("tag"), col("us").as("s_us"))
          .unionByName(ev.filter(col("event_type") === "purchase")
            .select(col("user_id"), col("event_id"), col("us"),
              lit(1).as("tag"), lit(null).cast("long").as("s_us")))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("tag"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, 0)
        tagged
          .withColumn("prev_signup_us", last(col("s_us"), ignoreNulls = true).over(w))
          .filter(col("tag") === 1)
          .select(col("event_id"), col("user_id"), col("us"), col("prev_signup_us"))
          .orderBy(col("event_id"))
      },
      """SELECT p.event_id, p.user_id, p.us, s.s_us AS prev_signup_us
        |FROM (SELECT event_id, user_id, epoch_us(ts) AS us FROM events
        |      WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, epoch_us(ts) AS s_us FROM events
        |                WHERE event_type = 'signup') s
        |  ON p.user_id = s.user_id AND p.us >= s.s_us
        |ORDER BY p.event_id""".stripMargin),

    // Sessionization: lag-based gap detection, one shuffle on user_id.
    // All time arithmetic in integral microseconds for oracle parity.
    "q10_sessionize" -> entry(
      (s, dir) => {
        val ev = tbl(s, dir, "events")
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        ev.withColumn("prev_us", lag(col("us"), 1).over(w))
          .withColumn("new_session",
            when(col("prev_us").isNull || col("us") - col("prev_us") > 1800L * 1000000L, 1L)
              .otherwise(0L))
          .groupBy(col("user_id"))
          .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
          .orderBy(col("user_id"))
      },
      """SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events FROM (
        | SELECT user_id,
        |  CASE WHEN prev_us IS NULL OR us - prev_us > 1800 * 1000000 THEN 1 ELSE 0 END AS new_session
        | FROM (SELECT user_id, epoch_us(ts) AS us,
        |        lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
        |       FROM events))
        |GROUP BY user_id ORDER BY user_id""".stripMargin)
  )
}
