package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Each `queries` key has a matching DuckDB `oracleSql` with
  * identical output column names and engine-exact semantics
  * (decimal-exact sums, deterministic tie-breaks; see SURVEY §5).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q5MultiJoin(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C. relational / OLAP core
    "q1_agg" -> (Relational.q1Agg _),
    "q3_topk" -> (Relational.q3TopK _),
    "q5_multijoin" -> (Relational.q5MultiJoin _),
    "q_window" -> (Relational.qWindow _),
    "q_distinct" -> (Relational.qDistinct _),
    "q_exists" -> (Relational.qExists _),
    "q_rollup" -> (Relational.qRollup _),
    "q_asof" -> (Relational.qAsOf _),
    // B. telemetry / event-time
    "downsample_1hz" -> (Telemetry.downsample1Hz _),
    "beacon_5min" -> (Telemetry.beacon5Min _),
    "data_budget" -> ((s: SparkSession, d: String) => Telemetry.dataBudget(s, d)),
    "session_windows" -> ((s: SparkSession, d: String) => Telemetry.sessionWindows(s, d)),
    "chunk_messages" -> ((s: SparkSession, d: String) => Telemetry.chunkMessages(s, d)),
    "queue_stats" -> (Telemetry.queueStats _),
    "status_transitions" -> (Telemetry.statusTransitions _),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_topk" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_multijoin" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name""".stripMargin,
    "q_window" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, price_rank, run_qty FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS BIGINT) AS price_rank,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_qty
        |  FROM lineitem) t
        |WHERE price_rank <= 3""".stripMargin,
    "q_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_exists" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q_asof" ->
      """SELECT e.event_id, e.user_id, e.ts, d.o_orderdate AS last_order_date, d.day_total AS last_day_total
        |FROM events e ASOF LEFT JOIN (
        |  SELECT o_custkey, o_orderdate,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS day_total
        |  FROM orders GROUP BY o_custkey, o_orderdate) d
        |ON e.user_id = d.o_custkey AND e.ts >= d.o_orderdate""".stripMargin,
    "downsample_1hz" ->
      """SELECT event_id, user_id, sec, value FROM (
        |  SELECT event_id, user_id, date_trunc('second', ts) AS sec, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('second', ts) ORDER BY ts, event_id) AS rn
        |  FROM events) t WHERE rn = 1""".stripMargin,
    "beacon_5min" ->
      """SELECT user_id, bucket, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  MIN(ts) AS first_ts, MAX(ts) AS last_ts
        |FROM (SELECT *, make_timestamp((epoch_ms(ts) // 300000) * 300000 * 1000) AS bucket FROM events) t
        |GROUP BY user_id, bucket""".stripMargin,
    "data_budget" ->
      """SELECT event_id, user_id, ts, CAST(cum AS DOUBLE) AS cum_kb FROM (
        |  SELECT event_id, user_id, ts,
        |    SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM events) t
        |WHERE cum <= 5000.00""".stripMargin,
    "session_windows" ->
      """SELECT user_id, session_id, COUNT(*) AS n_events, MIN(ts) AS start_ts, MAX(ts) AS end_ts FROM (
        |  SELECT user_id, ts,
        |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM (
        |    SELECT user_id, ts, event_id,
        |      CASE WHEN LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |        OR epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
        |      THEN 1 ELSE 0 END AS new_s
        |    FROM events) a) b
        |GROUP BY user_id, session_id""".stripMargin,
    "chunk_messages" ->
      """SELECT event_id, user_id, nbytes, CAST(t.chunk_idx AS BIGINT) AS chunk_idx,
        |  LEAST(6400, nbytes - t.chunk_idx * 6400) AS chunk_bytes
        |FROM (SELECT event_id, user_id, CAST(ROUND(value * 100) AS BIGINT) AS nbytes FROM events) e,
        |  UNNEST(range(0, CAST(CEIL(nbytes / 6400.0) AS BIGINT))) AS t(chunk_idx)""".stripMargin,
    "queue_stats" ->
      """SELECT event_type, COUNT(*) AS n_msgs,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS bytes_total,
        |  CAST(COUNT(*) FILTER (WHERE k > 50) AS BIGINT) AS n_lost,
        |  CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE k > 50), 0) AS DOUBLE) AS bytes_lost,
        |  MAX(ts) FILTER (WHERE k <= 50) AS last_sent,
        |  MAX(ts) FILTER (WHERE k > 50) AS last_lost
        |FROM (SELECT *, CAST(regexp_extract(props, '([0-9]+)', 1) AS INT) AS k FROM events) t
        |GROUP BY event_type""".stripMargin,
    "status_transitions" ->
      """SELECT prev_type, event_type AS cur_type, COUNT(*) AS n_transitions,
        |  CAST(SUM(COALESCE(next_us - epoch_us(ts), 0)) AS BIGINT) AS total_dwell_us
        |FROM (
        |  SELECT user_id, ts, event_type,
        |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
        |    LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_us
        |  FROM events) t
        |WHERE prev_type IS NOT NULL AND prev_type <> event_type
        |GROUP BY prev_type, event_type""".stripMargin,
  )
}
