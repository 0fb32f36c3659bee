package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{EmbeddingQueries, Relational, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query ids q01–q23 cover SURVEY.md §2.4 Q1–Q22 (the SURVEY's combined
  * "Q14 set ops" is split into q14 INTERSECT / q15 EXCEPT, shifting later
  * ids by one: SURVEY Q15→q16, Q16→q17, Q17→q18, Q18→q19, Q19→q20,
  * Q20→q21, Q21→q22, Q22→q23).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The 5-table star join exercises scan, broadcast + shuffle joins, and
    * exact-decimal aggregation in one plan. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q05(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_project_limit" -> (Relational.q01 _),
    "q02_filter_agg"         -> (Relational.q02 _),
    "q03_hash_agg"           -> (Relational.q03 _),
    "q04_join_agg"           -> (Relational.q04 _),
    "q05_multijoin"          -> (Relational.q05 _),
    "q06_left_join"          -> (Relational.q06 _),
    "q07_semi_join"          -> (Relational.q07 _),
    "q08_anti_join"          -> (Relational.q08 _),
    "q09_count_distinct"     -> (Relational.q09 _),
    "q10_rollup"             -> (Relational.q10 _),
    "q11_window_rank"        -> (Relational.q11 _),
    "q12_window_running"     -> (Relational.q12 _),
    "q13_topk"               -> (Relational.q13 _),
    "q14_intersect"          -> (Relational.q14 _),
    "q15_except"             -> (Relational.q15 _),
    "q16_string_funcs"       -> (Relational.q16 _),
    "q17_date_funcs"         -> (Relational.q17 _),
    "q18_event_window"       -> (TextQueries.q18 _),
    "q19_wordcount"          -> (TextQueries.q19 _),
    "q20_inverted_index"     -> (TextQueries.q20 _),
    "q21_file_stats"         -> (TextQueries.q21 _),
    "q22_dedup_exact"        -> (TextQueries.q22 _),
    "q23_embed_dim"          -> (EmbeddingQueries.q23 _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_scan_project_limit" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    "q02_filter_agg" ->
      """SELECT COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(l_discount AS DECIMAL(12,4))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1994-01-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1995-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q03_hash_agg" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_qty,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_base,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4)))), 2) AS DOUBLE) AS sum_disc_price
        |FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q04_join_agg" ->
      """SELECT c.c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS total
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin,
    "q05_multijoin" ->
      """SELECT n.n_name, COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l.l_discount AS DECIMAL(12,4)))), 2) AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA' GROUP BY n.n_name ORDER BY n.n_name""".stripMargin,
    "q06_left_join" ->
      """SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
        |FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_custkey HAVING COUNT(o.o_orderkey) = 0
        |ORDER BY c.c_custkey""".stripMargin,
    "q07_semi_join" ->
      """SELECT COUNT(*) AS n FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')""".stripMargin,
    "q08_anti_join" ->
      """SELECT p.p_partkey FROM part p
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
        |ORDER BY p.p_partkey""".stripMargin,
    "q09_count_distinct" ->
      """SELECT COUNT(DISTINCT l_partkey) AS parts, COUNT(DISTINCT l_suppkey) AS supps
        |FROM lineitem""".stripMargin,
    "q10_rollup" ->
      """SELECT o_orderpriority, o_orderstatus,
        |  CAST(GROUPING(o_orderpriority) AS INTEGER) AS g1,
        |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g2,
        |  COUNT(*) AS n
        |FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
        |ORDER BY g1, g2, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,
    "q11_window_rank" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS INTEGER) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q12_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4))) OVER (
        |    PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS run
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q13_topk" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_acctbal DESC, c_custkey LIMIT 10""".stripMargin,
    "q14_intersect" ->
      """SELECT k FROM ((SELECT o_custkey AS k FROM orders)
        |  INTERSECT (SELECT c_custkey FROM customer))
        |ORDER BY k LIMIT 50""".stripMargin,
    "q15_except" ->
      """SELECT k FROM ((SELECT c_custkey AS k FROM customer)
        |  EXCEPT (SELECT o_custkey FROM orders))
        |ORDER BY k""".stripMargin,
    "q16_string_funcs" ->
      """SELECT p_partkey, UPPER(p_brand) AS b,
        |  CAST(LENGTH(p_name) AS INTEGER) AS len,
        |  SUBSTR(p_type, 1, 5) AS t5,
        |  CONCAT(p_brand, '#', CAST(p_size AS VARCHAR)) AS tag
        |FROM part WHERE p_name LIKE '%blue%' OR p_type LIKE 'SMALL%'
        |ORDER BY p_partkey""".stripMargin,
    "q17_date_funcs" ->
      """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS y,
        |  CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS m,
        |  COUNT(*) AS n
        |FROM orders GROUP BY 1, 2 ORDER BY y, m""".stripMargin,
    "q18_event_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS w, event_type,
        |  COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS v
        |FROM events GROUP BY 1, 2 ORDER BY w, event_type""".stripMargin,
    "q19_wordcount" ->
      """SELECT word, COUNT(*) AS n FROM (
        |  SELECT UNNEST(string_split_regex(LOWER(text), '[^a-z]+')) AS word
        |  FROM documents)
        |WHERE word <> '' GROUP BY word ORDER BY n DESC, word LIMIT 100""".stripMargin,
    "q20_inverted_index" ->
      """SELECT word, COUNT(DISTINCT doc_id) AS n_docs,
        |  array_to_string(list_sort(list(DISTINCT CAST(doc_id AS VARCHAR))), ',') AS docs
        |FROM (
        |  SELECT doc_id, UNNEST(string_split_regex(LOWER(text), '[^a-z]+')) AS word
        |  FROM documents)
        |WHERE word <> '' GROUP BY word ORDER BY word LIMIT 200""".stripMargin,
    "q21_file_stats" ->
      """SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS chars,
        |  MIN(doc_id) AS first_doc
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q22_dedup_exact" ->
      """SELECT h, COUNT(*) AS dups FROM (SELECT MD5(text) AS h FROM documents)
        |GROUP BY h HAVING COUNT(*) > 1 ORDER BY h""".stripMargin,
    "q23_embed_dim" ->
      """SELECT vec_id, label, CAST(len(embedding) AS INTEGER) AS dim
        |FROM embeddings ORDER BY vec_id LIMIT 50""".stripMargin,
  )
}
