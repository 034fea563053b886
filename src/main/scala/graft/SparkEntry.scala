package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.ErrorFrame

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Conventions for oracle (DuckDB) hash-equality:
  *  - aggregates over floating columns go through exact decimal sums and
  *    are cast to double at the end (order-independent, engine-agnostic);
  *  - per-row double arithmetic is allowed (deterministic IEEE);
  *  - every query ends with a deterministic total ORDER BY.
  */
object SparkEntry {

  private val DEC = "decimal(18,4)"

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- q: relational

  private def q1(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate".cast("date") <= lit("1998-09-02"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity".cast(DEC)).cast("double").as("sum_qty"),
        sum($"l_extendedprice".cast(DEC)).cast("double").as("sum_base_price"),
        sum(($"l_extendedprice".cast(DEC) * (lit(1).cast(DEC) - $"l_discount".cast(DEC))))
          .cast("double").as("sum_disc_price"),
        sum(($"l_extendedprice".cast(DEC) * (lit(1).cast(DEC) - $"l_discount".cast(DEC))
          * (lit(1).cast(DEC) + $"l_tax".cast(DEC)))).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  private def q2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")), $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"c_name", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(10)
  }

  private def q3(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
    val ord = t(s, dir, "orders").filter($"o_orderdate".cast("date") < lit("1998-03-15"))
    val li = t(s, dir, "lineitem").filter($"l_shipdate".cast("date") > lit("1998-03-15"))
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate".cast("date").cast("string").as("o_orderdate"), $"o_orderpriority")
      .agg(sum(($"l_extendedprice".cast(DEC) * (lit(1).cast(DEC) - $"l_discount".cast(DEC))))
        .cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey".asc)
      .limit(20)
  }

  private def q6(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate".cast("date") >= lit("1996-01-01")
        && $"l_shipdate".cast("date") < lit("1997-01-01")
        && $"l_discount" >= 0.03 && $"l_discount" <= 0.07
        && $"l_quantity" < 24)
      .agg(sum(($"l_extendedprice".cast(DEC) * $"l_discount".cast(DEC)))
        .cast("double").as("revenue"),
        count(lit(1)).as("n"))
  }

  // ---------------------------------------------------------------- e: error handling

  /** Shared failing transform: parse k out of events.props, compute an
    * ANSI integral division that fails when k % 7 == 0.
    */
  private def eventsCaptured(s: SparkSession, dir: String): ErrorFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
      .withColumn("k", regexp_extract($"props", "[0-9]+", 0).cast("int"))
    ErrorFrame.captureErrors(
      ev,
      Map("res" -> expr("100 div (k % 7)")),
      input = $"props")
  }

  private def e2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    eventsCaptured(s, dir).values
      .select($"event_id", $"k", $"res".cast("long").as("res"))
      .orderBy($"event_id")
  }

  private def e4(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    eventsCaptured(s, dir)
      .deadLetters("events k-division pipeline")
      .select($"input_value", $"description", $"cause.error_class".as("error_class"))
      .orderBy($"input_value")
  }

  // ---------------------------------------------------------------- d/t: pipeline ops

  private def d1(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .groupBy(md5($"text").as("text_hash"))
      .agg(min($"doc_id").as("canonical_id"), count(lit(1)).as("n_copies"))
      .orderBy($"canonical_id")
  }

  private def t3(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select(
        $"doc_id",
        size(split(trim($"text"), "\\s+")).cast("long").as("ws_tokens"),
        size(regexp_extract_all($"text", lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0)))
          .cast("long").as("re_tokens"))
      .orderBy($"doc_id")
  }

  // ---------------------------------------------------------------- registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1 _),
    "q2_top_orders" -> (q2 _),
    "q3_shipping_priority" -> (q3 _),
    "q6_filter_agg" -> (q6 _),
    "e2_capture_values" -> (e2 _),
    "e4_dead_letters" -> (e4 _),
    "d1_exact_dedup" -> (d1 _),
    "t3_tokens" -> (t3 _),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) * (1 + CAST(l_tax AS DECIMAL(18,4)))) AS DOUBLE) AS sum_charge,
        | COUNT(*) AS count_order
        |FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_top_orders" ->
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate, o_orderpriority,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        | AND CAST(o_orderdate AS DATE) < DATE '1998-03-15'
        | AND CAST(l_shipdate AS DATE) > DATE '1998-03-15'
        |GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 20""".stripMargin,
    "q6_filter_agg" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        | AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
        | AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "e2_capture_values" ->
      """SELECT event_id, k, CAST(100 // (k % 7) AS BIGINT) AS res
        |FROM (SELECT event_id, CAST(regexp_extract(props, '[0-9]+') AS INT) AS k FROM events)
        |WHERE k % 7 <> 0 ORDER BY event_id""".stripMargin,
    "e4_dead_letters" ->
      """SELECT props AS input_value,
        | 'events k-division pipeline' AS description,
        | 'org.apache.spark.SparkArithmeticException' AS error_class
        |FROM (SELECT props, CAST(regexp_extract(props, '[0-9]+') AS INT) AS k FROM events)
        |WHERE k % 7 = 0 ORDER BY input_value""".stripMargin,
    "d1_exact_dedup" ->
      """SELECT md5(text) AS text_hash, MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY canonical_id""".stripMargin,
    "t3_tokens" ->
      """SELECT doc_id,
        | CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
        | CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS re_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
