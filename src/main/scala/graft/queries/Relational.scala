package graft.queries

import graft.{Num, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** TPC-H-flavoured relational inventory over the driver testdata.
  *
  * Every query is deterministic (total ORDER BY — ties fully broken by a
  * unique key) and numerically oracle-safe (decimal-cast sums, see
  * [[graft.Num]]; math functions applied to already-exact aggregate
  * scalars, never summed per-row). Each has a DuckDB oracle in
  * [[graft.SparkEntry.oracleSql]] with identical output column names.
  *
  * Scale notes (the 100 TB lens): every aggregate here shuffles only its
  * grouping keys (partial aggregation is automatic); dimension joins
  * (nation/region/supplier/part at TPC-H proportions) are explicitly
  * `broadcast()`; the one quadratic operator (q22 theta join) is keyed on
  * `p_size` first so it is an equi-join with a bounded per-key fan-out,
  * not a cross product.
  */
object Relational {
  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    Tables.load(spark, sfDir, name)

  // ---------------------------------------------------------------- q01
  /** TPC-H Q1: scan + pushed filter + partial/final hash aggregate. */
  def q01(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Num.dsum(col("l_quantity")).as("sum_qty"),
        Num.dsum(col("l_extendedprice")).as("sum_base_price"),
        Num.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        Num.davg(col("l_quantity")).as("avg_qty"),
        Num.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q01Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${Num.dsumSql("l_quantity")} AS sum_qty,
       |  ${Num.dsumSql("l_extendedprice")} AS sum_base_price,
       |  ${Num.dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |  ${Num.davgSql("l_quantity")} AS avg_qty,
       |  ${Num.davgSql("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q02
  /** Global top-k: TakeOrderedAndProject — no full sort at scale. */
  def q02(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderdate").cast("date").as("o_date"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  val q02Sql: String =
    """SELECT o_orderkey, o_totalprice, CAST(o_orderdate AS DATE) AS o_date
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q03
  /** TPC-H Q3: 3-way join (broadcast filtered customer) + agg + top-k. */
  def q03(spark: SparkSession, sfDir: String): DataFrame = {
    val c = t(spark, sfDir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(spark, sfDir, "orders")
      .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
    val l = t(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") > lit("1999-01-01").cast("timestamp"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_date"))
      .agg(Num.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("revenue"), col("o_date"))
  }

  val q03Sql: String =
    s"""SELECT l_orderkey,
       |  ${Num.dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  CAST(o_orderdate AS DATE) AS o_date
       |FROM customer, orders, lineitem
       |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
       |  AND l_orderkey = o_orderkey
       |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
       |  AND l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
       |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
       |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q04
  /** TPC-H Q4 shape: EXISTS as a left-semi join, never a fan-out join. */
  def q04(spark: SparkSession, sfDir: String): DataFrame = {
    val o = t(spark, sfDir, "orders")
    val l = t(spark, sfDir, "lineitem").filter(col("l_quantity") > 45)
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q04Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders WHERE EXISTS (
      |  SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q05
  /** TPC-H Q5 shape: star join — fact shuffled once, all dims broadcast. */
  def q05(spark: SparkSession, sfDir: String): DataFrame = {
    val l = t(spark, sfDir, "lineitem")
    val o = t(spark, sfDir, "orders")
    val c = t(spark, sfDir, "customer")
    val n = t(spark, sfDir, "nation")
    val r = t(spark, sfDir, "region")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(Num.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val q05Sql: String =
    s"""SELECT r_name, n_name,
       |  ${Num.dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  COUNT(*) AS n_lines
       |FROM lineitem, orders, customer, nation, region
       |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
       |  AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
       |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------- q06
  /** TPC-H Q6: pure pushed-down filter + single-row aggregate. */
  def q06(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(Num.dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n"))

  val q06Sql: String =
    s"""SELECT ${Num.dsumSql("l_extendedprice * l_discount")} AS revenue, COUNT(*) AS n
       |FROM lineitem
       |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------- q07
  /** Broadcast dim join: brand-level volume. */
  def q07(spark: SparkSession, sfDir: String): DataFrame = {
    val l = t(spark, sfDir, "lineitem")
    val p = t(spark, sfDir, "part")
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(Num.dsum(col("l_quantity")).as("sum_qty"),
        Num.dsum(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("p_brand"))
  }

  val q07Sql: String =
    s"""SELECT p_brand, ${Num.dsumSql("l_quantity")} AS sum_qty,
       |  ${Num.dsumSql("l_extendedprice")} AS sum_price, COUNT(*) AS n_lines
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- q08
  /** Left-semi join: customers that have at least one order. */
  def q08(spark: SparkSession, sfDir: String): DataFrame = {
    val c = t(spark, sfDir, "customer")
    val o = t(spark, sfDir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"), Num.davg(col("c_acctbal")).as("avg_bal"))
      .orderBy(col("c_mktsegment"))
  }

  val q08Sql: String =
    s"""SELECT c_mktsegment, COUNT(*) AS n_customers, ${Num.davgSql("c_acctbal")} AS avg_bal
       |FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q09
  /** Left-anti join: customers with no pending ('P') orders. */
  def q09(spark: SparkSession, sfDir: String): DataFrame = {
    val c = t(spark, sfDir, "customer")
    val o = t(spark, sfDir, "orders").filter(col("o_orderstatus") === "P")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_nationkey"))
  }

  val q09Sql: String =
    """SELECT c_nationkey, COUNT(*) AS n_customers
      |FROM customer WHERE NOT EXISTS (
      |  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  // ---------------------------------------------------------------- q10
  /** Per-group top-k via row_number window (shuffle on custkey only). */
  def q10(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(spark, sfDir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  val q10Sql: String =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  // ---------------------------------------------------------------- q11
  /** Running (cumulative) sum per customer — decimal-exact window sum.
    *
    * Scale note: the trailing total ORDER BY returns the whole table —
    * oracle-driven determinism, not a production shape. At 100 TB the
    * window computation itself is fine (one shuffle on o_custkey,
    * per-key sorted scan); the consumer would drop the global sort and
    * write partitioned output, or bound with a per-key limit.
    */
  def q11(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_date"),
        sum(col("o_totalprice").cast(DecimalType(27, 4))).over(w)
          .cast(DoubleType).as("running_total"),
        lag(col("o_totalprice"), 1, 0.0)
          .over(Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_orderdate"), col("o_orderkey"))).as("prev_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q11Sql: String =
    """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
      |  COALESCE(LAG(o_totalprice, 1) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 0.0) AS prev_price
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q12
  /** Ranking window zoo: rank / dense_rank / ntile over parts per brand. */
  def q12(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    t(spark, sfDir, "part")
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"))
      .filter(col("rnk") <= 5)
      .orderBy(col("p_brand"), col("rnk"), col("p_partkey"))
  }

  val q12Sql: String =
    """SELECT p_brand, p_partkey, p_retailprice, rnk, drnk, quartile FROM (
      |  SELECT p_brand, p_partkey, p_retailprice,
      |    RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk, NTILE(4) OVER w AS quartile
      |  FROM part
      |  WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey))
      |WHERE rnk <= 5 ORDER BY p_brand, rnk, p_partkey""".stripMargin

  // ---------------------------------------------------------------- q13
  /** ROLLUP with null-free output keys (COALESCE to 'ALL').
    *
    * Planned via [[graft.operators.Rollups.rollupFromBase]]: the base
    * level aggregates once (exact decimal sums re-aggregate exactly),
    * and the subtotal levels derive from the tiny base result instead
    * of native rollup's Expand tripling the 600 k-row shuffle —
    * measured 4× faster, identical values (q14 keeps the native cube
    * path for built-in grouping-set coverage).
    */
  def q13(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Rollups.rollupFromBase(
      t(spark, sfDir, "lineitem"), Seq("l_returnflag", "l_linestatus"),
      baseAggs = Seq(sum(col("l_extendedprice").cast(DecimalType(27, 4))).as("s"),
        count(lit(1)).as("n")),
      reAggs = Seq(sum(col("s")).as("s"), sum(col("n")).as("n")))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("s").cast(DoubleType).as("sum_price"), col("n"))
      .orderBy(col("returnflag"), col("linestatus"))

  val q13Sql: String =
    s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       |  COALESCE(l_linestatus, 'ALL') AS linestatus,
       |  ${Num.dsumSql("l_extendedprice")} AS sum_price, COUNT(*) AS n
       |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
       |ORDER BY returnflag, linestatus""".stripMargin

  // ---------------------------------------------------------------- q14
  /** CUBE over order status × priority. */
  def q14(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), Num.dsum(col("o_totalprice")).as("sum_price"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("sum_price"))
      .orderBy(col("status"), col("priority"))

  val q14Sql: String =
    s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       |  COALESCE(o_orderpriority, 'ALL') AS priority,
       |  COUNT(*) AS n, ${Num.dsumSql("o_totalprice")} AS sum_price
       |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
       |ORDER BY status, priority""".stripMargin

  // ---------------------------------------------------------------- q15
  /** Set operations: UNION / INTERSECT / EXCEPT cardinalities. */
  def q15(spark: SparkSession, sfDir: String): DataFrame = {
    val c = t(spark, sfDir, "customer")
    val building = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val machinery = c.filter(col("c_mktsegment") === "MACHINERY").select(col("c_custkey"))
    val withOrders = t(spark, sfDir, "orders").select(col("o_custkey").as("c_custkey"))
    def one(op: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
    one("except", building.except(withOrders))
      .unionAll(one("intersect", building.intersect(withOrders)))
      .unionAll(one("union", building.union(machinery).distinct()))
      .orderBy(col("op"))
  }

  val q15Sql: String =
    """WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
      |     machinery AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'),
      |     w_orders AS (SELECT o_custkey AS c_custkey FROM orders)
      |SELECT 'except' AS op, COUNT(*) AS n FROM (SELECT * FROM building EXCEPT SELECT * FROM w_orders)
      |UNION ALL
      |SELECT 'intersect' AS op, COUNT(*) AS n FROM (SELECT * FROM building INTERSECT SELECT * FROM w_orders)
      |UNION ALL
      |SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT DISTINCT c_custkey FROM (SELECT * FROM building UNION ALL SELECT * FROM machinery))
      |ORDER BY op""".stripMargin

  // ---------------------------------------------------------------- q16
  /** Exact distinct aggregates (expand + two-phase under the hood). */
  def q16(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .agg(countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_lines"))

  val q16Sql: String =
    """SELECT COUNT(DISTINCT l_orderkey) AS n_orders, COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_lines FROM lineitem""".stripMargin

  // ---------------------------------------------------------------- q17
  /** String-function surface over part (all codegen'd built-ins).
    *
    * Scale note: like q11, the total ORDER BY over the full table is
    * parity-only; the per-row string work is embarrassingly parallel
    * and the production form omits the global sort.
    */
  def q17(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "part")
      .select(col("p_partkey"),
        upper(col("p_name")).as("uname"),
        substring(col("p_name"), 1, 8).as("prefix"),
        length(col("p_name")).cast("int").as("name_len"),
        regexp_replace(col("p_name"), " ", "_").as("snake"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
        instr(col("p_name"), "a").cast("int").as("first_a"),
        reverse(col("p_name")).as("rname"))
      .orderBy(col("p_partkey"))

  val q17Sql: String =
    """SELECT p_partkey, UPPER(p_name) AS uname, SUBSTRING(p_name, 1, 8) AS prefix,
      |  CAST(LENGTH(p_name) AS INT) AS name_len, REPLACE(p_name, ' ', '_') AS snake,
      |  CONCAT_WS('/', p_brand, p_type) AS brand_type,
      |  LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
      |  CAST(STRPOS(p_name, 'a') AS INT) AS first_a, REVERSE(p_name) AS rname
      |FROM part ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q18
  /** Date/time surface: trunc, extract, diff, add. */
  def q18(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .groupBy(year(col("o_orderdate")).cast("int").as("o_year"),
        month(col("o_orderdate")).cast("int").as("o_month"))
      .agg(count(lit(1)).as("n"),
        min(col("o_orderdate").cast("date")).as("first_day"),
        max(date_add(col("o_orderdate").cast("date"), 30)).as("max_plus30"),
        max(datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")))
          .cast("int").as("max_days_since"))
      .orderBy(col("o_year"), col("o_month"))

  val q18Sql: String =
    """SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year, CAST(MONTH(o_orderdate) AS INT) AS o_month,
      |  COUNT(*) AS n, MIN(CAST(o_orderdate AS DATE)) AS first_day,
      |  CAST(MAX(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY) AS DATE) AS max_plus30,
      |  CAST(MAX(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))) AS INT) AS max_days_since
      |FROM orders GROUP BY 1, 2 ORDER BY o_year, o_month""".stripMargin

  // ---------------------------------------------------------------- q19
  /** Math functions applied to exact aggregate scalars (deterministic). */
  def q19(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(Num.dsum(col("l_quantity")).as("sum_qty"),
        Num.dsum(col("l_extendedprice")).as("sum_price"))
      .select(col("l_returnflag"),
        round(sqrt(col("sum_qty")), 6).as("sqrt_qty"),
        round(log(col("sum_price")), 6).as("ln_price"),
        round(pow(col("sum_qty"), lit(1.5)) / col("sum_price"), 6).as("ratio"),
        floor(col("sum_qty")).cast("bigint").as("floor_qty"),
        ceil(col("sum_price")).cast("bigint").as("ceil_price"))
      .orderBy(col("l_returnflag"))

  val q19Sql: String =
    s"""WITH g AS (
       |  SELECT l_returnflag, ${Num.dsumSql("l_quantity")} AS sum_qty,
       |    ${Num.dsumSql("l_extendedprice")} AS sum_price
       |  FROM lineitem GROUP BY l_returnflag)
       |SELECT l_returnflag, ROUND(SQRT(sum_qty), 6) AS sqrt_qty,
       |  ROUND(LN(sum_price), 6) AS ln_price,
       |  ROUND(POW(sum_qty, 1.5) / sum_price, 6) AS ratio,
       |  CAST(FLOOR(sum_qty) AS BIGINT) AS floor_qty,
       |  CAST(CEIL(sum_price) AS BIGINT) AS ceil_price
       |FROM g ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q20
  /** CASE WHEN bucketing + conditional aggregation. */
  def q20(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .select(col("o_totalprice"), col("o_orderstatus"),
        when(col("o_totalprice") < 50000, "small")
          .when(col("o_totalprice") < 150000, "medium")
          .otherwise("large").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        count(when(col("o_orderstatus") === "F", 1)).as("n_finished"),
        Num.dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("bucket"))

  val q20Sql: String =
    s"""SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
       |            WHEN o_totalprice < 150000 THEN 'medium'
       |            ELSE 'large' END AS bucket,
       |  COUNT(*) AS n,
       |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
       |  ${Num.dsumSql("o_totalprice")} AS sum_price
       |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- q21
  /** Scalar-subquery threshold (decimal-exact, so both engines agree). */
  def q21(spark: SparkSession, sfDir: String): DataFrame = {
    val c = t(spark, sfDir, "customer")
    val thr = c.agg((sum(col("c_acctbal").cast(DecimalType(27, 4))).cast(DoubleType)
      / count(lit(1))).as("thr"))
    c.crossJoin(broadcast(thr))
      .filter(col("c_acctbal") > col("thr"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_rich"), Num.davg(col("c_acctbal")).as("avg_bal"))
      .orderBy(col("c_nationkey"))
  }

  val q21Sql: String =
    s"""SELECT c_nationkey, COUNT(*) AS n_rich, ${Num.davgSql("c_acctbal")} AS avg_bal
       |FROM customer
       |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(27,4))) AS DOUBLE) / COUNT(*) FROM customer)
       |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  // ---------------------------------------------------------------- q22
  /** Pairwise price gaps per size — semantically a theta join
    * (`p1.p_size = p2.p_size AND p1.price > p2.price`, the oracle's
    * formulation), executed as an O(n log n) prefix-sum rewrite: group
    * by (size, price), then for each price group the pairs against all
    * cheaper parts are `c·C_prev` and their gap mass is
    * `c·(price·C_prev − S_prev)` from running count/sum windows. The
    * per-size-quadratic join this replaces was the correct *bounded*
    * fallback; at 100 TB the window form shuffles each row once and
    * never materializes a pair.
    */
  def q22(spark: SparkSession, sfDir: String): DataFrame = {
    val g = t(spark, sfDir, "part")
      .groupBy(col("p_size"), col("p_retailprice"))
      .agg(count(lit(1)).as("c"))
      .withColumn("pd", col("p_retailprice").cast(DecimalType(27, 4)))
    val w = Window.partitionBy(col("p_size")).orderBy(col("p_retailprice"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("c_prev", coalesce(sum(col("c")).over(w), lit(0L)))
      .withColumn("s_prev",
        coalesce(sum(col("pd") * col("c")).over(w), lit(0).cast(DecimalType(38, 4))))
      .groupBy(col("p_size"))
      .agg(sum(col("c") * col("c_prev")).as("n_pairs"),
        sum(col("c") * (col("pd") * col("c_prev") - col("s_prev")))
          .cast(DoubleType).as("sum_gap"))
      // the join formulation emits nothing for sizes with no strictly
      // cheaper pair (all-equal prices / singleton sizes)
      .where(col("n_pairs") > 0)
      .orderBy(col("p_size"))
  }

  val q22Sql: String =
    s"""SELECT p1.p_size, COUNT(*) AS n_pairs,
       |  ${Num.dsumSql("p1.p_retailprice - p2.p_retailprice")} AS sum_gap
       |FROM part p1 JOIN part p2
       |  ON p1.p_size = p2.p_size AND p1.p_retailprice > p2.p_retailprice
       |GROUP BY p1.p_size ORDER BY p1.p_size""".stripMargin

  // ---------------------------------------------------------------- q49
  /** Exact interpolated percentiles per group. Both engines use the
    * same linear interpolation `(1-f)·a + f·b` over identically-sorted
    * doubles, so the results agree bitwise.
    *
    * Computed via [[graft.operators.Percentiles]] — a distributed
    * histogram + prefix-sum + conditional-min lookup that reproduces
    * `percentile()` bit-for-bit WITHOUT its unbounded per-group
    * value-map buffer (the round-2 scale-killer flag on this query).
    */
  def q49(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
    val qty = graft.operators.Percentiles.exactInterpolated(
      li, "l_returnflag", col("l_quantity"),
      Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75))
    val price = graft.operators.Percentiles.exactInterpolated(
      li, "l_returnflag", col("l_extendedprice"), Seq("price_p90" -> 0.9))
      .select(col("l_returnflag"), col("price_p90"))
    qty.join(price, "l_returnflag")
      .select(col("l_returnflag"), col("p25"), col("p50"), col("p75"),
        col("price_p90"), col("n"))
      .orderBy(col("l_returnflag"))
  }

  val q49Sql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS p25,
      |  quantile_cont(l_quantity, 0.5) AS p50,
      |  quantile_cont(l_quantity, 0.75) AS p75,
      |  quantile_cont(l_extendedprice, 0.9) AS price_p90,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q50
  /** Pivot: order counts and exact sums per status, one column per
    * priority (explicit value list → stable schema).
    */
  def q50(spark: SparkSession, sfDir: String): DataFrame = {
    val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    t(spark, sfDir, "orders")
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", priorities)
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("o_orderstatus") +: priorities.zipWithIndex.map { case (p, i) =>
        col(s"`$p`").as(s"n_p${i + 1}") }: _*)
      .orderBy(col("o_orderstatus"))
  }

  val q50Sql: String =
    """SELECT o_orderstatus,
      |  COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS n_p1,
      |  COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS n_p2,
      |  COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS n_p3,
      |  COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS n_p4,
      |  COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS n_p5
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- q51
  /** Unpivot (wide → long): lineitem's four measure columns melted to
    * (measure, value) rows, then aggregated per measure — the inverse
    * of q50's pivot, via the typed unpivot API.
    */
  def q51(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .unpivot(
        Array(col("l_orderkey")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "measure", "value")
      .groupBy(col("measure"))
      .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("total"))
      .orderBy(col("measure"))

  val q51Sql: String =
    s"""WITH long AS (
       |  SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
       |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
       |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
       |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
       |SELECT measure, COUNT(*) AS n, ${Num.dsumSql("value")} AS total
       |FROM long GROUP BY measure ORDER BY measure""".stripMargin

  /** name → (query fn, oracle SQL). */
  // ---------------------------------------------------------------- q56
  /** Sketch aggregates — the 100 TB daily drivers for cardinality and
    * quantiles. `approx_count_distinct` is a HyperLogLog++ sketch
    * (fixed ~kB state per group, mergeable across partitions — vs the
    * exact distinct's shuffle of every value) and `approx_percentile`
    * is a KLL-style quantile sketch (bounded state vs q49's full
    * value histogram). Sketch VALUES are engine-specific, so the
    * query emits the exact answers plus boolean envelope checks
    * (sketch within 15% of the exact distinct count / 5% of the exact
    * quantile); the oracle produces the same exact values and `true`
    * literals — a sketch drifting out of its error envelope becomes a
    * driver-visible hash mismatch instead of a local-test-only fact.
    */
  def q56(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
    // each exact reference comes from its own efficient plan — a
    // single-distinct aggregate per key column (two-phase partial
    // distinct, no multi-distinct Expand tripling the scan) and the
    // q49 distributed-histogram percentile (bounded reducer state,
    // not percentile()'s per-group value map) — then tiny per-flag
    // frames join back to the sketch row
    val sketches = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey")).as("ad_ok"),
        approx_count_distinct(col("l_partkey")).as("ad_pk"),
        expr("approx_percentile(l_extendedprice, array(0.5, 0.9), 10000)")
          .as("qs"),
        count(lit(1)).as("n"))
    val ndOrder = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("nd_orderkey"))
    val ndPart = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("nd_partkey"))
    val exactPs = graft.operators.Percentiles.exactInterpolated(
        li.select(col("l_returnflag"), col("l_extendedprice")),
        "l_returnflag", col("l_extendedprice"),
        Seq("ep50" -> 0.5, "ep90" -> 0.9))
      .select(col("l_returnflag"), col("ep50"), col("ep90"))
    sketches
      .join(ndOrder, "l_returnflag").join(ndPart, "l_returnflag")
      .join(exactPs, "l_returnflag")
      .select(col("l_returnflag"), col("nd_orderkey"), col("nd_partkey"),
        col("n"),
        (abs(col("ad_ok") - col("nd_orderkey")) <=
          col("nd_orderkey") * 0.15).as("hll_orderkey_ok"),
        (abs(col("ad_pk") - col("nd_partkey")) <=
          col("nd_partkey") * 0.15).as("hll_partkey_ok"),
        (abs(element_at(col("qs"), 1) - col("ep50")) <=
          col("ep50") * 0.05).as("p50_ok"),
        (abs(element_at(col("qs"), 2) - col("ep90")) <=
          col("ep90") * 0.05).as("p90_ok"))
      .orderBy(col("l_returnflag"))
  }

  val q56Sql: String =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_orderkey) AS nd_orderkey,
      |  COUNT(DISTINCT l_partkey) AS nd_partkey,
      |  COUNT(*) AS n,
      |  true AS hll_orderkey_ok, true AS hll_partkey_ok,
      |  true AS p50_ok, true AS p90_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q62
  /** Bloom-prefiltered join ([[graft.operators.BloomJoin]] scaladoc
    * for the 100 TB rationale): orders are membership-filtered against
    * a bitset of BUILDING-segment customer keys before the exact
    * equi-join. The bloom is a lossless prefilter (no false
    * negatives), so the oracle is the plain join — any bloom bug that
    * drops a row is a driver-visible hash mismatch.
    */
  def q62(spark: SparkSession, sfDir: String): DataFrame = {
    val o = t(spark, sfDir, "orders")
    val c = t(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_nationkey"))
    graft.operators.BloomJoin.join(o, c, "o_custkey", "c_custkey")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        Num.dsum(col("o_totalprice")).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  val q62Sql: String =
    s"""SELECT o_orderpriority, COUNT(*) AS n_orders,
       |  ${Num.dsumSql("o_totalprice")} AS revenue
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q64
  /** MERGE-style upsert ([[graft.operators.Merge]]): the customer
    * snapshot is merged with derived updates (customers with orders
    * get a recomputed balance and an ACTIVE segment) plus one synthetic
    * insert row (key −1, exercising WHEN NOT MATCHED). Deterministic:
    * the balance is an exact decimal sum, divided and rounded in the
    * same written order in both engines.
    */
  def q64(spark: SparkSession, sfDir: String): DataFrame = {
    val c = t(spark, sfDir, "customer")
    val o = t(spark, sfDir, "orders")
    val updates = o.groupBy(col("o_custkey").as("c_custkey"))
      .agg(round(Num.dsum(col("o_totalprice")) / 1000, 2).as("new_bal"))
      .join(c, Seq("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("new_bal").as("c_acctbal"), lit("ACTIVE").as("c_mktsegment"))
    val insert = spark.range(1).select(
      lit(-1L).as("c_custkey"), lit("Customer#NEW").as("c_name"),
      lit(0).as("c_nationkey"), lit(0.0).as("c_acctbal"),
      lit("ACTIVE").as("c_mktsegment"))
    graft.operators.Merge.upsert(c, updates.unionByName(insert), "c_custkey")
      .orderBy(col("c_custkey"))
  }

  val q64Sql: String =
    s"""WITH upd AS (
       |  SELECT o_custkey AS c_custkey,
       |    ROUND(${Num.dsumSql("o_totalprice")} / 1000, 2) AS new_bal
       |  FROM orders GROUP BY o_custkey),
       |updates AS (
       |  SELECT c.c_custkey, c.c_name, c.c_nationkey,
       |    u.new_bal AS c_acctbal, 'ACTIVE' AS c_mktsegment
       |  FROM upd u JOIN customer c USING (c_custkey)
       |  UNION ALL
       |  SELECT CAST(-1 AS BIGINT), 'Customer#NEW', CAST(0 AS INT),
       |    CAST(0.0 AS DOUBLE), 'ACTIVE')
       |SELECT
       |  COALESCE(u.c_custkey, b.c_custkey) AS c_custkey,
       |  CASE WHEN u.c_custkey IS NULL THEN b.c_name ELSE u.c_name END AS c_name,
       |  CASE WHEN u.c_custkey IS NULL THEN b.c_nationkey ELSE u.c_nationkey END AS c_nationkey,
       |  CASE WHEN u.c_custkey IS NULL THEN b.c_acctbal ELSE u.c_acctbal END AS c_acctbal,
       |  CASE WHEN u.c_custkey IS NULL THEN b.c_mktsegment ELSE u.c_mktsegment END AS c_mktsegment
       |FROM customer b FULL OUTER JOIN updates u ON b.c_custkey = u.c_custkey
       |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q71
  /** Correlated aggregate subquery through the SQL entry path: orders
    * beating 1.5× their own customer's average order value. One SQL
    * text serves both engines — the average is the exact decimal form,
    * so the correlated threshold is bit-identical. Catalyst
    * decorrelates this into an aggregate + equi-join (no per-row
    * re-execution); the plan audit would flag any regression into a
    * nested-loop shape.
    */
  val q71Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_orders
      |FROM orders o
      |WHERE o_totalprice > (
      |  SELECT 1.5 * CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(27,4))) AS DOUBLE)
      |         / COUNT(*)
      |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  def q71(spark: SparkSession, sfDir: String): DataFrame = {
    graft.Tables.registerAll(spark, sfDir)
    spark.sql(q71Sql)
  }

  // ---------------------------------------------------------------- q72
  /** Statistical aggregates (corr / sample covariance) in exact-then-
    * double form: the five moment sums are exact decimals (order-
    * independent), cast to double once, and the corr/covar formulas
    * run in the identical written order in both engines — so the
    * results are bit-identical where the native `corr()` (double
    * accumulation, partition-order-dependent) would not be. The
    * per-row products are computed in double and rounded to 4
    * decimals by the decimal cast, identically in both engines.
    */
  def q72(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
    li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(COUNT(*) AS DOUBLE)").as("dn"),
        expr("CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE)").as("dsx"),
        expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)").as("dsy"),
        expr("CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,4))) AS DOUBLE)").as("dsxx"),
        expr("CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)").as("dsyy"),
        expr("CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)").as("dsxy"))
      .select(col("l_returnflag"), col("n"),
        expr("ROUND((dn * dsxy - dsx * dsy) / " +
          "(sqrt(dn * dsxx - dsx * dsx) * sqrt(dn * dsyy - dsy * dsy)), 6)")
          .as("corr_qty_price"),
        expr("ROUND((dsxy - dsx * dsy / dn) / (dn - 1.0), 4)")
          .as("covar_qty_price"))
      .orderBy(col("l_returnflag"))
  }

  // ---------------------------------------------------------------- q160
  /** Neyman-allocated stratified sampling: a fixed budget of 100 rows
    * is split across the `l_returnflag` strata proportionally to
    * N_h·σ_h (the variance-optimal allocation for estimating a mean —
    * high-variance strata earn more samples than proportional
    * allocation would give), integerized with the largest-remainder
    * (Hamilton) rule (q100/q146's exact-apportionment machinery) and
    * drawn deterministically as the lowest-hash rows per stratum.
    * Output per stratum: population, σ, allocation, and checksums of
    * the drawn sample — bit-reproducible end to end.
    *
    * Determinism discipline: σ via q72's decimal-exact moment sums →
    * identical doubles in both engines; Hamilton remainders compared
    * on round(·,6) values; the draw orders on a pure integer hash.
    * Scale: one moments pass, one 3-row allocation (unpartitioned
    * windows bounded by stratum cardinality, not data), one top-n_h
    * per-stratum window on the hash — all shuffles keyed by stratum.
    */
  def q160(spark: SparkSession, sfDir: String): DataFrame = {
    val budget = 100
    val li = t(spark, sfDir, "lineitem")
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("y"),
        col("l_orderkey"), col("l_linenumber"))
    val stats = li.groupBy(col("g")).agg(
        count(lit(1)).as("n_pop"),
        expr("CAST(COUNT(*) AS DOUBLE)").as("dn"),
        expr("CAST(SUM(CAST(y AS DECIMAL(38,4))) AS DOUBLE)").as("dsy"),
        expr("CAST(SUM(CAST(y * y AS DECIMAL(38,4))) AS DOUBLE)").as("dsyy"))
      .withColumn("sigma", expr("sqrt((dsyy - dsy * dsy / dn) / dn)"))
      .withColumn("w", expr("CAST(round(dn * sigma, 6) AS DOUBLE)"))
    val wtot = stats.agg(
      expr("CAST(SUM(CAST(round(w, 6) AS DECIMAL(38,6))) AS DOUBLE)").as("wtot"))
    val whole = Window.partitionBy(lit(1))
    val alloc = stats.crossJoin(broadcast(wtot))
      .withColumn("share", lit(budget) * col("w") / col("wtot"))
      .withColumn("base", floor(col("share")).cast("long"))
      .withColumn("rem", col("share") - col("base"))
      .withColumn("rk", row_number().over(Window.orderBy(col("rem").desc, col("g"))))
      .withColumn("tot_base", sum(col("base")).over(whole))
      .withColumn("alloc",
        col("base") + when(col("rk") <= lit(budget) - col("tot_base"), 1L).otherwise(0L))
      .select(col("g"), col("n_pop"), round(col("sigma"), 4).as("sigma_r"),
        col("alloc"))
    // two-phase draw: a stratum-keyed window alone would sort each
    // whole stratum in ONE task (|strata| = 3 ⇒ 3 tasks at any data
    // size — a guaranteed straggler at scale). Phase 1 takes the
    // per-(stratum, salt) top-budget rows — correct because any
    // stratum's final allocation ≤ budget, so every global winner
    // survives its salt bucket — leaving ≤ 32·budget rows per stratum
    // for the exact phase-2 window.
    // Tie-break note: (l_orderkey, l_linenumber) is NOT unique in the
    // synthetic lineitem (the sf0.1 parity sweep caught a duplicate
    // pair with differing prices straddling the draw boundary), so the
    // ordering includes the value column to stay total — remaining
    // ties are full-row duplicates, where either pick yields identical
    // output.
    val salts = 32
    val drawOrder = Seq(col("h"), col("l_orderkey"), col("l_linenumber"), col("y"))
    val prelim = li
      .withColumn("h", pmod(
        col("l_orderkey") * lit(2654435761L) + col("l_linenumber") * lit(97L),
        lit(2147483647L)))
      .withColumn("prn", row_number().over(
        Window.partitionBy(col("g"), pmod(col("h"), lit(salts)))
          .orderBy(drawOrder: _*)))
      .where(col("prn") <= budget)
    val drawn = prelim
      .withColumn("srn", row_number().over(Window.partitionBy(col("g"))
        .orderBy(drawOrder: _*)))
      .join(broadcast(alloc), "g")
      .where(col("srn") <= col("alloc"))
      .groupBy(col("g")).agg(
        count(lit(1)).as("n_sel"),
        sum(col("l_orderkey") * lit(100L) + col("l_linenumber"))
          .cast("long").as("sel_key_sum"),
        Num.dsum(col("y"), 4).as("sel_y_sum"))
    alloc.join(drawn, "g")
      .select(col("g"), col("n_pop"), col("sigma_r"), col("alloc"),
        col("n_sel"), col("sel_key_sum"), col("sel_y_sum"))
      .orderBy(col("g"))
  }

  val q160Sql: String =
    s"""WITH stats AS (
       |  SELECT l_returnflag AS g, CAST(COUNT(*) AS BIGINT) AS n_pop,
       |    CAST(COUNT(*) AS DOUBLE) AS dn,
       |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS dsy,
       |    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS dsyy
       |  FROM lineitem GROUP BY l_returnflag),
       |sig AS (
       |  SELECT g, n_pop, dn, sqrt((dsyy - dsy * dsy / dn) / dn) AS sigma,
       |    CAST(round(dn * sqrt((dsyy - dsy * dsy / dn) / dn), 6) AS DOUBLE) AS w
       |  FROM stats),
       |wt AS (SELECT CAST(SUM(CAST(round(w, 6) AS DECIMAL(38,6))) AS DOUBLE) AS wtot FROM sig),
       |al AS (
       |  SELECT g, n_pop, sigma, base, rem,
       |    ROW_NUMBER() OVER (ORDER BY rem DESC, g) AS rk,
       |    SUM(base) OVER () AS tot_base
       |  FROM (
       |    SELECT g, n_pop, sigma,
       |      CAST(floor(100 * w / wtot) AS BIGINT) AS base,
       |      100 * w / wtot - floor(100 * w / wtot) AS rem
       |    FROM sig CROSS JOIN wt)),
       |alloc AS (
       |  SELECT g, n_pop, ROUND(sigma, 4) AS sigma_r,
       |    base + CASE WHEN rk <= 100 - tot_base THEN 1 ELSE 0 END AS alloc
       |  FROM al),
       |drawn AS (
       |  SELECT l_returnflag AS g, l_orderkey, l_linenumber, l_extendedprice,
       |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY
       |      (l_orderkey * 2654435761 + l_linenumber * 97) % 2147483647,
       |      l_orderkey, l_linenumber, l_extendedprice) AS srn
       |  FROM lineitem),
       |sel AS (
       |  SELECT d.g, CAST(COUNT(*) AS BIGINT) AS n_sel,
       |    CAST(SUM(d.l_orderkey * 100 + d.l_linenumber) AS BIGINT) AS sel_key_sum,
       |    ${Num.dsumSql("d.l_extendedprice", 4)} AS sel_y_sum
       |  FROM drawn d JOIN alloc a USING (g) WHERE d.srn <= a.alloc
       |  GROUP BY d.g)
       |SELECT g, n_pop, sigma_r, alloc, n_sel, sel_key_sum, sel_y_sum
       |FROM alloc JOIN sel USING (g) ORDER BY g""".stripMargin

  val q72Sql: String =
    """WITH comp AS (
      |  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(COUNT(*) AS DOUBLE) AS dn,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS dsx,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS dsy,
      |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS dsxx,
      |    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS dsyy,
      |    CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS dsxy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  ROUND((dn * dsxy - dsx * dsy) /
      |        (sqrt(dn * dsxx - dsx * dsx) * sqrt(dn * dsyy - dsy * dsy)), 6)
      |    AS corr_qty_price,
      |  ROUND((dsxy - dsx * dsy / dn) / (dn - 1.0), 4) AS covar_qty_price
      |FROM comp ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q105
  /** Distribution window functions — percent_rank / cume_dist /
    * nth_value over suppliers per nation, completing the window-zoo
    * coverage (q10-q12 rank/analytic/frame families). The
    * (acctbal, suppkey) order is tie-free, so both distribution
    * functions are rank/n rationals of the same total order in both
    * engines; nth_value reads the full frame explicitly (its default
    * running frame would return a row-dependent value).
    */
  def q105(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("s_acctbal"), col("s_suppkey"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(spark, sfDir, "supplier")
      .select(col("s_nationkey"), col("s_suppkey"),
        round(col("s_acctbal"), 2).as("acctbal"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        nth_value(col("s_suppkey"), 2).over(full).as("second_poorest"))
      .orderBy(col("s_nationkey"), col("s_suppkey"))
  }

  val q105Sql: String =
    """SELECT s_nationkey, s_suppkey, ROUND(s_acctbal, 2) AS acctbal,
      |  ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
      |  ROUND(CUME_DIST() OVER w, 6) AS cume,
      |  NTH_VALUE(s_suppkey, 2) OVER (PARTITION BY s_nationkey
      |    ORDER BY s_acctbal, s_suppkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_poorest
      |FROM supplier
      |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
      |ORDER BY s_nationkey, s_suppkey""".stripMargin

  val registry: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q01_pricing_summary", q01 _, Some(q01Sql)),
    ("q02_top_orders", q02 _, Some(q02Sql)),
    ("q03_shipping_priority", q03 _, Some(q03Sql)),
    ("q04_order_priority_semijoin", q04 _, Some(q04Sql)),
    ("q05_star_join_revenue", q05 _, Some(q05Sql)),
    ("q06_filter_agg", q06 _, Some(q06Sql)),
    ("q07_broadcast_brand_volume", q07 _, Some(q07Sql)),
    ("q08_semi_join_customers", q08 _, Some(q08Sql)),
    ("q09_anti_join_customers", q09 _, Some(q09Sql)),
    ("q10_window_topk_per_group", q10 _, Some(q10Sql)),
    ("q11_window_running_total", q11 _, Some(q11Sql)),
    ("q12_window_ranking", q12 _, Some(q12Sql)),
    ("q13_rollup", q13 _, Some(q13Sql)),
    ("q14_cube", q14 _, Some(q14Sql)),
    ("q15_set_operations", q15 _, Some(q15Sql)),
    ("q16_distinct_counts", q16 _, Some(q16Sql)),
    ("q17_string_functions", q17 _, Some(q17Sql)),
    ("q18_date_functions", q18 _, Some(q18Sql)),
    ("q19_math_functions", q19 _, Some(q19Sql)),
    ("q20_case_buckets", q20 _, Some(q20Sql)),
    ("q21_scalar_subquery", q21 _, Some(q21Sql)),
    ("q22_theta_join_price_gaps", q22 _, Some(q22Sql)),
    ("q49_exact_percentiles", q49 _, Some(q49Sql)),
    ("q50_pivot_status_priority", q50 _, Some(q50Sql)),
    ("q51_unpivot_measures", q51 _, Some(q51Sql)),
    // sketch outputs are engine-specific → deliberate rows-only check
    ("q56_sketch_aggregates", q56 _, Some(q56Sql)),
    ("q62_bloom_prefilter_join", q62 _, Some(q62Sql)),
    ("q64_merge_upsert", q64 _, Some(q64Sql)),
    ("q71_correlated_subquery", q71 _, Some(q71Sql)),
    ("q72_corr_covar", q72 _, Some(q72Sql)),
    ("q160_neyman_sample", q160 _, Some(q160Sql)),
    ("q105_window_distribution", q105 _, Some(q105Sql))
  )
}
