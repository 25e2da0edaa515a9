package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Headline aggregation / join queries (extensions beyond the reference's
  * own surface — SURVEY §2.9 — used as bench workloads and as coverage of
  * Spark's agg/join operator families).
  *
  * Float determinism: money sums go through exact DECIMAL arithmetic and
  * only the final sum is cast to DOUBLE, so Spark and the DuckDB oracle
  * produce bit-identical doubles regardless of partial-aggregation order.
  */
object AggQueries {

  private def dec(p: Int, s: Int) = DecimalType(p, s)

  /** TPC-H Q1-style pricing summary over lineitem. One shuffle (groupBy
    * on two low-cardinality keys) with map-side partial aggregation; the
    * shipdate filter pushes down to the parquet scan.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val discFactor = lit(1).cast(dec(3, 2)) - col("l_discount").cast(dec(4, 2))
    val taxFactor = lit(1).cast(dec(3, 2)) + col("l_tax").cast(dec(4, 2))
    // Integer-exact finals: each money term is scaled to its smallest
    // unit (qty/price in cents, disc_price in 1e-4, charge in 1e-6)
    // while still an exact DECIMAL, then summed as DECIMAL(38,0) (no
    // long-overflow in partial sums at any SF) and only the FINAL total
    // is cast to BIGINT. r14 emitted DECIMAL(38,x) finals — values
    // matched but the driver's hasher coerces DuckDB decimals to
    // float64 while parquet keeps decimal128, a repr seam. BIGINT
    // finals kill both the sf1 one-ulp seam and the repr seam; the
    // other 226 graded queries already use this idiom.
    val qtyCents = (col("l_quantity").cast(dec(18, 2)) * lit(100)).cast(dec(38, 0))
    val priceCents = (col("l_extendedprice").cast(dec(18, 2)) * lit(100)).cast(dec(38, 0))
    val discE4 = (col("l_extendedprice").cast(dec(18, 2)) * discFactor * lit(10000)).cast(dec(38, 0))
    val chargeE6 = (col("l_extendedprice").cast(dec(18, 2)) * (discFactor * taxFactor) * lit(1000000)).cast(dec(38, 0))
    li.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(qtyCents).cast(LongType).as("sum_qty_cents"),
        sum(priceCents).cast(LongType).as("sum_base_price_cents"),
        sum(discE4).cast(LongType).as("sum_disc_price_e4"),
        sum(chargeE6).cast(LongType).as("sum_charge_e6"),
        count(lit(1)).cast(LongType).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  def pricingSummaryOracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0))) AS BIGINT) AS sum_qty_cents,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0))) AS BIGINT) AS sum_base_price_cents,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS DECIMAL(38,0))) AS BIGINT) AS sum_disc_price_e4,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * ((CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) * 1000000 AS DECIMAL(38,0))) AS BIGINT) AS sum_charge_e6,
      |  CAST(COUNT(*) AS BIGINT) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-style: top revenue orders for one market segment. Only the
    * true dimension (filtered customer) is broadcast; lineitem⨝orders is
    * left as a shuffle join on l_orderkey — at 100 TB orders is a fact
    * table and forcing it into a broadcast would blow the 8 GB cap / the
    * driver. AQE still picks a broadcast at small scale when the filtered
    * orders side fits, so local runs lose nothing.
    */
  def topRevenueOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val revenue = col("l_extendedprice").cast(dec(18, 2)) *
      (lit(1).cast(dec(3, 2)) - col("l_discount").cast(dec(4, 2)))
    li.join(orders.join(broadcast(cust), col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(sum(revenue).cast(DoubleType).as("revenue"))
      .select(col("l_orderkey").cast(LongType).as("l_orderkey"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  def topRevenueOrdersOracle: String =
    """SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY l_orderkey
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q5-style: revenue by nation — a star join where every true
    * dimension (region, nation, customer) is broadcast and the two fact
    * tables (lineitem, orders) meet in a shuffle join on l_orderkey. The
    * orders⨝customer edge broadcasts the customer side (dimension), never
    * orders; AQE upgrades the fact edge to broadcast at small scale.
    */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.load(spark, dir, "region")
    val nation = Tables.load(spark, dir, "nation")
    val cust = Tables.load(spark, dir, "customer")
    val orders = Tables.load(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val revenue = col("l_extendedprice").cast(dec(18, 2)) *
      (lit(1).cast(dec(3, 2)) - col("l_discount").cast(dec(4, 2)))
    val custNation = cust
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_name"), col("r_name"))
    li.join(orders.join(broadcast(custNation), col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), col("r_name"))
      .agg(sum(revenue).cast(DoubleType).as("revenue"),
        count(lit(1)).cast(LongType).as("n_items"))
      .orderBy(col("n_name"))
  }

  /** TPC-H Q6-style: pure filter + single aggregate — the predicate
    * pushdown / column pruning showcase (scan reads 4 columns, filters
    * reach the parquet reader).
    */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.filter(
        col("l_shipdate") >= to_timestamp(lit("1994-01-01 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit("1995-01-01 00:00:00")) &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(
        sum(col("l_extendedprice").cast(dec(18, 2)) * col("l_discount").cast(dec(4, 2)))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).cast(LongType).as("n_items"))
  }

  def forecastRevenueOracle: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin

  /** Extension — ROLLUP subtotals with grouping ids (hierarchical
    * aggregates in one pass; map-side partial aggregation applies to
    * every grouping set).
    */
  def rollupRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(dec(18, 2))).cast(DoubleType).as("sum_qty"),
        count(lit(1)).cast(LongType).as("n"),
        grouping_id().cast(LongType).as("gid"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  def rollupRevenueOracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** CUBE twin of [[rollupRevenue]]: all four grouping sets (exact
    * DECIMAL sums cast to DOUBLE at the end; grouping_id disambiguates
    * the NULL group keys).
    */
  def cubeRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(dec(18, 2))).cast(DoubleType).as("sum_qty"),
        count(lit(1)).cast(LongType).as("n"),
        grouping_id().cast(LongType).as("gid"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  def cubeRevenueOracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Extension — exact distinct aggregation per group (expands to a
    * two-phase aggregate in Spark; one extra shuffle on the distinct
    * key).
    */
  def distinctParts(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).cast(LongType).as("n_parts"),
        countDistinct(col("l_suppkey")).cast(LongType).as("n_supps"),
        count(lit(1)).cast(LongType).as("n_rows"))
      .orderBy("l_returnflag")
  }

  def distinctPartsOracle: String =
    """SELECT l_returnflag,
      |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
      |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Extension — approximate distinct counts, the 100 TB path where
    * exact distinct is too expensive. Uses the deterministic KMV
    * bottom-k sketch ([[graft.operators.Kmv]]) rather than HLL: same
    * mergeable O(k)-state scale story, but the portable hash makes the
    * estimate bit-identical cross-engine, so the DuckDB oracle grades
    * it HASH-EXACT instead of rows-only. k=1024 → ~3% rsd; groups with
    * fewer distincts than k report the exact count.
    */
  def approxDistinctParts(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    graft.operators.Kmv.distinctSketch(li, "l_returnflag", "l_partkey", k = 1024)
      .select(col("l_returnflag"), col("est_distinct").as("approx_parts"))
      .orderBy("l_returnflag")
  }

  val approxDistinctPartsOracle: String =
    s"""WITH src AS (SELECT l_returnflag, l_partkey FROM lineitem),
       |${graft.operators.Kmv.distinctSketchSql("src", "l_returnflag", "l_partkey", k = 1024)}
       |SELECT l_returnflag, est_distinct AS approx_parts
       |FROM kmv ORDER BY l_returnflag""".stripMargin

  /** Extension — anti/semi join: customers without orders, and the
    * distinct-count per segment of those with orders.
    */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    val orders = Tables.load(spark, dir, "orders").select(col("o_custkey"))
    cust.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey").cast(LongType).as("c_custkey"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  def customersWithoutOrdersOracle: String =
    """SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  def revenueByNationOracle: String =
    """SELECT n_name, r_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY n_name, r_name
      |ORDER BY n_name""".stripMargin

  /** TPC-H Q14-style: promotion revenue share per month — fact-to-dim
    * broadcast join (part is the dimension), conditional aggregation,
    * exact DECIMAL revenue. The share is the DOUBLE ratio of two exact
    * decimal sums, rounded to 6 dp (bit-identical cross-engine).
    */
  def promoShare(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"),
        col("l_shipdate"))
      .filter(col("l_shipdate") >= "1996-03-01" && col("l_shipdate") < "1996-04-01")
    val part = Tables.load(spark, dir, "part").select(col("p_partkey"), col("p_type"))
    val revenue = col("l_extendedprice").cast(dec(18, 2)) *
      (lit(1).cast(dec(3, 2)) - col("l_discount").cast(dec(4, 2)))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", revenue).otherwise(lit(0).cast(dec(18, 2))))
          .as("pr"),
        sum(revenue).as("tr"),
        count(lit(1)).cast(LongType).as("n_items"))
      .select(
        round(col("pr").cast(DoubleType) / col("tr").cast(DoubleType), 6)
          .as("promo_share"),
        col("pr").cast(DoubleType).as("promo_revenue"),
        col("tr").cast(DoubleType).as("total_revenue"),
        col("n_items"))
  }

  val promoShareOracle: String =
    """WITH f AS (
      |  SELECT p_type,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) AS rev
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= '1996-03-01' AND l_shipdate < '1996-04-01'),
      |s AS (SELECT
      |    SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE CAST(0 AS DECIMAL(18,2)) END) AS pr,
      |    SUM(rev) AS tr, CAST(COUNT(*) AS BIGINT) AS n_items FROM f)
      |SELECT round(CAST(pr AS DOUBLE) / CAST(tr AS DOUBLE), 6) AS promo_share,
      |  CAST(pr AS DOUBLE) AS promo_revenue, CAST(tr AS DOUBLE) AS total_revenue,
      |  n_items
      |FROM s""".stripMargin
}
