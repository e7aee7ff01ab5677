package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
import graft.Tables

/** Relational core (SURVEY §2.A): TPC-H-flavoured queries over the driver
  * tables, written DataFrame-first so Catalyst owns pushdown, pruning, join
  * selection and AQE re-planning.
  *
  * Determinism conventions (SURVEY §5): money/quantity aggregates go through
  * DECIMAL(18,2) (exact for this data, order-independent) and are cast to
  * DOUBLE only at the end; timestamps leave as epoch-second BIGINTs; every
  * query ends in a total ORDER BY. Each query has a DuckDB twin in
  * [[Relational.oracles]].
  */
object Relational {

  private val D = DecimalType(18, 2)
  private def dec(c: Column): Column = c.cast(D)
  /** Exact decimal sum exported as double. */
  private def moneySum(c: Column): Column = sum(dec(c)).cast(DoubleType)
  /** l_extendedprice * (1 - l_discount), exact in decimal. */
  private def revenue(price: Column, disc: Column): Column =
    sum(dec(price) * (lit(BigDecimal(1)).cast(D) - dec(disc))).cast(DoubleType)
  /** Epoch seconds from a (possibly NTZ) timestamp. The driver's parquet is
    * written without a UTC flag so Spark 4 reads TIMESTAMP_NTZ, which has no
    * direct BIGINT cast — route through TIMESTAMP (session TZ is UTC, so the
    * instant matches DuckDB's naive epoch_ms//1000).
    */
  private def epochS(c: Column): Column =
    c.cast(org.apache.spark.sql.types.TimestampType).cast(LongType)
  /** Floor epoch-seconds from events.ts, which Spark 4 reads as a
    * nanos-epoch LongType — the SHARED exact-integer conversion (see
    * JsonEtl.tsSec's precision note; a second copy of the expression here
    * would be the drift the round-4 verdict warned about).
    */
  private def evSec(c: Column): Column = graft.etl.JsonEtl.tsSec(c)

  // ---------------------------------------------------------------- q1
  /** Pricing summary: the canonical map-side-combinable aggregation. At
    * 100 TB this is one scan + partial agg + tiny shuffle (few groups).
    */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir).lineitem
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        revenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
        (sum(dec(col("l_quantity"))).cast(DoubleType) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  // ---------------------------------------------------------------- q3
  /** Shipping priority: selective dim filter → two joins → agg → top-k.
    * customer is broadcast (small side); lineitem⋈orders shuffles on the
    * order key once.
    */
  def q3ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val cust = t.customer.filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = t.orders.filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = t.lineitem.filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        epochS(col("o_orderdate")).as("o_epoch"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  // ---------------------------------------------------------------- q5
  /** Local-supplier volume: five joins; all dims broadcast, the single big
    * shuffle is lineitem⋈orders.
    */
  def q5LocalSupplier(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val dims = broadcast(
      t.supplier.join(t.nation, col("s_nationkey") === col("n_nationkey"))
        .join(t.region.filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey", "s_nationkey", "n_name"))
    val cust = broadcast(t.customer.select("c_custkey", "c_nationkey"))
    val ord = t.orders.filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    t.lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(dims, col("l_suppkey") === col("s_suppkey"))
      .join(cust, col("o_custkey") === col("c_custkey")
        && col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  // ---------------------------------------------------------------- topk
  /** Global top-k: TakeOrderedAndProject, no full sort at scale. */
  def topkOrders(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).orders
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)

  // ---------------------------------------------------------------- window
  /** Per-customer running total — ROWS frame with a total order so the
    * running decimal sum is reproducible.
    */
  def windowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir).orders
      .select(col("o_custkey"), col("o_orderkey"),
        sum(dec(col("o_totalprice"))).over(w).cast(DoubleType).as("running_spend"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Per-customer order cadence: seconds since the previous order and
    * until the next (lag/lead over the per-key sequence; kept in BIGINT
    * seconds — a day division would hit engine-specific double rounding).
    */
  def lagLead(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val sec = epochS(col("o_orderdate"))
    Tables(s, dir).orders
      .select(col("o_custkey"), col("o_orderkey"),
        (sec - lag(sec, 1).over(w)).as("sec_since_prev"),
        (lead(sec, 1).over(w) - sec).as("sec_until_next"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Top-3 parts by retail price per brand (dense per-group top-k). */
  def rankInGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables(s, dir).part
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        row_number().over(w).cast(LongType).as("rk"))
      .filter(col("rk") <= 3)
      .orderBy(col("p_brand"), col("rk"))
  }

  // ---------------------------------------------------------------- distinct
  def distinctCount(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).lineitem
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"))
      .orderBy(col("l_returnflag"))

  /** HLL sketch distinct — rows-only for the driver (sketch ≠ DuckDB's);
    * error bound vs exact asserted in RelationalSpec.
    */
  def approxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).lineitem
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_part"))
      .orderBy(col("l_returnflag"))

  // ---------------------------------------------------------------- semi/anti
  def semiJoin(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.customer.join(t.orders.filter(col("o_orderstatus") === "O"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Customers with no open ('O') order — anti-join with a pushed filter on
    * the build side (every customer has *some* order at all SFs, so the
    * unfiltered variant would be a degenerate 0-row check).
    */
  def antiJoin(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.customer.join(t.orders.filter(col("o_orderstatus") === "O"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  // ---------------------------------------------------------------- rollup
  def rollupAgg(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).orders
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("sum_price"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("sum_price"))
      .orderBy(col("status"), col("priority"))

  // ---------------------------------------------------------------- percentiles
  /** Exact continuous quantiles (R-7 interpolation, same as DuckDB's
    * quantile_cont). l_quantity has ≤1 decimal and heavy duplication, so the
    * interpolated values are reproducible across engines.
    */
  def percentiles(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.75)").as("p75"))
      .orderBy(col("l_returnflag"))

  /** Sketch-based quantiles (rows-only: the sketch is engine-specific;
    * RelationalSpec bounds it against [[percentiles]]). At 100 TB this is
    * the quantile you actually run: mergeable partial sketches, no sort.
    * One sketch serves all three quantiles (array form), then the array is
    * unpacked to scalar columns — the driver's gate can't hash array cells.
    */
  def approxPercentiles(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).lineitem
      .groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_quantity"),
        array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("pcts"))
      .select(col("l_returnflag"),
        element_at(col("pcts"), 1).cast(DoubleType).as("p25"),
        element_at(col("pcts"), 2).cast(DoubleType).as("p50"),
        element_at(col("pcts"), 3).cast(DoubleType).as("p75"))
      .orderBy(col("l_returnflag"))

  // ---------------------------------------------------------------- conditional
  /** Pivot-style conditional aggregation over events per user bucket. */
  def conditionalAgg(s: SparkSession, dir: String): DataFrame = {
    def cnt(tp: String) = count(when(col("event_type") === tp, 1)).as(s"n_$tp")
    Tables(s, dir).events
      .groupBy((col("user_id") % 10).as("bucket"))
      .agg(cnt("click"), cnt("view"), cnt("purchase"),
        moneySum(when(col("event_type") === "purchase", col("value"))).as("purchase_value"))
      .orderBy(col("bucket"))
  }

  /** Orders above their customer's average order value — a correlated
    * scalar subquery. Catalyst decorrelates it into an aggregate + join, so
    * at scale it costs one groupBy + one equi-join, not a per-row subquery.
    */
  def aboveCustomerAvg(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    // price > 2·avg expressed as price·n > 2·sum — pure decimal/bigint
    // arithmetic, so the threshold compare is exact in both engines (a
    // double avg could flip boundary rows between Spark and DuckDB)
    val byCust = t.orders.groupBy(col("o_custkey").as("ac_custkey"))
      .agg(sum(dec(col("o_totalprice"))).as("sum_price"),
        count(lit(1)).as("n_orders"))
    t.orders.join(byCust, col("o_custkey") === col("ac_custkey"))
      .filter(dec(col("o_totalprice")) * col("n_orders") > col("sum_price") * lit(2))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** Full cube over status × priority (all 4 grouping sets). */
  def cubeAgg(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).orders
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("sum_price"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("sum_price"))
      .orderBy(col("status"), col("priority"))

  /** Event counts per user bucket pivoted by event type — the dynamic-
    * column cousin of [[conditionalAgg]] using the .pivot API (values
    * enumerated, so the plan is a single two-phase aggregate, no extra
    * pass to discover columns).
    */
  def pivotAgg(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).events
      .groupBy((col("user_id") % 10).as("bucket"))
      .pivot("event_type", Seq("click", "view", "purchase", "error", "signup"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("bucket"))

  /** Pearson correlation of (value, props.k) per event type, computed from
    * exact decimal sums so it reproduces bit-for-bit cross-engine: the five
    * Σ's are order-independent decimals; the closed form then runs in
    * fixed-order double arithmetic (sqrt is IEEE-correctly-rounded, unlike
    * log). Built-in `corr` streams doubles in partition order — fine
    * numerically, useless for a hash-compare oracle.
    */
  def corrExact(s: SparkSession, dir: String): DataFrame = {
    // tight scales keep every product exactly representable: (18,2)×(18,0)
    // → (37,2) fits in 38 digits; DECIMAL(38,8) operands would overflow
    // precision on multiply and the engines' rounding rules differ (caught
    // at sf0.1: 4e-16 drift)
    val x = col("value").cast(DecimalType(18, 2))
    val y = get_json_object(col("props"), "$.k").cast(LongType).cast(DecimalType(18, 0))
    val agg = Tables(s, dir).events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast(DoubleType).as("n"),
        sum(x).cast(DoubleType).as("sx"), sum(y).cast(DoubleType).as("sy"),
        sum(x * y).cast(DoubleType).as("sxy"),
        sum(x * x).cast(DoubleType).as("sxx"),
        sum(y * y).cast(DoubleType).as("syy"))
    agg.select(col("event_type"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
            sqrt(col("n") * col("syy") - col("sy") * col("sy")))).as("corr"))
      .orderBy(col("event_type"))
  }

  /** Quantity-weighted average price per return flag: both sums exact
    * decimals, one double division at the end — reproducible, unlike a
    * streaming weighted mean.
    */
  def weightedAvg(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        sum(dec(col("l_extendedprice")) * dec(col("l_quantity"))).as("wsum"),
        sum(dec(col("l_quantity"))).as("qsum"))
      .select(col("l_returnflag"),
        (col("wsum").cast(DoubleType) / col("qsum").cast(DoubleType))
          .as("weighted_avg_price"))
      .orderBy(col("l_returnflag"))

  /** Quartile assignment of orders by price within each status (NTILE —
    * deterministic given the total order below it).
    */
  def ntileQuartiles(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(s, dir).orders
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
        ntile(4).over(w).cast(LongType).as("quartile"))
      .orderBy(col("o_orderstatus"), col("o_orderkey"))
  }

  /** Fixed-bin value histogram over events (bin width 10). */
  def valueHistogram(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).events
      .groupBy(floor(col("value") / 10).cast(LongType).as("bin"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bin"))

  /** Orders per day-of-week, via engine-neutral epoch arithmetic
    * ((days+4) % 7: 1970-01-01 was a Thursday=4; 0=Sunday).
    */
  def dayOfWeek(s: SparkSession, dir: String): DataFrame = {
    // floor(sec/86400) via double is exact at epoch-day magnitudes (<2^53)
    val dow = (floor(epochS(col("o_orderdate")) / lit(86400L)).cast(LongType)
      + lit(4L)) % lit(7L)
    Tables(s, dir).orders
      .groupBy(dow.cast(LongType).as("dow"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("dow"))
  }

  /** Aggregate-filtered groups (HAVING): nations with an above-average
    * customer base.
    */
  def havingAgg(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).customer
      .groupBy(col("c_nationkey").cast(LongType).as("nationkey"))
      .agg(count(lit(1)).as("n_cust"), moneySum(col("c_acctbal")).as("sum_bal"))
      .filter(col("n_cust") >= 60)
      .orderBy(col("nationkey"))

  /** Per-nation customer/supplier presence via FULL OUTER join of two
    * aggregates (regions where only one side exists survive with zeros).
    */
  def outerJoin(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val c = t.customer.groupBy(col("c_nationkey").cast(LongType).as("nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    val sup = t.supplier.groupBy(col("s_nationkey").cast(LongType).as("s_nationkey"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(sup, col("nationkey") === col("s_nationkey"), "full_outer")
      .select(coalesce(col("nationkey"), col("s_nationkey")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  // ---------------------------------------------------------------- union
  def unionDedup(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.customer.select(col("c_nationkey").cast(LongType).as("nationkey"))
      .union(t.supplier.select(col("s_nationkey").cast(LongType).as("nationkey")))
      .distinct()
      .orderBy(col("nationkey"))
  }

  // ---------------------------------------------------------------- range join
  /** Equi key + range predicate: lineitems shipped within 30 days of their
    * order. The range filter rides on the equi shuffle — no cross product.
    */
  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.lineitem.select(col("l_orderkey"), col("l_shipdate"))
      .join(t.orders.select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey")
          && epochS(col("l_shipdate")) >= epochS(col("o_orderdate"))
          && epochS(col("l_shipdate")) < epochS(col("o_orderdate")) + lit(30L * 86400))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_fast_ship"))
      .orderBy(col("o_orderpriority"))
  }

  // ---------------------------------------------------------------- grouping sets
  /** Arbitrary grouping sets — the report shape rollup/cube can't express
    * (two independent one-dimension breakdowns + a grand total in one scan;
    * a UNION of groupBys would scan the table three times). Same physical
    * plan as rollup: one Expand + one partial-combined aggregation.
    */
  def groupingSetsAgg(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir).orders
    o.groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().cast(LongType).as("grp"),
        count(lit(1)).as("n_orders"),
        moneySum(col("o_totalprice")).as("total_price"))
      .orderBy(col("grp"),
        col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
  }

  // ---------------------------------------------------------------- retention
  /** Cohort retention matrix over events: cohort = a user's first active
    * day, cell = distinct users from that cohort active `day_offset` days
    * later. Two aggregations, both keyed by user_id, so the events shuffle
    * is paid once and reused for the self-join; at 100 TB the cohort map is
    * tiny (one row per user, partial-aggregated map-side) and the final
    * matrix is days², independent of event volume.
    */
  def retentionCohorts(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir).events
      .select(col("user_id"),
        floor(evSec(col("ts")) / lit(86400L)).cast(LongType).as("day"))
    val first = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    ev.join(first, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  // ---------------------------------------------------------------- funnel
  /** Ordered funnel conversion (view → click → purchase): a user advances a
    * stage only with an event at-or-after their previous stage's first
    * event. Each stage is a per-user min over a filtered slice joined to
    * the previous stage — every shuffle is on user_id, so the three stage
    * aggregations and the final assembly co-partition; stage frames shrink
    * monotonically (funnels only lose users), so AQE broadcasts the later
    * joins at scale.
    */
  def funnelConversion(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir).events
      .select(col("user_id"), col("event_type"), evSec(col("ts")).as("sec"))
    val view = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("sec")).as("t_view"))
    val click = ev.filter(col("event_type") === "click")
      .join(view, "user_id").filter(col("sec") >= col("t_view"))
      .groupBy(col("user_id")).agg(min(col("sec")).as("t_click"))
    val purchase = ev.filter(col("event_type") === "purchase")
      .join(click, "user_id").filter(col("sec") >= col("t_click"))
      .groupBy(col("user_id")).agg(min(col("sec")).as("t_purchase"))
    ev.select(col("user_id")).distinct()
      .join(view, Seq("user_id"), "left")
      .join(click, Seq("user_id"), "left")
      .join(purchase, Seq("user_id"), "left")
      .groupBy((col("user_id") % 10).as("bucket"))
      .agg(count(lit(1)).as("n_users"),
        count(col("t_view")).as("n_view"),
        count(col("t_click")).as("n_view_click"),
        count(col("t_purchase")).as("n_funnel"))
      // asc_nulls_last: a NULL user_id yields a NULL bucket, which Spark
      // sorts NULLS FIRST by default while DuckDB's ORDER BY defaults to
      // NULLS LAST — pin the DuckDB convention so the engines agree if
      // null user_ids ever appear in the data.
      .orderBy(col("bucket").asc_nulls_last)
  }

  // ---------------------------------------------------------------- attribution
  /** Last-touch revenue attribution: each purchase's value credits the
    * user's most recent click/view within a 1-day lookback (else 'none').
    * The touch resolves with ONE ignore-nulls `last` over the per-user
    * event order — no purchases×touches self-join, so the only shuffle is
    * the user_id window sort, the sessionize shape that survives 100 TB.
    * Value sums in exact decimal ([[moneySum]]); tie-break is
    * (sec, event_id), engine-neutral integer order.
    */
  def attribution(s: SparkSession, dir: String): DataFrame = {
    val lookback = 86400L
    val ev = Tables(s, dir).events
      .select(col("user_id"), col("event_id"), evSec(col("ts")).as("sec"),
        col("event_type"), col("value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type").isin("click", "view"),
      struct(col("sec"), col("event_type")))
    ev.withColumn("lt", last(touch, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        when(col("lt").isNull || col("sec") - col("lt.sec") > lookback,
          lit("none")).otherwise(col("lt.event_type")).as("touch_type"),
        col("value"))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_purchases"),
        moneySum(col("value")).as("attributed_value"))
      .orderBy(col("touch_type"))
  }

  // ---------------------------------------------------------------- range frame
  /** Value-based (RANGE) window frame: per customer, total spend within
    * the trailing 30 DAYS of each order — rows land in the frame by
    * order-date distance, not row count (the ROWS-frame cousins are
    * [[windowRunning]] and [[movingAvg]]). Epoch-second longs order the
    * frame, so the range arithmetic is engine-neutral integer math.
    */
  def rangeFrame(s: SparkSession, dir: String): DataFrame = {
    val sec = epochS(col("o_orderdate"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("sec"))
      .rangeBetween(-30L * 86400, Window.currentRow)
    Tables(s, dir).orders
      .select(col("o_custkey"), col("o_orderkey"), sec.as("sec"),
        dec(col("o_totalprice")).as("price"))
      .select(col("o_custkey"), col("o_orderkey"),
        sum(col("price")).over(w).cast(DoubleType).as("spend_30d"),
        count(lit(1)).over(w).as("n_orders_30d"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  // ---------------------------------------------------------------- set ops
  /** INTERSECT / EXCEPT audience arithmetic: customers with an open order
    * vs customers with a high balance, partitioned into both / only-open /
    * only-rich. Catalyst plans the set ops as left-semi/left-anti hash
    * joins over the distinct key sets — id-only exchanges, aggregate-sized
    * output.
    */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val open = t.orders.filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("k")).distinct()
    val rich = t.customer.filter(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("k")).distinct()
    def tagged(df: DataFrame, tag: String): DataFrame =
      df.agg(count(lit(1)).as("n")).select(lit(tag).as("side"), col("n"))
    tagged(open.intersect(rich), "both")
      .union(tagged(open.except(rich), "only_open"))
      .union(tagged(rich.except(open), "only_rich"))
      .orderBy(col("side"))
  }

  // ---------------------------------------------------------------- moving avg
  /** 7-order trailing moving average of order value per customer — the
    * bounded-ROWS-frame window (running/lag frames are covered elsewhere;
    * this is the sliding one). The frame sum stays decimal until the single
    * division, so the average is exact cross-engine.
    */
  def movingAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-6, Window.currentRow)
    Tables(s, dir).orders
      .select(col("o_custkey"), col("o_orderkey"),
        (sum(dec(col("o_totalprice"))).over(w).cast(DoubleType)
          / count(lit(1)).over(w).cast(DoubleType)).as("avg_price_7"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  // ---------------------------------------------------------------- islands
  /** Gaps-and-islands: maximal runs of consecutive active months per
    * customer (the classic m - row_number() grouping trick — one window
    * over the distinct (customer, month) frame, which is orders-of-
    * magnitude smaller than the orders table it summarizes, then one
    * aggregation on the same partitioning key).
    */
  def orderIslands(s: SparkSession, dir: String): DataFrame = {
    val m = (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).cast(LongType)
    val months = Tables(s, dir).orders
      .select(col("o_custkey"), m.as("m")).distinct()
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("m"))
    months
      .select(col("o_custkey"), col("m"),
        (col("m") - row_number().over(w)).as("grp"))
      .groupBy(col("o_custkey"), col("grp"))
      .agg(min(col("m")).as("start_month"), max(col("m")).as("end_month"),
        count(lit(1)).as("n_months"))
      .select(col("o_custkey"), col("start_month"), col("end_month"), col("n_months"))
      .orderBy(col("o_custkey"), col("start_month"))
  }

  // ---------------------------------------------------------------- string agg
  /** Deterministic LISTAGG: per-nation roster as a sorted comma-joined
    * string. sort_array(collect_list(...)) gives an order-independent
    * result no matter how partitions interleave — the only way a
    * string-valued aggregate can be exact cross-engine. Group sizes here
    * are dimension-bounded (suppliers per nation), which is what makes a
    * collect_list aggregate legitimate at 100 TB; an unbounded-group
    * listagg is the anti-pattern this query's doc warns against.
    */
  def stringAgg(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.supplier
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        concat_ws(",", sort_array(collect_list(col("s_name")))).as("roster"))
      .orderBy(col("n_name"))
  }

  /** Per-user exponential moving average over the event stream — the
    * order-SENSITIVE smoothing a recursive window (s_t = α·x_t +
    * (1−α)·s_{t−1}) needs, which no plain window frame can express
    * (weights depend on distance from t). The in-order-fold discipline
    * makes it ORACLE-EXACT: one compiled [[graft.functions.EwmaFold]]
    * pass per user over the event_id-sorted value list emits ALL prefix
    * EWMAs in O(n) — the interpreted `aggregate(concat(acc, ...))` form
    * this replaces copied O(n²) accumulator cells per group (parity
    * spec-pinned bit-for-bit in FunctionsSpec; the oracle recomputes each
    * prefix independently — O(n²) arithmetic but the same FP op
    * sequence). α = 0.5, an exact binary fraction. Bounded-group caveat
    * as q_string_agg: the per-user list materializes, so this is for
    * keys with bounded history — the unbounded-stream shape is the
    * streaming state-store sessionize family, not a batch fold.
    */
  def ewma(s: SparkSession, dir: String): DataFrame = {
    val packed = Tables(s, dir).events
      .groupBy(col("user_id"))
      .agg(array_sort(collect_list(struct(col("event_id"), col("value"))))
        .as("xs"))
      .withColumn("es", graft.functions.ewma_fold(col("xs.value"), 0.5))
    packed.select(col("user_id"), posexplode(col("xs")).as(Seq("i", "x")),
        col("es"))
      .select(col("user_id"), col("x.event_id").as("event_id"),
        col("x.value").as("value"),
        element_at(col("es"), col("i") + 1).as("ewma"))
      .orderBy(col("user_id"), col("event_id"))
  }

  // =================================================================
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ewma"              -> (ewma _),
    "q1_pricing_summary"  -> (q1PricingSummary _),
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "q5_local_supplier"   -> (q5LocalSupplier _),
    "q_topk_orders"       -> (topkOrders _),
    "q_window_running"    -> (windowRunning _),
    "q_rank_in_group"     -> (rankInGroup _),
    "q_distinct_count"    -> (distinctCount _),
    "q_approx_distinct"   -> (approxDistinct _),
    "q_semi_join"         -> (semiJoin _),
    "q_anti_join"         -> (antiJoin _),
    "q_rollup"            -> (rollupAgg _),
    "q_percentiles"       -> (percentiles _),
    "q_approx_percentiles" -> (approxPercentiles _),
    "q_above_cust_avg"    -> (aboveCustomerAvg _),
    "q_cube"              -> (cubeAgg _),
    "q_pivot"             -> (pivotAgg _),
    "q_lag_lead"          -> (lagLead _),
    "q_having"            -> (havingAgg _),
    "q_value_histogram"   -> (valueHistogram _),
    "q_corr_exact"        -> (corrExact _),
    "q_ntile"             -> (ntileQuartiles _),
    "q_weighted_avg"      -> (weightedAvg _),
    "q_day_of_week"       -> (dayOfWeek _),
    "q_outer_join"        -> (outerJoin _),
    "q_conditional_agg"   -> (conditionalAgg _),
    "q_union_dedup"       -> (unionDedup _),
    "q_range_join"        -> (rangeJoin _),
    "q_grouping_sets"     -> (groupingSetsAgg _),
    "q_string_agg"        -> (stringAgg _),
    "q_retention"         -> (retentionCohorts _),
    "q_funnel"            -> (funnelConversion _),
    "q_order_islands"     -> (orderIslands _),
    "q_moving_avg"        -> (movingAvg _),
    "q_set_ops"           -> (setOps _),
    "q_range_frame"       -> (rangeFrame _),
    "q_attribution"       -> (attribution _))

  val oracles: Map[String, String] = Map(
    "q_attribution" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_ms(ts)//1000 AS sec,
        |    event_type, value FROM events),
        |t AS (SELECT user_id, sec, event_type, value,
        |  last_value(CASE WHEN event_type IN ('click','view') THEN sec END IGNORE NULLS)
        |    OVER w AS lt_sec,
        |  last_value(CASE WHEN event_type IN ('click','view') THEN event_type END IGNORE NULLS)
        |    OVER w AS lt_type
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT CASE WHEN lt_sec IS NULL OR sec - lt_sec > 86400
        |    THEN 'none' ELSE lt_type END AS touch_type,
        |  COUNT(*) AS n_purchases,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS attributed_value
        |FROM t WHERE event_type = 'purchase'
        |GROUP BY touch_type ORDER BY touch_type""".stripMargin,
    "q_range_frame" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS spend_30d,
        |  COUNT(*) OVER w AS n_orders_30d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_ms(o_orderdate)//1000
        |  RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_set_ops" ->
      """WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'),
        |b AS (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
        |SELECT 'both' AS side, COUNT(*) AS n
        |  FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
        |UNION ALL SELECT 'only_open', COUNT(*)
        |  FROM (SELECT k FROM a EXCEPT SELECT k FROM b)
        |UNION ALL SELECT 'only_rich', COUNT(*)
        |  FROM (SELECT k FROM b EXCEPT SELECT k FROM a)
        |ORDER BY side""".stripMargin,
    "q_moving_avg" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    / CAST(COUNT(*) OVER w AS DOUBLE) AS avg_price_7
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_retention" ->
      """WITH ev AS (SELECT user_id, epoch_ms(ts)//1000//86400 AS day FROM events),
        |f AS (SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id)
        |SELECT f.cohort_day, ev.day - f.cohort_day AS day_offset,
        |  COUNT(DISTINCT ev.user_id) AS n_active
        |FROM ev JOIN f ON ev.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_ms(ts)//1000 AS sec FROM events),
        |u AS (SELECT DISTINCT user_id FROM ev),
        |v AS (SELECT user_id, MIN(sec) AS t_view FROM ev
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.sec) AS t_click FROM ev e
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.sec >= v.t_view GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.sec) AS t_purchase FROM ev e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.sec >= c.t_click GROUP BY e.user_id)
        |SELECT u.user_id % 10 AS bucket, COUNT(*) AS n_users,
        |  COUNT(v.t_view) AS n_view, COUNT(c.t_click) AS n_view_click,
        |  COUNT(p.t_purchase) AS n_funnel
        |FROM u LEFT JOIN v ON u.user_id = v.user_id
        |LEFT JOIN c ON u.user_id = c.user_id
        |LEFT JOIN p ON u.user_id = p.user_id
        |GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_order_islands" ->
      """WITH months AS (SELECT DISTINCT o_custkey,
        |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m
        |  FROM orders),
        |g AS (SELECT o_custkey, m,
        |    m - ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY m) AS grp
        |  FROM months)
        |SELECT o_custkey, MIN(m) AS start_month, MAX(m) AS end_month,
        |  COUNT(*) AS n_months
        |FROM g GROUP BY o_custkey, grp
        |ORDER BY o_custkey, start_month""".stripMargin,
    "q_string_agg" ->
      """SELECT n_name, COUNT(*) AS n_suppliers,
        |  string_agg(s_name, ',' ORDER BY s_name) AS roster
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    // each row's EWMA recomputed as an independent prefix fold — O(n²)
    // per user but the SAME 0.5*x + 0.5*a FP op sequence as the Spark
    // fold, hence bit-identical
    "q_ewma" ->
      """WITH w AS (SELECT user_id, event_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        |  FROM events),
        |seq AS (SELECT user_id, list(value ORDER BY event_id) AS xs
        |  FROM events GROUP BY user_id)
        |SELECT w.user_id, w.event_id, w.value,
        |  list_reduce(xs[1:rn], (a, x) -> 0.5 * x + 0.5 * a) AS ewma
        |FROM w JOIN seq USING (user_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS grp,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY grp, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  epoch_ms(o_orderdate)//1000 AS o_epoch, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_rank_in_group" ->
      """SELECT p_brand, p_partkey, p_retailprice, rk FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rk
        |  FROM part) WHERE rk <= 3 ORDER BY p_brand, rk""".stripMargin,
    "q_distinct_count" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp,
        |  COUNT(DISTINCT l_partkey) AS n_part
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,
    "q_rollup" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.75) AS p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_above_cust_avg" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o JOIN (
        |  SELECT o_custkey AS ac_custkey,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sum_price,
        |    COUNT(*) AS n_orders
        |  FROM orders GROUP BY o_custkey) a ON o.o_custkey = a.ac_custkey
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) * n_orders > sum_price * 2
        |ORDER BY o_orderkey""".stripMargin,
    "q_cube" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q_weighted_avg" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS weighted_avg_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_ntile" ->
      """SELECT o_orderstatus, o_orderkey, o_totalprice,
        |  CAST(NTILE(4) OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS quartile
        |FROM orders ORDER BY o_orderstatus, o_orderkey""".stripMargin,
    "q_corr_exact" ->
      """WITH a AS (SELECT event_type,
        |  CAST(COUNT(*) AS DOUBLE) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |  CAST(SUM(CAST(CAST(json_extract(props, '$.k') AS BIGINT) AS DECIMAL(18,0))) AS DOUBLE) AS sy,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(CAST(json_extract(props, '$.k') AS BIGINT) AS DECIMAL(18,0))) AS DOUBLE) AS sxy,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |  CAST(SUM(CAST(CAST(json_extract(props, '$.k') AS BIGINT) AS DECIMAL(18,0)) * CAST(CAST(json_extract(props, '$.k') AS BIGINT) AS DECIMAL(18,0))) AS DOUBLE) AS syy
        |  FROM events GROUP BY event_type)
        |SELECT event_type,
        |  (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr
        |FROM a ORDER BY event_type""".stripMargin,
    "q_value_histogram" ->
      """SELECT CAST(FLOOR(value / 10) AS BIGINT) AS bin, COUNT(*) AS n
        |FROM events GROUP BY bin ORDER BY bin""".stripMargin,
    "q_day_of_week" ->
      """SELECT (CAST(FLOOR((epoch_ms(o_orderdate)//1000) / 86400) AS BIGINT) + 4) % 7 AS dow,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY dow ORDER BY dow""".stripMargin,
    "q_having" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer GROUP BY nationkey HAVING COUNT(*) >= 60
        |ORDER BY nationkey""".stripMargin,
    "q_lag_lead" ->
      """SELECT o_custkey, o_orderkey,
        |  epoch_ms(o_orderdate)//1000 - LAG(epoch_ms(o_orderdate)//1000)
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS sec_since_prev,
        |  LEAD(epoch_ms(o_orderdate)//1000)
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |    - epoch_ms(o_orderdate)//1000 AS sec_until_next
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_pivot" ->
      """SELECT user_id % 10 AS bucket,
        |  COUNT(*) FILTER (event_type = 'click') AS click,
        |  COUNT(*) FILTER (event_type = 'view') AS view,
        |  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (event_type = 'error') AS error,
        |  COUNT(*) FILTER (event_type = 'signup') AS signup
        |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_outer_join" ->
      """SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
        |  COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        |FROM (SELECT CAST(c_nationkey AS BIGINT) AS nationkey, COUNT(*) AS n_cust
        |      FROM customer GROUP BY 1) c
        |FULL OUTER JOIN (SELECT CAST(s_nationkey AS BIGINT) AS nationkey, COUNT(*) AS n_supp
        |      FROM supplier GROUP BY 1) s
        |ON c.nationkey = s.nationkey
        |ORDER BY nationkey""".stripMargin,
    "q_conditional_agg" ->
      """SELECT user_id % 10 AS bucket,
        |  COUNT(*) FILTER (event_type = 'click') AS n_click,
        |  COUNT(*) FILTER (event_type = 'view') AS n_view,
        |  COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_value
        |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_union_dedup" ->
      """SELECT DISTINCT nationkey FROM (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
        |  UNION ALL SELECT CAST(s_nationkey AS BIGINT) FROM supplier)
        |ORDER BY nationkey""".stripMargin,
    "q_range_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_fast_ship
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  AND epoch_ms(l_shipdate)//1000 >= epoch_ms(o_orderdate)//1000
        |  AND epoch_ms(l_shipdate)//1000 < epoch_ms(o_orderdate)//1000 + 30*86400
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
}
