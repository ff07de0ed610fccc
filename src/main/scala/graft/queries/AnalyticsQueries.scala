package graft.queries

import graft.queries.Tables.load
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational analytics over the TPC-H-ish tables: aggregation
  * pipelines, broadcast joins, windows, set ops, rollup, top-k.
  * These are the bench headliners — each is written for the plan we
  * want at 100 TB: filters that push into the parquet scan, small
  * dimensions broadcast, exact-decimal aggregation for oracle parity.
  */
object AnalyticsQueries {

  /** Order years present at every scale factor (pivot column set —
    * part of the operator definition, shared with the SQL twin).
    */
  private val PivotYears: Seq[Int] = 1995 to 2001

  /** Funnel step window: 7 days in µs. Per-user events in the
    * synthetic corpus are days apart, so this keeps the step
    * constraint binding (150 → 144 → 132 at sf0.01) — an unbounded
    * funnel converts everyone and checks nothing.
    */
  private val FunnelWindowUs: Long = 7L * 86400L * 1000000L

  /** Session gap: 12 h in µs. The synthetic per-user median gap is
    * ~7 h with p90 ≈ 25 h, so 12 h yields several multi-event
    * sessions per user — both the break and the continue branch stay
    * live at the oracle scale.
    */
  private val SessionGapUs: Long = 12L * 3600L * 1000000L

  /** Retention cohort bucket: one week in µs (the corpus spans ~30
    * days → ~5 cohorts × ~5 offsets).
    */
  private val WeekUs: Long = 7L * 86400L * 1000000L

  /** Range/as-of join window: one hour in µs. */
  private val HourUs: Long = 3600L * 1000000L

  /** KMV sketch size; well below the sf0.01 composite-key domain so
    * the estimation branch (not the exact-fallback) is what the
    * oracle exercises. (Declared BEFORE `all` — the twin SQL strings
    * interpolate these at object init.)
    */
  private val KmvK: Int = 256

  /** The composite key whose cardinality q_kmv_distinct estimates —
    * DuckDB text; the Spark side builds the identical concat_ws.
    */
  private val KmvKeySql: String =
    "concat_ws('|', user_id, event_type, props)"

  /** The per-side key q_kmv_set_ops compares across event-type
    * partitions (event_type itself excluded — it defines the sides).
    */
  private val KmvSetKeySql: String = "concat_ws('|', user_id, props)"

  /** Bits per dimension in the q_zorder_key interleave. */
  private val ZBits: Int = 16

  /** q_table_profile: KMV size + the profiled lineitem columns as
    * (name, DuckDB key SQL, DuckDB order SQL) — the Spark side builds
    * the identical expressions. Keys render through exact longs (the
    * double columns are cents/integral by construction) so the hash
    * identities are engine-portable.
    */
  private val ProfileK: Int = 128
  private val ProfileCols: Seq[(String, String, String)] = Seq(
    ("l_orderkey", "CAST(l_orderkey AS VARCHAR)", "l_orderkey"),
    ("l_linenumber", "CAST(l_linenumber AS VARCHAR)", "l_linenumber"),
    ("l_quantity", "CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)",
      "CAST(l_quantity AS BIGINT)"),
    ("price_c",
      "CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR)",
      "CAST(round(l_extendedprice * 100) AS BIGINT)"),
    ("l_returnflag", "l_returnflag", "l_returnflag"),
    ("ship_us", "CAST(epoch_us(l_shipdate) AS VARCHAR)",
      "epoch_us(l_shipdate)"))

  /** Bradley-Terry MM iteration count (q_bt_strengths). Correctness
    * is iteration-count-independent — the twin replays the exact
    * integer trajectory — so this is a budget, not a convergence
    * guarantee; the MM map contracts geometrically (spec-pinned) and
    * ten rounds put the 5-type fixture well inside reading precision.
    */
  private val BtIters = 10

  /** Unrolled MM trajectory CTEs t1..t[[BtIters]] over the pair CTEs
    * (`e` directed games, `w` per-item wins, `kk` item count,
    * `t0` = 1e6 flat start) — the DuckDB twin of
    * [[graft.ops.Preference.bradleyTerry]]'s BigInt loop. HUGEINT
    * `//` and BigInt `/` agree (both floor) because every operand is
    * positive; sums of floor-divided integers are exact, so the whole
    * trajectory replays bit-identically. Every CTE is MATERIALIZED:
    * each round references the previous one twice, so inlining would
    * re-evaluate the chain 2^iters times.
    */
  private def btTrajectoryCtes: String =
    (1 to BtIters).map { k =>
      s"""d$k AS MATERIALIZED (SELECT e.i,
         |  sum(e.n * 1000000000000 // (ta.th + tb.th)) AS den
         |  FROM e JOIN t${k - 1} ta ON ta.i = e.i
         |  JOIN t${k - 1} tb ON tb.i = e.j GROUP BY e.i),
         |r$k AS MATERIALIZED (SELECT w.i, CASE WHEN w.w = 0 THEN CAST(1 AS HUGEINT)
         |    ELSE CAST(w.w AS HUGEINT) * 1000000000000 // d$k.den END
         |  AS raw FROM w JOIN d$k USING (i)),
         |s$k AS MATERIALIZED (SELECT sum(raw) AS s FROM r$k),
         |t$k AS MATERIALIZED (SELECT i, greatest(CAST(1 AS HUGEINT),
         |    raw * (kk.k * 1000000) // s$k.s) AS th
         |  FROM r$k, s$k, kk)""".stripMargin
    }.mkString(",\n")

  /** q_zorder_scan box: users below this id × one January-2024 week
    * (the base corpus spans 2024-01-01..31 at every sf; GenScale
    * copies occupy later, disjoint ranges, so the box stays valid and
    * selective as data scales).
    */
  private val ZScanMaxUser: Long = 12L
  private val ZScanT0: Long = 1704844800000000L // 2024-01-10 UTC, µs
  private val ZScanT1: Long = 1705449600000000L // 2024-01-17 UTC, µs

  val all: Seq[QueryDef] = Seq(

    // pricing summary: wide aggregation with decimal-exact sums
    // Money aggregates surface as exact scaled BIGINTs (x10^4): the
    // decimal sums are exact on both engines, but decimal→double
    // conversion is not bit-identical across engines — integers are.
    QueryDef("q1_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) * 10000 AS BIGINT) AS sum_qty_e4,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) * 10000 AS BIGINT) AS sum_base_price_e4,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS sum_disc_price_e4,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) * 10000 AS BIGINT) AS DOUBLE)
        |    / 10000.0 / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      val qtyE4 = (sum(col("l_quantity").cast("decimal(18,4)")) * 10000).cast("long")
      load(s, d, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          qtyE4.as("sum_qty_e4"),
          (sum(col("l_extendedprice").cast("decimal(18,4)")) * 10000)
            .cast("long").as("sum_base_price_e4"),
          (sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount").cast("decimal(18,2)"))) * 10000)
            .cast("long").as("sum_disc_price_e4"),
          (qtyE4.cast("double") / 10000.0 / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // shipping-priority top-k: 3-way join, small side broadcast
    QueryDef("q3_shipping_topk",
      """SELECT l.l_orderkey AS orderkey,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l.l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT)
        |    AS revenue_e4,
        |  strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |GROUP BY l.l_orderkey, o.o_orderdate
        |ORDER BY revenue_e4 DESC, orderkey LIMIT 10""".stripMargin) { (s, d) =>
      val c = load(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = load(s, d, "orders")
      val l = load(s, d, "lineitem")
      // exact long-cents arithmetic: p·100 and d·100 are integral, so
      // Σ p2·(100−d2) = 10⁴·Σ p(1−d) — bit-identical to the oracle's
      // decimal sum, but the hot loop is primitive long math. Group
      // sizes are bounded (~7 lineitems/order), so the long sum cannot
      // overflow at any scale factor.
      val rev = (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long") *
        (lit(100L) - (col("l_discount").cast("decimal(18,2)") * 100).cast("long"))
      // broadcast only the FILTERED DIMENSION (customer); the
      // orders⋈customer side is fact-sized and must not carry a
      // broadcast hint — AQE converts the join to broadcast when the
      // runtime size allows (it does at bench SFs) and falls back to a
      // shuffle join at scales where a forced broadcast would OOM
      l.join(o.join(broadcast(c),
          o("o_custkey") === c("c_custkey")),
          l("l_orderkey") === col("o_orderkey"))
        // group on the RAW date; the string render happens once per
        // OUTPUT row (10), not once per input row (millions)
        .groupBy(l("l_orderkey").as("orderkey"), col("o_orderdate"))
        .agg(sum(rev).as("revenue_e4"))
        .orderBy(col("revenue_e4").desc, col("orderkey"))
        .limit(10)
        .select(col("orderkey"), col("revenue_e4"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
    },

    // regional revenue: 6-way star join, dims broadcast
    QueryDef("q5_regional_revenue",
      """SELECT n.n_name AS nation,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l.l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT)
        |    AS revenue_e4
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE s.s_nationkey = c.c_nationkey
        |GROUP BY n.n_name ORDER BY revenue_e4 DESC, nation""".stripMargin) { (s, d) =>
      val l = load(s, d, "lineitem")
      val o = load(s, d, "orders")
      val c = load(s, d, "customer")
      val sup = load(s, d, "supplier")
      val n = load(s, d, "nation")
      val r = load(s, d, "region")
      // broadcast hints only on the FIXED-cardinality dims (nation,
      // region); customer and supplier scale with the dataset, so
      // their join strategy is left to AQE — broadcast at bench SFs,
      // shuffle at scales where a forced broadcast would OOM
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey") &&
          sup("s_nationkey") === c("c_nationkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(n("n_name").as("nation"))
        .agg((sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(18,2)"))) * 10000)
          .cast("long").as("revenue_e4"))
        .orderBy(col("revenue_e4").desc, col("nation"))
    },

    // TPC-H Q17 pattern — small-quantity revenue for one brand: a
    // per-part average threshold (the correlated subquery) computed
    // as one groupBy re-joined to the fact, the comparison kept
    // EXACT by cross-multiplication (5·qty·cnt < sum_qty in decimal
    // — never a float 0.2·avg). Brand filter pushes to the part
    // scan; the part side broadcasts; the per-part stats frame is
    // part-domain-sized.
    QueryDef("q17_small_qty_revenue",
      """WITH bp AS (SELECT p_partkey FROM part
        |  WHERE p_brand = 'Brand#13'),
        |li AS (SELECT l.l_partkey, CAST(l.l_quantity AS DECIMAL(18,2))
        |    AS q, CAST(l.l_extendedprice AS DECIMAL(18,2)) AS px
        |  FROM lineitem l JOIN bp ON l.l_partkey = bp.p_partkey),
        |st AS (SELECT l_partkey, sum(q) AS sumq,
        |  CAST(count(*) AS BIGINT) AS cnt FROM li GROUP BY 1)
        |SELECT CAST(coalesce(sum(li.px), 0) * 10000 AS BIGINT)
        |    AS revenue_e4,
        |  CAST(count(*) AS BIGINT) AS n_lines
        |FROM li JOIN st USING (l_partkey)
        |WHERE li.q * 5 * st.cnt < st.sumq""".stripMargin) { (s, d) =>
      val bp = load(s, d, "part").filter(col("p_brand") === "Brand#13")
        .select(col("p_partkey"))
      val li = load(s, d, "lineitem")
        .join(broadcast(bp), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"),
          col("l_quantity").cast("decimal(18,2)").as("q"),
          col("l_extendedprice").cast("decimal(18,2)").as("px"))
      val st = li.groupBy("l_partkey")
        .agg(sum(col("q")).as("sumq"), count(lit(1)).as("cnt"))
      li.join(st, "l_partkey")
        .filter(col("q") * lit(5) * col("cnt") < col("sumq"))
        .agg((coalesce(sum(col("px")), lit(0).cast("decimal(18,2)")) *
          10000).cast("long").as("revenue_e4"),
          count(lit(1)).as("n_lines"))
    },

    // TPC-H Q18 pattern — large-volume orders: group-having on the
    // fact (sum of quantities per order above a threshold), then the
    // qualifying ORDER KEYS (a tiny frame) pull in customer/order
    // detail — the having-side semi-join never widens the fact scan.
    QueryDef("q18_large_orders",
      """WITH big AS (SELECT l_orderkey,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT)
        |    AS qty_e2
        |  FROM lineitem GROUP BY 1
        |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250)
        |SELECT c.c_name AS cname, o.o_orderkey AS orderkey,
        |  strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
        |  CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 10000 AS BIGINT)
        |    AS totalprice_e4,
        |  big.qty_e2
        |FROM big JOIN orders o ON big.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY big.qty_e2 DESC, orderkey""".stripMargin) { (s, d) =>
      val big = load(s, d, "lineitem")
        .groupBy("l_orderkey")
        .agg((sum(col("l_quantity").cast("decimal(18,2)")) * 100)
          .cast("long").as("qty_e2"))
        .filter(col("qty_e2") > 25000L)
      val o = load(s, d, "orders")
      val c = load(s, d, "customer")
      big.join(o, big("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .select(c("c_name").as("cname"),
          o("o_orderkey").as("orderkey"),
          date_format(o("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          (o("o_totalprice").cast("decimal(18,2)") * 10000)
            .cast("long").as("totalprice_e4"),
          col("qty_e2"))
        .orderBy(col("qty_e2").desc, col("orderkey"))
    },

    // TPC-H Q19 pattern — disjunctive bracket predicates: revenue
    // over an OR of (brand, size-range, quantity-range) conjuncts.
    // The part side pre-filters to the UNION of bracket brands (every
    // disjunct pins a brand, so the filter pushes into the part scan
    // and the broadcast ships only candidate parts); the residual OR
    // evaluates post-join. Decimal discipline throughout — the
    // quantity brackets compare exact decimals, never doubles.
    QueryDef("q19_bracket_revenue",
      """WITH bp AS (SELECT p_partkey, p_brand, p_size FROM part
        |  WHERE p_brand IN ('Brand#12', 'Brand#23', 'Brand#3')),
        |j AS (SELECT CAST(l.l_quantity AS DECIMAL(18,2)) AS q,
        |    CAST(l.l_extendedprice AS DECIMAL(18,2)) AS px,
        |    CAST(l.l_discount AS DECIMAL(18,2)) AS disc,
        |    p.p_brand, p.p_size
        |  FROM lineitem l JOIN bp p ON l.l_partkey = p.p_partkey)
        |SELECT CAST(coalesce(sum(px * (1 - disc)), 0) * 10000
        |    AS BIGINT) AS revenue_e4,
        |  CAST(count(*) AS BIGINT) AS n_lines
        |FROM j
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |    AND q BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        |    AND q BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
        |    AND q BETWEEN 20 AND 30)""".stripMargin) { (s, d) =>
      val brackets = Seq(("Brand#12", 15, 1, 11), ("Brand#23", 25, 10, 20),
        ("Brand#3", 35, 20, 30))
      val bp = load(s, d, "part")
        .filter(col("p_brand").isin(brackets.map(_._1): _*))
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      val j = load(s, d, "lineitem")
        .join(broadcast(bp), col("l_partkey") === col("p_partkey"))
        .select(col("l_quantity").cast("decimal(18,2)").as("q"),
          col("l_extendedprice").cast("decimal(18,2)").as("px"),
          col("l_discount").cast("decimal(18,2)").as("disc"),
          col("p_brand"), col("p_size"))
      val hit = brackets.map { case (b, sz, qLo, qHi) =>
        col("p_brand") === b && col("p_size").between(1, sz) &&
          col("q").between(qLo, qHi)
      }.reduce(_ || _)
      j.filter(hit)
        .agg((coalesce(sum(col("px") * (lit(1) - col("disc"))),
          lit(0).cast("decimal(18,2)")) * 10000).cast("long")
          .as("revenue_e4"),
          count(lit(1)).as("n_lines"))
    },

    // TPC-H Q21 pattern — the sole blocking supplier: finished
    // orders where EXACTLY ONE supplier shipped late (> 100 days
    // after the order date) and at least two suppliers participated;
    // numwait counts each supplier's late lines in such orders. The
    // reference formulation is the correlated EXISTS / NOT-EXISTS
    // pair — the twin replays exactly that — while the Spark side
    // uses the aggregate reformulation (per-order distinct-supplier
    // and distinct-LATE-supplier counts, one shuffle on orderkey),
    // the shape that scales: no per-row correlated probes, the
    // order-grain stats frame joins back to the late lines.
    QueryDef("q21_blocking_supplier",
      """WITH lo AS (SELECT l.l_orderkey, l.l_suppkey,
        |    date_diff('day', o.o_orderdate, l.l_shipdate) > 100
        |      AS late
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderstatus = 'F'),
        |w1 AS (SELECT * FROM lo l1 WHERE late
        |  AND EXISTS (SELECT 1 FROM lo l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lo l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey AND l3.late))
        |SELECT s.s_name AS sname, CAST(count(*) AS BIGINT) AS numwait
        |FROM w1 JOIN supplier s ON w1.l_suppkey = s.s_suppkey
        |GROUP BY 1 ORDER BY numwait DESC, sname""".stripMargin) { (s, d) =>
      val lo = load(s, d, "lineitem").as("l")
        .join(load(s, d, "orders").filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (datediff(col("l_shipdate"), col("o_orderdate")) > 100)
            .as("late"))
      val st = lo.groupBy("l_orderkey")
        .agg(countDistinct(col("l_suppkey")).as("ns"),
          countDistinct(when(col("late"), col("l_suppkey"))).as("nl"))
      val w1 = lo.filter(col("late"))
        .join(st, "l_orderkey")
        .filter(col("ns") >= 2 && col("nl") === 1)
      w1.join(broadcast(load(s, d, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name").as("sname"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("sname"))
    },

    // TPC-H Q22 pattern — idle above-average balances: customers
    // whose balance exceeds the mean POSITIVE balance and who placed
    // no orders SINCE the cutoff (the reference's 7-year inactivity
    // window; every synthetic customer has SOME order, so the
    // unwindowed test is vacuous), grouped by nation. The global
    // -average threshold stays EXACT by cross-multiplication
    // (bal · n_pos > sum_pos in decimal — the q17 discipline for a
    // GLOBAL correlate; the O(1) stats row is the only driver
    // traffic), and the inactivity test is an ANTI join on custkey
    // against the date-filtered orders (the filter pushes into the
    // orders scan), never a correlated probe per row.
    QueryDef("q22_idle_balance",
      """WITH st AS (SELECT
        |    sum(CAST(c_acctbal AS DECIMAL(18,2))) AS sp,
        |    CAST(count(*) AS BIGINT) AS np
        |  FROM customer WHERE c_acctbal > 0),
        |idle AS (SELECT c.c_custkey, c.c_nationkey,
        |    CAST(c.c_acctbal AS DECIMAL(18,2)) AS bal
        |  FROM customer c, st
        |  WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * st.np > st.sp
        |    AND NOT EXISTS (SELECT 1 FROM orders o
        |      WHERE o.o_custkey = c.c_custkey
        |        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'))
        |SELECT n.n_name AS nation,
        |  CAST(count(*) AS BIGINT) AS n_cust,
        |  CAST(sum(bal) * 100 AS BIGINT) AS totbal_e2
        |FROM idle JOIN nation n ON idle.c_nationkey = n.n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val c = load(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"),
          col("c_acctbal").cast("decimal(18,2)").as("bal"))
      val st = c.filter(col("bal") > 0)
        .agg(sum(col("bal")).as("sp"), count(lit(1)).as("np")).head()
      val (sp, np) = (st.getDecimal(0), st.getLong(1))
      val idle = c
        .filter(col("bal") * np > lit(sp))
        .join(load(s, d, "orders")
          .filter(col("o_orderdate") >= lit("2000-01-01 00:00:00")
            .cast("timestamp"))
          .select(col("o_custkey")).distinct(),
          col("c_custkey") === col("o_custkey"), "left_anti")
      idle.join(broadcast(load(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(count(lit(1)).as("n_cust"),
          (sum(col("bal")) * 100).cast("long").as("totbal_e2"))
        .orderBy("nation")
    },

    // TPC-H Q4 pattern — order-priority checking: orders of one
    // quarter with at least one genuinely late line (shipped > 30
    // days after the order date — the schema's lateness signal),
    // counted by priority. The EXISTS is a SEMI join with the
    // residual date comparison in the join condition — the fact scan
    // never widens, each order counts once however many lines are
    // late.
    QueryDef("q4_order_priority",
      """SELECT o.o_orderpriority AS priority,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val o = load(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      val l = load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      o.join(l, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") +
            expr("INTERVAL 30 DAYS"), "left_semi")
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("priority")
    },

    // TPC-H Q6 pattern — the forecasting-revenue-change scan: ONE
    // pass over the fact with every predicate (ship year, discount
    // bracket, quantity cap) pushed into the parquet scan, exact
    // decimal sum. The whole query is a PushedFilters line + a
    // map-side-combined agg — the plan a 100 TB scan needs.
    QueryDef("q6_forecast_revenue",
      """SELECT CAST(coalesce(sum(
        |    CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    CAST(l_discount AS DECIMAL(18,2))), 0) * 10000 AS BIGINT)
        |    AS revenue_e4,
        |  CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin) { (s, d) =>
      load(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp")
          // decimal literals: string operands would promote the
          // comparison to Double while the twin runs DECIMAL BETWEEN
          && col("l_discount").cast("decimal(18,2)").between(
            lit(new java.math.BigDecimal("0.05")),
            lit(new java.math.BigDecimal("0.07")))
          && col("l_quantity") < 24)
        .agg((coalesce(sum(col("l_extendedprice").cast("decimal(18,2)")
          * col("l_discount").cast("decimal(18,2)")),
          lit(0).cast("decimal(18,2)")) * 10000).cast("long")
          .as("revenue_e4"),
          count(lit(1)).as("n_lines"))
    },

    // TPC-H Q10 pattern — returned-item losers: revenue lost to
    // returns (l_returnflag = 'R') for one quarter's orders, by
    // customer with nation detail, top 20 by lost revenue
    // (custkey tiebreak keeps the limit deterministic — custkey is
    // the group key, so the cut commutes with the detail joins).
    // Date filter pushes to the orders scan; the top-20 cut applies
    // to the per-customer aggregate BEFORE customer/nation detail
    // joins, so exactly 20 keys pull detail and the 20-row side
    // broadcasts against the customer scan.
    QueryDef("q10_returned_items",
      """WITH rl AS (SELECT o.o_custkey,
        |    CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |      (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS rev
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_returnflag = 'R'
        |    AND o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        |    AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00'),
        |pc AS (SELECT o_custkey,
        |  CAST(sum(rev) * 10000 AS BIGINT) AS revenue_e4
        |  FROM rl GROUP BY 1),
        |top AS (SELECT * FROM pc
        |  ORDER BY revenue_e4 DESC, o_custkey LIMIT 20)
        |SELECT c.c_custkey AS custkey, c.c_name AS cname,
        |  n.n_name AS nation, top.revenue_e4
        |FROM top JOIN customer c ON top.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |ORDER BY top.revenue_e4 DESC, custkey LIMIT 20""".stripMargin) {
      (s, d) =>
      val rl = load(s, d, "lineitem").filter(col("l_returnflag") === "R")
        .join(load(s, d, "orders")
          .filter(col("o_orderdate") >=
            lit("1996-07-01").cast("timestamp")
            && col("o_orderdate") < lit("1996-10-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"),
          (col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount").cast("decimal(18,2)")))
            .as("rev"))
      val pc = rl.groupBy("o_custkey")
        .agg((sum(col("rev")) * 10000).cast("long").as("revenue_e4"))
      val top = pc.orderBy(col("revenue_e4").desc, col("o_custkey"))
        .limit(20)
      broadcast(top).join(load(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(load(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey").as("custkey"),
          col("c_name").as("cname"), col("n_name").as("nation"),
          col("revenue_e4"))
        .orderBy(col("revenue_e4").desc, col("custkey"))
        .limit(20)
    },

    // TPC-H Q13 pattern — customer order-count distribution: LEFT
    // join so zero-order customers survive into the c_count = 0
    // bucket, two cascaded aggregations (per-customer count, then
    // the count-of-counts histogram).
    QueryDef("q13_custdist",
      """WITH co AS (SELECT c.c_custkey,
        |  CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        |  FROM customer c LEFT JOIN orders o
        |    ON o.o_custkey = c.c_custkey
        |  GROUP BY 1)
        |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM co GROUP BY 1
        |ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, d) =>
      load(s, d, "customer")
        .join(load(s, d, "orders"),
          col("o_custkey") === col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // TPC-H Q14 pattern — promotion revenue share for one month:
    // conditional aggregation over one joined scan, the share kept
    // EXACT as parts-per-million by integer division of the e4
    // fixed-point sums (never a float percentage).
    QueryDef("q14_promo_revenue",
      """WITH j AS (SELECT p.p_type,
        |    CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |      (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS rev
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE l.l_shipdate >= TIMESTAMP '1996-07-01 00:00:00'
        |    AND l.l_shipdate < TIMESTAMP '1996-08-01 00:00:00'),
        |t AS (SELECT
        |  CAST(coalesce(sum(CASE WHEN p_type = 'PROMO' THEN rev END),
        |    0) * 10000 AS BIGINT) AS promo_e4,
        |  CAST(coalesce(sum(rev), 0) * 10000 AS BIGINT) AS total_e4
        |  FROM j)
        |SELECT promo_e4, total_e4,
        |  CAST(CASE WHEN total_e4 = 0 THEN 0
        |    ELSE CAST(promo_e4 AS HUGEINT) * 1000000 // total_e4 END
        |    AS BIGINT) AS promo_ppm
        |FROM t""".stripMargin) { (s, d) =>
      val j = load(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-07-01").cast("timestamp")
          && col("l_shipdate") < lit("1996-08-01").cast("timestamp"))
        .join(broadcast(load(s, d, "part")
          .select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_type"),
          (col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount").cast("decimal(18,2)")))
            .as("rev"))
      j.agg(
          (coalesce(sum(when(col("p_type") === "PROMO", col("rev"))),
            lit(0).cast("decimal(18,2)")) * 10000).cast("long")
            .as("promo_e4"),
          (coalesce(sum(col("rev")), lit(0).cast("decimal(18,2)"))
            * 10000).cast("long").as("total_e4"))
        .withColumn("promo_ppm",
          when(col("total_e4") === 0L, 0L)
            // widen BEFORE the *1e6: e4 revenue sums pass Long/1e6
            // at moderate scale and a 64-bit multiply would wrap
            // silently under non-ANSI div (the twin uses HUGEINT)
            .otherwise(expr(
              "cast(promo_e4 as decimal(38,0)) * 1000000 div total_e4")))
    },

    // TPC-H Q15 pattern — top supplier(s) by quarterly revenue: the
    // revenue view aggregated once, the max picked off the O(1)
    // stats row (the only driver traffic), equality on EXACT e4
    // fixed-point so ties surface instead of float-drifting apart.
    QueryDef("q15_top_supplier",
      """WITH rv AS (SELECT l_suppkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT)
        |    AS revenue_e4
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s.s_suppkey AS suppkey, s.s_name AS sname,
        |  rv.revenue_e4
        |FROM rv JOIN supplier s ON rv.l_suppkey = s.s_suppkey
        |WHERE rv.revenue_e4 = (SELECT max(revenue_e4) FROM rv)
        |ORDER BY suppkey""".stripMargin) { (s, d) =>
      val rv = load(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg((sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(18,2)"))) * 10000)
          .cast("long").as("revenue_e4"))
      // an empty ship window makes max() NULL — the twin returns
      // zero rows, so must we (not an NPE on the driver)
      val maxRow = rv.agg(max(col("revenue_e4"))).head()
      val maxRev =
        if (maxRow.isNullAt(0)) Long.MinValue else maxRow.getLong(0)
      rv.filter(col("revenue_e4") === maxRev)
        .join(broadcast(load(s, d, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey").as("suppkey"),
          col("s_name").as("sname"), col("revenue_e4"))
        .orderBy("suppkey")
    },

    // TPC-H Q7 pattern — bilateral shipping volume: revenue flowing
    // between two nations (either direction) by ship year. The
    // nation filter is applied to the TINY dimension chains first —
    // suppliers and customers of the two nations join against 1-row
    // broadcast nation frames BEFORE touching the fact, so the big
    // join's build sides are pre-shrunk; the either-direction pair
    // filter is a residual on the joined grain.
    QueryDef("q7_nation_volume",
      """WITH sn AS (SELECT s.s_suppkey, n.n_name AS supp_nation
        |  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  WHERE n.n_name IN ('NATION_1', 'NATION_2')),
        |cn AS (SELECT c.c_custkey, n.n_name AS cust_nation
        |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  WHERE n.n_name IN ('NATION_1', 'NATION_2'))
        |SELECT sn.supp_nation, cn.cust_nation,
        |  CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |    (1 - CAST(l.l_discount AS DECIMAL(18,2)))) * 10000
        |    AS BIGINT) AS revenue_e4
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN sn ON l.l_suppkey = sn.s_suppkey
        |JOIN cn ON o.o_custkey = cn.c_custkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND sn.supp_nation <> cn.cust_nation
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
      val nats = load(s, d, "nation")
        .filter(col("n_name").isin("NATION_1", "NATION_2"))
      val sn = load(s, d, "supplier")
        .join(broadcast(nats), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cn = load(s, d, "customer")
        .join(broadcast(nats), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      load(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(load(s, d, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cn), col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg((sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(18,2)"))) * 10000)
          .cast("long").as("revenue_e4"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // TPC-H Q8 pattern — national market share: of the ECONOMY-part
    // revenue bought by EUROPE customers in 1995–1996, the share
    // supplied by NATION_3, by order year — conditional aggregation
    // over one multi-join scan, the share EXACT as ppm by integer
    // division of e4 fixed-point sums. Part/nation/region dimension
    // chains broadcast; the fact is filtered by the part semi-join
    // before the wide joins.
    QueryDef("q8_market_share",
      """WITH ep AS (SELECT p_partkey FROM part
        |  WHERE p_type = 'ECONOMY'),
        |ec AS (SELECT c.c_custkey
        |  FROM customer c
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  WHERE r.r_name = 'EUROPE'),
        |sn AS (SELECT s.s_suppkey, n.n_name AS supp_nation
        |  FROM supplier s
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey),
        |j AS (SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
        |    sn.supp_nation,
        |    CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |      (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS rev
        |  FROM lineitem l
        |  JOIN ep ON l.l_partkey = ep.p_partkey
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN ec ON o.o_custkey = ec.c_custkey
        |  JOIN sn ON l.l_suppkey = sn.s_suppkey
        |  WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |    AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
        |t AS (SELECT o_year,
        |  CAST(coalesce(sum(CASE WHEN supp_nation = 'NATION_3'
        |    THEN rev END), 0) * 10000 AS BIGINT) AS nation_e4,
        |  CAST(coalesce(sum(rev), 0) * 10000 AS BIGINT) AS total_e4
        |  FROM j GROUP BY 1)
        |SELECT o_year, nation_e4, total_e4,
        |  CAST(CASE WHEN total_e4 = 0 THEN 0
        |    ELSE CAST(nation_e4 AS HUGEINT) * 1000000 // total_e4 END
        |    AS BIGINT) AS share_ppm
        |FROM t ORDER BY o_year""".stripMargin) { (s, d) =>
      val ep = load(s, d, "part").filter(col("p_type") === "ECONOMY")
        .select(col("p_partkey"))
      val ec = load(s, d, "customer")
        .join(broadcast(load(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(load(s, d, "region")
          .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"))
      val sn = load(s, d, "supplier")
        .join(broadcast(load(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val j = load(s, d, "lineitem")
        .join(broadcast(ep), col("l_partkey") === col("p_partkey"))
        .join(load(s, d, "orders")
          .filter(col("o_orderdate") >=
            lit("1995-01-01").cast("timestamp")
            && col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(ec), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
        .select(year(col("o_orderdate")).cast("long").as("o_year"),
          col("supp_nation"),
          (col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount").cast("decimal(18,2)")))
            .as("rev"))
      j.groupBy("o_year")
        .agg(
          (coalesce(sum(when(col("supp_nation") === "NATION_3",
            col("rev"))), lit(0).cast("decimal(18,2)")) * 10000)
            .cast("long").as("nation_e4"),
          (coalesce(sum(col("rev")), lit(0).cast("decimal(18,2)"))
            * 10000).cast("long").as("total_e4"))
        .withColumn("share_ppm",
          when(col("total_e4") === 0L, 0L)
            // widen BEFORE the *1e6 (see q14) — 64-bit would wrap
            .otherwise(expr(
              "cast(nation_e4 as decimal(38,0)) * 1000000 div total_e4")))
        .orderBy("o_year")
    },

    // window functions: rank + running sum per partition
    QueryDef("q_window_running",
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  row_number() OVER w AS rn,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) OVER
        |    (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS run_qty
        |FROM lineitem WHERE l_suppkey <= 2
        |WINDOW w AS (PARTITION BY l_suppkey
        |             ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |ORDER BY l_suppkey, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
      load(s, d, "lineitem").filter(col("l_suppkey") <= 2)
        .withColumn("rn", row_number().over(w))
        .withColumn("run_qty",
          sum(col("l_quantity").cast("decimal(18,6)"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
        .select("l_suppkey", "l_orderkey", "l_linenumber", "rn", "run_qty")
        .orderBy("l_suppkey", "rn")
    },

    // global top-k without full sort on the oracle side too
    QueryDef("q_topk_orders",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin) { (s, d) =>
      load(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(20)
    },

    // set operations over the events domain
    QueryDef("q_setops",
      """WITH p AS (SELECT DISTINCT user_id FROM events
        |           WHERE event_type = 'purchase'),
        |e AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
        |SELECT 'purchase_no_error' AS tag, user_id
        |FROM (SELECT user_id FROM p EXCEPT SELECT user_id FROM e)
        |UNION ALL
        |SELECT 'purchase_and_error' AS tag, user_id
        |FROM (SELECT user_id FROM p INTERSECT SELECT user_id FROM e)
        |ORDER BY tag, user_id""".stripMargin) { (s, d) =>
      val ev = load(s, d, "events")
      val p = ev.filter(col("event_type") === "purchase").select("user_id").distinct()
      val e = ev.filter(col("event_type") === "error").select("user_id").distinct()
      p.except(e).withColumn("tag", lit("purchase_no_error"))
        .unionByName(p.intersect(e).withColumn("tag", lit("purchase_and_error")))
        .select("tag", "user_id")
        .orderBy("tag", "user_id")
    },

    // semi join (EXISTS)
    QueryDef("q_semi_join",
      """SELECT c.c_mktsegment, count(*) AS n_customers
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |              AND o.o_orderpriority = '1-URGENT')
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin) { (s, d) =>
      val c = load(s, d, "customer")
      val o = load(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")
    },

    // anti join (NOT EXISTS) — parts never ordered in bulk. The
    // right-side predicate keeps the result nonzero at every SF
    // (every part has SOME lineitem, so an unrestricted NOT EXISTS
    // is vacuously empty and proves nothing).
    QueryDef("q_anti_join",
      """SELECT p_partkey FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        |                  WHERE l.l_partkey = part.p_partkey
        |                  AND l.l_quantity > 45)
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      val p = load(s, d, "part")
      val l = load(s, d, "lineitem").filter(col("l_quantity") > 45)
      p.join(l, p("p_partkey") === l("l_partkey"), "left_anti")
        .select("p_partkey").orderBy("p_partkey")
    },

    // rollup with grouping-null ordering pinned on both engines
    QueryDef("q_rollup",
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_c
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST,
        |         o_orderpriority NULLS FIRST""".stripMargin) { (s, d) =>
      load(s, d, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          (sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("long").as("total_c"))
        .orderBy(asc_nulls_first("o_orderstatus"),
          asc_nulls_first("o_orderpriority"))
    },

    // CUBE over two dimensions
    QueryDef("q_cube",
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS qty_c
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
      load(s, d, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          (sum(col("l_quantity").cast("decimal(18,2)")) * 100)
            .cast("long").as("qty_c"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    },

    // lead/lag/ntile window functions
    QueryDef("q_lead_lag",
      """SELECT o_custkey, o_orderkey,
        |  lag(o_orderkey) OVER w AS prev_order,
        |  lead(o_orderkey) OVER w AS next_order,
        |  ntile(4) OVER w AS quartile,
        |  CAST(rank() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS price_rank
        |FROM orders WHERE o_custkey <= 20
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val wp = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      load(s, d, "orders").filter(col("o_custkey") <= 20)
        .select(col("o_custkey"), col("o_orderkey"),
          lag("o_orderkey", 1).over(w).as("prev_order"),
          lead("o_orderkey", 1).over(w).as("next_order"),
          ntile(4).over(w).as("quartile"),
          rank().over(wp).cast("long").as("price_rank"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // scalar string-function battery
    QueryDef("q_string_funcs",
      """SELECT p_partkey,
        |  upper(p_name) AS uname,
        |  length(p_name) AS len,
        |  substr(p_name, 1, 5) AS pre,
        |  replace(p_type, ' ', '_') AS typ,
        |  concat(p_brand, '#', p_type) AS brandtype,
        |  CAST(contains(p_name, 'a') AS BOOLEAN) AS has_a,
        |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size4
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      load(s, d, "part")
        .select(col("p_partkey"),
          upper(col("p_name")).as("uname"),
          length(col("p_name")).cast("long").as("len"),
          substring(col("p_name"), 1, 5).as("pre"),
          regexp_replace(col("p_type"), " ", "_").as("typ"),
          concat(col("p_brand"), lit("#"), col("p_type")).as("brandtype"),
          col("p_name").contains("a").as("has_a"),
          lpad(col("p_size").cast("string"), 4, "0").as("size4"))
        .orderBy("p_partkey")
    },

    // array + JSON function battery over events.props
    QueryDef("q_array_json_funcs",
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  len(string_split(event_type, 'u')) AS n_splits,
        |  list_sort(string_split(event_type, ''))[1] AS min_char
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      load(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"),
          size(split(col("event_type"), "u", -1)).cast("long").as("n_splits"),
          array_min(filter(split(col("event_type"), ""), c => c =!= lit("")))
            .as("min_char"))
        .orderBy("event_id")
    },

    // exact distinct counting
    QueryDef("q_distinct_agg",
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      load(s, d, "lineitem").groupBy("l_returnflag")
        .agg(countDistinct("l_partkey").as("n_parts"),
          countDistinct("l_suppkey").as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    },

    // pivot: per-nation revenue spread across order years as columns
    // (Spark's relational pivot; the oracle is the equivalent
    // conditional aggregation). Exact cents, nation table broadcast,
    // one shuffle on the group key.
    QueryDef("q_pivot", {
      val cols = PivotYears.map(y =>
        s"CAST(sum(CASE WHEN yr = $y THEN tp END) * 100 AS BIGINT) AS y$y")
        .mkString(",\n  ")
      s"""WITH j AS (SELECT n_name, year(o_orderdate) AS yr,
         |  CAST(o_totalprice AS DECIMAL(18,2)) AS tp
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey)
         |SELECT n_name,
         |  $cols
         |FROM j GROUP BY n_name ORDER BY n_name""".stripMargin
    }) { (s, d) =>
      load(s, d, "orders")
        .join(load(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(load(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), year(col("o_orderdate")).as("yr"),
          col("o_totalprice").cast("decimal(18,2)").as("tp"))
        .groupBy("n_name")
        .pivot("yr", PivotYears)
        .agg(sum(col("tp")))
        .select(col("n_name") +: PivotYears.map(y =>
          (col(y.toString) * 100).cast("long").as(s"y$y")): _*)
        .orderBy("n_name")
    },

    // event funnel: signup → click-within-7d → purchase-within-7d,
    // each step strictly after the user's previous step; per-step
    // user counts. Three conditional min-aggregations joined on
    // user_id — the standard declarative funnel (no per-user
    // sequential scan); the step window keeps the constraint binding.
    QueryDef("q_funnel",
      s"""WITH e AS (SELECT user_id, event_type,
         |  ${OracleDefs.EventStepUs} AS step_us FROM events),
         |s1 AS (SELECT user_id, min(step_us) AS t1 FROM e
         |  WHERE event_type = 'signup' GROUP BY 1),
         |s2 AS (SELECT e.user_id, min(step_us) AS t2 FROM e
         |  JOIN s1 USING (user_id)
         |  WHERE event_type = 'click' AND step_us > t1
         |    AND step_us <= t1 + $FunnelWindowUs GROUP BY 1),
         |s3 AS (SELECT e.user_id, min(step_us) AS t3 FROM e
         |  JOIN s2 USING (user_id)
         |  WHERE event_type = 'purchase' AND step_us > t2
         |    AND step_us <= t2 + $FunnelWindowUs GROUP BY 1)
         |SELECT count(*) AS n_signup,
         |  (SELECT count(*) FROM s2) AS n_then_click,
         |  (SELECT count(*) FROM s3) AS n_then_purchase
         |FROM s1""".stripMargin) { (s, d) =>
      val evRaw = load(s, d, "events")
      val ev = evRaw
        .select(col("user_id"), col("event_type"),
          Tables.stepUs(evRaw).as("step_us"))
      def step(prev: org.apache.spark.sql.DataFrame, evType: String,
          tPrev: String, tOut: String) =
        ev.join(prev, "user_id")
          .filter(col("event_type") === evType &&
            col("step_us") > col(tPrev) &&
            col("step_us") <= col(tPrev) + FunnelWindowUs)
          .groupBy("user_id").agg(min("step_us").as(tOut))
      val s1 = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("step_us").as("t1"))
      val s2 = step(s1, "click", "t1", "t2")
      val s3 = step(s2, "purchase", "t2", "t3")
      s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
        .agg(count("t1").as("n_signup"), count("t2").as("n_then_click"),
          count("t3").as("n_then_purchase"))
    },

    // gap-based batch sessionization: one window pass partitioned by
    // user (the only data-sized shuffle) assigns session indexes via
    // break-flag running sum; the session rollup then groups within
    // the same user partitioning. The streaming twin lives in
    // StreamOps.sessionize — this is the backfill shape.
    QueryDef("q_sessions",
      s"""WITH e AS (SELECT user_id, event_id,
         |  ${OracleDefs.EventStepUs} AS t FROM events),
         |l AS (SELECT user_id, event_id, t, lag(t) OVER
         |  (PARTITION BY user_id ORDER BY t, event_id) AS pt FROM e),
         |f AS (SELECT user_id, event_id, t, CASE WHEN pt IS NULL
         |  OR t - pt > $SessionGapUs THEN 1 ELSE 0 END AS brk FROM l),
         |s AS (SELECT user_id, t, sum(brk) OVER
         |  (PARTITION BY user_id ORDER BY t, event_id
         |   ROWS UNBOUNDED PRECEDING) AS sid FROM f)
         |SELECT user_id, CAST(sid AS BIGINT) AS session_id,
         |  count(*) AS n_events, min(t) AS start_us, max(t) AS end_us,
         |  max(t) - min(t) AS duration_us
         |FROM s GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin
    ) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("t", "event_id")
      val evRaw = load(s, d, "events")
      val e = evRaw
        .select(col("user_id"), col("event_id"), Tables.stepUs(evRaw).as("t"))
        .withColumn("pt", lag("t", 1).over(w))
        .withColumn("brk", when(col("pt").isNull ||
          col("t") - col("pt") > SessionGapUs, 1L).otherwise(0L))
        .withColumn("sid", sum("brk").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      e.groupBy(col("user_id"), col("sid").as("session_id"))
        .agg(count(lit(1)).as("n_events"), min("t").as("start_us"),
          max("t").as("end_us"),
          (max("t") - min("t")).as("duration_us"))
        .orderBy("user_id", "session_id")
    },

    // weekly cohort retention: cohort = each user's first-PURCHASE
    // week, activity = distinct purchase (user, week) — the curve
    // every growth dashboard reads. Conditioning on purchase is what
    // makes the table non-degenerate here: every synthetic user has
    // SOME event every week, but first purchases spread over three
    // weeks. Two key shuffles (per-user min, then the cohort×offset
    // count); the event_type predicate pushes into the scan.
    QueryDef("q_retention",
      s"""WITH e AS (SELECT user_id,
         |  ${OracleDefs.EventStepUs} // $WeekUs AS wk FROM events
         |  WHERE event_type = 'purchase'),
         |c AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY 1),
         |a AS (SELECT DISTINCT e.user_id, cohort_wk, wk - cohort_wk AS off
         |  FROM e JOIN c USING (user_id))
         |SELECT CAST(cohort_wk AS BIGINT) AS cohort_wk,
         |  CAST(off AS BIGINT) AS week_offset, count(*) AS n_users
         |FROM a GROUP BY 1, 2 ORDER BY cohort_wk, week_offset""".stripMargin
    ) { (s, d) =>
      val evRaw = load(s, d, "events")
      val e = evRaw
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), Tables.stepUs(evRaw).as("step_us"))
        .withColumn("wk", expr(s"step_us div ${WeekUs}L"))
      val cohort = e.groupBy("user_id").agg(min("wk").as("cohort_wk"))
      e.join(cohort, "user_id")
        .select(col("user_id"), col("cohort_wk"),
          (col("wk") - col("cohort_wk")).as("week_offset"))
        .distinct()
        .groupBy("cohort_wk", "week_offset")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_wk", "week_offset")
    },

    // binned range join (graft.ops.RangeJoin): purchases within one
    // hour AFTER an error by the same user — point-in-interval
    // attribution. The engine quantizes time into 1 h bins so
    // containment becomes an equi-join on (user_id, bin): no
    // BroadcastNestedLoopJoin anywhere in the plan (RangeJoinSpec
    // asserts this), shuffle volume |points| + 2×|intervals|. The
    // DuckDB twin is the naive inequality join — two different
    // algorithms, same rows.
    QueryDef("q_range_join",
      s"""WITH e AS (SELECT event_id, user_id,
         |  ${OracleDefs.EventStepUs} AS t, event_type, value FROM events),
         |err AS (SELECT user_id, event_id AS err_id, t AS t0,
         |  t + $HourUs AS t1 FROM e WHERE event_type = 'error'),
         |buy AS (SELECT user_id, event_id AS buy_id, t, value FROM e
         |  WHERE event_type = 'purchase')
         |SELECT err_id, buy_id, CAST(buy.t - err.t0 AS BIGINT) AS lag_us
         |FROM err JOIN buy USING (user_id)
         |WHERE buy.t >= err.t0 AND buy.t <= err.t1
         |ORDER BY err_id, buy_id""".stripMargin) { (s, d) =>
      val evRaw = load(s, d, "events")
      val e = evRaw.select(col("event_id"), col("user_id"),
        Tables.stepUs(evRaw).as("t"), col("event_type"))
      val err = e.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id").as("err_id"),
          col("t").as("t0"), (col("t") + HourUs).as("t1"))
      val buy = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("buy_id"), col("t"))
      graft.ops.RangeJoin.pointInInterval(buy, err,
          pointCol = "t", startCol = "t0", endCol = "t1",
          binWidth = HourUs, keys = Seq("user_id"))
        .select(col("err_id"), col("buy_id"),
          (col("t") - col("t0")).as("lag_us"))
        .orderBy("err_id", "buy_id")
    },

    // two-table as-of join (graft.ops.AsOfJoin): each purchase gets
    // the user's most recent click value at-or-before it. Spark side
    // runs the union+window shape (ONE shuffle on user_id,
    // intermediate |L|+|R|); the DuckDB twin is its NATIVE ASOF JOIN
    // — two independent as-of implementations pinned to the same
    // rows. Clicks are pre-aggregated to one row per (user_id, t)
    // (max value) so "latest" is well-defined in both engines.
    QueryDef("q_asof_join",
      s"""WITH e AS (SELECT event_id, user_id,
         |  ${OracleDefs.EventStepUs} AS t, event_type, value FROM events),
         |clk AS (SELECT user_id, t, max(value) AS click_value FROM e
         |  WHERE event_type = 'click' GROUP BY 1, 2),
         |buy AS (SELECT event_id, user_id, t FROM e
         |  WHERE event_type = 'purchase')
         |SELECT buy.event_id, clk.click_value AS asof_click_value
         |FROM buy ASOF LEFT JOIN clk
         |  ON buy.user_id = clk.user_id AND clk.t <= buy.t
         |ORDER BY buy.event_id""".stripMargin) { (s, d) =>
      val evRaw = load(s, d, "events")
      val e = evRaw.select(col("event_id"), col("user_id"),
        Tables.stepUs(evRaw).as("t"), col("event_type"), col("value"))
      val clk = e.filter(col("event_type") === "click")
        .groupBy("user_id", "t").agg(max("value").as("click_value"))
      val buy = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "t")
      graft.ops.AsOfJoin.backward(buy, clk, keys = Seq("user_id"),
          leftTime = "t", rightTime = "t", valueCols = Seq("click_value"))
        .select("event_id", "asof_click_value")
        .orderBy("event_id")
    },

    // the tolerance form of the as-of join: a click older than one
    // hour is no match at all (the quote-staleness contract). The
    // DuckDB twin applies the same bound as a post-ASOF CASE — the
    // single as-of match either passes the freshness check or the row
    // reports null, exactly AsOfJoin.backward(tolerance = 1 h).
    QueryDef("q_asof_join_tol",
      s"""WITH e AS (SELECT event_id, user_id,
         |  ${OracleDefs.EventStepUs} AS t, event_type, value FROM events),
         |clk AS (SELECT user_id, t, max(value) AS click_value FROM e
         |  WHERE event_type = 'click' GROUP BY 1, 2),
         |buy AS (SELECT event_id, user_id, t FROM e
         |  WHERE event_type = 'purchase')
         |SELECT buy.event_id,
         |  CASE WHEN buy.t - clk.t <= $HourUs THEN clk.click_value END
         |    AS asof_click_value
         |FROM buy ASOF LEFT JOIN clk
         |  ON buy.user_id = clk.user_id AND clk.t <= buy.t
         |ORDER BY buy.event_id""".stripMargin) { (s, d) =>
      val evRaw = load(s, d, "events")
      val e = evRaw.select(col("event_id"), col("user_id"),
        Tables.stepUs(evRaw).as("t"), col("event_type"), col("value"))
      val clk = e.filter(col("event_type") === "click")
        .groupBy("user_id", "t").agg(max("value").as("click_value"))
      val buy = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "t")
      graft.ops.AsOfJoin.backward(buy, clk, keys = Seq("user_id"),
          leftTime = "t", rightTime = "t", valueCols = Seq("click_value"),
          tolerance = Some(HourUs))
        .select("event_id", "asof_click_value")
        .orderBy("event_id")
    },

    // interval×interval overlap join (graft.ops.RangeJoin): a user's
    // 30-min error windows intersecting their 60-min signup windows,
    // with the overlap length. Both sides explode to 1 h bins but a
    // pair survives only in the bin holding the OVERLAP START, so
    // each pair is emitted exactly once without a distinct pass. The
    // DuckDB twin is the naive inequality join.
    QueryDef("q_interval_overlap",
      s"""WITH e AS (SELECT event_id, user_id,
         |  ${OracleDefs.EventStepUs} AS t, event_type FROM events),
         |err AS (SELECT user_id, event_id AS err_id, t AS elo,
         |  t + ${HourUs / 2} AS ehi FROM e WHERE event_type = 'error'),
         |sgn AS (SELECT user_id, event_id AS sgn_id, t AS slo,
         |  t + $HourUs AS shi FROM e WHERE event_type = 'signup')
         |SELECT err_id, sgn_id,
         |  CAST(least(ehi, shi) - greatest(elo, slo) AS BIGINT) AS overlap_us
         |FROM err JOIN sgn USING (user_id)
         |WHERE elo <= shi AND slo <= ehi
         |ORDER BY err_id, sgn_id""".stripMargin) { (s, d) =>
      val evRaw = load(s, d, "events")
      val e = evRaw.select(col("event_id"), col("user_id"),
        Tables.stepUs(evRaw).as("t"), col("event_type"))
      val err = e.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id").as("err_id"),
          col("t").as("elo"), (col("t") + HourUs / 2).as("ehi"))
      val sgn = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id").as("sgn_id"),
          col("t").as("slo"), (col("t") + HourUs).as("shi"))
      graft.ops.RangeJoin.intervalOverlap(err, sgn,
          "elo", "ehi", "slo", "shi", binWidth = HourUs,
          keys = Seq("user_id"))
        .select(col("err_id"), col("sgn_id"),
          (least(col("ehi"), col("shi")) -
            greatest(col("elo"), col("slo"))).as("overlap_us"))
        .orderBy("err_id", "sgn_id")
    },

    // KMV distinct-cardinality sketch (graft.ops.Sketch) over the
    // composite session key: the estimate rides the k smallest
    // distinct hashes — plain SQL state, so the twin replays the
    // sketch exactly (exact distinct alongside measures the error).
    // Engine side: HLL-sized hash threshold keeps the exchange at
    // O(k) rows regardless of corpus size.
    QueryDef("q_kmv_distinct",
      s"""WITH h AS (SELECT DISTINCT
         |  ${TextQueries.sqlSampleHash(KmvKeySql)} AS h FROM events),
         |km AS (SELECT h FROM h ORDER BY h LIMIT $KmvK),
         |m AS (SELECT count(*) AS nk, max(h) AS hk FROM km),
         |est AS (SELECT nk, hk,
         |  CASE WHEN nk < $KmvK THEN CAST(nk AS DOUBLE)
         |    ELSE CAST(${(KmvK - 1).toLong * graft.functions.GraftFunctions.PhMod}
         |      AS DOUBLE) / CAST(hk AS DOUBLE) END AS est FROM m),
         |e AS (SELECT count(*) AS n_exact FROM h)
         |SELECT $KmvK AS k, est.nk AS n_kept, est.hk AS kth_hash,
         |  est.est AS est_distinct, e.n_exact AS exact_distinct,
         |  abs(est.est - CAST(e.n_exact AS DOUBLE))
         |    / CAST(e.n_exact AS DOUBLE) AS rel_err
         |FROM est, e""".stripMargin) { (s, d) =>
      val ev = load(s, d, "events")
      val key = concat_ws("|", col("user_id"), col("event_type"),
        col("props"))
      val r = graft.ops.Sketch.kmvDistinct(ev, key, KmvK)
      ev.agg(countDistinct(graft.ops.Sketch.kmvHash(key))
          .as("exact_distinct"))
        .select(lit(KmvK).as("k"), lit(r.nKept).as("n_kept"),
          lit(r.kthHash).as("kth_hash"), lit(r.estimate).as("est_distinct"),
          col("exact_distinct"),
          (abs(lit(r.estimate) - col("exact_distinct").cast("double")) /
            col("exact_distinct").cast("double")).as("rel_err"))
    },

    // native per-group top-k (functions.TopKPairsAgg): the k best
    // users by exact-cents spend per event type through graft_topk —
    // a TypedImperativeAggregate with a k-capped heap, so each map
    // task reduces its slice to <= k entries per group BEFORE the
    // exchange (the window formulation the oracle uses must shuffle
    // and sort every row of the hottest group). The oracle's
    // row_number() twin is the semantic statement; the engine's
    // partial-agg plan is the scale statement (spec-asserted).
    QueryDef("q_group_topk",
      """WITH per AS (SELECT event_type, user_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, user_id, cents, row_number() OVER
        |  (PARTITION BY event_type ORDER BY cents DESC, user_id) AS rnk
        |  FROM per)
        |SELECT event_type, CAST(rnk AS BIGINT) AS rank, cents, user_id
        |FROM r WHERE rnk <= 3 ORDER BY event_type, rank""".stripMargin) {
      (s, d) =>
        val per = load(s, d, "events")
          .groupBy("event_type", "user_id")
          .agg((sum(col("value").cast("decimal(18,2)")) * 100)
            .cast("long").as("cents"))
        per.groupBy("event_type")
          .agg(graft.functions.TopKPairsAgg.topkPairs(
            col("cents"), col("user_id"), 3).as("top"))
          .select(col("event_type"), posexplode(col("top")))
          .select(col("event_type"),
            (col("pos") + 1).cast("long").as("rank"),
            col("col.ord").as("cents"), col("col.id").as("user_id"))
          .orderBy("event_type", "rank")
    },

    // KMV set comparison (graft.ops.Sketch.kmvCompare): ONE union
    // sketch estimates |A∪B|, Jaccard, and |A∩B| between two key
    // sets — the theta-sketch intersection idea with plain-SQL state
    // (k smallest union hashes + per-side presence flags), so the
    // twin replays the sketch exactly; exact figures ride alongside
    // to measure the error. A = (user,props) keys of click/view
    // events, B = the same domain for the remaining event types.
    QueryDef("q_kmv_set_ops", {
      val h = TextQueries.sqlSampleHash(KmvSetKeySql)
      s"""WITH ha AS (SELECT DISTINCT $h AS h FROM events
         |  WHERE event_type IN ('click', 'view')),
         |hb AS (SELECT DISTINCT $h AS h FROM events
         |  WHERE event_type NOT IN ('click', 'view')),
         |u AS (SELECT h, max(ia) AS ia, max(ib) AS ib FROM (
         |  SELECT h, 1 AS ia, 0 AS ib FROM ha
         |  UNION ALL SELECT h, 0 AS ia, 1 AS ib FROM hb) GROUP BY h),
         |km AS (SELECT h, ia, ib FROM u ORDER BY h LIMIT $KmvK),
         |m AS (SELECT count(*) AS nk, max(h) AS hk,
         |  CAST(sum(CASE WHEN ia = 1 AND ib = 1 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS nboth FROM km),
         |e1 AS (SELECT nk, hk, nboth,
         |  CASE WHEN nk < $KmvK THEN CAST(nk AS DOUBLE)
         |    ELSE CAST(${(KmvK - 1).toLong * graft.functions.GraftFunctions.PhMod}
         |      AS DOUBLE) / CAST(hk AS DOUBLE) END AS uest,
         |  CASE WHEN nk < $KmvK THEN (CASE WHEN nk = 0 THEN 0.0
         |      ELSE CAST(nboth AS DOUBLE) / CAST(nk AS DOUBLE) END)
         |    ELSE CAST(nboth AS DOUBLE) / CAST($KmvK AS DOUBLE) END AS jest
         |  FROM m),
         |est AS (SELECT nk, hk, nboth, uest, jest,
         |  CASE WHEN nk < $KmvK THEN CAST(nboth AS DOUBLE)
         |    ELSE jest * uest END AS iest FROM e1),
         |ex AS (SELECT count(*) AS exact_union,
         |  CAST(sum(CASE WHEN ia = 1 AND ib = 1 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS exact_inter FROM u)
         |SELECT $KmvK AS k, est.nk AS n_kept, est.hk AS kth_hash,
         |  est.nboth AS n_both, est.uest AS est_union,
         |  est.jest AS est_jaccard, est.iest AS est_inter,
         |  ex.exact_union, ex.exact_inter,
         |  CAST(ex.exact_inter AS DOUBLE) / CAST(ex.exact_union AS DOUBLE)
         |    AS exact_jaccard,
         |  abs(est.uest - CAST(ex.exact_union AS DOUBLE))
         |    / CAST(ex.exact_union AS DOUBLE) AS rel_err_union,
         |  abs(est.jest - CAST(ex.exact_inter AS DOUBLE)
         |    / CAST(ex.exact_union AS DOUBLE)) AS abs_err_jaccard
         |FROM est, ex""".stripMargin
    }) { (s, d) =>
      val ev = load(s, d, "events")
      val key = concat_ws("|", col("user_id"), col("props"))
      val inA = col("event_type").isin("click", "view")
      val aSet = ev.filter(inA)
      val bSet = ev.filter(!inA)
      val r = graft.ops.Sketch.kmvCompare(aSet, key, bSet, key, KmvK)
      val u = aSet.select(graft.ops.Sketch.kmvHash(key).as("h"),
          lit(1).as("ia"), lit(0).as("ib"))
        .unionByName(bSet.select(graft.ops.Sketch.kmvHash(key).as("h"),
          lit(0).as("ia"), lit(1).as("ib")))
        .groupBy("h").agg(max(col("ia")).as("ia"), max(col("ib")).as("ib"))
      u.agg(count(lit(1)).as("exact_union"),
          sum(col("ia") * col("ib")).cast("long").as("exact_inter"))
        .select(lit(KmvK).as("k"), lit(r.nKept).as("n_kept"),
          lit(r.kthHash).as("kth_hash"), lit(r.nBoth).as("n_both"),
          lit(r.unionEst).as("est_union"),
          lit(r.jaccardEst).as("est_jaccard"),
          lit(r.interEst).as("est_inter"),
          col("exact_union"), col("exact_inter"),
          (col("exact_inter").cast("double") /
            col("exact_union").cast("double")).as("exact_jaccard"),
          (abs(lit(r.unionEst) - col("exact_union").cast("double")) /
            col("exact_union").cast("double")).as("rel_err_union"),
          abs(lit(r.jaccardEst) - col("exact_inter").cast("double") /
            col("exact_union").cast("double")).as("abs_err_jaccard"))
    },

    // Z-order (Morton) clustering key (graft.ops.Layout): the
    // interleave both engines compute from the SAME (bit, dim) loop.
    // The layout rewrite built on it (Layout.zorderWrite — quantile
    // buckets + range exchange + in-partition sort) is exercised in
    // ZOrderSpec, where the multi-dimension file-skipping claim is
    // asserted against parquet min/max stats.
    QueryDef("q_zorder_key",
      s"""SELECT event_id, user_id,
         |  ${graft.ops.Layout.zValueSql(Seq("user_id", "event_id"), ZBits)}
         |    AS zkey
         |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      load(s, d, "events")
        .select(col("event_id"), col("user_id"),
          graft.ops.Layout.zValue(
            Seq(col("user_id"), col("event_id")), ZBits).as("zkey"))
        .orderBy("event_id")
    },

    // the z-order WRITE path end-to-end: events rewritten once per
    // (session, dataset) into a (user_id, t_us)-z-ordered copy
    // (Layout.zorderWrite — quantile buckets, range exchange,
    // in-partition sort), then a user×week box read BACK FROM THE
    // COPY. The oracle states the box over the raw table, so a
    // layout rewrite that drops, duplicates, or corrupts any row
    // breaks the hash; the read itself prunes via ordinary parquet
    // min/max stats on the clustered files (the skipping economics
    // are spec-pinned in ZOrderSpec). Rep 1 pays the rewrite
    // (TempState, the gate-query pattern); the measured row is the
    // pruned box scan.
    QueryDef("q_zorder_scan",
      s"""SELECT event_id, user_id, ${OracleDefs.EventStepUs} AS t_us,
         |  event_type
         |FROM events
         |WHERE user_id < $ZScanMaxUser
         |  AND ${OracleDefs.EventStepUs} >= $ZScanT0
         |  AND ${OracleDefs.EventStepUs} < $ZScanT1
         |ORDER BY event_id""".stripMargin) { (s, d) =>
      val zdir = TempState.dir(
        "zorder|" + s.sparkContext.applicationId + "|" + d) { r =>
        val ev = load(s, d, "events")
        graft.ops.Layout.zorderWrite(
          ev.select(col("event_id"), col("user_id"),
            Tables.stepUs(ev).as("t_us"), col("event_type")),
          Seq("user_id", "t_us"), s"$r/events_z", bits = 5, nFiles = 32)
      }
      s.read.parquet(s"$zdir/events_z")
        .filter(col("user_id") < ZScanMaxUser &&
          col("t_us") >= ZScanT0 && col("t_us") < ZScanT1)
        .select("event_id", "user_id", "t_us", "event_type")
        .orderBy("event_id")
    },

    // winsorized aggregate: values CLAMPED to the Tukey fences instead
    // of dropped (the robust-mean convention), each clamped value
    // quantized to e6 integers so the sum is exact on both engines —
    // a double mean would be addition-order-dependent; the integer
    // sum plus ONE final IEEE division is not.
    QueryDef("q_winsorize_agg",
      """WITH h AS (SELECT event_type AS grp, value AS v, count(*) AS c
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |cm AS (SELECT grp, v, c,
        |  CAST(sum(c) OVER (PARTITION BY grp ORDER BY v) AS BIGINT) AS cum,
        |  CAST(sum(c) OVER (PARTITION BY grp) AS BIGINT) AS n FROM h),
        |q AS (SELECT grp, max(n) AS n,
        |  min(CASE WHEN cum * 4 >= n * 1 THEN v END) AS q1,
        |  min(CASE WHEN cum * 4 >= n * 3 THEN v END) AS q3
        |  FROM cm GROUP BY grp),
        |b AS (SELECT grp, n, q1 - (q3 - q1) * 1.5 AS lo,
        |  q3 + (q3 - q1) * 1.5 AS hi FROM q)
        |SELECT b.grp AS event_type, b.n,
        |  CAST(sum(CAST(round(least(greatest(e.value, b.lo), b.hi)
        |    * 1000000) AS BIGINT)) AS BIGINT) AS wsum_e6,
        |  CAST(sum(CAST(round(least(greatest(e.value, b.lo), b.hi)
        |    * 1000000) AS BIGINT)) AS DOUBLE) / CAST(b.n AS DOUBLE)
        |    AS wmean_e6
        |FROM events e JOIN b ON e.event_type = b.grp
        |WHERE e.value IS NOT NULL
        |GROUP BY 1, 2 ORDER BY event_type""".stripMargin) { (s, d) =>
      val ev = load(s, d, "events").filter(col("value").isNotNull)
      val b = graft.ops.PipelineOps.iqrBounds(ev, col("event_type"),
        col("value"), k = 1.5)
      val clamped = round(
        least(greatest(col("value"), col("lo")), col("hi")) * 1000000d, 0)
        .cast("long")
      ev.join(broadcast(b), ev("event_type") === b("grp"))
        .groupBy(col("grp").as("event_type"), col("n"))
        .agg(sum(clamped).as("wsum_e6"))
        .withColumn("wmean_e6",
          col("wsum_e6").cast("double") / col("n").cast("double"))
        .orderBy("event_type")
    },

    // Tukey-fence outlier trim (PipelineOps.iqrBounds): per-event-type
    // fences off EXACT discrete quartiles (histogram + integer-math
    // selection, no per-group sort), then one broadcast join back over
    // the events to count kept/outlier rows. The twin replays the
    // identical quartile selection and the identical IEEE fence
    // arithmetic, so bounds AND counts must agree bit for bit.
    QueryDef("q_outlier_trim",
      """WITH h AS (SELECT event_type AS grp, value AS v, count(*) AS c
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |cm AS (SELECT grp, v, c,
        |  CAST(sum(c) OVER (PARTITION BY grp ORDER BY v) AS BIGINT) AS cum,
        |  CAST(sum(c) OVER (PARTITION BY grp) AS BIGINT) AS n FROM h),
        |q AS (SELECT grp, max(n) AS n,
        |  min(CASE WHEN cum * 4 >= n * 1 THEN v END) AS q1,
        |  min(CASE WHEN cum * 4 >= n * 3 THEN v END) AS q3
        |  FROM cm GROUP BY grp),
        |b AS (SELECT grp, n, q1 - (q3 - q1) * 1.5 AS lo,
        |  q3 + (q3 - q1) * 1.5 AS hi FROM q)
        |SELECT b.grp AS event_type, b.n, b.lo, b.hi,
        |  CAST(count(*) FILTER (e.value < b.lo OR e.value > b.hi)
        |    AS BIGINT) AS n_out,
        |  CAST(count(*) FILTER (e.value >= b.lo AND e.value <= b.hi)
        |    AS BIGINT) AS n_kept
        |FROM events e JOIN b ON e.event_type = b.grp
        |WHERE e.value IS NOT NULL
        |GROUP BY 1, 2, 3, 4 ORDER BY event_type""".stripMargin) { (s, d) =>
      val ev = load(s, d, "events").filter(col("value").isNotNull)
      val b = graft.ops.PipelineOps.iqrBounds(ev, col("event_type"),
        col("value"), k = 1.5)
      ev.join(broadcast(b), ev("event_type") === b("grp"))
        .groupBy(col("grp").as("event_type"), col("n"), col("lo"),
          col("hi"))
        .agg(
          sum(when(col("value") < col("lo") || col("value") > col("hi"),
            1L).otherwise(0L)).as("n_out"),
          sum(when(col("value") >= col("lo") && col("value") <= col("hi"),
            1L).otherwise(0L)).as("n_kept"))
        .orderBy("event_type")
    },

    // behavioral-sequence export: each user's FIRST 12 events in
    // event-time order as aligned id/type arrays — the trajectory
    // shape a sequence model trains on. The cap rides graft_topk's
    // map-side partial combine (ord = −µs keeps the earliest; µs > 0
    // so the negation is overflow-safe), so the shuffle carries
    // O(users × k) — never a per-user collect_list of unbounded
    // state; the selected ids then semi-join event types back and a
    // k-sized per-user aggregation rebuilds the ordered arrays.
    QueryDef("q_session_export",
      s"""WITH e AS (SELECT user_id, event_id, event_type,
         |  ${OracleDefs.EventStepUs} AS t FROM events),
         |r AS (SELECT user_id, event_id, event_type, row_number() OVER
         |  (PARTITION BY user_id ORDER BY t, event_id) AS rn FROM e),
         |s AS (SELECT user_id, event_id, event_type, rn FROM r
         |  WHERE rn <= 12),
         |n AS (SELECT user_id, count(*) AS n_events FROM e
         |  GROUP BY user_id),
         |a AS (SELECT user_id,
         |  array_to_string(list(event_id ORDER BY rn), ',') AS ids,
         |  array_to_string(list(event_type ORDER BY rn), ',') AS types
         |  FROM s GROUP BY user_id)
         |SELECT n.user_id, n.n_events, a.ids, a.types
         |FROM n JOIN a ON n.user_id = a.user_id
         |ORDER BY n.user_id""".stripMargin) { (s, d) =>
      val ev = load(s, d, "events")
      // sequences ship comma-joined (scalar-output contract: the
      // driver's pandas-based oracle harness cannot hash ARRAY cells)
      graft.ops.Trajectories.export(ev, Tables.stepUs(ev), 12)
        .orderBy("user_id")
    },

    // the export bounded for serving (Trajectories.writeShards +
    // readShardRange): trajectories packed into tar shards keyed by
    // user range, then users [40, 90) read back with shard files
    // pruned BY NAME before any byte opens — the range-addressable
    // artifact a training loader consumes, not a sorted DataFrame.
    // The twin replays the same trajectory SQL filtered to the range:
    // a hash match proves the container roundtrip byte-preserves
    // every sequence.
    QueryDef("q_traj_shard_range",
      s"""WITH e AS (SELECT user_id, event_id, event_type,
         |  ${OracleDefs.EventStepUs} AS t FROM events),
         |r AS (SELECT user_id, event_id, event_type, row_number() OVER
         |  (PARTITION BY user_id ORDER BY t, event_id) AS rn FROM e),
         |s AS (SELECT user_id, event_id, event_type, rn FROM r
         |  WHERE rn <= 12),
         |n AS (SELECT user_id, count(*) AS n_events FROM e
         |  GROUP BY user_id),
         |a AS (SELECT user_id,
         |  array_to_string(list(event_id ORDER BY rn), ',') AS ids,
         |  array_to_string(list(event_type ORDER BY rn), ',') AS types
         |  FROM s GROUP BY user_id)
         |SELECT n.user_id, n.n_events, a.ids, a.types
         |FROM n JOIN a ON n.user_id = a.user_id
         |WHERE n.user_id >= 40 AND n.user_id < 90
         |ORDER BY n.user_id""".stripMargin) { (s, d) =>
      val dir = TempState.dir(
        "trajshards|" + s.sparkContext.applicationId + "|" + d) { r =>
        val ev = load(s, d, "events")
        graft.ops.Trajectories.writeShards(
          graft.ops.Trajectories.export(ev, Tables.stepUs(ev), 12),
          s"$r/shards", usersPerShard = 32)
      }
      graft.ops.Trajectories.readShardRange(s, s"$dir/shards",
          usersPerShard = 32, loUser = 40, hiUser = 90)
        .orderBy("user_id")
    },

    // one-pass histogram quantiles (Sketch.histogramQuantiles): the
    // O(buckets)-exchange alternative to an exact percentile sort —
    // fixed bins over events.value with clamp buckets at the range
    // edges, rank walk + in-bucket linear interpolation on the
    // driver's O(buckets) histogram. Bin indexing and interpolation
    // run the identical IEEE expression sequence in the twin; the
    // estimate is e6-quantized. hi=200 < max(value)=490 so the
    // overflow clamp bucket carries real rows.
    QueryDef("q_histogram_quantiles",
      """WITH v AS (SELECT value FROM events WHERE value IS NOT NULL),
        |nn AS (SELECT count(*) AS n FROM v),
        |b AS (SELECT CASE WHEN value < 0e0 THEN -1
        |  WHEN value >= 200e0 THEN 64
        |  ELSE CAST(floor((value - 0e0) / ((200e0 - 0e0) / 64)) AS INT)
        |  END AS bk FROM v),
        |h AS (SELECT bk, count(*) AS cnt FROM b GROUP BY bk),
        |c AS (SELECT bk, cnt, sum(cnt) OVER (ORDER BY bk) AS cum FROM h),
        |q AS (SELECT unnest([500, 900, 990]) AS q_pm),
        |t AS (SELECT q_pm, n,
        |  CAST(ceil(q_pm / 1000e0 * n) AS BIGINT) AS r FROM q, nn),
        |j AS (SELECT t.q_pm, t.n, t.r, min(c.bk) AS bk FROM t
        |  JOIN c ON c.cum >= t.r GROUP BY 1, 2, 3),
        |p AS (SELECT j.q_pm, j.n, j.r, j.bk, c.cnt, c.cum - c.cnt AS cb
        |  FROM j JOIN c ON j.bk = c.bk)
        |SELECT CAST(q_pm AS BIGINT) AS q_pm, n, r AS rank,
        |  CAST(bk AS BIGINT) AS bucket,
        |  CAST(round((CASE WHEN bk = -1 THEN 0e0
        |    WHEN bk >= 64 THEN 200e0
        |    ELSE 0e0 + ((200e0 - 0e0) / 64) * bk
        |      + ((200e0 - 0e0) / 64) * (r - cb) / cnt END) * 1000000e0)
        |    AS BIGINT) AS est_e6
        |FROM p ORDER BY q_pm""".stripMargin) { (s, d) =>
      graft.ops.Sketch.histogramQuantiles(
        load(s, d, "events").where(col("value").isNotNull),
        col("value"), lo = 0.0, hi = 200.0, buckets = 64,
        qsPm = Seq(500, 900, 990))
    },

    // ANALYZE TABLE (Profile.tableProfile): per-column counts, nulls,
    // min/max, and a KMV NDV sketch over the fact table in one
    // metadata pass + one threshold-cut sketch pass — the CBO
    // statistics primitive. Key identities are rendered as exact
    // integers or raw strings (never raw doubles, whose string form
    // is engine-specific); the twin replays every per-column sketch
    // with the shared hash. l_returnflag (NDV 3) exercises the
    // exact-below-k branch, the key columns the estimator branch.
    QueryDef("q_table_profile", {
      val num = (ProfileK - 1).toLong * graft.functions.GraftFunctions.PhMod
      val ctes = ProfileCols.map { case (nm, keySql, ordSql) =>
        s"""h_$nm AS (SELECT DISTINCT
           |  ${TextQueries.sqlSampleHash(keySql)} AS h
           |  FROM lineitem WHERE ($keySql) IS NOT NULL),
           |km_$nm AS (SELECT h FROM h_$nm ORDER BY h LIMIT $ProfileK),
           |m_$nm AS (SELECT count(*) AS nk, max(h) AS hk FROM km_$nm),
           |c_$nm AS (SELECT count(*) AS total, count($keySql) AS nn,
           |  CAST(min($ordSql) AS VARCHAR) AS mn,
           |  CAST(max($ordSql) AS VARCHAR) AS mx FROM lineitem)""".stripMargin
      }.mkString(",\n")
      val selects = ProfileCols.map { case (nm, _, _) =>
        s"""SELECT '$nm' AS "column", c_$nm.total AS n_rows,
           |  c_$nm.total - c_$nm.nn AS n_null,
           |  c_$nm.mn AS min_v, c_$nm.mx AS max_v,
           |  m_$nm.nk AS n_kept,
           |  CASE WHEN m_$nm.nk < $ProfileK THEN -1 ELSE m_$nm.hk END
           |    AS kth_hash,
           |  CASE WHEN m_$nm.nk < $ProfileK THEN CAST(m_$nm.nk AS DOUBLE)
           |    ELSE CAST($num AS DOUBLE) / CAST(m_$nm.hk AS DOUBLE) END
           |    AS ndv_est
           |FROM c_$nm, m_$nm""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"WITH\n$ctes\n$selects\nORDER BY \"column\""
    }) { (s, d) =>
      import graft.ops.{Profile, ProfileSpec}
      val li = load(s, d, "lineitem")
      val qty = col("l_quantity").cast("long")
      val pc = round(col("l_extendedprice") * 100, 0).cast("long")
      // NTZ→timestamp cast interprets the naive value in the session
      // zone (pinned UTC) — the same instant DuckDB's naive epoch_us
      // sees (the Tables.stepUs convention)
      val su = expr("unix_micros(cast(l_shipdate as timestamp))")
      Profile.tableProfile(li, Seq(
        ProfileSpec("l_orderkey",
          col("l_orderkey").cast("string"), col("l_orderkey")),
        ProfileSpec("l_linenumber",
          col("l_linenumber").cast("string"), col("l_linenumber").cast("long")),
        ProfileSpec("l_quantity", qty.cast("string"), qty),
        ProfileSpec("price_c", pc.cast("string"), pc),
        ProfileSpec("l_returnflag", col("l_returnflag"), col("l_returnflag")),
        ProfileSpec("ship_us", su.cast("string"), su)),
        k = ProfileK)
    },

    // Bradley-Terry preference strengths (Preference): consecutive
    // same-user events with different types and values form pairwise
    // games (higher value wins); Hunter's MM iteration then fits a
    // strength per event type. The corpus-sized work is ONE lag
    // window + one groupBy onto the O(items²) pair table; the MM
    // fixed point runs on that bounded table in exact BigInt integer
    // arithmetic (e6 θ, e12 transfers, floor division, per-round
    // renormalization), which the twin replays verbatim with unrolled
    // HUGEINT CTEs.
    QueryDef("q_bt_strengths",
      s"""WITH o AS (SELECT user_id, event_id, event_type, value,
         |  lag(event_type) OVER uw AS pt, lag(value) OVER uw AS pv
         |  FROM (SELECT user_id, event_id, event_type, value,
         |    ${OracleDefs.EventStepUs} AS t FROM events)
         |  WINDOW uw AS (PARTITION BY user_id ORDER BY t, event_id)),
         |v AS (SELECT * FROM o WHERE pt IS NOT NULL
         |  AND pt <> event_type AND value <> pv),
         |c AS (SELECT
         |  CASE WHEN event_type < pt THEN event_type ELSE pt END AS item_a,
         |  CASE WHEN event_type < pt THEN pt ELSE event_type END AS item_b,
         |  CASE WHEN value > pv THEN event_type ELSE pt END AS win
         |  FROM v),
         |pc AS MATERIALIZED (SELECT item_a, item_b,
         |  sum(CASE WHEN win = item_a THEN 1 ELSE 0 END) AS wins_a,
         |  sum(CASE WHEN win = item_b THEN 1 ELSE 0 END) AS wins_b
         |  FROM c GROUP BY 1, 2),
         |e AS MATERIALIZED (SELECT item_a AS i, item_b AS j,
         |    CAST(wins_a + wins_b AS HUGEINT) AS n FROM pc
         |  UNION ALL SELECT item_b, item_a, CAST(wins_a + wins_b AS HUGEINT)
         |  FROM pc),
         |w AS MATERIALIZED (SELECT i, CAST(sum(ww) AS BIGINT) AS w FROM (
         |    SELECT item_a AS i, wins_a AS ww FROM pc
         |    UNION ALL SELECT item_b, wins_b FROM pc) GROUP BY i),
         |g AS (SELECT i, CAST(sum(n) AS BIGINT) AS games FROM e GROUP BY i),
         |kk AS MATERIALIZED (SELECT CAST(count(*) AS HUGEINT) AS k FROM w),
         |t0 AS MATERIALIZED (SELECT i, CAST(1000000 AS HUGEINT) AS th FROM w),
         |$btTrajectoryCtes
         |SELECT w.i AS item, w.w AS wins, g.games,
         |  CAST(t$BtIters.th AS BIGINT) AS theta_e6,
         |  CAST(row_number() OVER (ORDER BY t$BtIters.th DESC, w.i)
         |    AS BIGINT) AS rk
         |FROM w JOIN g USING (i) JOIN t$BtIters USING (i)
         |ORDER BY rk""".stripMargin) { (s, d) =>
      val ev = load(s, d, "events")
      graft.ops.Preference.bradleyTerry(s,
        graft.ops.Preference.pairwiseFromEvents(ev, Tables.stepUs(ev)),
        BtIters)
        .orderBy("rk")
    },

    // Bradley-Terry over a WIDE item domain
    // (Preference.bradleyTerryDistributed via the auto router): items
    // are (event_type, event_id mod 7) composites — ~7× the type
    // domain, past the router's ceiling here — so θ lives as a frame
    // broadcast into the edge join and the only driver-side value per
    // round is the 1-row normalization sum. The trajectory is the
    // SAME exact integer MM recursion (DECIMAL(38,0) two-step floor
    // == BigInt floor == HUGEINT `//`), so the twin replays it with
    // the identical unrolled CTEs, only the item definition changing.
    QueryDef("q_bt_strengths_dist",
      s"""WITH o AS (SELECT user_id, event_id, event_type, value,
         |  lag(event_type) OVER uw AS pt, lag(value) OVER uw AS pv
         |  FROM (SELECT user_id, event_id,
         |    event_type || '#' || CAST(event_id % 7 AS VARCHAR)
         |      AS event_type, value,
         |    ${OracleDefs.EventStepUs} AS t FROM events)
         |  WINDOW uw AS (PARTITION BY user_id ORDER BY t, event_id)),
         |v AS (SELECT * FROM o WHERE pt IS NOT NULL
         |  AND pt <> event_type AND value <> pv),
         |c AS (SELECT
         |  CASE WHEN event_type < pt THEN event_type ELSE pt END AS item_a,
         |  CASE WHEN event_type < pt THEN pt ELSE event_type END AS item_b,
         |  CASE WHEN value > pv THEN event_type ELSE pt END AS win
         |  FROM v),
         |pc AS MATERIALIZED (SELECT item_a, item_b,
         |  sum(CASE WHEN win = item_a THEN 1 ELSE 0 END) AS wins_a,
         |  sum(CASE WHEN win = item_b THEN 1 ELSE 0 END) AS wins_b
         |  FROM c GROUP BY 1, 2),
         |e AS MATERIALIZED (SELECT item_a AS i, item_b AS j,
         |    CAST(wins_a + wins_b AS HUGEINT) AS n FROM pc
         |  UNION ALL SELECT item_b, item_a, CAST(wins_a + wins_b AS HUGEINT)
         |  FROM pc),
         |w AS MATERIALIZED (SELECT i, CAST(sum(ww) AS BIGINT) AS w FROM (
         |    SELECT item_a AS i, wins_a AS ww FROM pc
         |    UNION ALL SELECT item_b, wins_b FROM pc) GROUP BY i),
         |g AS (SELECT i, CAST(sum(n) AS BIGINT) AS games FROM e GROUP BY i),
         |kk AS MATERIALIZED (SELECT CAST(count(*) AS HUGEINT) AS k FROM w),
         |t0 AS MATERIALIZED (SELECT i, CAST(1000000 AS HUGEINT) AS th FROM w),
         |$btTrajectoryCtes
         |SELECT w.i AS item, w.w AS wins, g.games,
         |  CAST(t$BtIters.th AS BIGINT) AS theta_e6,
         |  CAST(row_number() OVER (ORDER BY t$BtIters.th DESC, w.i)
         |    AS BIGINT) AS rk
         |FROM w JOIN g USING (i) JOIN t$BtIters USING (i)
         |ORDER BY rk""".stripMargin) { (s, d) =>
      val ev = load(s, d, "events")
      val composite = ev.withColumn("event_type",
        concat(col("event_type"), lit("#"),
          (col("event_id") % 7).cast("string")))
      graft.ops.Preference.bradleyTerryAuto(s,
        graft.ops.Preference.pairwiseFromEvents(composite,
          Tables.stepUs(ev)),
        BtIters, driverMaxItems = 16)
        .orderBy("rk")
    })
}
