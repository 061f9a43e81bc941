"""The remaining TPC-H query shapes (Q2/Q7/Q8/Q9/Q11/Q12/Q13/Q16/Q19/
Q20/Q21/Q22), completing the full 22-query decision-support batch.

The driver's star schema has no ``partsupp`` table and no
commitdate/receiptdate/shipmode/container/phone columns, so the four
partsupp-centric queries (Q2/Q11/Q16/Q20) run against a deterministic
*derived* supply view (:func:`part_supply`) distilled from lineitem —
each (partkey, suppkey) pair with its minimum observed unit net price as
``ps_supplycost`` and total shipped quantity as ``ps_qty`` — and the
other adapted queries re-target their predicates onto columns that exist
(Q12 groups by l_linestatus instead of l_shipmode; Q21's "kept orders
waiting" becomes "sole supplier with returned lines"; Q22's phone
country code becomes the customer's nation key). Every query keeps its
canonical *plan shape*:

- Q2: min-per-group correlated subquery -> aggregate-then-rejoin on the
  (part, min cost) pair; all dimension joins broadcast.
- Q7: double-aliased nation dimension (supplier nation x customer
  nation) with a symmetric pair predicate; fact shuffles once.
- Q8: market share — two conditional aggregates over an 6-table star,
  CASE on the numerator only.
- Q9: profit expression combining fact and dimension columns, grouped
  by nation x year.
- Q11: group-sum HAVING a share of the global sum — the global scalar
  is a broadcast single-row aggregate, never a window over everything.
- Q12: two conditional counts after a fact-fact join, grouped by a
  low-cardinality column.
- Q13: distribution-of-counts (left outer join, per-key count, then
  histogram of the counts) including the zero bucket.
- Q16: count(DISTINCT supplier) per part attribute triple with NOT-IN
  dimension predicates; the distinct rides the same shuffle as the
  group-by.
- Q19: disjunction of three conjunctive (brand, size, quantity) bands
  — one broadcast join, OR evaluated row-side, no union of scans.
- Q20: two-level semi-join reduction (qualifying parts -> qualifying
  supplier-part volumes -> suppliers).
- Q21: multi-EXISTS over order line co-membership, rewritten as one
  aggregation per order (count suppliers / count returning suppliers)
  — the scale-safe form of correlated double EXISTS; the DuckDB twin
  keeps the textbook EXISTS/NOT EXISTS formulation as an independent
  cross-check.
- Q22: anti-join against orders + global-average scalar predicate,
  grouped by country bucket.

Reference parity: the reference's snapshot SQL surface is ad-hoc
pandas-over-Postgres (dashboard.py:236-303); these queries are the same
capability class exercised over the TPC-H-ish tables at warehouse scale.
All money arithmetic uses the exact-decimal kernels from
``functions.exact`` so every aggregate is order-independent and
bit-identical to the DuckDB oracle on any executor count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_streaming_system_with_apache_kafka_spark.functions.exact import (
    dec4,
    dsum,
    oracle_dsum,
    revenue_dec,
)
from real_time_streaming_system_with_apache_kafka_spark.sources.tables import load

_DEC = "decimal(38,6)"

# Derived supply view shared by Q2/Q11/Q16/Q20 (the schema has no
# partsupp table): one row per observed (partkey, suppkey) pair.
# ps_supplycost is the minimum observed unit net price quantized DOWN to
# whole cents: the raw division is a full-precision double, and casting
# such a double to decimal is engine-dependent at halfway points (Spark
# rounds the shortest decimal representation, DuckDB the true binary
# value) — but floor() over bit-identical IEEE doubles is deterministic
# on every engine, and the resulting 2dp value then survives any decimal
# cast exactly. min() is order-independent; ps_qty is an exact-decimal
# sum. The view is itself a single map-side-combined shuffle over
# lineitem and would be materialized (bucketed by ps_partkey) once at
# 100 TB, not recomputed per query.
_PS_SQL = """
    SELECT l_partkey AS ps_partkey,
           l_suppkey AS ps_suppkey,
           min(floor(l_extendedprice / l_quantity * 100.0) / 100.0)
               AS ps_supplycost,
           cast(sum(cast(l_quantity AS decimal(38,6))) AS double) AS ps_qty
    FROM lineitem
    GROUP BY l_partkey, l_suppkey
"""


def part_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    unit_cents = F.floor(
        F.col("l_extendedprice") / F.col("l_quantity") * F.lit(100.0)
    )
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(unit_cents / F.lit(100.0)).alias("ps_supplycost"),
        dsum(F.col("l_quantity"), "ps_qty"),
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2: for STANDARD parts of one size, the EUROPE supplier(s)
    offering the minimum supply cost. The correlated MIN subquery is an
    aggregate on the derived supply view re-joined on (partkey, cost) —
    cost equality is on a double both sides computed identically, so the
    rejoin is exact. Dimensions (part subset, supplier, nation, region)
    all broadcast; the only big shuffle is the supply-view group-by."""
    part = (
        load(spark, "part", sf_dir)
        .filter((F.col("p_type") == "STANDARD") & (F.col("p_size") == 15))
        .select("p_partkey", "p_name")
    )
    nation = load(spark, "nation", sf_dir)
    region = load(spark, "region", sf_dir).filter(F.col("r_name") == "EUROPE")
    eu_nation = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    supp = (
        load(spark, "supplier", sf_dir)
        .join(F.broadcast(eu_nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps = part_supply(spark, sf_dir).join(
        F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey")
    )
    offers = ps.join(F.broadcast(supp), F.col("ps_suppkey") == F.col("s_suppkey"))
    min_cost = offers.groupBy(F.col("ps_partkey").alias("mc_partkey")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        offers.join(
            F.broadcast(min_cost),
            (F.col("ps_partkey") == F.col("mc_partkey"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("ps_supplycost").alias("supplycost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: revenue shipped between two nations, either direction,
    by year. The nation dimension is broadcast twice under different
    aliases (supplier side / customer side); the symmetric pair
    predicate prunes before the group-by, and lineitem shuffles only
    for the final (nation, nation, year) aggregate."""
    n1, n2 = "NATION_1", "NATION_2"
    nation = load(spark, "nation", sf_dir).filter(F.col("n_name").isin(n1, n2))
    supp = (
        load(spark, "supplier", sf_dir)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load(spark, "customer", sf_dir)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = load(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    li = load(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(
            ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
            | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(revenue_dec().cast(_DEC)).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_2's share of ASIA's ECONOMY-part revenue per
    order year. Six-table star: every dimension broadcasts, the fact
    shuffles once for the year group-by; the share is a conditional
    numerator over the same exact-decimal sum."""
    part = load(spark, "part", sf_dir).filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    supp_nation = load(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    supp = (
        load(spark, "supplier", sf_dir)
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"))
        .select("s_suppkey", "supp_nation")
    )
    region = load(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    cust_nation = (
        load(spark, "nation", sf_dir)
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    cust = (
        load(spark, "customer", sf_dir)
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("cn_key"))
        .select("c_custkey")
    )
    orders = load(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load(spark, "lineitem", sf_dir)
    vol = revenue_dec().cast(_DEC)
    nation_vol = F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(
        F.lit(0).cast(_DEC)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey, "left_semi")
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(nation_vol).cast("double").alias("nation_volume"),
            F.sum(vol).cast("double").alias("total_volume"),
        )
        .select(
            "o_year",
            (F.col("nation_volume") / F.col("total_volume")).alias("mkt_share"),
            "nation_volume",
            "total_volume",
        )
        .orderBy("o_year")
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit by supplier nation x year for parts whose name
    contains 'bolt'. The schema has no ps_supplycost, so cost is
    modeled as half the part's retail price per unit — the *shape*
    (fact expression referencing two dimensions' columns, substring
    part filter, nation x year rollup) is Q9's. Profit stays in exact
    decimal end-to-end: retailprice (2dp) x integer quantity x 0.5
    has <=3 fractional digits, exactly representable at scale 6."""
    part = load(spark, "part", sf_dir).filter(
        F.col("p_name").contains("bolt")
    ).select("p_partkey", "p_retailprice")
    nation = load(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    supp = (
        load(spark, "supplier", sf_dir)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "n_name")
    )
    orders = load(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    li = load(spark, "lineitem", sf_dir)
    cost = (
        dec4("p_retailprice")
        * dec4("l_quantity")
        * F.lit("0.5").cast("decimal(2,1)")
    )
    profit = (revenue_dec().cast(_DEC) - cost.cast(_DEC)).cast(_DEC)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts whose supply value from NATION_3's suppliers
    exceeds a fixed fraction of the nation's total supply value. The
    global total is a one-row aggregate broadcast against the per-part
    sums — never a window over an unpartitioned frame. Supply value is
    computed in exact decimal from cost x qty at fixed 4+6 scales."""
    nation = load(spark, "nation", sf_dir).filter(F.col("n_name") == "NATION_3")
    supp = (
        load(spark, "supplier", sf_dir)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    ps = part_supply(spark, sf_dir).join(
        F.broadcast(supp), F.col("ps_suppkey") == F.col("s_suppkey"), "left_semi"
    )
    value = (
        F.col("ps_supplycost").cast("decimal(18,4)")
        * F.col("ps_qty").cast("decimal(18,6)")
    ).cast(_DEC)
    per_part = ps.groupBy("ps_partkey").agg(
        F.sum(value).alias("value_dec")
    )
    total = per_part.agg(
        (F.sum("value_dec") * F.lit("0.001").cast("decimal(4,3)")).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(total), F.col("value_dec") > F.col("threshold"))
        .select("ps_partkey", F.col("value_dec").cast("double").alias("value"))
        .orderBy(F.col("value").desc(), "ps_partkey")
    )


def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: high- vs low-priority order line counts per
    line status (the schema has no l_shipmode; l_linestatus is the
    stand-in category) for one ship year. Fact-fact join on orderkey,
    then two conditional counts ride one map-side combine."""
    li = load(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    orders = load(spark, "orders", sf_dir).select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: histogram of per-customer order counts, including
    customers with zero orders (left outer join, count the non-null
    side). Excludes URGENT orders as the stand-in for the comment
    NOT LIKE filter. Two shuffles: custkey count, then count-of-counts
    over an input already reduced to one row per customer."""
    cust = load(spark, "customer", sf_dir).select("c_custkey")
    orders = load(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: distinct supplier count per (brand, type, size) for
    parts outside one brand/type, over the derived supply pairs. The
    DISTINCT aggregation shares the group-by shuffle (Spark expands
    distinct into a two-phase aggregate automatically)."""
    part = load(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#9")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    pairs = part_supply(spark, sf_dir).select("ps_partkey", "ps_suppkey")
    return (
        pairs.join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue from three OR'd (brand, size, quantity)
    bands. One broadcast join against part, the disjunction evaluated
    as a row-side predicate — not three scans unioned; Catalyst can
    still push the common bounds (quantity, size envelopes)."""
    part = load(spark, "part", sf_dir).select("p_partkey", "p_brand", "p_size")
    li = load(spark, "lineitem", sf_dir).filter(F.col("l_quantity") <= 30)
    band = (
        (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(band)
        .agg(
            F.sum(revenue_dec().cast(_DEC)).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: NATION_4 suppliers of 'small …' parts whose
    1996 shipped volume of those parts exceeds 40% of their all-time
    volume (the availqty predicate re-targeted onto observable
    volumes). Two nested reductions collapse into semi joins: parts
    filter -> per-(supp, part) volume comparison -> supplier semi
    join. Output is the supplier list, smallest relation last."""
    part = load(spark, "part", sf_dir).filter(
        F.col("p_name").startswith("small")
    ).select("p_partkey")
    li = load(spark, "lineitem", sf_dir).join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    vol = (
        li.groupBy("l_suppkey", "l_partkey")
        .agg(
            dsum(F.col("l_quantity"), "total_qty"),
            dsum(
                F.when(
                    (F.col("l_shipdate") >= "1996-01-01")
                    & (F.col("l_shipdate") < "1997-01-01"),
                    F.col("l_quantity"),
                ).otherwise(F.lit(0.0)),
                "y96_qty",
            ),
        )
        .filter(F.col("y96_qty") > F.lit(0.4) * F.col("total_qty"))
        .select("l_suppkey")
    )
    nation = load(spark, "nation", sf_dir).filter(F.col("n_name") == "NATION_4")
    return (
        load(spark, "supplier", sf_dir)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(vol, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def q21_sole_returning_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: NATION_0 suppliers who were the *only* supplier
    with returned lines on a multi-supplier finished order. The
    textbook form is EXISTS (another supplier's line) AND NOT EXISTS
    (another supplier's returned line); here both correlated probes
    collapse into one aggregation per order — count of distinct
    suppliers, count of distinct returning suppliers, and the sole
    returning supplier via a conditional max — which is the shape that
    survives 100 TB (one shuffle on orderkey, no per-row subquery).
    The DuckDB oracle keeps the EXISTS/NOT-EXISTS formulation as an
    independent derivation of the same set."""
    orders = load(spark, "orders", sf_dir).filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    li = load(spark, "lineitem", sf_dir).join(
        orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi"
    )
    returned = F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct(returned).alias("n_ret_supps"),
        F.max(returned).alias("sole_supp"),
    )
    culprit = per_order.filter(
        (F.col("n_supps") > 1) & (F.col("n_ret_supps") == 1)
    )
    nation = load(spark, "nation", sf_dir).filter(F.col("n_name") == "NATION_0")
    supp = (
        load(spark, "supplier", sf_dir)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    return (
        culprit.join(F.broadcast(supp), F.col("sole_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: well-funded customers (balance above the positive
    average across selected nations) who never placed an order,
    bucketed by nation (the stand-in for the phone country code). The
    global average is a broadcast one-row aggregate; "never ordered"
    is a left-anti join on custkey."""
    nations = [1, 3, 5, 7, 9, 11, 13]
    cust = load(spark, "customer", sf_dir).filter(
        F.col("c_nationkey").isin(nations)
    ).select("c_custkey", "c_nationkey", "c_acctbal")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast(_DEC)).cast("double")
            / F.count("c_acctbal")
        ).alias("avg_bal")
    )
    orders = load(spark, "orders", sf_dir).select("o_custkey")
    return (
        cust.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal"), "totacctbal"),
        )
        .orderBy("cntrycode")
    )


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q11_important_stock": q11_important_stock,
    "q12_priority_lines": q12_priority_lines,
    "q13_customer_distribution": q13_customer_distribution,
    "q16_supplier_count": q16_supplier_count,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q20_excess_suppliers": q20_excess_suppliers,
    "q21_sole_returning_supplier": q21_sole_returning_supplier,
    "q22_global_sales_opportunity": q22_global_sales_opportunity,
}

_ORACLE_REV = (
    "cast(sum(cast(cast(l_extendedprice AS decimal(12,4)) "
    "* cast(1 - l_discount AS decimal(6,4)) AS decimal(38,6))) AS double)"
)

ORACLES = {
    "q2_min_cost_supplier": f"""
        WITH ps AS ({_PS_SQL}),
        offers AS (
            SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
                   ps_supplycost AS supplycost
            FROM ps
            JOIN part ON ps_partkey = p_partkey
            JOIN supplier ON ps_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE p_type = 'STANDARD' AND p_size = 15 AND r_name = 'EUROPE'
        )
        SELECT * FROM offers o
        WHERE supplycost = (SELECT min(supplycost) FROM offers i
                            WHERE i.p_partkey = o.p_partkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    "q7_volume_shipping": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               cast(year(l_shipdate) AS integer) AS l_year,
               {_ORACLE_REV} AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= timestamp '1996-01-01'
          AND l_shipdate < timestamp '1998-01-01'
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    "q8_market_share": """
        WITH vols AS (
            SELECT cast(year(o_orderdate) AS integer) AS o_year,
                   cast(cast(l_extendedprice AS decimal(12,4))
                        * cast(1 - l_discount AS decimal(6,4))
                        AS decimal(38,6)) AS vol,
                   n1.n_name AS supp_nation
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            JOIN region ON n2.n_regionkey = r_regionkey
            WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
              AND o_orderdate >= timestamp '1996-01-01'
              AND o_orderdate < timestamp '1998-01-01'
        )
        SELECT o_year,
               cast(sum(CASE WHEN supp_nation = 'NATION_2' THEN vol
                             ELSE cast(0 AS decimal(38,6)) END) AS double)
                   / cast(sum(vol) AS double) AS mkt_share,
               cast(sum(CASE WHEN supp_nation = 'NATION_2' THEN vol
                             ELSE cast(0 AS decimal(38,6)) END) AS double)
                   AS nation_volume,
               cast(sum(vol) AS double) AS total_volume
        FROM vols
        GROUP BY o_year
        ORDER BY o_year
    """,
    "q9_product_profit": """
        SELECT n_name AS nation, cast(year(o_orderdate) AS integer) AS o_year,
               cast(sum(cast(
                   cast(cast(l_extendedprice AS decimal(12,4))
                        * cast(1 - l_discount AS decimal(6,4))
                        AS decimal(38,6))
                   - cast(cast(p_retailprice AS decimal(12,4))
                          * cast(l_quantity AS decimal(12,4))
                          * cast(0.5 AS decimal(2,1)) AS decimal(38,6))
                   AS decimal(38,6))) AS double) AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%bolt%'
        GROUP BY n_name, year(o_orderdate)
        ORDER BY n_name, year(o_orderdate) DESC
    """,
    "q11_important_stock": f"""
        WITH ps AS ({_PS_SQL}),
        nat AS (
            SELECT ps_partkey,
                   cast(ps_supplycost AS decimal(18,4))
                   * cast(ps_qty AS decimal(18,6)) AS value_dec
            FROM ps
            JOIN supplier ON ps_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_3'
        ),
        per_part AS (
            SELECT ps_partkey,
                   sum(cast(value_dec AS decimal(38,6))) AS value_dec
            FROM nat GROUP BY ps_partkey
        )
        SELECT ps_partkey, cast(value_dec AS double) AS value
        FROM per_part
        WHERE value_dec > (SELECT sum(value_dec) * cast(0.001 AS decimal(4,3))
                           FROM per_part)
        ORDER BY value DESC, ps_partkey
    """,
    "q12_priority_lines": """
        SELECT l_linestatus,
               count(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                          THEN 1 END) AS high_line_count,
               count(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                          THEN 1 END) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= timestamp '1996-01-01'
          AND l_shipdate < timestamp '1997-01-01'
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
    "q13_customer_distribution": """
        WITH per_cust AS (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT OUTER JOIN (SELECT o_custkey, o_orderkey FROM orders
                             WHERE o_orderpriority <> '1-URGENT') o
                ON c_custkey = o.o_custkey
            GROUP BY c_custkey
        )
        SELECT c_count, count(*) AS custdist
        FROM per_cust
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "q16_supplier_count": f"""
        WITH ps AS ({_PS_SQL})
        SELECT p_brand, p_type, p_size,
               count(DISTINCT ps_suppkey) AS supplier_cnt
        FROM ps JOIN part ON ps_partkey = p_partkey
        WHERE p_brand <> 'Brand#9' AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "q19_disjunctive_revenue": f"""
        SELECT {_ORACLE_REV} AS revenue, count(*) AS n_lineitems
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE ((p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 5
                AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 10
                AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 20 AND 30))
    """,
    "q20_excess_suppliers": f"""
        WITH vol AS (
            SELECT l_suppkey,
                   {oracle_dsum('l_quantity', 'total_qty')},
                   {oracle_dsum(
                       "CASE WHEN l_shipdate >= timestamp '1996-01-01' "
                       "AND l_shipdate < timestamp '1997-01-01' "
                       "THEN l_quantity ELSE 0.0 END", 'y96_qty')}
            FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part
                                WHERE p_name LIKE 'small%')
            GROUP BY l_suppkey, l_partkey
        )
        SELECT s_suppkey, s_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_4'
          AND s_suppkey IN (SELECT l_suppkey FROM vol
                            WHERE y96_qty > 0.4 * total_qty)
        ORDER BY s_suppkey
    """,
    "q21_sole_returning_supplier": """
        SELECT s_name, count(DISTINCT l1.l_orderkey) AS numwait
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE n_name = 'NATION_0'
          AND o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
    """,
    "q22_global_sales_opportunity": f"""
        WITH cust AS (
            SELECT c_custkey, c_nationkey, c_acctbal
            FROM customer
            WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
        )
        SELECT c_nationkey AS cntrycode, count(*) AS numcust,
               {oracle_dsum('c_acctbal', 'totacctbal')}
        FROM cust
        WHERE c_acctbal > (
                SELECT cast(sum(cast(c_acctbal AS decimal(38,6))) AS double)
                       / count(c_acctbal)
                FROM cust WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_nationkey
        ORDER BY cntrycode
    """,
}
