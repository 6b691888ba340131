"""Extended TPC-H-shaped relational coverage (Q7-Q22 adapted).

The reference has no relational operators at all (SURVEY.md
§2.3-2.7); these queries exist to demonstrate that the full
join/agg/subquery surface a go-integ user would run *downstream* of
extraction is first-class here, expressed Spark-first:

- fixed-cardinality dims (nation 25 rows, region 5) are explicitly
  broadcast; SF-scaled dims (part, supplier) are left to AQE, which
  broadcasts them while they fit and shuffles when they don't —
  the right call at 100 TB where `part` is no longer small;
- correlated subqueries (Q17's per-part average, Q22's global
  average, Q15's max) are written as explicit decorrelations:
  a separate aggregate joined back (broadcast when scalar), which is
  exactly the plan Catalyst would rewrite to — but stated, so the
  shuffle structure is visible and testable;
- every aggregate output is aliased + rounded identically in the
  DuckDB oracle so the driver's value-hash compare is byte-stable.

The driver schema differs from stock TPC-H (no partsupp, no
l_shipmode/l_commitdate, no o_comment/c_phone); queries are adapted
to the columns that exist, keeping each original's *plan shape*.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_integ_spark.registry import register
from go_integ_spark.tables import load_table

def _disc_price() -> "F.Column":
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _ts(s: str) -> F.Column:
    return F.lit(s + " 00:00:00").cast("timestamp")


@register(
    "q7_volume_shipping",
    bench=True,
    tags=("join", "agg"),
    oracle="""
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
FROM (
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
           l_extendedprice * (1 - l_discount) AS volume
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume by
    year. The two nation joins are broadcasts (25 rows each), and the
    nation filter cuts supplier/customer *before* the fact joins, so
    the lineitem shuffle only carries rows for the two nations.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("s_nk"),
    )
    c = load_table(spark, sf_dir, "customer").join(
        F.broadcast(n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("c_nk"),
    )
    return (
        s.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(_disc_price()), 2).alias("revenue"))
    )


@register(
    "q8_market_share",
    tags=("join", "agg", "case"),
    oracle="""
SELECT o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
             / sum(volume), 4) AS mkt_share
FROM (
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           l_extendedprice * (1 - l_discount) AS volume,
           n2.n_name AS supp_nation
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region   ON n1.n_regionkey = r_regionkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
) all_nations
GROUP BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of PROMO-part volume sold
    into one region, per year. The selective part filter (1/6 of
    parts) drives the join order; nation/region broadcast; the
    conditional share is a single pass (two sums, one CASE).
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(nat)
    r = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    )
    n2 = F.broadcast(
        nat.select(
            F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
        )
    )
    volume = _disc_price()
    nation_volume = F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(F.lit(0.0))
    return (
        p.join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(n2, F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(nation_volume) / F.sum(volume), 4).alias("mkt_share"))
    )


@register(
    "q9_product_profit",
    tags=("join", "agg"),
    oracle="""
SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
FROM (
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           l_extendedprice * (1 - l_discount) AS amount
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%bolt%'
) profit
GROUP BY nation, o_year
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (profit = discounted price; the schema has no
    partsupp/supplycost). part filters by name pattern — a scan-side
    StringContains pushdown — then joins up the fact chain; the final
    agg has nation x year cardinality (~175 groups), so partial
    aggregation collapses everything map-side.
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("bolt"))
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        p.join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(_disc_price()), 2).alias("sum_profit"))
    )


@register(
    "q13_customer_distribution",
    bench=True,
    tags=("join", "outer", "agg"),
    oracle="""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
    SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
) c_orders
GROUP BY c_count
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: orders-per-customer histogram including
    zero-order customers (left outer join, count of non-null keys).
    Two shuffles: the outer join on custkey and the tiny histogram
    regroup — the first agg reuses the join's hash partitioning, so
    Catalyst elides the exchange between join and count.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q14_promo_effect",
    tags=("join", "agg", "case"),
    oracle="""
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
""",
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: PROMO share of one month's revenue. The
    shipdate window pushes into the scan; part joins on partkey (AQE
    broadcasts it while it fits, shuffles at scale factors where a
    200k-rows-per-SF dim no longer does).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-09-01")) & (F.col("l_shipdate") < _ts("1997-10-01"))
    )
    p = load_table(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(F.lit(0.0))
    return li.join(p, F.col("l_partkey") == F.col("p_partkey")).agg(
        F.round(100.0 * F.sum(promo) / F.sum(_disc_price()), 4).alias("promo_revenue")
    )


@register(
    "q15_top_supplier",
    tags=("join", "agg", "subquery"),
    oracle="""
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with max quarterly revenue.
    The scalar max is decorrelated to a 1-row aggregate and
    broadcast-cross-joined back — no driver collect, no second scan
    of lineitem. Revenue is rounded *before* the max comparison on
    both sides so float ULPs can't flip equality.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01")) & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    # revenue feeds the scalar-max branch AND the final join; persist
    # so lineitem is scanned/shuffled once, as the docstring promises.
    from go_integ_spark.functions.cache import cached_persist

    rev_base = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_disc_price()), 2).alias("total_revenue")
    )
    revenue = cached_persist("q15_revenue", rev_base, lambda: rev_base)
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(top), F.col("total_revenue") == F.col("max_revenue"))
        .join(s, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_quantity_revenue",
    tags=("join", "agg", "subquery"),
    oracle="""
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (
    SELECT l_partkey AS avg_partkey, 0.5 * avg(l_quantity) AS qty_cut
    FROM lineitem GROUP BY l_partkey
) part_avg ON avg_partkey = p_partkey
WHERE p_brand = 'Brand#23' AND l_quantity < qty_cut
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders of one
    brand. The correlated per-part average is decorrelated by hand:
    one groupBy over lineitem, joined back on partkey. Both that agg
    and the join shuffle on l_partkey — one partitioning, reused.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    part_avg = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (0.5 * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(part_avg, F.col("avg_partkey") == F.col("p_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q18_large_volume_customers",
    bench=True,
    tags=("join", "agg", "having"),
    oracle="""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       round(sum(l_quantity), 2) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey HAVING sum(l_quantity) > 150
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
""",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a
    threshold, with their customers. The HAVING subquery is a
    semi-join against a pre-aggregated lineitem — the agg and the
    semi-join share the l_orderkey partitioning; the filtered key set
    is small, so AQE turns the IN into a broadcast semi-join.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tot_qty"))
        .filter(F.col("tot_qty") > 150)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        o.join(big, F.col("o_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


@register(
    "q19_disjunctive_predicates",
    tags=("join", "scan"),
    oracle="""
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
""",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of brand/size/quantity clauses
    across the join. Catalyst extracts the common single-table parts
    (brand IN (...), size <= 35, quantity bounds) and pushes them
    below the join as scan filters; the residual disjunction runs
    post-join in codegen.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    clause = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(clause)
        .agg(F.round(F.sum(_disc_price()), 2).alias("revenue"))
    )


@register(
    "q2_min_cost_supplier",
    tags=("join", "subquery", "topk"),
    oracle="""
WITH cost AS (
    SELECT l_partkey, l_suppkey,
           round(min(l_extendedprice / l_quantity), 2) AS unit_cost
    FROM lineitem GROUP BY l_partkey, l_suppkey
),
eu AS (
    SELECT s_suppkey, s_name, s_acctbal, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
),
mc AS (
    SELECT l_partkey AS mp, min(unit_cost) AS min_cost
    FROM cost JOIN eu ON l_suppkey = s_suppkey GROUP BY l_partkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
FROM part JOIN cost ON p_partkey = l_partkey
JOIN eu ON l_suppkey = s_suppkey
JOIN mc ON mp = p_partkey AND unit_cost = min_cost
WHERE p_size = 15
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (no partsupp in this schema: supply cost =
    cheapest observed unit price in lineitem). The correlated min is
    a per-part WINDOW min over the (part, supplier) unit-cost frame,
    applied after the selective part filter — one pass over the
    lineitem-agg + supplier-chain lineage (the r12 join-back-to-own-
    aggregate form computed it twice; equivalence pinned in
    tests/test_round13_opt.py). Supplier dim is filtered through
    broadcast nation/region *before* touching the fact, so the
    lineitem agg is the only big shuffle; the final ORDER BY ...
    LIMIT is TakeOrderedAndProject (no global sort). Unit cost is
    rounded before the min / equality so ULP noise can't flip the
    argmin.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.min(F.col("l_extendedprice") / F.col("l_quantity")), 2).alias("unit_cost")
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # eu is an SF-scaled supplier subset: no hint, AQE decides
    eu_cost = cost.join(eu, F.col("l_suppkey") == F.col("s_suppkey"))
    # r13 restructure (result-identical, oracle unchanged): the r12
    # form joined eu_cost back to its own per-part min aggregate, so
    # the whole lineitem-agg + supplier-chain lineage was computed
    # TWICE (the before-plan scans every table twice — guide §1.2
    # step 1). The per-part min is a window over the same frame —
    # one pass — and restricting to p_size=15 parts FIRST is valid
    # because the min is per-part (dropping other parts cannot change
    # it), which also shrinks the window input by the part-filter
    # selectivity. 2 full lineage passes -> 1, and the window sees
    # only surviving parts.
    from pyspark.sql import Window

    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    w = Window.partitionBy("l_partkey")
    return (
        eu_cost.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q11_important_part_value",
    tags=("join", "agg", "having", "subquery"),
    oracle="""
WITH pv AS (
    SELECT l_partkey,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS cents
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_1'
    GROUP BY l_partkey
)
SELECT l_partkey AS p_key, cents / 100.0 AS part_value
FROM pv
WHERE cents::HUGEINT * (SELECT CAST(count(*) AS BIGINT) FROM pv)
      > 2 * (SELECT sum(cents)::HUGEINT FROM pv)
""",
)
def q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (value from lineitem revenue — no partsupp):
    per-part value for one nation's suppliers, HAVING value above a
    fraction of the nation total. The scalar threshold is the pv
    aggregate re-aggregated to one row and broadcast; pv is
    PERSISTED so the threshold branch and the probe branch share one
    lineitem scan/shuffle (Catalyst does not reuse the exchange
    across the two subtrees on its own).

    Value is computed in INTEGER CENTS (per-row round once, exact
    int64 sums) and the HAVING is the pure integer comparison
    ``cents * n_parts > 2 * total_cents`` (value above twice the
    average part value) — order-free and engine-exact, where the
    previous end-rounded float sum flipped a .xx5 boundary the
    moment a join-strategy change reordered the summation. The
    2x-average threshold is also scale-INVARIANT (q20's principle):
    a fixed fraction of the grand total empties as part cardinality
    grows with SF. The one-nation supplier subset is SF-scaled, so
    it carries no broadcast hint — AQE broadcasts it while it fits.
    """
    li = load_table(spark, sf_dir, "lineitem")
    n1 = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    pv = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.round(_disc_price() * 100).cast("bigint")).alias("cents")
        )
    )
    from go_integ_spark.functions.cache import cached_persist

    pv = cached_persist("q11_pv", pv, lambda frame=pv: frame)
    thresh = pv.agg(
        F.sum("cents").alias("total_cents"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        # decimal products (oracle twin: HUGEINT): revenue skew can
        # push one part's cents past 2^63/n_parts, silently flipping
        # the HAVING in int64 while DuckDB errors (r7 review)
        pv.join(
            F.broadcast(thresh),
            F.col("cents").cast("decimal(38,0)") * F.col("n_parts")
            > 2 * F.col("total_cents").cast("decimal(38,0)"),
        )
        .select(
            F.col("l_partkey").alias("p_key"),
            (F.col("cents") / 100.0).alias("part_value"),
        )
    )


@register(
    "q12_priority_shipping",
    tags=("join", "agg", "case"),
    oracle="""
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
""",
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (no l_shipmode/commitdate: the category is
    l_returnflag, "late" is shipped 60+ days after ordering). The
    year window pushes into the lineitem scan; the cross-table
    lateness predicate runs post-join in codegen; the agg is one
    pass with two CASE sums over 3 groups — fully map-side.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q16_supplier_part_count",
    tags=("join", "antijoin", "agg", "distinct"),
    oracle="""
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#23' AND p_size IN (1, 5, 10, 15, 20, 25)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per part segment,
    excluding flagged suppliers (acctbal < 0 stands in for the
    comment-scan — the schema has no s_comment). The NOT IN is a
    broadcast left-anti join (the exclusion list is tiny); part is
    filtered before the join so only qualifying segments shuffle;
    countDistinct expands to the standard two-phase partial-distinct
    aggregate — no single-point distinct.
    """
    li = load_table(spark, sf_dir, "lineitem")
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#23") & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
    )
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@register(
    "q20_promotion_candidates",
    tags=("join", "semijoin", "subquery", "having"),
    oracle="""
WITH shipped AS (
    SELECT l_suppkey, sum(l_quantity) AS qty
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
    SELECT l_suppkey FROM shipped
    WHERE qty > (SELECT 1.2 * avg(qty) FROM shipped)
)
""",
)
def q20_promotion_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved disproportionate volume
    of one part family in one year — nested IN subqueries become a
    chain of semi-joins. The part-name filter broadcasts into a
    semi-join on the scan side; the per-supplier agg feeds both the
    scalar average (broadcast back) and the final semi-join into
    supplier. The 1.2x-of-average threshold is scale-invariant, so
    the query returns a meaningful slice at any SF (a fixed quantity
    cutoff would be empty at sf0.001 and all-pass at sf10).
    l_quantity is integral, so the sums/average compare exactly.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    red = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("red")).select(
        "p_partkey"
    )
    shipped = (
        li.join(red, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    cut = shipped.agg((1.2 * F.avg("qty")).alias("cut"))
    heavy = shipped.join(F.broadcast(cut), F.col("qty") > F.col("cut")).select("l_suppkey")
    s = load_table(spark, sf_dir, "supplier")
    return s.join(
        F.broadcast(heavy), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name")


@register(
    "q21_late_supplier_wait",
    tags=("join", "agg", "exists"),
    oracle="""
WITH lo AS (
    SELECT l_orderkey, l_suppkey,
           CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                THEN 1 ELSE 0 END AS late
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
),
per_supp AS (
    SELECT l_orderkey, l_suppkey, max(late) AS late
    FROM lo GROUP BY l_orderkey, l_suppkey
),
per_order AS (
    SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late
    FROM per_supp GROUP BY l_orderkey
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM per_supp
JOIN per_order USING (l_orderkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE late = 1 AND n_supp > 1 AND n_late = 1
GROUP BY s_name
""",
)
def q21_late_supplier_wait(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the *sole* late shipper
    on a multi-supplier finished order (lateness = shipped 90+ days
    after ordering; the schema has no commit/receipt dates). The
    EXISTS / NOT EXISTS pair is decorrelated into per-order counts
    (suppliers on the order, late suppliers on the order) computed as
    a window over the (orderkey, suppkey) rollup — NOT a separate
    aggregate branch, which would make Catalyst duplicate the whole
    lineitem⋈orders subtree and scan the fact twice. One scan, one
    join, one agg shuffle, one narrow window re-shuffle whose
    partitions are per-order supplier lists (bounded, tiny). At
    100 TB the classic 4-scan EXISTS formulation is the difference
    between one fact scan and four.
    """
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    lo = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        F.when(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), 1
        )
        .otherwise(0)
        .alias("late"),
    )
    per_supp = lo.groupBy("l_orderkey", "l_suppkey").agg(F.max("late").alias("late"))
    w = Window.partitionBy("l_orderkey")
    counted = per_supp.select(
        "l_orderkey",
        "l_suppkey",
        "late",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.sum("late").over(w).alias("n_late"),
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        counted.filter(
            (F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1)
        )
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q22_idle_customers",
    tags=("antijoin", "agg", "subquery"),
    oracle="""
SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM (
    SELECT c_nationkey % 5 AS cntrycode, c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
) custsale
GROUP BY cntrycode
""",
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: country code = nationkey%5 since the
    schema has no c_phone, and "idle" = no order since 1999 since
    every synthetic customer has some order). The scalar average
    broadcasts; the NOT EXISTS is a left-anti join on custkey against
    the date-filtered orders; the final agg has 5 groups.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("1999-01-01")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy((F.col("c_nationkey") % 5).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )
