"""Web link graph: href extraction, host-level edge aggregation, and
PageRank — the link-structure signals a web corpus pipeline feeds into
crawl prioritization and document quality weighting (cf. the original
PageRank paper and Common Crawl's host-level web graph releases).

Everything before the iterative solve is codegen: link extraction is one
regexp_extract_all + explode, host resolution reuses the urlops
canonicalization expressions, and the edge list is one partial-agged
groupBy. PageRank is the canonical join-loop: each iteration is two
equi-joins + one aggregation, all keyed on the node — co-partitioned under
AQE, nothing driver-side but the node count (one scalar) and the loop
itself (a handful of plan nodes per iteration; at production depth you
checkpoint every few iterations to truncate lineage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pdfsearch_spark.pipeline.urlops import host_expr, url_normalize_expr

# absolute http(s) hrefs only; relative-link resolution needs a base-URL
# join against the page URL and is out of scope for the graph signals here
HREF_RE = 'href="(https?://[^"]+)"'


def extract_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, dst_url): one row per absolute href occurrence. One codegen
    projection + explode — no UDF, no shuffle."""
    return pages.select(
        F.col(url_col).alias("src_url"),
        F.explode(
            F.expr(
                f"regexp_extract_all(cast(coalesce({html_col}, '') as string),"
                f" '{HREF_RE}', 1)"
            )
        ).alias("dst_url"),
    )


def host_graph(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    psl_rules: DataFrame | None = None,
) -> DataFrame:
    """(src_host, dst_host, weight): host-level edge list, self-loops
    dropped (intra-host navigation is not an endorsement signal). Hosts go
    through the same canonicalization as urlops, so 'WWW.X.com:443' and
    'https://x.com' merge. One shuffle (the groupBy), partial-agged.

    When ``psl_rules`` (a ``urlops.load_psl_rules`` frame) is supplied,
    both endpoints are collapsed to their FULL-PSL registrable (apex)
    domain before edge aggregation — the domain-level web graph (cf.
    Common Crawl's host- vs domain-level graph releases), with wildcard
    and exception suffixes resolved correctly instead of via the embedded
    heuristic. Self-loops are re-dropped AFTER apexing (two hosts of one
    registrable domain are intra-site). The PSL resolve is keyed on
    DISTINCT endpoint hosts, so its cost scales with host cardinality,
    not edge cardinality; column names are unchanged so ``pagerank`` /
    ``degree_stats`` compose either way.
    """
    links = extract_links(pages, url_col, html_col)

    def host_of(col: str):
        return host_expr(url_normalize_expr(F.coalesce(F.col(col), F.lit(""))))

    edges = links.select(
        host_of("src_url").alias("src_host"),
        host_of("dst_url").alias("dst_host"),
    ).filter(
        (F.col("src_host") != "")
        & (F.col("dst_host") != "")
        & (F.col("src_host") != F.col("dst_host"))
    )
    if psl_rules is not None:
        from pdfsearch_spark.pipeline.urlops import apex_domain_psl

        hosts = (
            edges.select(F.col("src_host").alias("host"))
            .union(edges.select(F.col("dst_host").alias("host")))
            .distinct()
        )
        amap = apex_domain_psl(hosts, psl_rules, host_col="host").select(
            "host", "apex_domain"
        )
        # two equi-joins on the endpoint host; the map side is host-cardinal
        # (maybe 10^8 rows at crawl scale) so no forced broadcast — AQE
        # picks broadcast when it actually fits
        src_map = amap.select(
            F.col("host").alias("src_host"), F.col("apex_domain").alias("_sa")
        )
        dst_map = amap.select(
            F.col("host").alias("dst_host"), F.col("apex_domain").alias("_da")
        )
        edges = (
            edges.join(src_map, "src_host")
            .join(dst_map, "dst_host")
            .select(
                F.col("_sa").alias("src_host"), F.col("_da").alias("dst_host")
            )
            .filter(F.col("src_host") != F.col("dst_host"))
        )
    return edges.groupBy("src_host", "dst_host").agg(
        F.count("*").alias("weight")
    )


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 3,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    weight_col: str = "weight",
) -> DataFrame:
    """Weighted PageRank over the edge list: rank = (1-d)/N + d * sum over
    in-edges of rank(src) * weight / out_weight(src). The simple
    no-dangling-redistribution variant (mass leaving sink nodes is not
    re-spread, so ranks need not sum to 1 — ordering, which is what quality
    weighting consumes, is unaffected); iterations are rounded to 8 dp so
    the fixpoint trajectory is reproducible across engines and partition
    layouts regardless of float summation order.

    Returns (node, rank). Scale shape per iteration: rank ⋈ edges ⋈
    out-weights on the src key, then one groupBy(dst) with map-side partial
    sums; a mega-hub's in-edges partial-aggregate before the shuffle. Only
    N (one scalar) reaches the driver.
    """
    nodes = (
        edges.select(F.col(src_col).alias("node"))
        .union(edges.select(F.col(dst_col).alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        # a crawl slice with no qualifying hrefs: empty (node, rank) frame,
        # not a ZeroDivisionError
        return nodes.withColumn("rank", F.lit(0.0))
    base = round((1.0 - damping) / n, 8)
    out_w = edges.groupBy(src_col).agg(
        F.sum(F.col(weight_col).cast("double")).alias("_wout")
    )
    rank = nodes.withColumn("rank", F.lit(round(1.0 / n, 8)))
    for _ in range(n_iter):
        contrib = (
            edges.join(rank, edges[src_col] == rank["node"])
            .join(out_w, src_col)
            .select(
                F.col(dst_col).alias("node"),
                (
                    F.col("rank")
                    * F.col(weight_col).cast("double")
                    / F.col("_wout")
                ).alias("c"),
            )
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("_s"))
        rank = nodes.join(sums, "node", "left").select(
            "node",
            F.round(
                F.lit(base) + F.lit(damping) * F.coalesce("_s", F.lit(0.0)), 8
            ).alias("rank"),
        )
    return rank


def degree_stats(edges: DataFrame) -> DataFrame:
    """(host, out_deg, in_deg, out_weight, in_weight): per-host degree
    profile of the host graph — two partial-agged aggregations joined
    full-outer on the host."""
    out = edges.groupBy(F.col("src_host").alias("host")).agg(
        F.count("*").alias("out_deg"),
        F.sum("weight").alias("out_weight"),
    )
    inn = edges.groupBy(F.col("dst_host").alias("host")).agg(
        F.count("*").alias("in_deg"),
        F.sum("weight").alias("in_weight"),
    )
    return out.join(inn, "host", "full_outer").select(
        "host",
        F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
        F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        F.coalesce("out_weight", F.lit(0)).alias("out_weight"),
        F.coalesce("in_weight", F.lit(0)).alias("in_weight"),
    )
