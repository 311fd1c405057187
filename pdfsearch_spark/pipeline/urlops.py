"""URL operations: canonicalization, host / apex-domain extraction, and
per-domain aggregates — the URL hygiene layer of a web-corpus pipeline
(crawl dedup keys on the canonical URL; domain caps and per-site stats key
on the apex domain).

All transforms are chained codegen regexes (no UDF, no shuffle until the
stats groupBy), using only the regex subset Java regex (Spark) and RE2
(the DuckDB oracle) interpret identically: char classes, alternation,
bounded repetition, capture groups — no lookaround, no backrefs in
PATTERNS (replacement backrefs are fine; each engine has its own escape
syntax, $1 vs \\1).

Canonicalization rules (the common subset of RFC 3986 normalization +
crawl-pipeline convention):
- strip the fragment (`#...` never reaches the server);
- lowercase the scheme and authority (case-insensitive per RFC 3986);
  path/query case is PRESERVED (significant on most servers);
- strip default ports (`:80` for http, `:443` for https);
- strip tracking query params (utm_*, fbclid, gclid, msclkid) and tidy
  the leftover separators, preserving all other params in order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# scheme://host[:port] — the case-insensitive prefix of a URL
_AUTH_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"
# A run of tracking params anchored to a real separator. The leading [?&]
# boundary (kept via $1) stops substring hits on legitimate names
# ('?notgclid=5', '?myfbclid=x') and on path text ('/gclid=1'); the
# one-or-more run with a consumed inter-param '&' strips consecutive
# tracking params in a single pass WITHOUT ever synthesizing a '&&'
# (so no separator-collapse step that could touch a literal '&&' in a
# path, where '&' is legal).
_TRACK_RE = (
    "([?&])(?:(?:utm_[a-zA-Z0-9_]+|fbclid|gclid|msclkid)=[^&#]*(?:&|$))+"
)

# Multi-label public suffixes the apex heuristic recognizes. A real crawl
# ships the full public-suffix list as a table; this embedded subset keeps
# the op dependency-free and the rule identical in the SQL oracle.
MULTIPART_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "co.in", "co.nz", "co.kr",
    "com.br", "com.cn", "com.mx", "com.tr",
)

_SUFFIX_ALT = "|".join(s.replace(".", "\\.") for s in MULTIPART_SUFFIXES)


def url_normalize_expr(url: Column) -> Column:
    """The canonical form of `url` as a codegen expression."""
    u = F.regexp_replace(url, "#.*$", "")  # fragment
    pre = F.regexp_extract(u, _AUTH_RE, 1)
    u = F.concat(
        F.lower(pre), F.substring(u, F.length(pre) + F.lit(1), F.lit(2**30))
    )
    u = F.regexp_replace(u, "^(http://[^/?#:]*):80([/?#].*)?$", "$1$2")
    u = F.regexp_replace(u, "^(https://[^/?#:]*):443([/?#].*)?$", "$1$2")
    u = F.regexp_replace(u, _TRACK_RE, "$1")
    u = F.regexp_replace(u, "\\?&", "?")
    return F.regexp_replace(u, "[?&]$", "")


def host_expr(url_norm: Column) -> Column:
    """Hostname of an already-normalized URL ('' when there is none)."""
    return F.regexp_extract(url_norm, "^[a-z][a-z0-9+.-]*://([^/?#:]*)", 1)


def apex_domain_expr(host: Column) -> Column:
    """Registrable ('apex') domain: last two labels, or last three when the
    host ends in a recognized multi-label public suffix; the bare host when
    it has no dot (localhost, IPs are out of scope for the heuristic)."""
    three = F.regexp_extract(host, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    two = F.regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    is_multi = host.rlike(f"(^|\\.)({_SUFFIX_ALT})$")
    picked = F.when(is_multi, three).otherwise(two)
    return F.when(picked == "", host).otherwise(picked)


def load_psl_rules(spark, path: str) -> DataFrame:
    """Parse a public-suffix-list file (publicsuffix.org format) into a
    rules DataFrame (rule string, is_exception boolean, n_labels int):
    comment ('//') and blank lines dropped, '!' exception prefix split off,
    '*.'-wildcard rules kept verbatim. Small (~10k rows) — always the
    broadcast side."""
    lines = spark.read.text(path).select(F.trim(F.col("value")).alias("v"))
    rules = lines.filter(
        (F.col("v") != "") & (~F.col("v").startswith("//"))
    ).select(
        F.regexp_replace(F.col("v"), "^!", "").alias("rule"),
        F.col("v").startswith("!").alias("is_exception"),
    )
    return rules.withColumn("n_labels", F.size(F.split(F.col("rule"), "\\.")))


def apex_domain_psl(
    df: DataFrame, rules: DataFrame, host_col: str = "host"
) -> DataFrame:
    """Adds ``apex_domain`` resolved against a FULL public-suffix list — the
    production path for real crawls, replacing apex_domain_expr's embedded
    16-suffix subset (which stays the dependency-free, oracle-checkable
    default).

    Implements the publicsuffix.org algorithm relationally (plain,
    '*.'-wildcard, and '!'-exception rules; the implicit '*' rule as the
    1-label fallback): each DISTINCT host explodes into its ≤2·L candidate
    lookup keys (every label-suffix for plain/exception rules, and
    '*.'+the-one-shorter-suffix for wildcard rules), joins the broadcast
    rules table, and the prevailing rule — any exception first, else the
    longest match — fixes the public-suffix label count; the apex is one
    label more.

    Scale shape: hosts are deduplicated first (web corpora have ~10^6-10^8
    hosts for 10^12 docs), so the explode ×2L and both small aggregations
    run over host cardinality, not corpus cardinality; the rules side is
    always broadcast, and the final (host, apex_domain) map joins back on
    the host key.
    """
    hosts = df.select(F.col(host_col).alias("_h")).distinct()
    with_l = hosts.withColumn(
        "_labels", F.split(F.col("_h"), "\\.")
    ).withColumn("_L", F.size(F.col("_labels")))
    # candidate i (0-based) = the suffix labels[i:], which matches either a
    # plain/exception rule equal to it, or a wildcard rule '*.'+labels[i+1:]
    # (the '*' consuming label i); both match _n = L - i labels
    keyed = (
        with_l.select(
            "_h", "_L", "_labels",
            F.posexplode(F.col("_labels")).alias("_i", "_lab"),
        )
        .select(
            "_h",
            (F.col("_L") - F.col("_i")).alias("_n"),
            F.explode(
                F.array(
                    F.array_join(
                        F.slice("_labels", F.col("_i") + 1, F.col("_L")), "."
                    ),
                    F.when(
                        F.col("_i") + 1 < F.col("_L"),
                        F.concat(
                            F.lit("*."),
                            F.array_join(
                                F.slice(
                                    "_labels", F.col("_i") + 2, F.col("_L")
                                ),
                                ".",
                            ),
                        ),
                    ),
                )
            ).alias("_key"),
        )
        .filter(F.col("_key").isNotNull())
    )
    matched = keyed.join(
        F.broadcast(rules), keyed["_key"] == rules["rule"], "inner"
    ).select("_h", "_n", "is_exception")
    prevailing = matched.groupBy("_h").agg(
        F.max(F.when(F.col("is_exception"), F.col("_n") - 1)).alias("_exc"),
        F.max(F.when(~F.col("is_exception"), F.col("_n"))).alias("_best"),
    )
    resolved = (
        with_l.join(prevailing, "_h", "left")
        .withColumn(
            "_ps", F.coalesce(F.col("_exc"), F.col("_best"), F.lit(1))
        )
        .select(
            "_h",
            F.when(F.col("_L") > F.col("_ps"), F.array_join(
                F.slice(
                    F.col("_labels"),
                    F.col("_L") - F.col("_ps"),
                    F.col("_ps") + 1,
                ),
                ".",
            )).otherwise(F.col("_h")).alias("apex_domain"),
        )
    )
    return df.join(
        resolved, df[host_col] == resolved["_h"], "left"
    ).drop("_h")


def url_normalize(df: DataFrame, url_col: str = "url") -> DataFrame:
    """(original columns..., url_norm, host, apex_domain) — one codegen
    projection, no shuffle; runs at scan speed and column-prunes."""
    norm = url_normalize_expr(F.coalesce(F.col(url_col), F.lit("")))
    out = df.withColumn("url_norm", norm).withColumn(
        "host", host_expr(F.col("url_norm"))
    )
    return out.withColumn("apex_domain", apex_domain_expr(F.col("host")))


def domain_stats(
    df: DataFrame,
    url_col: str = "url",
    chars_col: str = "n_chars",
    psl_rules: DataFrame | None = None,
) -> DataFrame:
    """Per-apex-domain corpus profile:
    (apex_domain, n_docs, n_hosts, total_chars, n_canonical_urls).

    n_canonical_urls counts distinct canonical URLs — the crawl-dedup
    cardinality; n_docs / n_canonical_urls > 1 means the crawler fetched
    the same canonical page repeatedly (tracking-param explosion).

    When ``psl_rules`` (a ``load_psl_rules`` frame) is supplied, apex
    resolution uses the FULL public-suffix algorithm (``apex_domain_psl``)
    instead of the embedded 16-suffix heuristic — the production path, so a
    caller holding the real PSL can't silently mis-apex multi-label-suffix
    hosts (e.g. 'a.b.test.ck' under '*.ck'). The extra cost is bounded by
    DISTINCT-host cardinality, not corpus cardinality.

    Scale shape: one partial-agged shuffle on apex_domain; the two distinct
    counts ride the same exchange (Spark plans multi-distinct aggregates
    with an expand, still a single shuffle stage family, no extra pass
    over the input).
    """
    enriched = url_normalize(df, url_col)
    if psl_rules is not None:
        enriched = apex_domain_psl(
            enriched.drop("apex_domain"), psl_rules, host_col="host"
        )
    return enriched.groupBy("apex_domain").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("host").alias("n_hosts"),
        F.sum(F.col(chars_col).cast("long")).alias("total_chars"),
        F.countDistinct("url_norm").alias("n_canonical_urls"),
    )
