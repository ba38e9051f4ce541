"""URL canonicalization — the first gate of every web-corpus pipeline.

Crawl URLs arrive in mixed case, with default ports, `www.` prefixes,
tracking parameters and fragments; dedup/provenance joins need ONE
canonical spelling per resource plus the registered domain (the
public-suffix-aware site key that per-domain caps and mixture weights
group by). Everything here is built-in column expressions — lower /
substring_index / split / filter / array_sort / array_join — so the
whole canonicalization runs inside whole-stage codegen on the JVM: no
UDF, no Python worker, no shuffle (reference parity: the reference has
no URL handling at all — its keys are opaque strings passed through
`Search.cpp`; this is tier-2 engine-extension surface like the rest of
the text-pipeline family).

Canonicalization rules (the common subset of the Safe Browsing /
crawler conventions, applied by BOTH the Spark side and the DuckDB
oracle from the raw URL string independently):

1. drop the fragment (`#...`);
2. lowercase the scheme and the authority;
3. strip one leading `www.` label;
4. drop the port when it is the scheme default (http:80, https:443),
   keep any other explicit port;
5. drop tracking query parameters (`utm_*`, `ref=...`), sort the
   surviving parameters bytewise, drop the `?` when none survive;
6. the registered domain is the last two host labels, or the last
   THREE when the last two form a multi-label public suffix (the
   fixture suffix set: example.com / archive.test — the co.uk shape).

At 100 TB the suffix set is a broadcast dim table; here it is two
literals folded into the expression (the same plan shape: a codegen'd
lookup, never a shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Multi-label public suffixes the fixtures exercise (the real list is
# ~10k entries and ships as a broadcast table; the RULE is identical).
MULTI_LABEL_SUFFIXES = ("example.com", "archive.test")


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append canonical-URL columns derived ONLY from the raw string in
    `url_col`: host, registered_domain, canonical_url, path_depth,
    kept_params. Pure codegen expressions — no UDF, no shuffle."""
    u = F.col(url_col)
    no_frag = F.substring_index(u, "#", 1)
    df = (
        df.withColumn("_scheme", F.lower(F.substring_index(no_frag, "://", 1)))
        .withColumn("_rest", F.substring_index(no_frag, "://", -1))
        # the authority ends at the first '/' OR '?' (a query can follow
        # the authority with no path); least() skips the NULLified
        # zero-positions, so _cut is NULL only for authority-only URLs
        .withColumn(
            "_cut",
            F.expr(
                "least(nullif(instr(_rest, '/'), 0),"
                " nullif(instr(_rest, '?'), 0))"
            ),
        )
        .withColumn(
            "_auth",
            F.lower(
                F.expr(
                    "case when _cut is null then _rest"
                    " else substring(_rest, 1, _cut - 1) end"
                )
            ),
        )
        # path + query; URLs with no path canonicalize to path '/' —
        # without the guard, substring(_rest, 0) would echo the whole
        # rest and double the host into the path
        .withColumn(
            "_pathq",
            F.expr(
                "case when _cut is null then '/' "
                "when substring(_rest, _cut, 1) = '?' "
                "then '/' || substring(_rest, _cut) "
                "else substring(_rest, _cut) end"
            ),
        )
        .withColumn(
            "_host0",
            F.when(
                F.instr("_auth", ":") > 0, F.substring_index("_auth", ":", 1)
            ).otherwise(F.col("_auth")),
        )
        .withColumn(
            "_port",
            F.when(
                F.instr("_auth", ":") > 0, F.substring_index("_auth", ":", -1)
            ),
        )
        .withColumn(
            "host",
            F.when(
                F.col("_host0").startswith("www."),
                F.expr("substring(_host0, 5)"),
            ).otherwise(F.col("_host0")),
        )
        .withColumn(
            "_keep_port",
            F.col("_port").isNotNull()
            & ~(
                ((F.col("_scheme") == "http") & (F.col("_port") == "80"))
                | ((F.col("_scheme") == "https") & (F.col("_port") == "443"))
            ),
        )
        .withColumn("_path", F.substring_index("_pathq", "?", 1))
        .withColumn(
            "_params",
            F.when(
                F.instr("_pathq", "?") > 0,
                F.filter(
                    F.split(F.substring_index("_pathq", "?", -1), "&"),
                    lambda p: ~p.startswith("utm_") & ~p.startswith("ref="),
                ),
            ).otherwise(F.array().cast("array<string>")),
        )
        .withColumn("_qs", F.array_join(F.array_sort("_params"), "&"))
        .withColumn("kept_params", F.size("_params").cast("bigint"))
        .withColumn(
            "path_depth",
            F.size(
                F.filter(F.split("_path", "/"), lambda s: s != F.lit(""))
            ).cast("bigint"),
        )
        .withColumn("_labels", F.split("host", "[.]"))
        .withColumn("_n", F.size("_labels"))
        # a single-label host (e.g. 'localhost') IS its registered
        # domain; element_at(_labels, 0) would error under ANSI mode
        .withColumn(
            "_last2",
            F.when(
                F.col("_n") >= 2,
                F.concat_ws(
                    ".",
                    F.element_at("_labels", F.col("_n") - 1),
                    F.element_at("_labels", F.col("_n")),
                ),
            ).otherwise(F.col("host")),
        )
        .withColumn(
            "registered_domain",
            F.when(
                F.col("_last2").isin(*MULTI_LABEL_SUFFIXES)
                & (F.col("_n") >= 3),
                F.concat_ws(
                    ".",
                    F.element_at("_labels", F.col("_n") - 2),
                    F.col("_last2"),
                ),
            ).otherwise(F.col("_last2")),
        )
        .withColumn(
            "canonical_url",
            F.concat(
                F.col("_scheme"),
                F.lit("://"),
                F.col("host"),
                F.when(
                    F.col("_keep_port"), F.concat(F.lit(":"), F.col("_port"))
                ).otherwise(F.lit("")),
                F.col("_path"),
                F.when(
                    F.col("_qs") != "", F.concat(F.lit("?"), F.col("_qs"))
                ).otherwise(F.lit("")),
            ),
        )
    )
    return df.drop(
        "_scheme", "_rest", "_cut", "_auth", "_pathq", "_host0", "_port",
        "_keep_port", "_path", "_params", "_qs", "_labels", "_n", "_last2",
    )
