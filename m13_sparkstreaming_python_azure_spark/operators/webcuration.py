"""Web-corpus curation: URL normalization, domain extraction, per-domain
caps and blocklist filtering — the C4/RefinedWeb-style front half of a
web-scale training-data pipeline (cf. the dedup/quality back half in
operators/dedup.py and operators/text.py).

Everything here is JVM string expressions folded into the scan projection
(no Python, no shuffle except the per-domain cap's single window shuffle),
so at 100 TB these run at scan speed:

- ``normalize_url`` / ``extract_host`` / ``registered_domain`` are pure
  regexp/split column expressions — exact-URL dedup keys and domain
  grouping keys come out of the same scan that reads the text.
- ``per_domain_cap`` is one hash-partitioned window (count-based limit per
  domain) — Spark ≥3.5 plans the rank filter as WindowGroupLimit, so each
  partition keeps only ``cap`` rows per domain before the final shuffle.
- ``blocklist_filter`` broadcasts the blocklist (domain blocklists are
  thousands of rows, never corpus-sized) as a left-anti join.

Registered-domain extraction uses the last-two-labels heuristic; a real
deployment swaps in the public-suffix list (a ~10k-entry broadcast map)
— the seam is the same broadcast join, so the 100 TB shape is unchanged.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_url(url: Column) -> Column:
    """Canonical URL for exact-URL dedup: lowercase, scheme dropped,
    query string / fragment dropped, trailing slash trimmed."""
    u = F.lower(url)
    u = F.regexp_replace(u, r"^[a-z][a-z0-9+.-]*://", "")
    u = F.regexp_replace(u, r"[?#].*$", "")
    return F.regexp_replace(u, r"/$", "")


def extract_host(url: Column) -> Column:
    """Hostname of a URL (text between scheme and first /, :, ?, #)."""
    return F.regexp_extract(
        F.lower(url), r"^(?:[a-z][a-z0-9+.-]*://)?([^/:?#]+)", 1
    )


def registered_domain(host: Column) -> Column:
    """Last two dot-labels of the host ('cdn.news.example.com' →
    'example.com'). Public-suffix-list accuracy is a broadcast-map swap —
    see module docstring."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(n <= 2, F.concat_ws(".", parts)).otherwise(
        F.concat_ws(
            ".", F.element_at(parts, -2), F.element_at(parts, -1)
        )
    )


def blocklist_filter(
    df: DataFrame,
    domain_col: str,
    blocklist: Sequence[str] | DataFrame,
) -> DataFrame:
    """Drop rows whose domain is blocklisted. A literal list compiles to a
    NOT-isin scan predicate; a DataFrame blocklist becomes a broadcast
    left-anti join (the form that scales to real blocklists)."""
    if isinstance(blocklist, DataFrame):
        bl = blocklist.select(F.col(blocklist.columns[0]).alias(domain_col))
        return df.join(F.broadcast(bl), on=domain_col, how="left_anti")
    return df.filter(~F.col(domain_col).isin(list(blocklist)))


def per_domain_cap(
    df: DataFrame,
    domain_col: str,
    order_cols: Sequence[Column],
    cap: int,
) -> DataFrame:
    """Keep at most ``cap`` rows per domain, best-first by ``order_cols``
    (pass a deterministic total order). One window shuffle; the rank
    filter plans as WindowGroupLimit (per-partition top-``cap`` before the
    exchange) on Spark ≥3.5."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(domain_col).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


# query parameters that only identify the CLICK, not the resource —
# stripping them is what makes URL dedup merge real duplicates without
# over-merging distinct pages (C4/CCNet-style URL canonicalization)
TRACKING_PARAM_RE = (
    r"^(utm_[a-z0-9]+|fbclid|gclid|msclkid|mc_cid|mc_eid|ref|igshid)$"
)


def canonicalize_url(url: Column) -> Column:
    """Parameter-aware URL canonicalization (vs ``normalize_url``, which
    drops the whole query string): lowercase host, strip default ports
    (:80/:443), drop the fragment, strip TRACKING params but KEEP
    meaningful ones, sort surviving params, trim trailing slashes.
    Pure JVM string expressions — runs at scan speed; the DuckDB oracle
    mirrors each regexp verbatim."""
    rest = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?#]+)", 1))
    host = F.regexp_replace(hostport, r":(80|443)$", "")
    path = F.regexp_replace(
        F.regexp_extract(rest, r"^[^/?#]+([^?#]*)", 1), r"/+$", ""
    )
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~F.element_at(F.split(F.lower(p), "="), 1).rlike(
                TRACKING_PARAM_RE
            ),
        )
    )
    qs = F.concat_ws("&", params)
    return F.concat(
        host,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
