"""Web-corpus URL operators: canonicalization and URL-level dedup.

Every web-scale corpus (CommonCrawl/C4/RefinedWeb) dedups by URL
before any content pass -- the same page is crawled under dozens of
surface forms (case-varying hosts, default ports, trailing slashes,
tracking parameters, reordered query strings, fragments). Canonical
form here:

  1. drop the fragment (``#...``)
  2. lowercase scheme and host; optionally strip a leading ``www.``
  3. strip the scheme's default port (``:80`` http / ``:443`` https)
  4. strip ONE trailing slash from the path (root ``/`` == empty)
  5. drop tracking parameters (``utm_*`` prefixes + exact names like
     fbclid/gclid), sort the surviving query parameters, and rebuild

Pure JVM string/array expressions end-to-end (split_part, filter,
array_sort) -- zero Python, zero shuffle until the dedup aggregation,
so the kernel runs unchanged over 100 TB of crawl metadata. The dedup
itself is the skew-safe ``groupBy(canon).agg(min(struct(...)))`` +
join shape (map-side combinable; a mega-duplicated URL never sorts in
one task).

Reference parity: the reference's URL handling is pandas str kernels
(bodo/hiframes/series_str_impl.py); the canonicalize/dedup protocol
itself is from the public web-corpus literature (Raffel et al. 2020
C4; Penedo et al. 2023 RefinedWeb).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["canonicalize_url", "url_dedup"]

TRACKING_PREFIXES = ("utm_",)
TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "ref", "igshid",
                   "mc_cid", "mc_eid")


def canonicalize_url(url: Column | str, *, strip_www: bool = False,
                     tracking_prefixes: tuple = TRACKING_PREFIXES,
                     tracking_params: tuple = TRACKING_PARAMS) -> Column:
    """Canonical form of an absolute http(s) URL (see module doc).
    A second literal ``?`` in a URL is treated as a separator (RFC
    3986 forbids it unencoded). Deterministic: the surviving query
    params are sorted lexicographically (binary collation in both
    engines)."""
    u = F.col(url) if isinstance(url, str) else url
    nofrag = F.split_part(u, F.lit("#"), F.lit(1))
    base = F.split_part(nofrag, F.lit("?"), F.lit(1))
    qs = F.when(F.contains(nofrag, F.lit("?")),
                F.split_part(nofrag, F.lit("?"), F.lit(2))).otherwise("")
    scheme = F.lower(F.split_part(base, F.lit("://"), F.lit(1)))
    rest = F.substring(base, F.length(scheme) + 4, F.lit(2 ** 30))
    hostport = F.lower(F.split_part(rest, F.lit("/"), F.lit(1)))
    path = F.substring(rest, F.length(hostport) + 1, F.lit(2 ** 30))
    host = (F.when(scheme == "http",
                   F.regexp_replace(hostport, ":80$", ""))
            .when(scheme == "https",
                  F.regexp_replace(hostport, ":443$", ""))
            .otherwise(hostport))
    if strip_www:
        host = F.regexp_replace(host, "^www\\.", "")
    path = F.regexp_replace(path, "/$", "")
    params = F.filter(
        F.split(qs, "&"),
        lambda p: (p != "") & ~_is_tracking(p, tracking_prefixes,
                                            tracking_params))
    qpart = F.when(F.size(params) > 0,
                   F.concat(F.lit("?"),
                            F.array_join(F.array_sort(params), "&"))
                   ).otherwise("")
    return F.concat(scheme, F.lit("://"), host, path, qpart)


def _is_tracking(p: Column, prefixes: tuple, names: tuple) -> Column:
    name = F.split_part(p, F.lit("="), F.lit(1))
    cond = F.lit(False)
    for pre in prefixes:
        cond = cond | name.startswith(pre)
    if names:
        cond = cond | name.isin(*names)
    return cond


def url_dedup(df: DataFrame, *, url_col: str = "url",
              id_col: str = "doc_id", score_col: str | None = None,
              canon_col: str = "canon_url",
              **canon_kwargs) -> DataFrame:
    """Keep ONE row per canonical URL: the highest ``score_col`` (ties
    to the lowest id), or the lowest id when no score is given.
    Returns the surviving rows of ``df`` plus the ``canon_col`` column.

    Plan: canonicalize (per-row expression), ONE map-side-combinable
    ``groupBy(canon).agg(min(struct(...)))``, and a broadcast-able
    winners join back on the id -- no window, so a URL duplicated
    millions of times (the crawl-frontier hot key) reduces on the map
    side instead of sorting in one task."""
    keyed = df.withColumn(
        canon_col, canonicalize_url(F.col(url_col), **canon_kwargs))
    if score_col is not None:
        pick = F.struct((-F.col(score_col)).alias("s"),
                        F.col(id_col).alias("i"))
    else:
        pick = F.struct(F.col(id_col).alias("i"))
    winners = (keyed.groupBy(canon_col)
               .agg(F.min(pick).alias("_w"))
               .select(F.col("_w.i").alias(id_col)))
    return keyed.join(winners, id_col, "semi")
