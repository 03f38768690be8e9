"""URL / domain filtering for web-corpus curation (north star,
BASELINE.json): parse URLs into host / registered domain / TLD / path
and apply blocklist + spam-pattern keep/drop rules.

This is the first stage of every web-scale training-data pipeline
(C4 / RefinedWeb / FineWeb all start with URL filtering): drop
documents whose source URL hits a domain blocklist, a banned TLD, or a
spam path pattern — before any text processing spends cycles on them.

Scale posture (100 TB): everything here is a narrow, codegen-fused
expression — two regexp_extracts to split the URL, literal-array
membership tests for the (small, static) blocklists, one rlike for the
path rule. No join, no shuffle, no Python; the filter runs at scan
speed and, placed before parse/dedup stages, prunes the corpus where
it is cheapest. Blocklists large enough to matter (millions of
domains) would graduate to a broadcast join on `domain` — same plan
shape, still shuffle-free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["url_parts", "domain_filter", "canonicalize_url"]


def url_parts(url: Column) -> dict[str, Column]:
    """Decompose an absolute URL into host, registered domain (last two
    labels), TLD (last label) and path+query. Pure regexp_extract —
    patterns are dialect-portable (verified identical in Java regex,
    RE2 and DuckDB)."""
    host = F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)
    return {
        "host": host,
        "domain": F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1),
        "tld": F.regexp_extract(host, r"\.([^.]+)$", 1),
        "path": F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://[^/?#]+([^#]*)", 1),
    }


def canonicalize_url(url: Column) -> Column:
    """Canonical URL form for dedup/grouping — the normalization every
    web-corpus pipeline applies before URL-level dedup (C4/RefinedWeb):

    - scheme and host lowercased; a leading ``www.`` label dropped;
    - default ports stripped (``:80`` for http, ``:443`` for https);
    - the fragment dropped;
    - ``utm_*`` tracking parameters removed (with separator repair:
      a query left starting with ``&`` gets it flipped back to ``?``);
    - a trailing ``?`` and a trailing slash (non-root path) dropped.

    Pure regexp/substring expressions, portable between Java regex and
    RE2/DuckDB — deliberately NO lookbehind (RE2 has none). Narrow and
    codegen-fused: canonicalization runs at scan speed.
    """
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    hostport = F.regexp_replace(hostport, r"^www\.", "")
    hostport = F.when(
        (scheme == "http"), F.regexp_replace(hostport, r":80$", "")
    ).otherwise(hostport)
    hostport = F.when(
        (scheme == "https"), F.regexp_replace(hostport, r":443$", "")
    ).otherwise(hostport)
    # path+query, fragment dropped
    pq = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1)
    # utm removal in separator-safe order: non-first params carry their
    # own '&' and vanish cleanly; a first param followed by another
    # donates its '?' to the successor; a lone first param takes the
    # '?' with it. No lookbehind, no replace-first — both unportable.
    pq = F.regexp_replace(pq, r"&utm_[^&]*", "")
    pq = F.regexp_replace(pq, r"\?utm_[^&]*&", "?")
    pq = F.regexp_replace(pq, r"\?utm_[^&]*$", "")
    pq = F.regexp_replace(pq, r"\?$", "")
    # trailing-slash normalization on a bare path (no query part)
    pq = F.regexp_replace(pq, r"^(/.+)/$", r"$1")
    return F.concat(scheme, F.lit("://"), hostport, pq)


def domain_filter(
    df: DataFrame,
    url_col: str,
    id_col: str,
    blocked_domains: Sequence[str] = (),
    blocked_tlds: Sequence[str] = (),
    spam_path_re: str | None = None,
) -> DataFrame:
    """Classify each row's URL against the blocklists. Returns
    `(id, host, domain, tld, blocked BOOLEAN, reason STRING)` where
    reason is the FIRST matching rule in fixed precedence order
    (domain > tld > path), NULL when kept.

    The row set is preserved (audit view); callers drop with
    `.filter(~col("blocked"))`.
    """
    p = url_parts(F.col(url_col))
    reason = F.lit(None).cast("string")
    if spam_path_re:
        reason = F.when(p["path"].rlike(spam_path_re), F.lit("path")).otherwise(
            reason
        )
    if blocked_tlds:
        reason = F.when(
            p["tld"].isin(*[t.lower() for t in blocked_tlds]), F.lit("tld")
        ).otherwise(reason)
    if blocked_domains:
        reason = F.when(
            p["domain"].isin(*[d.lower() for d in blocked_domains]),
            F.lit("domain"),
        ).otherwise(reason)
    return df.select(
        F.col(id_col),
        p["host"].alias("host"),
        p["domain"].alias("domain"),
        p["tld"].alias("tld"),
        reason.isNotNull().alias("blocked"),
        reason.alias("reason"),
    )
