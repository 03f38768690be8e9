"""Prioritized-regex User-Agent classification.

Access-log analytics (the reference's domain — its ROUTERACCESS grok
pattern captures the raw UA string from CloudFront/router logs,
``grok.go`` app patterns) classifies UA strings into browser family +
major version + a bot flag. The well-known subtlety is that matching
is PRIORITY-ORDERED, not independent: Edge advertises ``Chrome/...``
(so Edge must match before Chrome), Chrome advertises ``Safari/...``
(so Chrome before Safari), and bots advertise ``Mozilla/5.0`` (so bot
signatures match first).

Spark-first: the rule table compiles into ONE chained ``CASE WHEN
rlike`` + per-family ``regexp_extract`` expression — pure JVM
whole-stage-codegen, no Python in the hot path, no join, no shuffle.
Rules are data (ordered tuples), so a custom rule set drops in without
code changes; the default table covers the families a weblog actually
sees.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["UA_RULES", "classify_ua", "with_ua_class"]

# (family, detect_regex, version_regex-with-one-group-or-None, is_bot)
# ORDER MATTERS — first match wins.
UA_RULES: tuple[tuple[str, str, str | None, bool], ...] = (
    ("googlebot", "Googlebot", r"Googlebot/([0-9]+)", True),
    ("curl", "^curl/", r"^curl/([0-9]+)", True),
    ("python-requests", "^python-requests/", r"^python-requests/([0-9]+)", True),
    # Edge BEFORE Chrome: its UA contains Chrome/
    ("edge", "Edg/", r"Edg/([0-9]+)", False),
    ("chrome", "Chrome/", r"Chrome/([0-9]+)", False),
    ("firefox", "Firefox/", r"Firefox/([0-9]+)", False),
    # Safari AFTER Chrome: Chrome's UA contains Safari/
    ("safari", "Safari/", r"Version/([0-9]+)", False),
)


def classify_ua(ua: Column) -> tuple[Column, Column, Column]:
    """``(family, major_version, is_bot)`` columns for a UA string
    column. Unmatched / empty UAs classify as ``('other', NULL,
    false)``. major_version is NULL when the family has no version
    capture or the capture is absent."""
    family: Column | None = None
    version: Column | None = None
    bot: Column | None = None
    for fam, detect, ver_re, is_bot in UA_RULES:
        hit = ua.rlike(detect)
        fam_c = F.lit(fam)
        # regexp_extract returns '' on no match — surface NULL instead
        ver_c = (
            F.nullif(F.regexp_extract(ua, ver_re, 1), F.lit("")).cast("int")
            if ver_re
            else F.lit(None).cast("int")
        )
        bot_c = F.lit(is_bot)
        if family is None:
            family = F.when(hit, fam_c)
            version = F.when(hit, ver_c)
            bot = F.when(hit, bot_c)
        else:
            family = family.when(hit, fam_c)
            version = version.when(hit, ver_c)
            bot = bot.when(hit, bot_c)
    assert family is not None and version is not None and bot is not None
    return (
        family.otherwise(F.lit("other")),
        version.otherwise(F.lit(None).cast("int")),
        bot.otherwise(F.lit(False)),
    )


def with_ua_class(df: DataFrame, ua_col: str) -> DataFrame:
    """Append ``ua_family``, ``ua_major``, ``ua_is_bot``."""
    fam, ver, bot = classify_ua(F.col(ua_col))
    return df.withColumns(
        {"ua_family": fam, "ua_major": ver, "ua_is_bot": bot}
    )
