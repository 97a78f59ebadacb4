"""Robots.txt gating (rule R6, RFC 9309 longest-prefix match) — JVM-side.

The rules column is ``array<struct<allow:boolean, prefix:string>>`` attached
by a broadcast join with host_state. Matching is pure Catalyst higher-order
functions (filter/aggregate lambdas) — no Python worker in this path at all,
so the gate whole-stage-codegens with the rest of the stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def path_col(url: Column) -> Column:
    """Path component of a canonical URL ('' → '/')."""
    p = F.parse_url(url, F.lit("PATH"))
    return F.when(p.isNull() | (p == ""), F.lit("/")).otherwise(p)


def blocked_expr(path: str, rules: str) -> Column:
    """True iff the longest-prefix rule matching ``path`` is a Disallow.

    Empty/null rules array → allow (not blocked).
    """
    return ~F.coalesce(
        F.expr(
            f"""
            aggregate(
              filter({rules}, r -> startswith({path}, r.prefix)),
              named_struct('len', -1, 'allow', true),
              (acc, r) -> IF(length(r.prefix) > acc.len,
                             named_struct('len', length(r.prefix), 'allow', r.allow),
                             acc)
            ).allow
            """
        ),
        F.lit(True),
    )


def with_blocked(df: DataFrame, path: str = "__path", rules: str = "robots_rules") -> DataFrame:
    return df.withColumn("blocked", blocked_expr(path, rules))
