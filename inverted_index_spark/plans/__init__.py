"""Plan-inspection helpers: assert that the plans we ship are the
plans we want (pushdown reached the scan, no stray exchanges)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters line(s) of the formatted plan (empty if none)."""
    plan = formatted_plan(df)
    return "\n".join(l.strip() for l in plan.splitlines() if "PushedFilters" in l)


def count_exchanges(df: DataFrame) -> int:
    plan = formatted_plan(df)
    return sum(1 for l in plan.splitlines() if "Exchange" in l and "Reused" not in l)


def count_exchanges_above_cache(df: DataFrame) -> int:
    """Exchanges in the QUERY-TIME plan only: every Exchange operator
    that is NOT inside an InMemoryRelation subtree. A cached
    relation's build subtree (e.g. the Searcher's one-time
    repartition("bucket")) executes at cache materialization, not per
    query, so its exchanges don't count against a per-query plan
    shape. Subtrees are tracked by tree indentation (a cached
    relation's children are printed deeper), so exchanges in OTHER
    join branches printed after an InMemoryRelation still count."""
    plan = formatted_plan(df)
    tree = plan.split("\n\n", 1)[0]  # detail sections repeat operator
    # names ("(5) Exchange") — only the tree block carries structure
    n = 0
    skip_depth: int | None = None
    for l in tree.splitlines():
        stripped = l.lstrip(" +-*:")
        if not stripped or "(" not in l:
            continue
        depth = len(l) - len(stripped)
        if skip_depth is not None:
            if depth > skip_depth:
                continue  # still inside the cached build subtree
            skip_depth = None
        if "InMemoryRelation" in l:
            skip_depth = depth
            continue
        if "Exchange" in l and "Reused" not in l:
            n += 1
    return n
