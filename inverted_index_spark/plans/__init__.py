"""Plan-inspection helpers: assert that the plans we ship are the
plans we want (pushdown reached the scan, no stray exchanges)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters line(s) of the formatted plan (empty if none)."""
    plan = formatted_plan(df)
    return "\n".join(l.strip() for l in plan.splitlines() if "PushedFilters" in l)


def count_exchanges(df: DataFrame) -> int:
    plan = formatted_plan(df)
    return sum(1 for l in plan.splitlines() if "Exchange" in l and "Reused" not in l)
