"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() twin on DuckDB at the
given sf dir, compare row count, schema (column names), and
order-insensitive values."""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod  # noqa: E402
from inverted_index_spark import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(rows, cols):
    """``rows`` must be dicts keyed by column name (both call sites
    convert first) — positional tuples would be ambiguous against the
    sorted ``cols`` order."""
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                v = round(v, 6)
                if math.isclose(v, 0.0, abs_tol=1e-12):
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def main(sf_dir: str, only: list[str] | None = None):
    spark = get_spark("oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    times: dict[str, float] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        _t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
            times[name] = round(time.time() - _t0, 2)
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(srows)} rows) [{times[name]}s]")
            continue
        try:
            ddf = con.execute(oracles[name])
            dcols = [d[0] for d in ddf.description]
            drows = ddf.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            continue
        if sorted(scols) != sorted(dcols):
            failures.append((name, f"schema mismatch {scols} vs {dcols}"))
            print(f"FAIL  {name}: schema {scols} vs {dcols}")
            continue
        s_norm = normalize([r.asDict() for r in srows], sorted(scols))
        d_norm = normalize(
            [dict(zip(dcols, r)) for r in drows], sorted(scols)
        )
        if len(s_norm) != len(d_norm):
            failures.append((name, f"rowcount {len(s_norm)} vs {len(d_norm)}"))
            print(f"FAIL  {name}: rowcount {len(s_norm)} vs {len(d_norm)}")
            continue
        if s_norm != d_norm:
            diff = [
                (a, b) for a, b in zip(s_norm, d_norm) if a != b
            ][:3]
            failures.append((name, f"value mismatch, first diffs {diff}"))
            print(f"FAIL  {name}: values differ, e.g. {diff}")
            continue
        # times[name] stays the SPARK-side wall recorded above — the
        # driver's time-budgeted gate never pays the DuckDB/normalize
        # cost, so ordering tuned from these numbers must not either
        print(f"OK    {name}: {len(s_norm)} rows [{times[name]}s]")
    slow = sorted(times.items(), key=lambda kv: -kv[1])[:15]
    print("\nslowest:", ", ".join(f"{n}={t}s" for n, t in slow))
    print(f"total {round(sum(times.values()), 1)}s over {len(times)} timed entries")
    print(f"\n{len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    raise SystemExit(main(sf, only))
