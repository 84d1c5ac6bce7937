"""Corpus-size amortization evidence (companion to scaling_bench.py).

The small-corpus scaling legs carry a ~2-3 s fixed per-job share
(driver planning + parquet commit protocol) that does NOT grow with
the corpus — at 2M turns it is ~25% of a 32-core build, which caps
measured efficiency far below what the same job does at real scale.
This harness runs the IDENTICAL build at two corpus sizes and two
parallelism levels and reports turns/sec per cell: if throughput at
high parallelism RISES with corpus size while low-parallelism
throughput stays flat, the efficiency deficit is the fixed share
amortizing, not a parallel-scaling defect.

Usage: python scripts/amortize_bench.py [n_small] [n_big] [repeats]
Appends a results table to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _steal() -> float:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8]) / 100.0


def worker(cores: int, n_turns: int, data_dir: str, repeats: int) -> None:
    import tempfile

    from inverted_index_spark import get_spark
    from inverted_index_spark.operators.build import build_index
    from inverted_index_spark.sources.store import SegmentStore

    spark = get_spark(f"amortize-{cores}-{n_turns}", cores=cores, shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    tx = spark.read.parquet(f"{data_dir}/transcripts")
    secs, steals = [], []
    for _ in range(repeats):
        store = SegmentStore(tempfile.mkdtemp(prefix=f"ii_amz_{cores}_") + "/idx")
        s0, t0 = _steal(), time.time()
        build_index(spark, tx, store, bucket_size=max(n_turns // 128, 512))
        secs.append(round(time.time() - t0, 2))
        steals.append(round(_steal() - s0, 1))
    print(
        "RESULT "
        + json.dumps(
            {
                "cores": cores,
                "n_turns": n_turns,
                "best_sec": min(secs),
                "turns_per_sec": round(n_turns / min(secs), 1),
                "secs_all": secs,
                "steals_all": steals,
            }
        )
    )
    spark.stop()


def main(n_small: int = 2_000_000, n_big: int = 6_000_000, repeats: int = 3) -> None:
    import tempfile

    data_dirs = {}
    for n_turns in (n_small, n_big):
        data_dir = tempfile.mkdtemp(prefix=f"ii_amz_data_{n_turns}_")
        gen = subprocess.run(
            [sys.executable, str(REPO / "scripts/scaling_bench.py"), "--gen",
             str(n_turns), data_dir],
            capture_output=True, text=True, cwd=str(REPO), timeout=3000,
        )
        if "GENDONE" not in gen.stdout:
            print(gen.stdout[-1500:], gen.stderr[-1500:])
            raise SystemExit("gen failed")
        data_dirs[n_turns] = data_dir

    results: dict[tuple[int, int], dict] = {}
    # every cell visited TWICE, interleaved, best-of kept (the same
    # weather-suppression protocol as scaling_bench: a single bad
    # window otherwise poisons exactly one cell and fakes a trend)
    cells = [(n, c) for n in (n_small, n_big) for c in (8, 32)]
    for n_turns, cores in cells * 2:
        time.sleep(90)  # cooldown (burstable host credit refill)
        out = subprocess.run(
            [sys.executable, __file__, "--worker", str(cores), str(n_turns),
             data_dirs[n_turns], str(repeats)],
            capture_output=True, text=True, cwd=str(REPO), timeout=3000,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
        if not line:
            print(out.stdout[-2000:], out.stderr[-2000:])
            raise SystemExit(f"worker {cores}/{n_turns} failed")
        r = json.loads(line[-1][len("RESULT "):])
        print(f"{n_turns} turns @ local[{cores}]: {r}")
        best = results.get((n_turns, cores))
        if best is None or r["best_sec"] < best["best_sec"]:
            r["secs_all"] = (best["secs_all"] if best else []) + r["secs_all"]
            r["steals_all"] = (best["steals_all"] if best else []) + r["steals_all"]
            results[(n_turns, cores)] = r
        else:
            best["secs_all"] += r["secs_all"]
            best["steals_all"] += r["steals_all"]

    rows = []
    for n in (n_small, n_big):
        r8, r32 = results[(n, 8)], results[(n, 32)]
        eff = r32["turns_per_sec"] / r8["turns_per_sec"] / 4
        rows.append(
            f"| {n:,} | {r8['best_sec']}s / {r8['turns_per_sec']:,} | "
            f"{r32['best_sec']}s / {r32['turns_per_sec']:,} | "
            f"{r32['turns_per_sec']/r8['turns_per_sec']:.2f}x | {eff:.2f} |"
        )
    md = (
        "\n## Corpus-size amortization (fixed-share evidence)\n\n"
        "Same build at two corpus sizes: the fixed per-job share "
        "(driver planning + commit protocol, ~2-3 s, size-independent) "
        "is a large slice of a small-corpus high-parallelism leg and "
        "shrinks toward zero as the corpus grows — the regime a "
        "100 TB deployment lives in.\n\n"
        "| corpus | local[8] best / turns·s⁻¹ | local[32] best / turns·s⁻¹ "
        "| ratio 32/8 | eff (ratio/4) |\n|---|---|---|---|---|\n"
        + "\n".join(rows)
        + "\n\nRaw attempts incl. per-attempt steal: BENCH/amortize_raw.json.\n"
    )
    bench_dir = REPO / "BENCH"
    (bench_dir / "amortize_raw.json").write_text(
        json.dumps({f"{k[0]}_{k[1]}": v for k, v in results.items()}, indent=2)
    )
    # NOT auto-appended to BASELINE.md: a throttled window produces a
    # host-weather table, not an engine table (it happened — see the
    # BASELINE.md addendum); curate manually after checking steal.
    print(md)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4], int(sys.argv[5]))
    else:
        main(
            int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000,
            int(sys.argv[2]) if len(sys.argv) > 2 else 6_000_000,
            int(sys.argv[3]) if len(sys.argv) > 3 else 3,
        )
