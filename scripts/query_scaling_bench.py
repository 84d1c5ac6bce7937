"""Query-side 8→32 scaling evidence at amortized batch sizes.

Round-5 gap (VERDICT #2): the measured batched-QPS 8→32 ratio (1.75x,
0.44 raw efficiency) was taken at a corpus/batch size where the
one-job fixed costs (scheduling + plan + Python-worker spin-up) were
a large share of wall, so it measured the constant, not the engine.
This protocol scales the per-job WORK until the fixed share is <10%:

  - corpus: N_TURNS turns (default 2M) — built ONCE on disk and
    shared by every leg (identical input; only query execution is
    timed, matching the open-once/query-many Searcher contract)
  - batch: N_QUERIES one-job batched top-k queries (default 1000)
    through Searcher.topk_batch — the throughput surface
  - legs alternate local[8] / local[32] in fresh JVMs with cooldowns
    (burstable host: credits refill while idle), 2 visits per level,
    per-attempt steal screening, best clean attempt per level
  - the job floor (spark.range(1).count()) is measured in-leg so the
    fixed-cost share of each attempt is explicit

Usage: python scripts/query_scaling_bench.py [n_turns] [n_queries]
       python scripts/query_scaling_bench.py --prep <n_turns> <dir>
       python scripts/query_scaling_bench.py --worker <cores> <n_turns> <n_queries> <dir>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _steal() -> float:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8]) / 100.0


def queries_for(n: int) -> dict[str, list[str]]:
    """Deterministic mixed-length query batch over the synthetic vocab."""
    out = {}
    for i in range(n):
        k = 1 + (i % 3)
        out[f"q{i:05d}"] = [f"w{(i * 37 + j * 911) % 20000:05d}" for j in range(k)]
    return out


def prep(n_turns: int, data_dir: str) -> None:
    from inverted_index_spark import get_spark
    from inverted_index_spark.operators.build import build_index
    from inverted_index_spark.sources.store import SegmentStore
    from inverted_index_spark.sources.transcripts import generate_transcripts

    spark = get_spark(
        "qscale-prep", cores=32, shuffle_partitions=32,
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_GRAFT_MEM", "48g")},
    )
    spark.sparkContext.setLogLevel("ERROR")
    tx_path = f"{data_dir}/transcripts"
    generate_transcripts(spark, n_turns, include_doc_id=True).write.mode(
        "overwrite"
    ).parquet(tx_path)
    store = SegmentStore(f"{data_dir}/idx")
    # buckets ≫ kernel tasks: the per-bucket kernels run as
    # shuffle_partitions tasks, and hashing only ~4 buckets into each
    # of 32 partitions leaves a ~1.6x straggler factor (measured) that
    # caps scaling regardless of the engine. At cluster scale buckets
    # outnumber tasks by orders of magnitude, so ~1024 buckets is the
    # representative shape (32 per partition at local[32]).
    build_index(
        spark, spark.read.parquet(tx_path), store,
        bucket_size=max(n_turns // int(os.environ.get("QS_BUCKETS", "1024")), 64),
    )
    spark.stop()
    print("PREPDONE", flush=True)


def worker(cores: int, n_turns: int, n_queries: int, data_dir: str) -> None:
    from inverted_index_spark import get_spark
    from inverted_index_spark.operators.search import Searcher
    from inverted_index_spark.sources.store import SegmentStore

    spark = get_spark(
        f"qscale-{cores}", cores=cores, shuffle_partitions=cores,
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_GRAFT_MEM", "48g")},
    )
    spark.sparkContext.setLogLevel("ERROR")
    searcher = Searcher(spark, SegmentStore(f"{data_dir}/idx")).open()
    qmap = queries_for(n_queries)
    # in-leg job-floor probe (fixed-cost share denominator)
    probe = spark.range(1).cache()
    probe.count()
    floors = []
    for _ in range(5):
        t0 = time.time()
        probe.count()
        floors.append(time.time() - t0)
    floor = min(floors)
    # warm the batched plan shape untimed (codegen + worker spawn)
    warm = {k: qmap[k] for k in list(qmap)[:20]}
    searcher.topk_batch(warm, k=10).collect()
    searcher.topk_batch(warm, k=10, use_wand=True).collect()

    def timed(fn):
        s0, t0 = _steal(), time.time()
        n_rows = fn()
        return [round(time.time() - t0, 3), round(_steal() - s0, 1), n_rows]

    attempts = [
        timed(lambda: len(searcher.topk_batch(qmap, k=10).collect()))
        for _ in range(3)
    ]
    wand_attempts = [
        timed(lambda: len(searcher.topk_batch(qmap, k=10, use_wand=True).collect()))
        for _ in range(2)
    ]
    print(
        "RESULT "
        + json.dumps(
            {
                "cores": cores,
                "n_turns": n_turns,
                "n_queries": n_queries,
                "job_floor_sec": round(floor, 3),
                "batch_attempts": attempts,
                "wand_attempts": wand_attempts,
            }
        ),
        flush=True,
    )
    searcher.close()
    spark.stop()


def main(n_turns: int, n_queries: int, cooldown_s: int = 120) -> None:
    import tempfile

    # the host's own parallel-compute ceiling (burstable VM: all-core
    # frequency falls as active cores rise) — efficiency is reported
    # raw AND against delivered hardware, like BENCH/BASELINE.md
    sys.path.insert(0, str(REPO / "scripts"))
    from scaling_bench import cpu_calibrate

    cal = cpu_calibrate((8, 32))
    hw_ratio = round(cal[32] / cal[8], 2)
    print(f"cpu calibration it/s: {cal} -> hardware 8->32 ratio {hw_ratio}",
          flush=True)

    data_dir = tempfile.mkdtemp(prefix="ii_qscale_")
    p = subprocess.run(
        [sys.executable, __file__, "--prep", str(n_turns), data_dir],
        capture_output=True, text=True, cwd=str(REPO), timeout=3000,
    )
    if "PREPDONE" not in p.stdout:
        print(p.stdout[-2000:], p.stderr[-2000:])
        raise SystemExit("prep failed")

    def clean(cores, a):
        return a[1] <= max(1.5, 0.05 * cores * a[0])

    visits = {8: [], 32: []}
    for leg_i, cores in enumerate((8, 32, 8, 32)):
        time.sleep(cooldown_s if leg_i else 10)
        out = subprocess.run(
            [sys.executable, __file__, "--worker", str(cores), str(n_turns),
             str(n_queries), data_dir],
            capture_output=True, text=True, cwd=str(REPO), timeout=3000,
        )
        lines = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
        if not lines:
            print(out.stdout[-3000:], out.stderr[-3000:])
            raise SystemExit(f"worker {cores} failed")
        r = json.loads(lines[-1][len("RESULT "):])
        print(f"local[{cores}]: {r}", flush=True)
        visits[cores].append(r)

    summary = {}
    for cores in (8, 32):
        atts = [a for v in visits[cores] for a in v["batch_attempts"]]
        w_atts = [a for v in visits[cores] for a in v["wand_attempts"]]
        cl = [a for a in atts if clean(cores, a)] or atts
        w_cl = [a for a in w_atts if clean(cores, a)] or w_atts
        summary[cores] = {
            "batch_sec": min(a[0] for a in cl),
            "wand_sec": min(a[0] for a in w_cl),
            "clean": bool([a for a in atts if clean(cores, a)]),
            "job_floor_sec": min(v["job_floor_sec"] for v in visits[cores]),
            "rows": cl[0][2],
        }
    r8, r32 = summary[8], summary[32]
    out = {
        "n_turns": n_turns,
        "n_queries": n_queries,
        "levels": summary,
        "batched_qps": {8: round(n_queries / r8["batch_sec"], 1),
                        32: round(n_queries / r32["batch_sec"], 1)},
        "speedup_8_to_32": round(r8["batch_sec"] / r32["batch_sec"], 2),
        "efficiency_raw": round(r8["batch_sec"] / r32["batch_sec"] / 4, 3),
        "hardware_ratio_8_to_32": hw_ratio,
        "efficiency_vs_hardware": round(
            r8["batch_sec"] / r32["batch_sec"] / hw_ratio, 3
        ),
        "wand_speedup": round(r8["wand_sec"] / r32["wand_sec"], 2),
        "fixed_cost_share_32": round(r32["job_floor_sec"] / r32["batch_sec"], 3),
    }
    print("SUMMARY " + json.dumps(out), flush=True)


if __name__ == "__main__":
    if sys.argv[1:2] == ["--prep"]:
        prep(int(sys.argv[2]), sys.argv[3])
    elif sys.argv[1:2] == ["--worker"]:
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), sys.argv[5])
    else:
        n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
        n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
        main(n_turns, n_queries)
