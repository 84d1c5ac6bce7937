"""Interleaved A/B regression harness: identical index build + one-job
batched BM25 on a baseline commit vs HEAD, alternating fresh
subprocesses on the same host within the same minutes — so host
weather (burstable-frequency drift that /proc/stat steal does not
capture) cancels out and only engine differences remain.

Round-5 result (closing round-4 VERDICT #1): r4 (85f24c2) and HEAD are
identical within ±3% on both metrics; the "bm25_batch_one_job
regression" was host weather. See BENCH/BASELINE.md round-5
disclosures.

Usage: python scripts/ab_regression.py [baseline_ref] [n_turns] [rounds]
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

WORKER = r'''
import sys, time, tempfile
sys.path.insert(0, sys.argv[1])
from inverted_index_spark import get_spark
from inverted_index_spark.operators.build import build_index
from inverted_index_spark.operators.search import Searcher
from inverted_index_spark.sources.store import SegmentStore

spark = get_spark("ab", cores=32, shuffle_partitions=32,
                  extra_conf={"spark.driver.memory": "48g"})
spark.sparkContext.setLogLevel("ERROR")
tx = spark.read.parquet(sys.argv[2])
# warm-up build (untimed: first build pays one-time plan/codegen costs)
s0 = SegmentStore(tempfile.mkdtemp(prefix="ab_w_") + "/idx")
build_index(spark, tx, s0, bucket_size=2048)
walls = []
for i in range(3):
    st = SegmentStore(tempfile.mkdtemp(prefix=f"ab_{i}_") + "/idx")
    t0 = time.time(); build_index(spark, tx, st, bucket_size=2048)
    walls.append(round(time.time() - t0, 3))
searcher = Searcher(spark, st).open()
qs = {f"q{i:03d}": ["w%05d" % i, "w%05d" % (i + 1)] for i in range(20)}
bw = []
for _ in range(3):
    t0 = time.time(); searcher.topk_batch(qs, k=10).collect()
    bw.append(round(time.time() - t0, 3))
print("RESULT", sys.argv[3], min(walls), walls, min(bw), bw, flush=True)
spark.stop()
'''


def main(baseline_ref: str, n_turns: int, rounds: int) -> int:
    base_tree = tempfile.mkdtemp(prefix="ab_baseline_")
    subprocess.run(
        ["git", "worktree", "add", "--force", base_tree, baseline_ref],
        cwd=REPO, check=True, capture_output=True,
    )
    try:
        tx_path = os.path.join(tempfile.mkdtemp(prefix="ab_tx_"), "tx.parquet")
        sys.path.insert(0, str(REPO))
        from inverted_index_spark import get_spark
        from inverted_index_spark.sources.transcripts import generate_transcripts

        s = get_spark("gen", cores=16, shuffle_partitions=16)
        s.sparkContext.setLogLevel("ERROR")
        generate_transcripts(s, n_turns, include_doc_id=True).write.mode(
            "overwrite"
        ).parquet(tx_path)
        s.stop()

        rc = 0
        for rnd in range(rounds):
            for tag, root in (("base", base_tree), ("head", str(REPO))):
                r = subprocess.run(
                    [sys.executable, "-c", WORKER, root, tx_path, f"{tag}#{rnd}"],
                    capture_output=True, text=True, cwd=root,
                )
                for line in r.stdout.splitlines():
                    if line.startswith("RESULT"):
                        print(line, flush=True)
                if r.returncode != 0:
                    print(tag, "FAILED", r.stderr[-800:], flush=True)
                    rc = 1
        return rc
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", base_tree],
            cwd=REPO, capture_output=True,
        )


if __name__ == "__main__":
    ref = sys.argv[1] if len(sys.argv) > 1 else "85f24c2"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 120_000
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    raise SystemExit(main(ref, n, k))
