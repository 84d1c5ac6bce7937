"""Profile bm25 topk_batch (one-job exhaustive vs WAND) to explain the
round-4/5 regression: split Spark job overhead from Python kernel time.

Usage: python scripts/profile_onejob.py [n_turns]
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from inverted_index_spark import get_spark
from inverted_index_spark.operators.build import build_index
from inverted_index_spark.operators.search import Searcher
from inverted_index_spark.sources.store import SegmentStore
from inverted_index_spark.sources.transcripts import write_transcripts

N = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000

QUERIES = [
    ["w00000"], ["w00001", "w00002"], ["w00010", "w00500", "w05000"],
    ["w00042", "w00007", "w00123", "w00999", "w05000"], ["бесплатно"],
    ["w00003"], ["w00004", "w19999"], ["w00020", "w00021"],
    ["w01000", "w02000", "w03000"], ["w00005", "w00006", "w00007"],
] * 2


def main() -> None:
    spark = get_spark("profile-onejob", cores=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="ii_prof_")
    write_transcripts(spark, N, f"{tmp}/tx.parquet")
    tx = spark.read.parquet(f"{tmp}/tx.parquet")
    store = SegmentStore(f"{tmp}/idx")
    build_index(spark, tx, store, bucket_size=1 << 14)
    s = Searcher(spark, store).open()
    qmap = {f"q{i:03d}": q for i, q in enumerate(QUERIES)}
    # warm both plan shapes + df memo
    s.topk_batch(qmap, 10).collect()
    s.topk_batch(qmap, 10, use_wand=True).collect()

    for label, wand in (("exhaustive", False), ("wand", True)):
        times = []
        for _ in range(5):
            t0 = time.time()
            s.topk_batch(qmap, 10, use_wand=wand).collect()
            times.append(round(time.time() - t0, 3))
        print(f"topk_batch {label}: {times} best={min(times)}")

    # term_dfs cost alone (memoized → ~0)
    t0 = time.time()
    s.term_dfs(sorted({t for q in QUERIES for t in q}))
    print(f"term_dfs (memo): {round(time.time() - t0, 4)}s")

    # kernel-only: pull the matched rows to the driver once, run the
    # per-bucket kernel in-process — no Spark job, pure Python/numpy
    import pandas as pd

    from inverted_index_spark.operators import bm25 as _bm25
    from inverted_index_spark.operators import wand as _wand

    n_docs, avgdl = s.stats
    all_terms = sorted({t for q in QUERIES for t in q})
    dfs = s.term_dfs(all_terms)
    idf_map = {t: _bm25.idf(n_docs, dfs[t]) for t in all_terms if t in dfs}
    rows = s._matching(sorted(idf_map)).toPandas()
    print(f"matched rows: {len(rows)} over {rows['bucket'].nunique()} buckets")
    for label, kern in (
        ("exhaustive", _wand._exhaustive_from_handles),
        ("wand", _wand._wand_from_handles),
    ):
        times = []
        for _ in range(3):
            t0 = time.time()
            nout = 0
            for _b, pdf in rows.groupby("bucket", sort=False):
                handles = {
                    t: _wand._term_handles(grp)
                    for t, grp in pdf.groupby("term", sort=True)
                }
                for qid, ts in qmap.items():
                    sub = {t: handles[t] for t in ts if t in handles}
                    if not sub:
                        continue
                    for d, sc in kern(sub, idf_map, avgdl, 10):
                        nout += 1
            times.append(round(time.time() - t0, 3))
        print(f"kernel-only {label}: {times} best={min(times)} rows_out={nout}")

    # handle-build cost alone
    t0 = time.time()
    for _b, pdf in rows.groupby("bucket", sort=False):
        for t, grp in pdf.groupby("term", sort=True):
            _wand._term_handles(grp)
    print(f"handle build only: {round(time.time() - t0, 3)}s")
    spark.stop()


if __name__ == "__main__":
    main()
