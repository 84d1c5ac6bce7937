"""Per-round bench harness (driver contract).

Runs the headline operators at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit": "sec", "queries":
{name: sec}, "sf"}.

Workloads:
  build_documents     index build over the sf documents table
  build_transcripts   index build over a synthetic transcript corpus
                      ($SPARK_GRAFT_TURNS turns, default 120k) →
                      turns/sec is value/turns
  build_fragments     the same transcript build with the shuffle-free
                      fragment encode (zero token-stream shuffle — the
                      multi-executor scale path)
  compact             one merge pass rewriting the fragment segments
                      into the compact layout
  bm25_naive_batch    20 BM25 top-10 queries, exhaustive scorer (warm
                      Searcher) → QPS = 20/sec
  bm25_wand_batch     same 20 queries through block-max WAND
  read_values_batch   20 OR+range reads (reference R10 semantics)
  build_positions     documents build incl. the positional artifact
  phrase_match        two exact-phrase queries over the positional index
  minhash_dedup       MinHash-LSH near-dup pairs over documents
  dedup_clusters      connected components over the near-dup pair graph
  embed_knn           exact cosine top-20 over embeddings

Burstable-host disclosure (round-3): this host throttles on CPU
credit; per-workload STEAL seconds are measured from /proc/stat and
emitted as "steal" next to the timings, so round-over-round drifts can
be attributed (a regression with high steal is host noise, not code).

Scaling evidence (local[8] vs local[32]) is produced by
scripts/scaling_bench.py → BENCH/BASELINE.md, not here (one bench run
must stay single-session for the driver's time budget).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_TURNS = int(os.environ.get("SPARK_GRAFT_TURNS", "120000"))


def main() -> None:
    from pyspark.sql import functions as F

    from inverted_index_spark import get_spark
    from inverted_index_spark.operators.build import build_index
    from inverted_index_spark.operators.dedup import minhash_lsh_pairs
    from inverted_index_spark.operators.search import Searcher
    from inverted_index_spark.operators.similarity import cosine_topk
    from inverted_index_spark.sources.store import SegmentStore
    from inverted_index_spark.sources.transcripts import generate_transcripts

    spark = get_spark("ii-bench", cores=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="ii_bench_")
    timings: dict[str, float] = {}
    steals: dict[str, float] = {}

    def _steal() -> float:
        """Cumulative CPU-steal seconds (burstable-host disclosure)."""
        try:
            with open("/proc/stat") as f:
                return int(f.readline().split()[8]) / os.sysconf("SC_CLK_TCK")
        except Exception:
            return 0.0

    def timed(name):
        class _T:
            def __enter__(self):
                self.s0 = _steal()
                self.t0 = time.time()

            def __exit__(self, *a):
                timings[name] = round(time.time() - self.t0, 3)
                steals[name] = round(_steal() - self.s0, 2)

        return _T()

    # UNTIMED warm-up: the first build in a fresh session pays ~8s of
    # one-time cost (JVM JIT + codegen compile + Python worker spawn +
    # parquet committer init) that is NOT engine throughput — measured:
    # identical build_documents 9.5s cold vs 1.7s warm. Rounds 1-2
    # timed it inside the first workload, which made build_documents
    # look 5x slower than it is and drift with JIT weather.
    warm_store = SegmentStore(f"{tmp}/warm_idx")
    warm_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
    build_index(spark, warm_docs, warm_store, bucket_size=128)
    Searcher(spark, warm_store).open().topk(["the"], 3).collect()

    # bucket sizes sized for ≥2 groups per core at these corpus sizes
    # (real deployments: bucket_size ~= corpus/n_partitions_target)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    doc_store = SegmentStore(f"{tmp}/docs_idx")
    with timed("build_documents"):
        build_index(spark, docs, doc_store, bucket_size=128)

    tx_store = SegmentStore(f"{tmp}/tx_idx")
    # the north-rule input is a STORED transcript table — materialize
    # first, measure the build reading from parquet (not generation)
    generate_transcripts(spark, N_TURNS, include_doc_id=True).write.mode(
        "overwrite"
    ).parquet(f"{tmp}/transcripts")
    tx = spark.read.parquet(f"{tmp}/transcripts")
    with timed("build_transcripts"):
        build_index(spark, tx, tx_store, bucket_size=max(N_TURNS // (CPUS * 2), 512))

    # the flagship scale feature: shuffle-free fragment encode + one
    # compaction pass back to the compact layout (slower than the
    # shuffled build on local[32] — a local shuffle has no network —
    # but the shape that wins when the token shuffle crosses machines)
    from inverted_index_spark.operators.merge import merge_segments

    frag_store = SegmentStore(f"{tmp}/frag_idx")
    with timed("build_fragments"):
        build_index(
            spark, tx, frag_store,
            bucket_size=max(N_TURNS // (CPUS * 2), 512), shuffle=False,
        )
    # min_files=1: rewrite the single fragmented segment into the
    # compact one-row-per-(bucket, term) layout — the deferred shuffle
    # the fragment build trades for
    with timed("compact"):
        merge_segments(spark, frag_store, min_files=1)

    searcher = Searcher(spark, tx_store).open()
    queries = [
        ["w00000"], ["w00001", "w00002"], ["w00010", "w00500", "w05000"],
        ["w00042", "w00007", "w00123", "w00999", "w05000"], ["бесплатно"],
        ["w00003"], ["w00004", "w19999"], ["w00020", "w00021"],
        ["w01000", "w02000", "w03000"], ["w00005", "w00006", "w00007"],
    ] * 2

    with timed("bm25_naive_batch"):
        for q in queries:
            searcher.topk(q, 10, use_wand=False).collect()
    with timed("bm25_wand_batch"):
        for q in queries:
            searcher.topk(q, 10, use_wand=True).collect()
    with timed("bm25_wand_one_job"):
        searcher.topk_batch(
            {f"q{i:03d}": q for i, q in enumerate(queries)}, k=10, use_wand=True
        ).collect()
    with timed("bm25_batch_one_job"):
        # the batched default: vectorized exhaustive over shared decoded
        # blocks (see Searcher.topk_batch docstring for the trade)
        searcher.topk_batch(
            {f"q{i:03d}": q for i, q in enumerate(queries)}, k=10
        ).collect()
    with timed("read_values_batch"):
        for i, q in enumerate(queries):
            searcher.read_values(q, 1000 * i, 1000 * i + 50000).collect()
    with timed("read_values_one_job"):
        searcher.read_values_batch(
            {f"r{i:03d}": (q, 1000 * i, 1000 * i + 50000) for i, q in enumerate(queries)}
        ).count()

    # positional artifact + phrase queries (round-3 capability): build
    # measured separately from the plain index so the positions cost is
    # visible round over round
    pos_store = SegmentStore(f"{tmp}/pos_idx")
    with timed("build_positions"):
        build_index(spark, docs, pos_store, bucket_size=128, positions=True)
    from inverted_index_spark.operators.positions import phrase_match

    with timed("phrase_match"):
        phrase_match(spark, pos_store, ["table", "hash"]).count()
        phrase_match(spark, pos_store, ["merge", "group"]).count()

    with timed("minhash_dedup"):
        minhash_lsh_pairs(docs, threshold=0.5).count()
    with timed("dedup_clusters"):
        from inverted_index_spark.operators.clustering import connected_components

        connected_components(minhash_lsh_pairs(docs, threshold=0.5)).count()
    with timed("winnow_pairs"):
        from inverted_index_spark.operators.dedup import winnow_match_pairs

        winnow_match_pairs(docs, min_shared=2).count()

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qv = [float(x) for x in emb.limit(1).collect()[0]["embedding"]]
    with timed("embed_knn"):
        cosine_topk(emb, qv, k=20).collect()

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    derived = {
        "build_turns_per_sec": round(N_TURNS / timings["build_transcripts"], 1),
        "bm25_naive_qps": round(len(queries) / timings["bm25_naive_batch"], 2),
        "bm25_wand_qps": round(len(queries) / timings["bm25_wand_batch"], 2),
        "bm25_batched_qps": round(len(queries) / timings["bm25_batch_one_job"], 2),
        "bm25_batched_wand_qps": round(len(queries) / timings["bm25_wand_one_job"], 2),
        "n_turns": N_TURNS,
        "cpus": CPUS,
    }
    print(
        json.dumps(
            {
                "metric": "ii_spark_headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "steal": steals,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "derived": derived,
            }
        )
    )
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
