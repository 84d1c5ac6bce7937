"""Round-6 optimization measurement harness (guide §1: measure first).

NOT the driver bench (bench.py is frozen) — this isolates the expensive
workloads with noop sinks / .count() actions and per-PHASE wall clocks so
each optimization targets the real cost, and captures .explain("formatted")
for every touched query path into plans/r06/.

Usage:
    python bench_extra.py [--phases p1,p2,...] [--plans-tag before|after]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_TURNS (as bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_TURNS = int(os.environ.get("SPARK_GRAFT_TURNS", "120000"))
PLANS_DIR = Path(__file__).resolve().parent / "plans" / "r06"

T: dict[str, float] = {}


def clock(name: str, fn):
    t0 = time.time()
    out = fn()
    T[name] = round(time.time() - t0, 3)
    print(f"  {name}: {T[name]:.3f}s", flush=True)
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def dump_plan(tag: str | None, name: str, df):
    if not tag:
        return
    PLANS_DIR.mkdir(parents=True, exist_ok=True)
    p = PLANS_DIR / f"{name}_{tag}.txt"
    p.write_text(df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"))


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--phases", default="all")
    ap.add_argument("--plans-tag", default=None)
    args = ap.parse_args()
    phases = set(args.phases.split(","))

    def want(p: str) -> bool:
        return "all" in phases or p in phases

    from inverted_index_spark import get_spark
    from inverted_index_spark.operators.build import build_index
    from inverted_index_spark.operators.merge import merge_segments
    from inverted_index_spark.operators.search import Searcher
    from inverted_index_spark.sources.store import SegmentStore
    from inverted_index_spark.sources.transcripts import generate_transcripts

    spark = get_spark(
        "ii-bench-extra", cores=CPUS, shuffle_partitions=CPUS,
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_GRAFT_MEM", "48g")},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tmp = tempfile.mkdtemp(prefix="ii_bx_")
    tag = args.plans_tag

    bucket = max(N_TURNS // (CPUS * 2), 512)
    tx_path = f"{tmp}/transcripts"
    generate_transcripts(spark, N_TURNS, include_doc_id=True).write.mode(
        "overwrite").parquet(tx_path)
    tx = spark.read.parquet(tx_path)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # ---- warmup (same rationale as bench.py) ----
    warm_store = SegmentStore(f"{tmp}/warm_idx")
    warm_docs = docs.limit(200)
    build_index(spark, warm_docs, warm_store, bucket_size=128)
    ws = Searcher(spark, warm_store).open()
    ws.topk(["the"], 3).collect()
    ws.topk_batch({"wq": ["the"]}, 3).collect()
    ws.read_values_batch({"wr": (["the"], None, None)}).count()

    queries = [
        ["w00000"], ["w00001", "w00002"], ["w00010", "w00500", "w05000"],
        ["w00042", "w00007", "w00123", "w00999", "w05000"], ["бесплатно"],
        ["w00003"], ["w00004", "w19999"], ["w00020", "w00021"],
        ["w01000", "w02000", "w03000"], ["w00005", "w00006", "w00007"],
    ] * 2

    # ---------------------------------------------------------- build ----
    if want("build"):
        from inverted_index_spark.functions.tokenizer import tokenize
        from inverted_index_spark.operators.build import (
            doc_lengths, encode_segment, encode_segment_fragments)

        sc.setJobDescription("bx: tokenize only (noop)")
        toks = tokenize(tx)
        clock("tokenize_noop", lambda: noop(toks))
        sc.setJobDescription("bx: tokenize+encode (noop)")
        enc = encode_segment(toks, bucket)
        dump_plan(tag, "build_encode", enc)
        clock("encode_noop", lambda: noop(enc))
        sc.setJobDescription("bx: fragment encode (noop)")
        encf = encode_segment_fragments(toks, bucket)
        dump_plan(tag, "build_encode_fragments", encf)
        clock("encode_frag_noop", lambda: noop(encf))
        sc.setJobDescription("bx: docstats (noop)")
        clock("docstats_noop", lambda: noop(doc_lengths(tx)))
        sc.setJobDescription("bx: full build")
        st = SegmentStore(f"{tmp}/tx_full")
        clock("build_full", lambda: build_index(spark, tx, st, bucket_size=bucket))
        sc.setJobDescription("bx: full fragment build")
        stf = SegmentStore(f"{tmp}/tx_frag")
        clock("build_frag_full",
              lambda: build_index(spark, tx, stf, bucket_size=bucket, shuffle=False))
        sc.setJobDescription("bx: compact")
        clock("compact", lambda: merge_segments(spark, stf, min_files=1))

    # --------------------------------------------------------- search ----
    if want("search"):
        st = SegmentStore(f"{tmp}/tx_q")
        build_index(spark, tx, st, bucket_size=bucket)
        searcher = Searcher(spark, st).open()
        # fixed-cost probe: the cheapest possible job in this session
        probe = spark.range(1).cache()
        probe.count()
        clock("job_overhead_x5", lambda: [probe.count() for _ in range(5)])
        # plan-only cost (analysis + optimization, no job)
        clock("plan_only_topk_x5", lambda: [
            searcher.topk(q, 10, use_wand=False)._jdf.queryExecution()
            .executedPlan() for q in queries[:5]])
        sc.setJobDescription("bx: topk naive per-query")
        clock("topk_naive_20", lambda: [
            searcher.topk(q, 10, use_wand=False).collect() for q in queries])
        dump_plan(tag, "topk_one_task", searcher.topk(queries[0], 10, use_wand=False))
        sc.setJobDescription("bx: topk wand per-query")
        clock("topk_wand_20", lambda: [
            searcher.topk(q, 10, use_wand=True).collect() for q in queries])
        sc.setJobDescription("bx: read_values per-query")
        clock("read_values_20", lambda: [
            searcher.read_values(q, 1000 * i, 1000 * i + 50000).collect()
            for i, q in enumerate(queries)])
        dump_plan(tag, "read_values_one_task",
                  searcher.read_values(queries[0], 0, 50000))
        sc.setJobDescription("bx: topk_batch one job")
        clock("topk_batch", lambda: searcher.topk_batch(
            {f"q{i:03d}": q for i, q in enumerate(queries)}, k=10).collect())
        dump_plan(tag, "topk_batch", searcher.topk_batch(
            {f"q{i:03d}": q for i, q in enumerate(queries)}, k=10))
        sc.setJobDescription("bx: read_values_batch one job")
        clock("read_values_batch_1job", lambda: searcher.read_values_batch(
            {f"r{i:03d}": (q, 1000 * i, 1000 * i + 50000)
             for i, q in enumerate(queries)}).count())
        dump_plan(tag, "read_values_batch", searcher.read_values_batch(
            {f"r{i:03d}": (q, 1000 * i, 1000 * i + 50000)
             for i, q in enumerate(queries)}))
        searcher.close()

    # -------------------------------------------------------- minhash ----
    if want("minhash"):
        from inverted_index_spark.operators.clustering import connected_components
        from inverted_index_spark.operators.dedup import (
            minhash_lsh_pairs, minhash_signatures, winnow_match_pairs)

        sc.setJobDescription("bx: minhash signatures only (tx)")
        sig = minhash_signatures(tx)
        dump_plan(tag, "minhash_signatures", sig)
        clock("minhash_sig_tx_noop", lambda: noop(sig))
        sc.setJobDescription("bx: minhash pairs (tx)")
        pairs = minhash_lsh_pairs(tx, threshold=0.5)
        dump_plan(tag, "minhash_lsh_pairs", pairs)
        clock("minhash_pairs_tx", lambda: pairs.count())
        sc.setJobDescription("bx: minhash pairs (docs)")
        clock("minhash_pairs_docs",
              lambda: minhash_lsh_pairs(docs, threshold=0.5).count())
        sc.setJobDescription("bx: dedup clusters (docs)")
        clock("dedup_clusters_docs", lambda: connected_components(
            minhash_lsh_pairs(docs, threshold=0.5)).count())
        sc.setJobDescription("bx: winnow pairs (docs)")
        wp = winnow_match_pairs(docs, min_shared=2)
        dump_plan(tag, "winnow_pairs", wp)
        clock("winnow_pairs_docs", lambda: wp.count())

    # ------------------------------------------------------ positions ----
    if want("positions"):
        from inverted_index_spark.operators.positions import (
            phrase_match, terms_within_window)

        pos_store = SegmentStore(f"{tmp}/pos_tx")
        clock("build_positions_tx", lambda: build_index(
            spark, tx, pos_store, bucket_size=bucket, positions=True))
        doc_pos = SegmentStore(f"{tmp}/pos_docs")
        clock("build_positions_docs", lambda: build_index(
            spark, docs, doc_pos, bucket_size=128, positions=True))
        # warm the plan shapes, then time (bench.py does the same)
        phrase_match(spark, doc_pos, ["the", "of"]).count()
        phrase_match(spark, doc_pos, ["the", "of"], slop=2).count()
        terms_within_window(spark, doc_pos, ["the", "of"], 10).count()
        pm = phrase_match(spark, pos_store, ["w00000", "w00001"])
        dump_plan(tag, "phrase_match", pm)
        sc.setJobDescription("bx: phrase_match tx")
        clock("phrase_tx_x2", lambda: (
            phrase_match(spark, pos_store, ["w00000", "w00001"]).count(),
            phrase_match(spark, pos_store, ["w00010", "w00011"]).count()))
        tw = terms_within_window(spark, pos_store, ["w00000", "w00002"], 20)
        dump_plan(tag, "terms_within_window", tw)
        sc.setJobDescription("bx: proximity tx")
        clock("proximity_tx", lambda: (
            tw.count(),
            phrase_match(spark, pos_store, ["w00000", "w00002"], slop=3).count()))

    # ------------------------------------------------------- trigrams ----
    if want("grep"):
        from inverted_index_spark.operators.query import and_values
        from inverted_index_spark.operators.substring import (
            build_trigram_index, regex_search, substring_search)

        warm_tri = SegmentStore(f"{tmp}/warm_tri")
        build_trigram_index(spark, warm_docs, warm_tri, bucket_size=128)
        substring_search(spark, warm_tri, "the", warm_docs).count()
        regex_search(spark, warm_tri, "the|of", warm_docs).count()
        tri = SegmentStore(f"{tmp}/tri_tx")
        sc.setJobDescription("bx: build trigram index")
        clock("build_trigrams_tx", lambda: build_trigram_index(
            spark, tx, tri, bucket_size=bucket))
        from inverted_index_spark.operators.substring import needle_trigrams
        grams = needle_trigrams("w00001 w00002")
        av = and_values(spark, tri, grams)
        dump_plan(tag, "and_values", av)
        sc.setJobDescription("bx: and_values only")
        clock("and_values_1", lambda: av.count())
        ss = substring_search(spark, tri, "w00001 w00002", tx)
        dump_plan(tag, "substring_search", ss)
        sc.setJobDescription("bx: grep tx")
        clock("grep_sub", lambda: ss.count())
        clock("grep_regex", lambda: regex_search(
            spark, tri, "w00010 w00011|w00042 w00043", tx).count())

    # ------------------------------------------------------------ knn ----
    if want("knn"):
        from inverted_index_spark.operators.similarity import cosine_topk

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        qv = [float(x) for x in emb.limit(1).collect()[0]["embedding"]]
        ck = cosine_topk(emb, qv, k=20)
        dump_plan(tag, "cosine_topk", ck)
        clock("embed_knn", lambda: ck.collect())

    print(json.dumps({"phases": T, "n_turns": N_TURNS, "cpus": CPUS}))
    import shutil

    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
