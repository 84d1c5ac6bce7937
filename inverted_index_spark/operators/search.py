"""Searcher — the reference's OpenInvertedIndex analog (R1,
single/single.go:820-862): open once, query many.

The reference eagerly caches all term bitmaps at open; here we cache
(a) the live postings DataFrame (Spark .cache() → columnar in-memory
batches on executors), (b) corpus stats (N, avgdl), and (c) a
term→global-df map memo. A query is then 1-2 short Spark jobs over
cached data instead of re-resolving the manifest + rescanning parquet
— this is what query QPS is measured on in bench.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inverted_index_spark.operators import bm25 as _bm25
from inverted_index_spark.operators import wand as _wand
from inverted_index_spark.operators.query import _decode_rows
from inverted_index_spark.sources.store import SegmentStore

# batched-query maps above this many entries ship via broadcast instead
# of the task closure (a closure is re-serialized into EVERY task; a
# broadcast lands once per executor)
BROADCAST_QMAP_THRESHOLD = 512


def _maybe_broadcast(spark: SparkSession, payload):
    try:
        n = sum(len(v) if hasattr(v, "__len__") else 1 for v in payload)
    except TypeError:
        n = 0
    if n <= BROADCAST_QMAP_THRESHOLD:
        return None
    return spark.sparkContext.broadcast(payload)


def _purged_postings(spark: SparkSession, store: SegmentStore, raw: DataFrame) -> DataFrame:
    """Rewrite a postings scan with the store's live deletes physically
    removed (decode → mask → re-encode, per (bucket, term) row). Runs
    ONCE at Searcher.open — every cached-path kernel (topk, WAND,
    batch, read_values) then sees only surviving docs and exact
    surviving df, with zero per-query cost.

    Deletes are GENERATION-SCOPED (store.read_deletes): ``raw`` must
    carry the ``_sgen`` scan-class column (read_postings
    with_gen=True), and a tombstone only masks rows whose source
    segment predates it — a reindexed doc's new postings survive.

    Scale shape: the delete set ships as per-bucket sorted arrays via a
    co-partitioned equi-join on bucket (NOT a broadcast — a 100 TB
    corpus can carry billions of tombstones); rows in buckets with no
    deletes pass through without decoding."""
    import numpy as np
    import pandas as pd

    from inverted_index_spark.functions.codec import (
        DEFAULT_BLOCK,
        decode_postings,
        encode_postings,
    )
    from inverted_index_spark.sources.store import POSTINGS_SCHEMA

    bs = store.pinned_bucket_size()
    if bs is None:
        raise ValueError(
            "store has live deletes but no pinned bucket_size — "
            "cannot map delete doc_ids onto postings buckets"
        )
    if "_sgen" not in raw.columns:
        raise ValueError("_purged_postings needs a with_gen=True scan (_sgen)")
    dmap = (
        store.read_deletes(spark, with_gen=True)
        .select(F.expr(f"cast(doc_id div {int(bs)} as long)").alias("bucket"),
                "doc_id", "del_gen")
        .groupBy("bucket")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("doc_id", "del_gen"))
            ).alias("dels_arr")
        )
    )
    # itertuples drops underscore-prefixed names → rename for the kernel
    joined = raw.withColumnRenamed("_sgen", "sgen").join(dmap, "bucket", "left")
    cols = list(POSTINGS_SCHEMA.fieldNames())

    def run(batches):
        for pdf in batches:
            outs = []
            hit = pdf["dels_arr"].notna()
            clean = pdf[~hit]
            if len(clean):
                outs.append(clean[cols])
            for row in pdf[hit].itertuples(index=False):
                # struct array sorted by doc_id (first struct field)
                dels = np.asarray([s["doc_id"] for s in row.dels_arr], np.int64)
                gens = np.asarray([s["del_gen"] for s in row.dels_arr], np.int64)
                # scope: only tombstones NEWER than this row's segment
                # apply; prune to the row's doc envelope
                lo = int(np.searchsorted(dels, row.min_doc, "left"))
                hi = int(np.searchsorted(dels, row.max_doc, "right"))
                sub = dels[lo:hi][gens[lo:hi] > np.int64(row.sgen)]
                if row.df == 0 or not len(sub):
                    # empty-postings term registration, or no overlap
                    outs.append(pd.DataFrame([{c: getattr(row, c) for c in cols}]))
                    continue
                d, tf, dl = decode_postings(
                    row.postings, row.tfs, row.dls, list(row.blocks)
                )
                di = d.view(np.int64)
                mask = ~np.isin(di, sub)
                if mask.all():
                    outs.append(pd.DataFrame([{c: getattr(row, c) for c in cols}]))
                    continue
                if not mask.any():
                    continue  # every doc deleted → drop the term row
                d2, tf2, dl2 = di[mask], tf[mask], dl[mask]
                p2, t2, l2, blocks2 = encode_postings(
                    d2, tf2, dl2, block_size=DEFAULT_BLOCK
                )
                outs.append(
                    pd.DataFrame(
                        [{
                            "bucket": row.bucket,
                            "term": row.term,
                            "df": len(d2),
                            "postings": p2,
                            "tfs": t2,
                            "dls": l2,
                            "blocks": blocks2,
                            "min_doc": int(d2[0]),
                            "max_doc": int(d2[-1]),
                        }]
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return joined.mapInPandas(run, schema=POSTINGS_SCHEMA)


class Searcher:
    def __init__(self, spark: SparkSession, store: SegmentStore):
        self.spark = spark
        self.store = store
        self._postings: DataFrame | None = None
        self._dfs: DataFrame | None = None
        self._stats: tuple[int, float] | None = None
        self._df_memo: dict[str, int] = {}
        self._df_complete = False
        self._single_segment = len(store.live_segments()) <= 1
        self._field_subs: dict[tuple[str, str], "Searcher"] = {}

    # ------------------------------------------------------------- open ---
    def open(self, preload_dfs_max_terms: int = 100_000) -> "Searcher":
        # cache pre-partitioned BY BUCKET: every per-query
        # groupBy("bucket").applyInPandas then satisfies its clustered
        # distribution straight off the cache and Catalyst elides the
        # per-query exchange — a WAND/topk query becomes ONE stage over
        # cached columnar batches plus a TakeOrdered merge (one-time
        # shuffle here instead of one per query)
        if self.store.has_deletes():
            # physically purge live deletes into the cache ONCE —
            # every kernel (WAND, exhaustive, batch, read_values) then
            # scores only surviving docs with exact surviving df, and
            # per-query paths pay nothing for delete support. The scan
            # carries _sgen so the purge is generation-scoped (a
            # reindexed doc's new postings survive its tombstone).
            raw = _purged_postings(
                self.spark, self.store,
                self.store.read_postings(self.spark, with_gen=True),
            )
        else:
            raw = self.store.read_postings(self.spark)
        self._postings = raw.repartition("bucket").cache()
        self._postings.count()  # materialize
        self._stats = _bm25.corpus_stats(self.spark, self.store)
        # preload the whole term→df dictionary when it fits (the
        # reference eagerly caches all bitmaps at open the same way,
        # single/single.go:742-788) → df lookups cost zero Spark jobs.
        # HARD-BOUNDED on every path (round-3): the manifest's n_terms
        # is an approx_count_distinct estimate, so the collect itself
        # carries a .limit(cap + 1) — the driver can never pull an
        # unbounded-by-data row count no matter what the estimate says.
        n_terms = int(self.store.live_segments()["n_terms"].sum() or 0)
        cap = preload_dfs_max_terms
        if self._single_segment and 0 < n_terms <= int(cap * 1.05):
            rows = (
                self._postings.groupBy("term")
                .agg(F.sum("df").alias("df"))
                .limit(cap + 1)
                .collect()
            )
            if len(rows) <= cap:
                self._df_memo.update({r["term"]: int(r["df"]) for r in rows})
                self._df_complete = True
        return self

    def field_searcher(self, name: str, store: SegmentStore) -> "Searcher":
        """Warm per-field sub-searcher (round-5): Field clauses in
        boolean.evaluate ride a cached sub-Searcher instead of a fresh
        store scan per query — the same open-once query-many shape the
        default store gets. Keyed by (name, root) so a refreshed
        field_stores map re-opens; closed with the parent."""
        key = (name, store.root)
        if key not in self._field_subs:
            self._field_subs[key] = Searcher(self.spark, store).open()
        return self._field_subs[key]

    def close(self) -> None:
        if self._postings is not None:
            self._postings.unpersist()
            self._postings = None
        if self._dfs is not None:
            self._dfs.unpersist()
            self._dfs = None
        if getattr(self, "_positions", None) is not None:
            self._positions.unpersist()
            self._positions = None
        for sub in self._field_subs.values():
            sub.close()
        self._field_subs.clear()

    def refresh(self) -> "Searcher":
        """Re-open against the CURRENT manifest snapshot. A Searcher
        holds the segment set it opened with; after a compaction the
        old segments survive only through cleanup's grace window, and a
        cache eviction would try to re-read deleted files. Long-lived
        searchers should refresh() after compaction (or size the grace
        window above their lifetime)."""
        self.close()
        self._stats = None
        self._df_memo.clear()
        self._df_complete = False
        self._n_postings_memo = None
        self._single_segment = len(self.store.live_segments()) <= 1
        return self.open()

    @property
    def postings(self) -> DataFrame:
        if self._postings is None:
            self.open()
        return self._postings

    # ---------------------------------------------------------- doc store ---
    def fetch_text(self, results: DataFrame, max_pruned_buckets: int = 10_000) -> DataFrame:
        """Hydrate a (doc_id, ...) result DataFrame with the stored turn
        text (build_index(store_text=True)); per-turn text is preserved
        byte-for-byte (input_hint equality invariant).

        Scale shape: the doc store is NEVER cached or scanned whole — a
        result page touches few doc-buckets, so the page's distinct
        buckets (a bounded collect: pages are top-k-sized) become a
        ``bucket IN (...)`` predicate pushed into the doc-store scan,
        and the row-group stats skip everything else. Pages touching
        more than ``max_pruned_buckets`` buckets fall back to a plain
        join (at that size the scan is no longer sparse anyway).

        Pre-versioned manifests don't record bucket_size — computing
        page buckets with a guessed width would produce bucket keys
        that match NO stored rows, so the pushed IN-filter would
        silently hydrate every result with null text. Those stores take
        the plain-join path (no bucket pruning) instead."""
        bs = self.store.pinned_bucket_size()
        if bs is None:
            docs = self.store.read_docs(self.spark)
            return results.join(docs.select("doc_id", "text"), "doc_id", "left")
        page_buckets = (
            results.select(
                F.expr(f"cast(doc_id div {int(bs)} as long)").alias("b")
            )
            .distinct()
            .limit(max_pruned_buckets + 1)
            .collect()
        )
        buckets = (
            [int(r["b"]) for r in page_buckets]
            if len(page_buckets) <= max_pruned_buckets
            else None
        )
        docs = self.store.read_docs(self.spark, buckets=buckets)
        return results.join(docs.select("doc_id", "text"), "doc_id", "left")

    # ------------------------------------------------------------ phrase ---
    def phrase(
        self,
        phrase: list[str],
        min_doc: int | None = None,
        max_doc: int | None = None,
        slop: int = 0,
    ) -> DataFrame:
        """phrase_match over a LAZILY cached positions scan — open-once
        query-many for phrase workloads, mirroring the postings cache
        (the artifact is only read/cached on the first phrase query, so
        non-phrase searchers pay nothing)."""
        from inverted_index_spark.operators.positions import (
            phrase_match_rows,
            read_positions,
        )

        if getattr(self, "_positions", None) is None:
            # with_gen when deletes are live: the cached rows carry
            # _sgen so phrase_match_rows applies the scoped filter on
            # decoded occurrences (pre-kernel)
            self._positions = read_positions(
                self.spark, self.store, with_gen=self.store.has_deletes()
            ).cache()
            self._positions.count()
        return phrase_match_rows(
            self.spark, self._positions, phrase, min_doc, max_doc, slop,
            store=self.store,
        )

    # ------------------------------------------------------------ boolean ---
    def search(
        self,
        q,
        min_doc: int | None = None,
        max_doc: int | None = None,
        field_stores=None,
    ):
        """Boolean search over the CACHED postings/positions — the
        open-once query-many surface for the algebra and the string
        grammar (operators.boolean). Term/Phrase leaves read the warm
        caches; Prefix/Fuzzy leaves fall back to store scans (their
        dictionary predicates prune at the parquet scan, which the
        bucket-partitioned cache layout does not help with)."""
        from inverted_index_spark.operators import boolean as _b

        if isinstance(q, str):
            q = _b.parse_query(q)
        return _b.evaluate(
            self.spark, self.store, q, min_doc, max_doc,
            searcher=self, field_stores=field_stores,
        )

    @property
    def stats(self) -> tuple[int, float]:
        if self._stats is None:
            self._stats = _bm25.corpus_stats(self.spark, self.store)
        return self._stats

    # ------------------------------------------------------------ reads ---
    def _matching(self, terms: list[str], min_doc=None, max_doc=None) -> DataFrame:
        from inverted_index_spark.operators.query import term_in_pred

        out = self.postings.where(term_in_pred("term", list(terms)))
        if min_doc is not None:
            out = out.where(F.col("max_doc") >= F.lit(int(min_doc)))
        if max_doc is not None:
            out = out.where(F.col("min_doc") <= F.lit(int(max_doc)))
        return out

    def _df_table(self) -> DataFrame:
        """Cached (term, df) dictionary for multi-segment stores —
        computed ONCE from the cached postings (decode + cross-segment
        countDistinct, proportionate to what open() already cached),
        then every term_dfs batch is a filter over cached columnar
        batches instead of a fresh per-query decode (round-4; the
        reference's eager bitmap cache has the same open-once shape)."""
        if self._dfs is None:
            decoded = self.postings.mapInPandas(
                lambda it: _decode_rows(it, None, None, False),
                schema="term string, doc_id long",
            )
            self._dfs = (
                decoded.groupBy("term")
                .agg(F.countDistinct("doc_id").alias("df"))
                .cache()
            )
            self._dfs.count()
        return self._dfs

    def term_dfs(self, terms: list[str]) -> dict[str, int]:
        if self._df_complete:
            return {
                t: self._df_memo[t]
                for t in set(terms)
                if self._df_memo.get(t, 0) > 0
            }
        missing = [t for t in set(terms) if t not in self._df_memo]
        if missing:
            if self._single_segment:
                rows = (
                    self._matching(missing)
                    .groupBy("term")
                    .agg(F.sum("df").alias("df"))
                    .collect()
                )
            else:
                rows = (
                    self._df_table()
                    .where(F.col("term").isin(missing))
                    .collect()
                )
            found = {r["term"]: int(r["df"]) for r in rows}
            for t in missing:
                self._df_memo[t] = found.get(t, 0)
        return {t: self._df_memo[t] for t in set(terms) if self._df_memo[t] > 0}

    # latency gate bounds: a read whose Σdf bound is under
    # SMALL_READ_CAP (≤ ~16 MB of raw doc_ids) on a store whose TOTAL
    # postings fit under SINGLE_TASK_SCAN_CAP runs as ONE task over the
    # cache instead of a 3-stage distinct + range-sorted plan
    SMALL_READ_CAP = 2_000_000
    SINGLE_TASK_SCAN_CAP = 20_000_000

    def read_values(self, terms: list[str], min_doc=None, max_doc=None) -> DataFrame:
        if not terms:
            return self.spark.range(0).select(F.col("id").alias("doc_id"))
        rows = self._matching(terms, min_doc, max_doc)
        # Latency gate: when the complete term→df dictionary is warm
        # (single-segment open), Σdf over the query terms bounds the
        # result rows DRIVER-SIDE for free. A small read on a modest
        # store then collapses to ONE task — one scan of the cached
        # postings, decode, np.unique — no distinct exchange, no
        # orderBy range-sampling job. Measured on the 120k-turn bench
        # store: 0.60 s/read → 0.31 s/read. The second cap keeps the
        # single task honest at scale: a coalesce(1) scan serializes
        # the WHOLE cache through one executor, so stores past
        # SINGLE_TASK_SCAN_CAP total postings keep the declarative
        # distinct().orderBy() plan (the 100 TB shape) regardless of
        # result size.
        if self._df_complete:
            bound = sum(self._df_memo.get(t, 0) for t in set(terms))
            if (
                bound <= self.SMALL_READ_CAP
                and self._n_postings() <= self.SINGLE_TASK_SCAN_CAP
            ):

                def _one_task(batches):
                    chunks = [
                        pdf["doc_id"].to_numpy(np.int64)
                        for pdf in _decode_rows(batches, min_doc, max_doc, False)
                    ]
                    vals = (
                        np.unique(np.concatenate(chunks))
                        if chunks
                        else np.zeros(0, dtype=np.int64)
                    )
                    yield pd.DataFrame({"doc_id": vals})

                return rows.coalesce(1).mapInPandas(_one_task, schema="doc_id long")
        decoded = rows.mapInPandas(
            lambda it: _decode_rows(it, min_doc, max_doc, False),
            schema="term string, doc_id long",
        )
        return decoded.select("doc_id").distinct().orderBy("doc_id")

    def _n_postings(self) -> int:
        """Total live postings from the manifest (cached at first use):
        the driver-side proxy for how big a single-task cache scan
        would be."""
        if getattr(self, "_n_postings_memo", None) is None:
            self._n_postings_memo = int(
                self.store.live_segments()["n_postings"].sum() or 0
            )
        return self._n_postings_memo

    def read_values_batch(
        self, queries: dict[str, tuple[list[str], int | None, int | None]]
    ) -> DataFrame:
        """MANY R10 reads in ONE Spark job: qid → (terms, min_doc,
        max_doc) → rows (qid, doc_id), sorted unique per qid. Same
        amortization shape as :meth:`topk_batch` — one pass over the
        union of matched postings, each block decoded at most once for
        the whole batch, per-query range slicing via binary search."""
        import numpy as np
        import pandas as pd

        from inverted_index_spark.functions.codec import decode_postings

        qmap = {
            qid: (sorted(set(ts)), lo, hi) for qid, (ts, lo, hi) in queries.items() if ts
        }
        if not qmap:
            return self.spark.createDataFrame([], "qid string, doc_id long")
        all_terms = sorted({t for ts, _, _ in qmap.values() for t in ts})
        lo_all = [lo for _, lo, _ in qmap.values()]
        hi_all = [hi for _, _, hi in qmap.values()]
        g_lo = None if any(x is None for x in lo_all) else min(lo_all)
        g_hi = None if any(x is None for x in hi_all) else max(hi_all)
        rows = self._matching(all_terms, g_lo, g_hi)
        term_qids: dict[str, list[str]] = {}
        for qid, (ts, _, _) in qmap.items():
            for t in ts:
                term_qids.setdefault(t, []).append(qid)

        # large batches ride a broadcast, not the task closure: a 100k-
        # query map serialized into EVERY task would dominate task
        # launch; a broadcast ships once per executor. `payload` is
        # None'd when broadcasting so the closure doesn't ALSO pickle
        # the raw dicts.
        payload = (qmap, term_qids)
        bc = _maybe_broadcast(self.spark, payload)
        if bc is not None:
            payload = None

        def run(batches):
            _qmap, _term_qids = bc.value if bc is not None else payload
            for pdf in batches:
                out_qid, out_doc = [], []
                for term, p, t, l, blocks in zip(
                    pdf["term"], pdf["postings"], pdf["tfs"], pdf["dls"], pdf["blocks"]
                ):
                    qids = _term_qids.get(term)
                    if not qids:
                        continue
                    d, _, _ = decode_postings(p, t, l, blocks, g_lo, g_hi)
                    if not len(d):
                        continue
                    for qid in qids:
                        _, lo, hi = _qmap[qid]
                        a = 0 if lo is None else int(np.searchsorted(d, lo, "left"))
                        b = len(d) if hi is None else int(np.searchsorted(d, hi, "right"))
                        if a == b:
                            continue
                        out_qid.append(np.repeat(qid, b - a))
                        out_doc.append(d[a:b])
                if out_qid:
                    yield pd.DataFrame(
                        {
                            "qid": np.concatenate(out_qid),
                            "doc_id": np.concatenate(out_doc).astype(np.int64),
                        }
                    )

        decoded = rows.mapInPandas(run, schema="qid string, doc_id long")
        return decoded.distinct().orderBy("qid", "doc_id")

    # ------------------------------------------------------------ BM25 ---
    def topk_batch(
        self, queries: dict[str, list[str]], k: int = 10, use_wand: bool = False
    ) -> DataFrame:
        """Run MANY BM25 top-k queries in ONE Spark job: (qid, rank,
        doc_id, score). Amortizes per-job scheduling latency across the
        batch — the idiomatic Spark shape for query throughput (a
        1000-executor cluster serves a query *stream* as unioned
        batches, not one job per query).

        Plan: ONE pass over the matched postings grouped by bucket; the
        query map rides in the task closure (small); inside each bucket
        every query runs over shared block handles, so each posting
        block is decoded AT MOST ONCE for the whole batch and no
        posting bytes are ever duplicated per query through a shuffle.
        Output is only ≤ k rows per (bucket, query) → window top-k.

        Default scorer is the VECTORIZED exhaustive kernel, not WAND
        (results identical — both are tested/oracle-gated): with blocks
        already decoded once per batch, WAND's per-span Python
        bookkeeping costs more than its pruning saves, measured 2x at
        2M turns (27 → 56 QPS at 32 cores, 300-query batch). WAND
        remains the right engine for the per-query path (topk), where
        k ≪ matched docs and pruning bounds the decode itself.
        """
        from pyspark.sql import Window
        import pandas as pd

        n_docs, avgdl = self.stats
        all_terms = sorted({t for ts in queries.values() for t in ts})
        dfs = self.term_dfs(all_terms)
        idf_map = {t: _bm25.idf(n_docs, dfs[t]) for t in all_terms if t in dfs}
        qmap = {
            qid: [t for t in sorted(set(ts)) if t in idf_map]
            for qid, ts in queries.items()
        }
        qmap = {qid: ts for qid, ts in qmap.items() if ts}
        if not qmap or n_docs == 0:
            return self.spark.createDataFrame(
                [], "qid string, rank int, doc_id long, score double"
            )
        live_terms = sorted({t for ts in qmap.values() for t in ts})
        rows = self._matching(live_terms)
        # large batches ride a broadcast, not the task closure (one
        # copy per executor instead of per task); payload None'd when
        # broadcasting so the closure doesn't also pickle the dicts
        payload = (qmap, idf_map)
        bc = _maybe_broadcast(self.spark, payload)
        if bc is not None:
            payload = None

        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            _qmap, _idf_map = bc.value if bc is not None else payload
            qids, docs, scores = [], [], []
            if use_wand:
                handles = {
                    t: _wand._term_handles(grp)
                    for t, grp in pdf.groupby("term", sort=True)
                }
                for qid, ts in _qmap.items():
                    sub = {t: handles[t] for t in ts if t in handles}
                    if not sub:
                        continue
                    for d, s in _wand._wand_from_handles(sub, _idf_map, avgdl, k):
                        qids.append(qid)
                        docs.append(d)
                        scores.append(s)
            else:
                # per-posting contributions are query-independent —
                # decode + score ONCE per bucket (round-6; was half the
                # kernel profile via per-query handle work), then each
                # query is a concat + unique + bincount over its terms'
                # slices. Identical accumulation order to the handle
                # path (see _materialized_contributions).
                contribs = _wand._materialized_contributions(
                    pdf, _idf_map, avgdl
                )
                for qid, ts in _qmap.items():
                    for d, s in _wand._topk_from_contributions(ts, contribs, k):
                        qids.append(qid)
                        docs.append(d)
                        scores.append(s)
            return pd.DataFrame(
                {
                    "qid": pd.Series(qids, dtype="object"),
                    "doc_id": pd.Series(docs, dtype="int64"),
                    "score": pd.Series(scores, dtype="float64"),
                }
            )

        local = rows.groupBy("bucket").applyInPandas(
            run, schema="qid string, doc_id long, score double"
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
        return (
            local.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", "rank", "doc_id", "score")
        )

    def _topk_one_task(
        self, rows: DataFrame, idf_map: dict[str, float], avgdl: float, k: int
    ) -> DataFrame:
        """Single-task exact BM25 top-k over the matched posting rows
        (the gated small-query plan; single-segment stores only, so no
        cross-segment duplicate rows can reach the accumulator)."""
        from inverted_index_spark.functions.codec import decode_postings

        k1, b = _bm25.K1, _bm25.B

        def _run(batches):
            doc_parts, contrib_parts = [], []
            for pdf in batches:
                for term, p, t, l, blocks in zip(
                    pdf["term"], pdf["postings"], pdf["tfs"], pdf["dls"], pdf["blocks"]
                ):
                    d, tf, dl = decode_postings(p, t, l, blocks)
                    if not len(d):
                        continue
                    w = idf_map[term]
                    c = w * tf.astype(np.float64) / (
                        tf.astype(np.float64)
                        + k1 * (1 - b + b * dl.astype(np.float64) / avgdl)
                    )
                    doc_parts.append(d.astype(np.int64))
                    contrib_parts.append(c)
            if not doc_parts:
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series(dtype="int64"),
                        "score": pd.Series(dtype="float64"),
                    }
                )
                return
            dd = np.concatenate(doc_parts)
            cc = np.concatenate(contrib_parts)
            uniq_d, inv = np.unique(dd, return_inverse=True)
            sums = np.bincount(inv, weights=cc, minlength=len(uniq_d))
            order = np.lexsort((uniq_d, -sums))[:k]  # score desc, doc asc
            yield pd.DataFrame({"doc_id": uniq_d[order], "score": sums[order]})

        out = rows.coalesce(1).mapInPandas(_run, schema="doc_id long, score double")
        # one partition in, ≤k rows out: a partition-local sort pins the
        # global (score desc, doc_id asc) contract without an exchange
        return out.sortWithinPartitions(F.desc("score"), F.asc("doc_id"))

    def topk(self, terms: list[str], k: int = 10, use_wand: bool = True) -> DataFrame:
        uniq = sorted(set(terms))
        n_docs, avgdl = self.stats
        dfs = self.term_dfs(uniq)
        idf_map = {t: _bm25.idf(n_docs, dfs[t]) for t in uniq if t in dfs}
        if not idf_map or n_docs == 0:
            return self.spark.range(0).select(
                F.col("id").alias("doc_id"), F.lit(0.0).alias("score")
            )
        rows = self._matching(list(idf_map))
        # Latency gate (mirrors read_values): a small query on a
        # df-complete store scores in ONE task — decode + per-doc
        # bincount + top-k inside a single mapInPandas pass over the
        # cached postings; no bucket exchange, no TakeOrdered merge.
        # Both kernels are exact, so the gated plan answers either
        # use_wand setting with identical rows. Σdf bounds the decoded
        # rows driver-side for free; the scan cap keeps the coalesce(1)
        # plan off stores big enough that serializing the whole cache
        # through one executor would be the new bottleneck.
        if self._df_complete:
            bound = sum(dfs.get(t, 0) for t in idf_map)
            if (
                bound <= self.SMALL_READ_CAP
                and self._n_postings() <= self.SINGLE_TASK_SCAN_CAP
            ):
                return self._topk_one_task(rows, idf_map, avgdl, k)
        if use_wand:
            import pandas as pd

            def run(pdf: pd.DataFrame) -> pd.DataFrame:
                return _wand._wand_bucket(pdf, idf_map, avgdl, k)

            local = rows.groupBy("bucket").applyInPandas(
                run, schema="doc_id long, score double"
            )
            return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        # exhaustive path with MAP-SIDE PARTIAL AGGREGATION: scores are
        # computed and pre-summed per doc inside the Arrow batch, so
        # only ≤(distinct docs per batch) small rows hit the shuffle —
        # never the exploded postings. Buckets are disjoint doc ranges,
        # so partial sums per doc are always combinable.
        import numpy as np
        import pandas as pd

        k1, b = _bm25.K1, _bm25.B

        from inverted_index_spark.functions.codec import decode_postings

        def score_batches(batches):
            for pdf in batches:
                doc_parts, contrib_parts = [], []
                for term, p, t, l, blocks in zip(
                    pdf["term"], pdf["postings"], pdf["tfs"], pdf["dls"], pdf["blocks"]
                ):
                    d, tf, dl = decode_postings(p, t, l, blocks)
                    if not len(d):
                        continue
                    w = idf_map[term]
                    c = w * tf.astype(np.float64) / (
                        tf.astype(np.float64)
                        + k1 * (1 - b + b * dl.astype(np.float64) / avgdl)
                    )
                    doc_parts.append(d.astype(np.int64))
                    contrib_parts.append(c)
                if not doc_parts:
                    continue
                dd = np.concatenate(doc_parts)
                cc = np.concatenate(contrib_parts)
                uniq, inv = np.unique(dd, return_inverse=True)
                # bincount, not add.at: ~10x faster on repeated indices
                # (measured for the batch kernel, wand.py)
                sums = np.bincount(inv, weights=cc, minlength=len(uniq))
                yield pd.DataFrame({"doc_id": uniq, "score": sums})

        partial = rows.mapInPandas(score_batches, schema="doc_id long, score double")
        if not self._single_segment:
            # pre-compaction overlap: fall back to exact dedup path
            decoded = rows.mapInPandas(
                lambda it: _decode_rows(it, None, None, True),
                schema="term string, doc_id long, tf long, dl long",
            ).dropDuplicates(["term", "doc_id"])
            idf_expr = F.create_map(
                *[x for t, w in idf_map.items() for x in (F.lit(t), F.lit(float(w)))]
            )
            partial = decoded.select(
                "doc_id",
                (
                    idf_expr[F.col("term")]
                    * F.col("tf")
                    / (
                        F.col("tf")
                        + _bm25.K1
                        * (1 - _bm25.B + _bm25.B * F.col("dl") / F.lit(float(avgdl)))
                    )
                ).alias("score"),
            )
        return (
            partial.groupBy("doc_id")
            .agg(F.sum("score").alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )
