"""Iceberg-backed segment catalog — the production home for the
SegmentStore manifest (SURVEY.md §7.0 names this as the north-rule
storage; BASELINE.json input_hint says "Iceberg transcript tables").

The parquet SegmentStore already implements Iceberg's commit model by
hand: an immutable snapshot per commit (gen-N.parquet), an atomic
pointer advance, optimistic-retry CAS, tombstones with a grace window.
This adapter swaps that hand-rolled layer for a real Iceberg catalog
when one is configured, keeping the exact SegmentStore interface so
every operator (build/query/merge/streaming) runs unchanged:

    manifest row      → row in an Iceberg table `<ns>.ii_manifest`
    commit_segment    → Iceberg APPEND of the new row + a serializable
                        UPDATE flipping victims live→merged (round-3:
                        replaces the read→overwritePartitions commit,
                        which was last-writer-wins under concurrency)
    read_manifest     → snapshot-isolated table scan
    cleanup           → DELETE + expire_snapshots

Commit protocol (mirrors the parquet store's victim-liveness CAS,
store.commit_segment):

    1. UPDATE victims SET status='merged', tombstone_ts=<unique mark>
       WHERE segment_id IN (...) AND status='live'   -- serializable
    2. count rows WHERE tombstone_ts = <mark>; a shortfall means a
       racing compactor already consumed a victim → COMPENSATE
       (flip our marks back to live) and raise ErrMergeConflict
    3. append the new live segment row (appends never conflict)

Appends are conflict-free in Iceberg; the only contended operation is
the victim flip, where Iceberg's serializable isolation on row-level
UPDATE provides the write-write conflict detection the os.link CAS
provides on parquet. The compensation in step 2 restores victims the
loser tombstoned before it learned it lost (readers can observe the
transient tombstone for the duration of one statement — same blast
radius as the parquet store's tombstone grace window).

Availability is probed at call time: this sandbox ships NO Iceberg
runtime (no iceberg-spark-runtime jar in /opt/spark/jars, no
pyiceberg), so the adapter raises a clear error here and the parquet
store remains the tested default. `tests/test_iceberg_store.py` skips
unless a catalog is configured (`spark.sql.catalog.<name>` conf);
`tests/test_iceberg_mock.py` exercises the commit protocol against a
mock catalog (append/update/count semantics simulated in pandas).
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import SparkSession

from inverted_index_spark.sources.store import (
    DELETES,
    LIVE,
    MANIFEST_COLS,
    MERGED,
    ErrMergeConflict,
    SegmentStore,
)


def _next_row_generation(manifest: pd.DataFrame) -> int:
    """Next ``generation_added`` for a manifest commit: one past the
    max generation of EVERY row present (any status). Row count is not
    a valid stand-in — cleanup() row-deletes retired rows, and a
    shrunken count would mint generations below live rows', breaking
    the gen-scoped delete rule (a batch applies only to segments with
    a strictly lower generation)."""
    if not len(manifest):
        return 1
    gens = pd.to_numeric(manifest["generation_added"], errors="coerce").fillna(0)
    return int(gens.max()) + 1


def iceberg_available(spark: SparkSession, catalog: str = "ii_catalog") -> bool:
    """True iff an Iceberg catalog is configured AND its classes load."""
    impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
    if not impl:
        return False
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.catalog.Catalog")
        return True
    except Exception:
        return False


@dataclass
class IcebergSegmentStore(SegmentStore):
    """SegmentStore whose manifest lives in an Iceberg table.

    Segment DATA stays as parquet under ``root`` (same layout, same
    readers); only the commit/catalog layer moves to Iceberg, which is
    where the concurrency guarantees live. Requires an Iceberg catalog
    on the session (spark-submit --packages iceberg-spark-runtime).
    """

    spark: SparkSession = None
    catalog: str = "ii_catalog"
    namespace: str = "ii"

    def _table(self) -> str:
        return f"{self.catalog}.{self.namespace}.ii_manifest"

    def _ensure(self) -> None:
        if not iceberg_available(self.spark, self.catalog):
            raise RuntimeError(
                f"no Iceberg catalog '{self.catalog}' on this session — "
                "add iceberg-spark-runtime and spark.sql.catalog.* conf, "
                "or use the parquet SegmentStore (default)"
            )
        cols = ", ".join(f"{c} STRING" if c in ("segment_id", "path", "status",
                                                "build_id", "input_fingerprint")
                         else f"{c} DOUBLE" if c in ("terms_per_sec", "skew_ratio",
                                                     "created_ts", "tombstone_ts")
                         else f"{c} BIGINT"
                         for c in MANIFEST_COLS)
        self.spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.catalog}.{self.namespace}")
        self.spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self._table()} ({cols}) USING iceberg "
            "TBLPROPERTIES ('commit.retry.num-retries'='20', "
            "'write.update.isolation-level'='serializable')"
        )

    def _snapshot_ids(self) -> list[int]:
        """Snapshot ids in commit order — position k (1-based) is the
        table state after the k-th commit, the Iceberg image of the
        parquet backend's gen-k.parquet."""
        rows = self.spark.sql(
            f"SELECT snapshot_id FROM {self._table()}.snapshots "
            "ORDER BY committed_at, snapshot_id"
        ).collect()
        return [int(r["snapshot_id"]) for r in rows]

    def at(self, generation: int) -> "IcebergSegmentStore":
        """Time travel via Iceberg's own snapshot log (VERSION AS OF);
        generation numbering matches current_generation (snapshot
        count). Expired snapshots (expire_snapshots) raise, exactly
        like the parquet backend after expire_generations."""
        self._ensure()
        gen = int(generation)
        if gen < 1:
            raise ValueError(f"generation must be >= 1, got {generation}")
        snaps = self._snapshot_ids()
        if gen > len(snaps):
            raise FileNotFoundError(
                f"generation {gen} not available (current={len(snaps)}; "
                "older snapshots may have been expired)"
            )
        return IcebergSegmentStore(
            root=self.root, pin_generation=gen, spark=self.spark,
            catalog=self.catalog, namespace=self.namespace,
        )

    def generations(self) -> list[int]:
        self._ensure()
        return list(range(1, len(self._snapshot_ids()) + 1))

    def read_manifest(self) -> pd.DataFrame:
        self._ensure()
        if self.pin_generation is not None:
            snaps = self._snapshot_ids()
            if self.pin_generation > len(snaps):
                raise FileNotFoundError(
                    f"pinned generation {self.pin_generation} has no "
                    "snapshot (expired or never committed)"
                )
            sid = snaps[self.pin_generation - 1]
            return (
                self.spark.sql(
                    f"SELECT * FROM {self._table()} VERSION AS OF {sid}"
                )
                .toPandas()
                .reindex(columns=MANIFEST_COLS)
            )
        return (
            self.spark.table(self._table()).toPandas().reindex(columns=MANIFEST_COLS)
        )

    def current_generation(self) -> int:
        """Snapshot count stands in for the parquet gen number."""
        self._ensure()
        return int(
            self.spark.sql(
                f"SELECT count(*) AS n FROM {self._table()}.snapshots"
            ).collect()[0]["n"]
        )

    def commit_segment(
        self,
        segment_id: str,
        stats: dict,
        replaces: list[str] | None = None,
        retire_deletes: list[str] | None = None,
        attach_deletes: tuple[str, int] | None = None,
        expect_deletes: list[str] | None = None,
    ) -> int:
        """Append-only commit with a validated victim flip (module
        docstring has the full protocol). Raises ErrMergeConflict when
        a racing compactor already consumed a victim, or (with
        ``expect_deletes``, see store.commit_segment) when a delete
        batch landed mid-merge — here the check reads the table just
        before the victim flip, so unlike the parquet transform it can
        only race a batch appended within the flip→append window (the
        same check-then-act caveat the retire path documents).

        ``generation_added`` is read as max(generation_added)+1 just
        before the append (the parquet store's gen counter is the CAS
        file number; here two RACING appends can observe the same max
        and tie). Row count would NOT work: cleanup() row-deletes
        retired rows, and a shrunken count would mint generations
        BELOW live rows' — a later delete batch would then scope as
        if it predated existing segments and never apply.
        Generation ties are harmless between segments (segments never
        scope against each other) and conservative between a delete
        batch and a racing segment (equal gen ⇒ the batch does NOT
        apply — the reindex-safe direction). ``attach_deletes`` lands
        the staged batch row in the SAME append as the segment row
        (one Iceberg snapshot → atomic), at the same generation."""
        if self.pin_generation is not None:
            raise PermissionError(
                "store is a read-only snapshot (at()); cannot commit segments"
            )
        self._ensure()
        tbl = self._table()
        if expect_deletes is not None:
            base = self.read_manifest()
            live_del = (
                set(base.loc[base["status"] == DELETES, "segment_id"])
                if len(base)
                else set()
            )
            unseen = live_del - set(expect_deletes)
            if unseen:
                raise ErrMergeConflict(
                    f"delete batch(es) {sorted(unseen)} committed while the "
                    "merge ran — re-merge against the fresh delete set"
                )
        if replaces:
            ids = ", ".join(f"'{s}'" for s in replaces)
            # unique mark → we can count and (on conflict) compensate
            # exactly the rows THIS commit flipped
            mark = float(f"{time.time():.6f}") + (uuid.uuid4().int % 997) * 1e-9
            self.spark.sql(
                f"UPDATE {tbl} SET status = '{MERGED}', tombstone_ts = {mark!r} "
                f"WHERE segment_id IN ({ids}) AND status = '{LIVE}'"
            )
            flipped = int(
                self.spark.sql(
                    f"SELECT count(*) AS n FROM {tbl} WHERE tombstone_ts = {mark!r}"
                ).collect()[0]["n"]
            )
            if flipped != len(set(replaces)):
                # a racer tombstoned some victim first → restore ours, abort
                self.spark.sql(
                    f"UPDATE {tbl} SET status = '{LIVE}', tombstone_ts = 0.0 "
                    f"WHERE tombstone_ts = {mark!r}"
                )
                raise ErrMergeConflict(
                    f"{len(set(replaces)) - flipped} merge victim(s) no longer "
                    "live — a racing compaction already consumed them"
                )
        gen = _next_row_generation(self.read_manifest())
        row = {c: None for c in MANIFEST_COLS}
        row.update(
            {
                "segment_id": segment_id,
                "path": self.seg_dir(segment_id),
                "generation_added": gen,
                "status": LIVE,
                "created_ts": time.time(),
                "tombstone_ts": 0.0,
                "build_id": stats.get("build_id", ""),
                "chunk": stats.get("chunk", -1),
                "input_fingerprint": stats.get("input_fingerprint", ""),
                "terms_per_sec": stats.get("terms_per_sec", 0.0),
                "skew_ratio": stats.get("skew_ratio", 0.0),
                "bucket_size": stats.get("bucket_size", 0),
                **{
                    k: stats.get(k, 0)
                    for k in (
                        "n_terms", "n_postings", "n_docs", "sum_dl", "bytes",
                        "min_doc", "max_doc",
                    )
                },
            }
        )
        rows = [row]
        if attach_deletes is not None:
            d_id, d_n = attach_deletes
            rows.append(
                self._delete_row(d_id, d_n, gen).iloc[0].to_dict()
            )
        self.spark.createDataFrame(pd.DataFrame(rows)[MANIFEST_COLS]).writeTo(
            tbl
        ).append()
        if retire_deletes:
            # retire absorbed delete batches with the generation-scoped
            # rule (parquet twin in store.commit_segment): a batch may
            # retire iff no OTHER live segment PREDATES it. Unlike the
            # parquet store's single-transaction check, this is check-
            # then-update across two statements: it can only race a
            # concurrent APPEND, and the worst case is retiring a batch
            # a racing older-gen segment still needs — the same
            # eventual-consistency caveat delete_docs documents. Victim
            # flips (the correctness-critical race) stay serializable.
            floor_row = self.spark.sql(
                f"SELECT min(generation_added) AS g FROM {tbl} "
                f"WHERE status = '{LIVE}' AND segment_id != '{segment_id}'"
            ).collect()[0]
            floor = floor_row["g"]
            ids = ", ".join(f"'{s}'" for s in retire_deletes)
            scope = (
                "" if floor is None
                else f" AND generation_added <= {int(floor)}"
            )
            self.spark.sql(
                f"UPDATE {tbl} SET status = '{MERGED}', "
                f"tombstone_ts = {time.time()!r} "
                f"WHERE segment_id IN ({ids}) AND status = '{DELETES}'{scope}"
            )
        return self.current_generation()

    def _commit_manifest(self, transform) -> int:
        """Generic-transform commits go through a read→diff path:
        removed rows become row-level DELETEs (cleanup), added rows
        become APPENDs (delete_docs' tombstone-batch row) — both
        compose with concurrent commits instead of overwriting them."""
        if self.pin_generation is not None:
            raise PermissionError(
                f"store is a read-only snapshot pinned at generation "
                f"{self.pin_generation} (at()); commits must go through "
                "an unpinned store"
            )
        self._ensure()
        base = self.read_manifest()
        nxt = transform(base, _next_row_generation(base) - 1)[MANIFEST_COLS]
        gone = set(base["segment_id"]) - set(nxt["segment_id"])
        if gone:
            ids = ", ".join(f"'{s}'" for s in sorted(gone))
            self.spark.sql(
                f"DELETE FROM {self._table()} WHERE segment_id IN ({ids})"
            )
        added = nxt[~nxt["segment_id"].isin(set(base["segment_id"]))]
        if len(added):
            self.spark.createDataFrame(
                added.reset_index(drop=True)[MANIFEST_COLS]
            ).writeTo(self._table()).append()
        return self.current_generation()

    def expire_generations(self, keep: int = 8, grace_s: float = 0.0) -> int:
        """Iceberg's own expire_snapshots owns snapshot retention."""
        if self.pin_generation is not None:
            raise PermissionError(
                "store is a read-only snapshot (at()); expiry is a write"
            )
        return 0
