"""Source/sink helpers (SURVEY.md §2.1).

Round-trip design: every non-parquet format query materializes the
driver's parquet data into the target format under a scratch dir, reads
it back through the format's own scan path, and runs an aggregation —
so CSV/JSON scans and all sinks are still oracle-checkable against the
original table (the round trip must be lossless for the checked columns).

Scale notes: writes go through `df.write` (distributed, one file per
partition — no driver collect); reads are plain `spark.read` scans that
keep Catalyst pushdown/pruning. A partitioned sink (`partitionBy`)
produces the directory layout that enables static partition pruning on
read-back, which the `s_partitioned_sink_pruned` query then exercises.
"""

from __future__ import annotations

import os
import uuid as _uuid

SCRATCH_ROOT = os.environ.get("IRIS_PYSPARK_SCRATCH", "/tmp/iris_pyspark_scratch")

#: Process nonce folded into every artifact fingerprint (round 11) AND
#: into the scratch path itself (round 12). Scratch artifacts are
#: *within-invocation* materializations of a subplan consumed several
#: times (oriented edge lists, MinHash signatures, BM25 postings);
#: serving one built by a PREVIOUS process would make a bench/oracle
#: invocation start from precomputed intermediates instead of the
#: parquet inputs. The nonce makes any artifact from another process
#: read as stale, so each process builds its artifacts exactly once
#: (first use) and reuses them only within itself. Round 12 (ADVICE
#: r11): the token is uuid4-based, not bare getpid() — Linux pid
#: recycling could let a later invocation match an earlier builder's
#: fingerprint and silently serve precomputed intermediates — and the
#: scratch path is scoped by the token so two CONCURRENT invocations
#: (bench + oracle) never share a write target (mode('overwrite')
#: deletes parquet files another process may be lazily reading).
_PROC_TOKEN = f"p{os.getpid()}-{_uuid.uuid4().hex[:10]}"
_PROCESS_NONCE = f"proc={_PROC_TOKEN}"

#: Wall-clock seconds spent BUILDING scratch artifacts this process,
#: keyed by artifact name (additive across rebuilds). bench.py reports
#: this as an additive JSON key so the warm min-of-N per-query numbers
#: can be read alongside the one-time build cost a cold consumer pays
#: (VERDICT r11 task 2).
ARTIFACT_BUILD_SECONDS: dict[str, float] = {}


def record_build_seconds(name: str, sec: float) -> None:
    """Accumulate artifact build time under `name` (see
    ARTIFACT_BUILD_SECONDS)."""
    ARTIFACT_BUILD_SECONDS[name] = round(
        ARTIFACT_BUILD_SECONDS.get(name, 0.0) + sec, 4
    )


def scratch_dir(sf_dir: str, name: str) -> str:
    """Per-(scale-factor, process, query) scratch path. The process
    token segment means concurrent invocations write disjoint trees;
    dead processes' trees are swept by the size-capped GC."""
    sf = os.path.basename(sf_dir.rstrip("/")) or "sf"
    return os.path.join(SCRATCH_ROOT, sf, _PROC_TOKEN, name)


def table_fingerprint(sf_dir: str, *tables: str, params: str = "") -> str:
    """Fingerprint of artifact INPUTS: derivation params + the process
    nonce (see _PROCESS_NONCE) + the absolute path, size, and mtime of
    every source parquet file. Metadata-only — no Spark job, no data
    read. Changes whenever the driver regenerates the scale-factor
    data, a differently-located sf_dir shares a basename with a cached
    one, the derivation parameters change, or another process built the
    artifact — the stale-reuse failure modes of a bare path check plus
    the cross-invocation-precomputation one."""
    parts = [_PROCESS_NONCE, params]
    for t in tables:
        p = os.path.abspath(os.path.join(sf_dir, f"{t}.parquet"))
        st = os.stat(p)
        parts.append(f"{p}:{st.st_size}:{st.st_mtime_ns}")
    return "|".join(parts)


def _fingerprint_file(path: str) -> str:
    return path.rstrip("/") + ".fingerprint"


def artifact_is_current(path: str, fingerprint: str) -> bool:
    """True iff `path` holds a COMPLETE artifact built from inputs
    matching `fingerprint` (sidecar file — a stale artifact must never
    be served). Completeness marker: directory artifacts (Spark sink
    output) need _SUCCESS — an interrupted write must never be trusted;
    a plain-file artifact IS its own marker provided it was published
    with an atomic os.replace (the house rule for file artifacts)."""
    if os.path.isfile(path):
        pass  # atomic-rename publish: existence == completeness
    elif not os.path.exists(os.path.join(path, "_SUCCESS")):
        return False
    fp_file = _fingerprint_file(path)
    if not os.path.exists(fp_file):
        return False
    with open(fp_file) as f:
        if f.read() != fingerprint:
            return False
    # Touch the sidecar on every successful validation: its mtime is the
    # "last validated" clock gc_scratch evicts by (LRU of USE, not of
    # write — an artifact revalidated every round never ages out).
    try:
        os.utime(fp_file)
    except OSError:
        pass
    return True


def gc_scratch(cap_bytes: int = 2 << 30, root: str | None = None) -> list[str]:
    """Size-capped sweep of the persistent scratch root.

    Fingerprinted artifacts (LSH signatures, IVF indexes, oriented edge
    lists) accumulate across rounds with no natural expiry. When the
    root exceeds `cap_bytes`, delete least-recently-VALIDATED artifact
    directories (sidecar mtime — touched by artifact_is_current on every
    cache hit) until under the cap, oldest first. Non-artifact scratch
    dirs (format round-trips, checkpoints) are swept by their own mtime;
    everything here is rebuildable by construction, so deletion is
    always safe — the only cost is a rebuild on next use.

    Returns the list of deleted paths (for the session-start log/test).
    """
    import shutil

    root = root or SCRATCH_ROOT
    if not os.path.isdir(root):
        return []

    def tree_size(p: str) -> int:
        total = 0
        for dirpath, _dirnames, filenames in os.walk(p):
            for fn in filenames:
                try:
                    total += os.stat(os.path.join(dirpath, fn)).st_size
                except OSError:
                    pass
        return total

    def newest_sidecar_mtime(p: str) -> float | None:
        """Max mtime of any .fingerprint sidecar within `p` — nested
        artifacts (e.g. scratch/<sf>/coorder/pairs) keep their validation
        sidecar at depth > 1, so scoring the depth-1 eviction unit by its
        own (never-updated) dir mtime would age the most frequently
        revalidated artifacts out FIRST. The unit inherits the newest
        validation clock found anywhere inside it."""
        newest: float | None = None
        for dirpath, _dirnames, filenames in os.walk(p):
            for fn in filenames:
                if fn.endswith(".fingerprint"):
                    try:
                        m = os.stat(os.path.join(dirpath, fn)).st_mtime
                    except OSError:
                        continue
                    newest = m if newest is None else max(newest, m)
        return newest

    # Candidate unit = a per-(sf, query) directory (scratch_dir layout),
    # scored by the newest sidecar mtime inside it (direct or nested),
    # else dir mtime. Loose files directly under the root are not
    # eviction units, so they don't count toward the cap either.
    candidates: list[tuple[float, str, int]] = []
    total = 0
    for sf_entry in os.scandir(root):
        if not sf_entry.is_dir():
            continue
        for entry in os.scandir(sf_entry.path):
            if entry.name.endswith(".fingerprint"):
                continue  # sidecars ride along with their artifact
            size = tree_size(entry.path) if entry.is_dir() else entry.stat().st_size
            fp = _fingerprint_file(entry.path)
            try:
                if os.path.exists(fp):
                    clock = os.stat(fp).st_mtime
                else:
                    nested = (
                        newest_sidecar_mtime(entry.path) if entry.is_dir() else None
                    )
                    clock = nested if nested is not None else entry.stat().st_mtime
            except OSError:
                clock = 0.0
            candidates.append((clock, entry.path, size))
            total += size

    deleted: list[str] = []
    if total <= cap_bytes:
        return deleted
    for clock, path, size in sorted(candidates):
        if total <= cap_bytes:
            break
        try:
            if os.path.isdir(path):
                shutil.rmtree(path, ignore_errors=True)
            else:
                os.remove(path)
            fp = _fingerprint_file(path)
            if os.path.exists(fp):
                os.remove(fp)
            total -= size
            deleted.append(path)
        except OSError:
            pass
    return deleted


def mark_artifact(path: str, fingerprint: str) -> None:
    """Record the input fingerprint next to a freshly written artifact.
    Written AFTER the parquet commit: a crash between the two leaves a
    _SUCCESS-complete artifact with no/old sidecar, which
    artifact_is_current treats as stale → rebuild, never wrong reuse."""
    with open(_fingerprint_file(path), "w") as f:
        f.write(fingerprint)
