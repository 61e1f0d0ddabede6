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

SCRATCH_ROOT = os.environ.get("IRIS_PYSPARK_SCRATCH", "/tmp/iris_pyspark_scratch")


def scratch_dir(sf_dir: str, name: str) -> str:
    """Deterministic per-(scale-factor, query) scratch path."""
    sf = os.path.basename(sf_dir.rstrip("/")) or "sf"
    return os.path.join(SCRATCH_ROOT, sf, name)
