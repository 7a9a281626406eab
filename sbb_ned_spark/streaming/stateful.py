"""Custom stateful streaming operator: cross-batch exact dedup.

``streaming_exact_dedup`` tags every incoming file with whether its
content has EVER been seen before — across micro-batches and restarts —
using ``applyInPandasWithState`` (the arbitrary-stateful-processing API;
state lives in the streaming state store and is checkpointed with the
query). This is the streaming face of the batch ``exact_groups`` stage
(`plans/pipeline.py`): a landing-dir stream of repo snapshots can be
collapsed to first-seen representatives continuously instead of
re-running the batch collapse.

Shape: rows are keyed by a bounded ``bucket = pmod(sha64, n_buckets)``
so state is partitioned and the shuffle key is a small int; per-bucket
state is the array of 64-bit content hashes seen so far. The batch
kernel is vectorized (np.isin + pandas duplicated — no per-row Python).

Scale notes: per-bucket state grows with distinct contents; at 10^12
files swap the exact hash array for a Bloom filter per bucket (the
state schema stays ``array<long>`` — store the filter words) or enable
state TTL; a 64-bit hash collision mis-tags one row as duplicate with
prob ~2^-63 per pair, the same accepted trade as the batch blocking
keys. The reference has no streaming analog (SURVEY.md §2.9); this is
part of the training-data-pipeline surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

OUTPUT_DDL = "record_id string, sha64 long, first_seen boolean"
STATE_DDL = "seen array<long>"


def _dedup_buckets(
    key: tuple, pdfs, state: GroupState
):
    seen = np.asarray(state.get[0], dtype=np.int64) if state.exists else np.empty(
        0, dtype=np.int64
    )
    # buffer the bucket's slice of this micro-batch (bounded: 1/n_buckets
    # of the batch) so the within-batch keeper is DETERMINISTIC — the min
    # record_id wins, matching the batch exact_groups keeper rule; across
    # micro-batches, earlier arrival wins (state)
    parts = list(pdfs)
    if not parts:
        return
    batch = pd.concat(parts, ignore_index=True)
    order = np.lexsort((batch["record_id"].to_numpy(),))
    h_sorted = batch["sha64"].to_numpy(dtype=np.int64)[order]
    first_in_batch_sorted = ~pd.Series(h_sorted).duplicated().to_numpy()
    fresh_sorted = first_in_batch_sorted & ~np.isin(h_sorted, seen)
    fresh = np.empty(len(batch), dtype=bool)
    fresh[order] = fresh_sorted
    state.update((np.concatenate([seen, h_sorted[fresh_sorted]]).tolist(),))
    yield pd.DataFrame(
        {
            "record_id": batch["record_id"],
            "sha64": batch["sha64"].to_numpy(dtype=np.int64),
            "first_seen": fresh,
        }
    )


def streaming_exact_dedup(
    files: DataFrame,
    id_col: str = "record_id",
    text_col: str = "content",
    n_buckets: int = 64,
) -> DataFrame:
    """(record_id, sha64, first_seen) per incoming row; ``first_seen`` is
    False iff the identical content appeared in ANY earlier row — earlier
    in this micro-batch, an earlier micro-batch, or before a restart
    (state is checkpointed). Downstream keeps ``first_seen`` rows only."""
    hashed = files.select(
        F.col(id_col).cast("string").alias("record_id"),
        F.xxhash64(text_col).alias("sha64"),
    ).withColumn("bucket", F.pmod("sha64", F.lit(n_buckets)).cast("int"))
    return hashed.groupBy("bucket").applyInPandasWithState(
        _dedup_buckets,
        outputStructType=OUTPUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
