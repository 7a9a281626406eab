"""Record-id codec helpers.

The pipeline runs on 32-byte BINARY record ids end-to-end (the unhexed
sha256 hex id — bytewise order equals lowercase-hex order, so min-labels
and `<` pair orders survive the narrowing while every posting/pair/CC
shuffle halves its id bytes). The decode is the one place that narrowing
can silently corrupt: ``unhex`` of a non-hex caller-supplied id returns
NULL, every equi-join on it drops the record, and the pipeline emits
all-singleton clusters with no error. ``guarded_unhex`` makes that a loud
plan-time failure instead (ADVICE r4 #1).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def guarded_unhex(col: str | Column, context: str) -> Column:
    """``unhex(col)`` that FAILS THE JOB when ``col`` is not lowercase
    even-length hex, instead of silently yielding NULL.

    The round-trip check ``lower(hex(unhex(c))) == c`` rejects every
    silent-corruption case at once: non-hex characters (unhex -> NULL),
    odd length (truncated decode), and uppercase digits (would re-hex to
    a DIFFERENT string and break min-id label comparability). One native
    expression per row — no Python in the path.
    """
    c = F.col(col) if isinstance(col, str) else col
    b = F.unhex(c)
    ok = F.lower(F.hex(b)) == c
    return F.when(ok, b).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"{context}: record id is not lowercase hex: "),
                F.coalesce(c, F.lit("NULL")),
            )
        )
    )
