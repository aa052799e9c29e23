"""Shared helpers for the data-ops pipelines over the driver testdata.

All readers prune columns at the read (`read_parquet(columns=[...])`) so
only needed columns leave storage — at the 100 TB design point a read
that loads all columns for a 2-column transform is wrong.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read(sf_dir: str, name: str, columns: list[str] | None = None,
         **kwargs) -> ray.data.Dataset:
    """Column-pruned parquet read of one testdata table."""
    return ray.data.read_parquet(
        table_path(sf_dir, name), columns=columns, **kwargs
    )


def cents(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """double currency → exact integer cents (order-independent sums).

    Float sums are summation-order-dependent, so a Ray partial-aggregate
    sum and a DuckDB sequential sum can drift in the last ulps and break
    value-hash comparison.  Scaling 2-decimal currency to int64 cents
    makes every downstream sum exact and order-independent; oracle SQL
    does the same with ``CAST(ROUND(x * 100) AS BIGINT)``.
    """
    import pyarrow.compute as pc

    return pc.cast(pc.round(pc.multiply(arr, 100.0)), pa.int64())
