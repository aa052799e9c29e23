"""Feed-export sinks (reference S6: ``scrapy crawl lists -o lists.json``,
README.md:444, settings.py:141 ``FEED_EXPORT_ENCODING``).

The reference exports the item stream to a single JSON/CSV file.  At
100 TB a single file is wrong twice over (no parallel write, no
resumability), so the engine's export is a **partitioned directory
sink**: ``Dataset.write_parquet`` / ``Dataset.write_json`` produce one
file per block, so a failed export can skip finished partitions and a
256-node cluster writes 256-wide.  The query entry returns the export
manifest (format, files, rows, bytes) — the driver-checkable surface of
a side-effecting sink.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pyarrow as pa
import ray.data

from .interleaved import span_links


def export_dataset(ds: ray.data.Dataset, out_dir: str) -> pa.Table:
    """Write ``ds`` as partitioned parquet AND json; return the manifest."""
    rows = []
    for fmt in ("parquet", "json"):
        d = os.path.join(out_dir, fmt)
        os.makedirs(d, exist_ok=True)
        if fmt == "parquet":
            ds.write_parquet(d)
        else:
            ds.write_json(d)
        files = sorted(glob.glob(os.path.join(d, "*")))
        rows.append(
            {
                "format": fmt,
                "n_files": len(files),
                "n_bytes": int(sum(os.path.getsize(f) for f in files)),
            }
        )
    return pa.Table.from_pylist(rows)


def feed_export(sf_dir: str) -> pa.Table:
    """Export the span-links stream (the publications feed, reference
    publications.py:102 + ``-o file.json``) to partitioned parquet+json
    under a scratch dir; returns (format, n_files, n_bytes) manifest."""
    out = tempfile.mkdtemp(prefix="wkm_feed_")
    try:
        return export_dataset(span_links(sf_dir), out)
    finally:
        shutil.rmtree(out, ignore_errors=True)
