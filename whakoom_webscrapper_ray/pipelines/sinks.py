"""Feed-export sinks (reference S6: ``scrapy crawl lists -o lists.json``,
README.md:444, settings.py:141 ``FEED_EXPORT_ENCODING``).

The reference exports the item stream to a single JSON/CSV file.  At
100 TB a single file is wrong twice over (no parallel write, no
resumability), so the engine's export is a **partitioned directory
sink**: ``Dataset.write_parquet`` / ``Dataset.write_json`` produce one
file per block, so a failed export can skip finished partitions and a
256-node cluster writes 256-wide.  The query entry READS THE EXPORT
BACK and returns per-format round-trip facts — row count plus an
order-insensitive content digest — so the sink's correctness (not its
block layout) is what the DuckDB oracle checks.
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
    """Write ``ds`` as partitioned parquet, json AND csv; return the
    manifest."""
    rows = []
    for fmt in ("parquet", "json", "csv"):
        d = os.path.join(out_dir, fmt)
        os.makedirs(d, exist_ok=True)
        if fmt == "parquet":
            ds.write_parquet(d)
        elif fmt == "json":
            ds.write_json(d)
        else:
            ds.write_csv(d)
        files = sorted(glob.glob(os.path.join(d, "*")))
        rows.append(
            {
                "format": fmt,
                "n_files": len(files),
                "n_bytes": int(sum(os.path.getsize(f) for f in files)),
            }
        )
    return pa.Table.from_pylist(rows)


# Order-insensitive content digest: per row, the low 64 bits (bytes
# 8..16, little-endian — DuckDB's ``md5_number_lower``) of
# md5("doc_id|offset|media_ref"), reduced mod the Mersenne prime
# 2^61-1 and summed mod the same prime.  Commutative, so block layout
# and row order never matter; BIGINT-exact on both sides.
_DIGEST_P = (1 << 61) - 1


def _digest_batch(batch: pa.Table) -> pa.Table:
    """Per-block partial: (n rows, digest sum).  Conformance-path md5
    per row (same discipline as multimodal.MediaDecoder) — the export
    check is O(feed), not a crawl hot path."""
    import hashlib

    s = 0
    for d, o, r in zip(batch["doc_id"].to_pylist(),
                       batch["offset"].to_pylist(),
                       batch["media_ref"].to_pylist()):
        h = hashlib.md5(f"{d}|{o}|{r}".encode()).digest()
        s = (s + int.from_bytes(h[8:16], "little") % _DIGEST_P) % _DIGEST_P
    return pa.table({"n": pa.array([batch.num_rows], pa.int64()),
                     "h": pa.array([s], pa.int64())})


def feed_export(sf_dir: str) -> pa.Table:
    """Export the span-links stream (the publications feed, reference
    publications.py:102 + ``-o file.json``) to partitioned parquet+json
    under a scratch dir, then read each export back and return
    (format, n_rows, content_sum): the round-trip proof that BOTH sinks
    contain exactly the feed's rows, independent of block layout."""
    out = tempfile.mkdtemp(prefix="wkm_feed_")
    try:
        export_dataset(span_links(sf_dir), out)
        rows = []
        for fmt, reader in (("json", ray.data.read_json),
                            ("parquet", ray.data.read_parquet),
                            ("csv", ray.data.read_csv)):
            parts = (
                reader(os.path.join(out, fmt))
                .map_batches(_digest_batch, batch_format="pyarrow")
                .to_pandas()          # one tiny row per block
            )
            rows.append({
                "format": fmt,
                "n_rows": int(parts["n"].sum()),
                # combine in Python ints: partials are < 2^61 each, so
                # a pandas int64 sum overflows silently at ~8 blocks
                "content_sum":
                    sum(int(x) for x in parts["h"]) % _DIGEST_P,
            })
        return pa.Table.from_pylist(rows)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def oracle_feed_export() -> str:
    """Both formats must round-trip the span-links feed exactly: same
    row count, same commutative md5 content digest (md5_number_lower =
    bytes 8..16 of the md5, little-endian — bit-exact vs
    :func:`_digest_batch`)."""
    from .interleaved import ORACLE_SPAN_LINKS

    return f"""
WITH agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(SUM(md5_number_lower(
                CAST(doc_id AS VARCHAR) || '|' ||
                CAST("offset" AS VARCHAR) || '|' || media_ref
              ) % {_DIGEST_P}) % {_DIGEST_P} AS BIGINT) AS content_sum
  FROM ({ORACLE_SPAN_LINKS})
)
SELECT t.format, agg.n_rows, agg.content_sum
FROM (VALUES ('json'), ('parquet'), ('csv')) AS t(format), agg
"""
