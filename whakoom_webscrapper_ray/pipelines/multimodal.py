"""Multimodal (binary-payload) columns: real plumbing, stubbed codecs.

Media is carried as an opaque ``binary`` column with typed metadata —
exactly how the crawl's interleaved documents reference media
(``media_ref`` spans, input_hint).  The decode/feature stages are
actor-pool ``map_batches`` transforms whose Ray-side plumbing (schema,
batch sizing, actor signature, output layout) is real and tested; the
actual image/audio codecs are not in this container, so decode is
gated behind an import-try and falls back to a deterministic fake
parser over our own payload format.

Payload format (synthesized deterministically from ``documents``):
``b"WKM0" + width:uint16 + height:uint16 + utf8(text)`` — a stand-in
for a real container header + body.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
import ray.data

from .common import read

MAGIC = b"WKM0"

try:  # the real decode path (absent in this container)
    import PIL.Image  # type: ignore  # noqa: F401

    HAVE_CODEC = True
except ImportError:
    HAVE_CODEC = False


def synth_payload_batch(batch: pa.Table) -> pa.Table:
    """documents → (doc_id, media: binary, media_kind) payload rows."""
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    payloads = []
    for d, t in zip(ids, texts):
        w = 16 + (d % 64) * 8
        h = 16 + ((d * 7) % 48) * 8
        payloads.append(
            MAGIC + struct.pack("<HH", w, h) + t.encode("utf-8")
        )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "media_kind": pa.array(["image"] * len(ids), pa.string()),
            "media": pa.array(payloads, pa.binary()),
        }
    )


class MediaDecoder:
    """Actor-pool decode/feature stage.

    ``__init__`` holds the (stub) codec state once per actor; real
    deployments would load the image/audio decoder or model here.
    Batches stay small (binary payloads are large at 100 TB —
    ``batch_size`` is set by the caller so batch × concurrency fits
    worker heaps).
    """

    def __init__(self) -> None:
        self.have_codec = HAVE_CODEC

    def _decode(self, payload: bytes) -> tuple[int, int, bytes]:
        if self.have_codec:
            # Real path: PIL.Image.open(io.BytesIO(payload)).size
            raise NotImplementedError(
                "real image decode not exercised in this container"
            )
        if payload[:4] != MAGIC:
            raise ValueError("bad media payload")
        w, h = struct.unpack("<HH", payload[4:8])
        return w, h, payload[8:]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["media"].to_pylist()
        widths = np.empty(len(payloads), dtype=np.int64)
        heights = np.empty(len(payloads), dtype=np.int64)
        nbytes = np.empty(len(payloads), dtype=np.int64)
        digests = []
        for i, p in enumerate(payloads):
            w, h, body = self._decode(p)
            widths[i] = w
            heights[i] = h
            nbytes[i] = len(p)
            # Content digest over the DECODED fields (header ints +
            # body), canonically serialized — the digest an indexer
            # would store for the media object.
            digests.append(
                hashlib.md5(b"WKM0|%d|%d|" % (w, h) + body).hexdigest()
            )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bytes": pa.array(nbytes, pa.int64()),
                "width": pa.array(widths, pa.int64()),
                "height": pa.array(heights, pa.int64()),
                "payload_md5": pa.array(digests, pa.string()),
            }
        )


# DuckDB re-derivation of the decode stage: the synth payload header is
# pure doc_id arithmetic, n_bytes is header + utf8 body length, and the
# digest's canonical serialization ("WKM0|w|h|" + body) is exactly what
# md5(VARCHAR) hashes (UTF-8 bytes).  Bit-exact vs MediaDecoder.
ORACLE_MEDIA_FEATURES = """
SELECT doc_id,
       8 + octet_length(encode(text))        AS n_bytes,
       16 + (doc_id % 64) * 8                AS width,
       16 + ((doc_id * 7) % 48) * 8          AS height,
       md5('WKM0|' || (16 + (doc_id % 64) * 8)::VARCHAR
           || '|' || (16 + ((doc_id * 7) % 48) * 8)::VARCHAR
           || '|' || text)                   AS payload_md5
FROM documents
"""


def media_features(sf_dir: str) -> ray.data.Dataset:
    """documents → synth binary payloads → actor-pool decode features.

    Small ``batch_size`` on the decode stage: binary payloads dominate
    memory, so batch × concurrency is sized for the worker heap, not
    for row count.
    """
    return (
        read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(synth_payload_batch, batch_format="pyarrow")
        .map_batches(
            MediaDecoder, concurrency=(1, 4), batch_size=256,
            batch_format="pyarrow",
        )
    )
