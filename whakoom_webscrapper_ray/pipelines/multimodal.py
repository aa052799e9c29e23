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

import struct
import zlib

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

    def _decode(self, payload: bytes) -> tuple[int, int]:
        if self.have_codec:
            # Real path: PIL.Image.open(io.BytesIO(payload)).size
            raise NotImplementedError(
                "real image decode not exercised in this container"
            )
        if payload[:4] != MAGIC:
            raise ValueError("bad media payload")
        return struct.unpack("<HH", payload[4:8])

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["media"].to_pylist()
        widths = np.empty(len(payloads), dtype=np.int32)
        heights = np.empty(len(payloads), dtype=np.int32)
        crcs = np.empty(len(payloads), dtype=np.int64)
        nbytes = np.empty(len(payloads), dtype=np.int64)
        for i, p in enumerate(payloads):
            w, h = self._decode(p)
            widths[i] = w
            heights[i] = h
            crcs[i] = zlib.crc32(p)
            nbytes[i] = len(p)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bytes": pa.array(nbytes, pa.int64()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "crc32": pa.array(crcs, pa.int64()),
            }
        )


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
