"""Multimodal (binary-payload) columns: real plumbing, dual codecs.

Media is carried as an opaque ``binary`` column with typed metadata —
exactly how the crawl's interleaved documents reference media
(``media_ref`` spans, input_hint).  The decode/feature stages are
actor-pool ``map_batches`` transforms whose Ray-side plumbing (schema,
batch sizing, actor signature, output layout) is real and tested.
Each stage carries TWO decode paths behind one batch contract: the
REAL codec path (PIL for images, PyAV for video — import-gated since
neither wheel is in this container, exercised by the fake-codec shims
in tests/test_media_codec.py so it cannot rot) and a deterministic
stub parser over our own payload format (the oracle-compared default
here).

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

try:  # the real image codec (absent in this container)
    import PIL.Image  # type: ignore  # noqa: F401

    HAVE_CODEC = True
except ImportError:
    HAVE_CODEC = False

try:  # the real video codec (absent in this container)
    import av  # type: ignore  # noqa: F401

    HAVE_VIDEO_CODEC = True
except ImportError:
    HAVE_VIDEO_CODEC = False


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

    ``__init__`` holds the codec choice once per actor; real
    deployments load the image decoder or model here.  Batches stay
    small (binary payloads are large at 100 TB — ``batch_size`` is set
    by the caller so batch × concurrency fits worker heaps).

    Two decode paths behind one batch contract:

    - **real** (PIL importable, or ``force_codec=True`` with a shim —
      tests/test_media_codec.py): per-payload ``PIL.Image.open``
      (codecs are inherently per item), digest over the DECODED pixel
      buffer (``IMG|w|h|`` + tobytes);
    - **stub** (this container): vectorized fixed-width header parse
      over the Arrow buffers, digest over the decoded stub fields.
    """

    def __init__(self, force_codec: bool | None = None) -> None:
        self.have_codec = (HAVE_CODEC if force_codec is None
                           else force_codec)

    def _decode_real(self, payload: bytes) -> tuple[int, int, bytes]:
        import io

        import PIL.Image

        im = PIL.Image.open(io.BytesIO(payload))
        w, h = im.size
        return w, h, im.tobytes()

    def _call_real(self, batch: pa.Table) -> pa.Table:
        payloads = batch["media"].to_pylist()
        widths = np.empty(len(payloads), dtype=np.int64)
        heights = np.empty(len(payloads), dtype=np.int64)
        nbytes = np.empty(len(payloads), dtype=np.int64)
        digests = []
        for i, p in enumerate(payloads):
            w, h, pix = self._decode_real(p)
            widths[i], heights[i], nbytes[i] = w, h, len(p)
            digests.append(
                hashlib.md5(b"IMG|%d|%d|" % (w, h) + pix).hexdigest()
            )
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_bytes": pa.array(nbytes, pa.int64()),
            "width": pa.array(widths, pa.int64()),
            "height": pa.array(heights, pa.int64()),
            "payload_md5": pa.array(digests, pa.string()),
        })

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.have_codec:
            return self._call_real(batch)
        # Stub path, vectorized: the fixed-width container header is
        # parsed straight off the Arrow binary buffers — one uint8
        # view + fancy-indexed little-endian recompose, no per-payload
        # Python loop.  Real codecs are per-item anyway; only the stub
        # gets this treatment so the bench reflects plumbing cost, not
        # a Python loop artifact.
        media = batch["media"]
        if isinstance(media, pa.ChunkedArray):
            media = media.combine_chunks()
        ao = media.offset  # sliced arrays: offsets start at ao
        off = np.frombuffer(media.buffers()[1], dtype=np.int32,
                            count=ao + len(media) + 1)[ao:]
        data = np.frombuffer(media.buffers()[2], dtype=np.uint8)
        starts = off[:-1].astype(np.int64)
        nbytes = (off[1:] - off[:-1]).astype(np.int64)
        if (nbytes < 8).any():
            raise ValueError("bad media payload")
        magic = np.frombuffer(MAGIC, dtype=np.uint8)
        hdr = data[(starts[:, None]
                    + np.arange(8, dtype=np.int64)[None, :]).ravel()
                   ].reshape(-1, 8)
        if (hdr[:, :4] != magic[None, :]).any():
            raise ValueError("bad media payload")
        widths = (hdr[:, 4].astype(np.int64)
                  | (hdr[:, 5].astype(np.int64) << 8))
        heights = (hdr[:, 6].astype(np.int64)
                   | (hdr[:, 7].astype(np.int64) << 8))
        # Content digest over the DECODED fields (header ints + body),
        # canonically serialized — the digest an indexer would store
        # for the media object.  md5 is inherently per-item; the body
        # is a zero-copy memoryview slice of the Arrow data buffer.
        dmem = memoryview(data)
        digests = [
            hashlib.md5(
                b"WKM0|%d|%d|" % (w, h)
                + dmem[s + 8:s + n]
            ).hexdigest()
            for w, h, s, n in zip(widths, heights, starts, nbytes)
        ]
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


# ------------------------------------------------------------- resize
_RESIZE_MAX = 64  # fit-within target for the long edge


class MediaResizer:
    """Actor-pool resize stage: binary payload in, binary payload out
    (the transform shape a real thumbnailer has — decode, scale to fit
    ``max_edge``, re-encode).  Real path (PIL importable, or
    ``force_codec=True`` with a shim): ``Image.open`` → fit-within
    ``resize`` → ``save`` in the source format.  Stub path re-encodes
    our container with the scaled header and untouched body — the
    same fit-within integer geometry, so the shim test can assert the
    two paths agree byte for byte on the synthetic container."""

    def __init__(self, max_edge: int = _RESIZE_MAX,
                 force_codec: bool | None = None) -> None:
        self.have_codec = (HAVE_CODEC if force_codec is None
                           else force_codec)
        self.max_edge = max_edge

    def _fit(self, w: int, h: int) -> tuple[int, int]:
        m = max(w, h)
        if m > self.max_edge:
            return (w * self.max_edge // m, h * self.max_edge // m)
        return w, h

    def _resize_real(self, payload: bytes) -> bytes:
        import io

        import PIL.Image

        im = PIL.Image.open(io.BytesIO(payload))
        w, h = self._fit(*im.size)
        if (w, h) != im.size:
            im = im.resize((w, h))
        buf = io.BytesIO()
        im.save(buf, format=im.format)
        return buf.getvalue()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for p in batch["media"].to_pylist():
            if self.have_codec:
                out.append(self._resize_real(p))
                continue
            if p[:4] != MAGIC:
                raise ValueError("bad media payload")
            w, h = self._fit(*struct.unpack("<HH", p[4:8]))
            out.append(MAGIC + struct.pack("<HH", w, h) + p[8:])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media_kind": batch["media_kind"],
                "media": pa.array(out, pa.binary()),
            }
        )


# The resized header is integer arithmetic over the synth dims
# (floor-div scale to fit the 64px long edge), and the digest hashes
# the same canonical decoded-field serialization media_features uses —
# bit-exact vs MediaDecoder over MediaResizer output.
ORACLE_MEDIA_RESIZE = f"""
WITH dims AS (
  SELECT doc_id, text,
         16 + (doc_id % 64) * 8       AS w,
         16 + ((doc_id * 7) % 48) * 8 AS h
  FROM documents
), scaled AS (
  SELECT doc_id, text,
         CASE WHEN greatest(w, h) > {_RESIZE_MAX}
              THEN w * {_RESIZE_MAX} // greatest(w, h) ELSE w END AS rw,
         CASE WHEN greatest(w, h) > {_RESIZE_MAX}
              THEN h * {_RESIZE_MAX} // greatest(w, h) ELSE h END AS rh
  FROM dims
)
SELECT doc_id,
       8 + octet_length(encode(text)) AS n_bytes,
       CAST(rw AS BIGINT)             AS width,
       CAST(rh AS BIGINT)             AS height,
       md5('WKM0|' || rw::VARCHAR || '|' || rh::VARCHAR || '|' || text)
                                      AS payload_md5
FROM scaled
"""


def media_resize(sf_dir: str) -> ray.data.Dataset:
    """documents → synth payloads → actor-pool resize → decode features
    of the RESIZED payload (the verification read a thumbnail pipeline
    runs).  Two chained actor-pool stages over binary columns."""
    return (
        read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(synth_payload_batch, batch_format="pyarrow")
        .map_batches(
            MediaResizer, concurrency=(1, 4), batch_size=256,
            batch_format="pyarrow",
        )
        .map_batches(
            MediaDecoder, concurrency=(1, 4), batch_size=256,
            batch_format="pyarrow",
        )
    )


# ------------------------------------------------------- frame sample
VIDEO_MAGIC = b"WKV0"
_FRAME_STRIDE = 5  # sample every 5th frame


def synth_video_batch(batch: pa.Table) -> pa.Table:
    """documents → (doc_id, media: binary, media_kind='video') rows.

    Payload: ``b"WKV0" + n_frames:uint16 + fps:uint16 + utf8(text)`` —
    n_frames = 4 + doc_id % 28, fps = 24; the body stands in for the
    encoded stream.
    """
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    payloads = [
        VIDEO_MAGIC + struct.pack("<HH", 4 + d % 28, 24)
        + t.encode("utf-8")
        for d, t in zip(ids, texts)
    ]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "media_kind": pa.array(["video"] * len(ids), pa.string()),
            "media": pa.array(payloads, pa.binary()),
        }
    )


class FrameSampler:
    """Actor-pool frame-sampling stage: decode the container header
    once per payload, emit one row per SAMPLED frame (every
    ``stride``-th), each with a content digest of the decoded frame.
    Real deployments would seek the codec to the sampled timestamps in
    ``__call__`` and hold the decoder in ``__init__``; the in-container
    stub derives each frame's bytes deterministically from the body.
    Output fans out rows (docs × frames/stride), so the caller keeps
    ``batch_size`` payload-sized."""

    def __init__(self, stride: int = _FRAME_STRIDE,
                 force_codec: bool | None = None) -> None:
        self.have_codec = (HAVE_VIDEO_CODEC if force_codec is None
                           else force_codec)
        self.stride = stride

    def _frames(self, payload: bytes) -> tuple[int, int, bytes]:
        if payload[:4] != VIDEO_MAGIC:
            raise ValueError("bad video payload")
        n_frames, fps = struct.unpack("<HH", payload[4:8])
        return n_frames, fps, payload[8:]

    def _sample_real(self, doc_id: int, payload: bytes
                     ) -> list[tuple[int, int, str]]:
        """Real path (PyAV importable, or ``force_codec=True`` with a
        shim): demux/decode the stream, keep every ``stride``-th
        frame, digest its decoded pixel buffer."""
        import io

        import av

        out = []
        with av.open(io.BytesIO(payload)) as container:
            for i, frame in enumerate(container.decode(video=0)):
                if i % self.stride == 0:
                    pix = frame.to_ndarray().tobytes()
                    out.append((doc_id, i, hashlib.md5(
                        b"FRM|%d|" % i + pix).hexdigest()))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        out_id, out_idx, out_md5 = [], [], []
        for d, p in zip(ids, batch["media"].to_pylist()):
            if self.have_codec:
                for doc, i, dig in self._sample_real(d, p):
                    out_id.append(doc)
                    out_idx.append(i)
                    out_md5.append(dig)
                continue
            n_frames, _fps, body = self._frames(p)
            for i in range(0, n_frames, self.stride):
                out_id.append(d)
                out_idx.append(i)
                # digest of the decoded frame: canonical serialization
                # doc|frame|body (the stub "decode" of frame i)
                out_md5.append(hashlib.md5(
                    b"%d|%d|" % (d, i) + body
                ).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_idx, pa.int64()),
                "frame_md5": pa.array(out_md5, pa.string()),
            }
        )


# n_frames is pure doc_id arithmetic and the frame digest's canonical
# serialization ("doc|idx|" + body) is md5(VARCHAR) over UTF-8 —
# bit-exact vs FrameSampler's stub decode.
ORACLE_FRAME_SAMPLE = f"""
SELECT d.doc_id,
       CAST(gs.i AS BIGINT)                   AS frame_idx,
       md5(d.doc_id::VARCHAR || '|' || gs.i::VARCHAR || '|' || d.text)
                                              AS frame_md5
FROM documents d
JOIN generate_series(0, 30, {_FRAME_STRIDE}) gs(i)
  ON gs.i < 4 + d.doc_id % 28
"""


def frame_sample(sf_dir: str) -> ray.data.Dataset:
    """documents → synth video payloads → actor-pool frame sampling.

    The sampler fans out one row per sampled frame; batch_size stays
    payload-sized for the same heap reasons as media_features.
    """
    return (
        read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(synth_video_batch, batch_format="pyarrow")
        .map_batches(
            FrameSampler, concurrency=(1, 4), batch_size=256,
            batch_format="pyarrow",
        )
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
