"""Real-codec-branch coverage for the multimodal stages (closes the r4
"missing #3": the PIL/av paths were documented but never executed).

The stages are plain callables, so the fakes are injected as
sys.modules entries + ``force_codec=True`` and the batches run
in-process — no Ray needed.  The fakes parse the synthetic containers,
so geometry (width/height/frame count, fit-within resize) must agree
with the stub path exactly; only the digest serialization differs by
design (real paths hash DECODED pixel buffers)."""

from __future__ import annotations

import hashlib
import struct
import sys

import pyarrow as pa
import pytest

from tests.fake_codecs import make_fake_av, make_fake_pil
from whakoom_webscrapper_ray.pipelines.multimodal import (
    MAGIC,
    FrameSampler,
    MediaDecoder,
    MediaResizer,
    synth_payload_batch,
    synth_video_batch,
)

DOCS = pa.table({
    "doc_id": pa.array([3, 17, 64, 111], pa.int64()),
    "text": pa.array(
        ["alpha beta", "gamma", "delta epsilon zeta", "eta"],
        pa.string()),
})


@pytest.fixture
def fake_pil(monkeypatch):
    pil, image = make_fake_pil()
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", image)


@pytest.fixture
def fake_av(monkeypatch):
    monkeypatch.setitem(sys.modules, "av", make_fake_av())


def test_decoder_real_branch_geometry(fake_pil):
    pb = synth_payload_batch(DOCS)
    real = MediaDecoder(force_codec=True)(pb)
    stub = MediaDecoder(force_codec=False)(pb)
    for col in ("doc_id", "n_bytes", "width", "height"):
        assert real[col].equals(stub[col]), col
    # real digest hashes the DECODED pixel buffer (fake body = utf8)
    w = real["width"][0].as_py()
    h = real["height"][0].as_py()
    body = pb["media"][0].as_py()[8:]
    assert real["payload_md5"][0].as_py() == hashlib.md5(
        b"IMG|%d|%d|" % (w, h) + body).hexdigest()
    assert real.schema == stub.schema


def test_resizer_real_branch_byte_identical(fake_pil):
    """The real path (open -> fit-within resize -> save) re-encodes
    the fake container with the same scaled header the stub writes —
    byte-for-byte identical output, including no-op small images."""
    pb = synth_payload_batch(DOCS)
    real = MediaResizer(force_codec=True)(pb)
    stub = MediaResizer(force_codec=False)(pb)
    assert real.equals(stub)
    # downscale really happened for the large payloads
    for p in real["media"].to_pylist():
        w, h = struct.unpack("<HH", p[4:8])
        assert p[:4] == MAGIC and max(w, h) <= 64


def test_resizer_then_decoder_real_chain(fake_pil):
    """The chained thumbnail pipeline (resize -> decode) holds on the
    real branch end to end."""
    pb = synth_payload_batch(DOCS)
    feats = MediaDecoder(force_codec=True)(
        MediaResizer(force_codec=True)(pb))
    assert feats.num_rows == DOCS.num_rows
    assert (max(feats["width"].to_pylist())
            <= 64 >= max(feats["height"].to_pylist()))


def test_frame_sampler_real_branch(fake_av):
    vb = synth_video_batch(DOCS)
    real = FrameSampler(force_codec=True)(vb)
    stub = FrameSampler(force_codec=False)(vb)
    # same sampled frame set (doc_id, frame_idx) — stride over the
    # demuxed stream must agree with the header arithmetic
    key = ["doc_id", "frame_idx"]
    assert real.select(key).equals(stub.select(key))
    # real digest hashes the decoded frame ndarray
    d = real["doc_id"][0].as_py()
    body = vb["media"][0].as_py()[8:]
    pix = b"0|" + body
    assert real["frame_md5"][0].as_py() == hashlib.md5(
        b"FRM|0|" + pix).hexdigest()
    assert d == DOCS["doc_id"][0].as_py()


def test_stub_paths_unchanged_without_codec():
    """No shim, no force: the import-gated default stays the stub and
    keeps the oracle-compared digest serialization."""
    pb = synth_payload_batch(DOCS)
    out = MediaDecoder()(pb)
    w = 16 + (3 % 64) * 8
    h = 16 + ((3 * 7) % 48) * 8
    assert out["payload_md5"][0].as_py() == hashlib.md5(
        b"WKM0|%d|%d|" % (w, h) + b"alpha beta").hexdigest()
