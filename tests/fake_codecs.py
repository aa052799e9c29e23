"""Minimal stand-ins for the ``PIL.Image`` and ``av`` surfaces the
multimodal real-codec paths use — the fake-lance pattern
(tests/fake_lance.py) applied to media: inject these as
``sys.modules["PIL"] / ["PIL.Image"] / ["av"]`` (or pass
``force_codec=True``) so the import-gated real branches EXECUTE in
tests instead of rotting.

The fakes parse the repo's own synthetic containers (``WKM0`` images,
``WKV0`` videos), so the real-path geometry can be asserted against
the stub path exactly (same fit-within math, same headers)."""

from __future__ import annotations

import struct
import types

MAGIC = b"WKM0"
VIDEO_MAGIC = b"WKV0"


class FakeImage:
    format = "WKM0"

    def __init__(self, w: int, h: int, body: bytes) -> None:
        self.size = (w, h)
        self._body = body

    def tobytes(self) -> bytes:
        return self._body

    def resize(self, wh: tuple[int, int]) -> "FakeImage":
        return FakeImage(wh[0], wh[1], self._body)

    def save(self, buf, format=None) -> None:
        assert format == "WKM0"
        w, h = self.size
        buf.write(MAGIC + struct.pack("<HH", w, h) + self._body)


def _image_open(fp) -> FakeImage:
    payload = fp.read()
    if payload[:4] != MAGIC:
        raise ValueError("fake PIL: bad container")
    w, h = struct.unpack("<HH", payload[4:8])
    return FakeImage(w, h, payload[8:])


def make_fake_pil() -> tuple[types.ModuleType, types.ModuleType]:
    """(PIL, PIL.Image) module pair for sys.modules injection."""
    pil = types.ModuleType("PIL")
    image = types.ModuleType("PIL.Image")
    image.open = _image_open
    pil.Image = image
    return pil, image


class FakeFrame:
    def __init__(self, idx: int, body: bytes) -> None:
        self._idx = idx
        self._body = body

    def to_ndarray(self):
        import numpy as np

        return np.frombuffer(
            b"%d|" % self._idx + self._body, dtype=np.uint8)


class FakeContainer:
    def __init__(self, payload: bytes) -> None:
        if payload[:4] != VIDEO_MAGIC:
            raise ValueError("fake av: bad container")
        self._n, self._fps = struct.unpack("<HH", payload[4:8])
        self._body = payload[8:]

    def decode(self, video: int = 0):
        for i in range(self._n):
            yield FakeFrame(i, self._body)

    def __enter__(self) -> "FakeContainer":
        return self

    def __exit__(self, *exc) -> None:
        pass


def make_fake_av() -> types.ModuleType:
    av = types.ModuleType("av")
    av.open = lambda fp: FakeContainer(fp.read())
    return av
