"""Mocked-PIL drive of the real pixel-decode slot (decode_media).

No PIL ships in this container, so the decode cannot run for real — the
control flow (open -> RGB convert -> aspect-preserving fit-into-target
resize -> raster digest; null row on corrupt blobs) is pinned here by
injecting a fake PIL module, exactly like the mocked-torch decoder tests.
"""

from __future__ import annotations

import hashlib
import sys
import types

import pandas as pd
import pytest


class FakeImage:
    def __init__(self, w, h, mode="CMYK"):
        self.size = (w, h)
        self.mode = mode
        self.resized_to = None

    def convert(self, mode):
        return FakeImage(*self.size, mode=mode)

    def resize(self, wh):
        out = FakeImage(*wh, mode=self.mode)
        out.resized_to = wh
        return out

    def tobytes(self):
        return b"rgb" * (self.size[0] * self.size[1])


@pytest.fixture()
def fake_pil(monkeypatch):
    """PIL.Image.open decodes blobs of the form b'img:<w>x<h>'; anything
    else raises like a real decoder on garbage."""

    def open_(fh):
        data = fh.read()
        if not data.startswith(b"img:"):
            raise OSError("cannot identify image file")
        w, h = (int(x) for x in data[4:].split(b"x"))
        return FakeImage(w, h)

    pil = types.ModuleType("PIL")
    image_mod = types.ModuleType("PIL.Image")
    image_mod.open = open_
    pil.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)
    return pil


def _decode(rows, target=224):
    from docling_ocr_qwen3vl_spark.operators.multimodal import (
        DECODED_MEDIA_SCHEMA,
        _decode_media_batches,
    )

    batch = pd.DataFrame(
        {"doc_id": [r[0] for r in rows], "blob": [r[1] for r in rows]}
    )
    out = pd.concat(list(_decode_media_batches(target)(iter([batch]))))
    assert list(out.columns) == DECODED_MEDIA_SCHEMA.names
    return {r.doc_id: r for r in out.itertuples()}


def test_decode_resize_and_digest(fake_pil):
    out = _decode([("a", b"img:448x224"), ("b", b"img:100x50")])
    # 448x224 fits into 224 at scale 0.5 -> 224x112; digest of the raster
    a = out["a"]
    assert (a.width, a.height, a.mode) == (448, 224, "RGB")
    assert a.n_pixel_bytes == 3 * 224 * 112
    assert a.pixel_sha == hashlib.md5(b"rgb" * (224 * 112)).hexdigest()
    # small images are never upscaled
    b = out["b"]
    assert b.n_pixel_bytes == 3 * 100 * 50


def test_corrupt_blob_yields_null_row_not_task_failure(fake_pil):
    out = _decode([("good", b"img:10x10"), ("bad", b"not an image"), ("nil", None)])
    assert out["good"].width == 10
    assert out["bad"].width is None or pd.isna(out["bad"].width)
    assert out["nil"].pixel_sha is None or pd.isna(out["nil"].pixel_sha)


def test_decode_media_gate_without_pil():
    """Without PIL the plan constructor raises the documented gate error."""
    import importlib

    from docling_ocr_qwen3vl_spark.operators import multimodal

    if importlib.util.find_spec("PIL") is not None:
        pytest.skip("real PIL present; gate cannot fire")
    with pytest.raises(NotImplementedError, match="needs PIL"):
        multimodal.decode_media(object())


# ----------------------------------------------------------- mocked av path
class FakeFrame:
    def __init__(self, ts):
        self.ts = ts

    def to_ndarray(self, format):
        assert format == "rgb24"

        class A:
            def __init__(self, ts):
                self.ts = ts

            def tobytes(self):
                return b"frame@%d" % self.ts

        return A(self.ts)


class FakeContainer:
    def __init__(self, duration_s):
        self.duration = int(duration_s * 1_000_000)
        self.streams = types.SimpleNamespace(video=[object()])
        self._pos = 0
        self.seeks = []

    def seek(self, micros):
        self.seeks.append(micros)
        self._pos = micros

    def decode(self, stream):
        yield FakeFrame(self._pos)


@pytest.fixture()
def fake_av(monkeypatch):
    def open_(fh):
        data = fh.read()
        if not data.startswith(b"vid:"):
            raise ValueError("invalid container")
        return FakeContainer(float(data[4:]))

    av = types.ModuleType("av")
    av.open = open_
    monkeypatch.setitem(sys.modules, "av", av)
    return av


def test_decode_frames_even_seeks_and_digests(fake_av):
    from docling_ocr_qwen3vl_spark.operators.multimodal import (
        FRAME_SCHEMA,
        _decode_frames_batches,
    )

    batch = pd.DataFrame({"doc_id": ["v"], "blob": [b"vid:8.0"]})
    out = pd.concat(list(_decode_frames_batches(4)(iter([batch]))))
    assert list(out.columns) == FRAME_SCHEMA.names
    # evenly spaced seek points across the 8 s container: 0, 2, 4, 6 s
    assert list(out["frame_ts"]) == [0.0, 2.0, 4.0, 6.0]
    assert list(out["frame_idx"]) == [0, 1, 2, 3]
    assert out["frame_sha"].iloc[1] == hashlib.md5(b"frame@2000000").hexdigest()


def test_decode_frames_skips_undecodable(fake_av):
    from docling_ocr_qwen3vl_spark.operators.multimodal import _decode_frames_batches

    batch = pd.DataFrame(
        {"doc_id": ["good", "bad"], "blob": [b"vid:4.0", b"garbage"]}
    )
    out = pd.concat(list(_decode_frames_batches(2)(iter([batch]))))
    assert set(out["doc_id"]) == {"good"} and len(out) == 2


def test_decode_frames_sequential_when_no_duration(fake_av, monkeypatch):
    """Containers without a duration header (raw H.264, some MKV) decode
    the first n frames sequentially instead of seeking — not silently
    dropped."""
    import sys

    av = sys.modules["av"]

    class SeqFrame:
        def __init__(self, idx):
            self.time = idx * 0.5

        def to_ndarray(self, format):
            class A:
                def __init__(self, t):
                    self.t = t

                def tobytes(self):
                    return b"seq@%f" % self.t

            return A(self.time)

    class NoDurationContainer:
        duration = None
        streams = types.SimpleNamespace(video=[object()])

        def decode(self, stream):
            for i in range(100):
                yield SeqFrame(i)

    monkeypatch.setattr(av, "open", lambda fh: NoDurationContainer())
    from docling_ocr_qwen3vl_spark.operators.multimodal import _decode_frames_batches

    batch = pd.DataFrame({"doc_id": ["raw"], "blob": [b"whatever"]})
    out = pd.concat(list(_decode_frames_batches(3)(iter([batch]))))
    assert list(out["frame_idx"]) == [0, 1, 2]
    assert list(out["frame_ts"]) == [0.0, 0.5, 1.0]
