"""Native C++ ingest core vs the numpy reference implementations."""

import numpy as np
import pytest

native = pytest.importorskip("terastructure_tpu.native")

from terastructure_tpu.data import pack  # noqa: E402
from terastructure_tpu.data.bed import _LUT  # noqa: E402


def test_pack_matches_numpy(rng):
    x = rng.integers(0, 4, size=(64, 37)).astype(np.int8)
    np.testing.assert_array_equal(native.pack2bit(x), pack.pack2bit(x))


def test_unpack_roundtrip(rng):
    x = rng.integers(0, 4, size=(16, 101)).astype(np.int8)
    p = native.pack2bit(x)
    np.testing.assert_array_equal(native.unpack2bit(p, 101), x)
    # tail padding decodes as MISSING
    full = native.unpack2bit(p, p.shape[1] * 4)
    assert (full[:, 101:] == 3).all()


def test_bed_translate_matches_lut(rng):
    raw = rng.integers(0, 256, size=(40, 13), dtype=np.uint8)
    np.testing.assert_array_equal(native.bed_translate(raw), _LUT[raw])


def test_bed_translate_inverse_roundtrip(rng):
    raw = rng.integers(0, 256, size=(40, 13), dtype=np.uint8)
    np.testing.assert_array_equal(
        native.bed_translate(native.bed_translate(raw), inverse=True), raw)


def test_unpack_bounds_check():
    p = np.zeros((2, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="exceeds capacity"):
        native.unpack2bit(p, 13)


def test_gather_groups_matches_numpy():
    native = pytest.importorskip("terastructure_tpu.native")
    rng = np.random.default_rng(0)
    l, w, wp, g = 37, 13, 16, 4
    packed = rng.integers(0, 256, size=(l, w), dtype=np.uint8)
    starts = rng.integers(0, l, size=6).astype(np.int64)
    out = np.full((len(starts) * g, wp), 0xAB, dtype=np.uint8)
    native.gather_groups(packed, starts, g, out)
    want = np.stack([packed[(s + r) % l] for s in starts for r in range(g)])
    np.testing.assert_array_equal(out[:, :w], want)
    assert (out[:, w:] == 0xAB).all()   # padding untouched
