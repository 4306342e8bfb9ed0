import numpy as np
import jax.numpy as jnp

from terastructure_tpu.data.pack import (
    pack2bit, packed_width, unpack2bit, unpack2bit_jnp,
)
from terastructure_tpu.models.psd import MISSING


def test_roundtrip_exact_multiple(rng):
    x = rng.integers(0, 4, size=(7, 16)).astype(np.int8)
    p = pack2bit(x)
    assert p.shape == (7, 4)
    np.testing.assert_array_equal(unpack2bit(p, 16), x)


def test_roundtrip_ragged(rng):
    x = rng.integers(0, 4, size=(5, 13)).astype(np.int8)
    p = pack2bit(x)
    assert p.shape == (5, packed_width(13))
    np.testing.assert_array_equal(unpack2bit(p, 13), x)
    # Padding positions decode as MISSING.
    full = unpack2bit(p, packed_width(13) * 4)
    assert (full[:, 13:] == MISSING).all()


def test_jnp_unpack_matches_numpy(rng):
    x = rng.integers(0, 4, size=(3, 21)).astype(np.int8)
    p = pack2bit(x)
    out = np.asarray(unpack2bit_jnp(jnp.asarray(p), 21))
    np.testing.assert_array_equal(out, x)


def test_pack_1d(rng):
    x = rng.integers(0, 4, size=(9,)).astype(np.int8)
    np.testing.assert_array_equal(unpack2bit(pack2bit(x), 9), x)
