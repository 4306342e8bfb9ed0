"""2-bit genotype packing — the HBM-resident representation.

Genotypes take values {0, 1, 2, MISSING=3}: exactly 2 bits. A 1M x 1M
matrix packs to 250 GB, so the packed form is what lives (sharded) in HBM;
kernels unpack on the fly (4x less HBM bandwidth than int8).

Layout is SNP-major — rows are SNPs, columns are individuals packed 4 per
byte, little-endian within the byte (individual i sits at bits
``2*(i % 4)``). This mirrors PLINK .bed's SNP-major 2-bit layout
(reference reader: src/snp.cc `read_bed` per SURVEY.md §2.1) so ingest is
a table lookup, not a re-pack — but note PLINK's *code* assignment differs
(data/bed.py handles translation).

Both jnp (device, jittable) and numpy paths are provided.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from terastructure_tpu.models.psd import MISSING  # noqa: F401  (code 3)


def packed_width(n: int) -> int:
    """Bytes per SNP row for n individuals."""
    return (n + 3) // 4


def pack2bit(x: np.ndarray) -> np.ndarray:
    """Pack int genotypes (..., N) with values in {0,1,2,3} to uint8 (..., ceil(N/4)).

    Trailing positions in the last partial byte are padded with MISSING so
    that unpacked padding never contributes to statistics. Large 2-D
    inputs route through the native C++ core when built (~9x faster).
    """
    x = np.asarray(x)
    if x.ndim == 2 and x.size >= (1 << 22) and x.dtype == np.int8:
        try:
            from terastructure_tpu import native

            return native.pack2bit(x)
        except ImportError:
            pass
    n = x.shape[-1]
    w = packed_width(n)
    pad = 4 * w - n
    if pad:
        pad_block = np.full(x.shape[:-1] + (pad,), MISSING, dtype=x.dtype)
        x = np.concatenate([x, pad_block], axis=-1)
    x = x.astype(np.uint8).reshape(x.shape[:-1] + (w, 4))
    return (
        x[..., 0] | (x[..., 1] << 2) | (x[..., 2] << 4) | (x[..., 3] << 6)
    ).astype(np.uint8)


def unpack2bit(packed: np.ndarray, n: int) -> np.ndarray:
    """Inverse of pack2bit: uint8 (..., W) -> int8 (..., n)."""
    packed = np.asarray(packed)
    out = np.empty(packed.shape[:-1] + (packed.shape[-1] * 4,), dtype=np.int8)
    for s in range(4):
        out[..., s::4] = (packed >> (2 * s)) & 0x3
    return out[..., :n]


def unpack2bit_jnp(packed: jnp.ndarray, n: int) -> jnp.ndarray:
    """Jittable unpack: uint8 (..., W) -> int8 (..., n).

    Implemented as shift/mask + interleave so XLA lowers it to cheap vector
    ops; no gather. ``n`` must be static under jit.
    """
    shifts = jnp.arange(4, dtype=jnp.uint8) * 2          # (4,)
    # (..., W, 4): genotype s of each byte.
    g = (packed[..., None] >> shifts) & jnp.uint8(0x3)
    out = g.reshape(packed.shape[:-1] + (packed.shape[-1] * 4,))
    return out[..., :n].astype(jnp.int8)
