"""Genotype dataset container + heldout/validation set construction.

The reference's SNP class (src/snp.{hh,cc}, SURVEY.md §2.1) owns the N x L
genotype matrix and ID labels; the inference class builds heldout +
validation entry sets and excludes them from updates (SURVEY.md §1.2 step 5,
§3.3). Here:

  - training genotypes live 2-bit packed, SNP-major: uint8 (L, ceil(N/4));
  - heldout/validation entries are *re-coded as MISSING* in the training
    matrix (so every kernel excludes them for free via the missing mask) and
    stored separately as COO (ind_idx, snp_idx, x) arrays for scoring.

Two evaluation sets, as upstream: `validation` drives the convergence
criterion during fitting; `heldout` (test) is scored only at the end.

The canonical constructors are packed-native: `from_packed` carves the
eval sets directly on the 2-bit matrix (no dense N x L materialization —
the reference reads .bed straight into its working representation,
SNP::read_bed, SURVEY.md §2.1; at biobank scale densifying first would
need O(N*L) int8 = ~1 TB). `from_bed` = read_bed + from_packed;
`from_dense` packs then delegates.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Optional

import numpy as np

from terastructure_tpu.data.pack import pack2bit, packed_width, unpack2bit
from terastructure_tpu.models.psd import MISSING

log = logging.getLogger("terastructure_tpu")

# per-byte count of 2-bit codes equal to MISSING (0b11)
_MISS_LUT = np.array(
    [sum(((b >> (2 * s)) & 3) == MISSING for s in range(4))
     for b in range(256)], dtype=np.uint8)


@dataclasses.dataclass
class EntrySet:
    """A COO set of (individual, SNP, genotype) entries."""

    ind_idx: np.ndarray   # (M,) int32
    snp_idx: np.ndarray   # (M,) int32
    x: np.ndarray         # (M,) int8 in {0,1,2}

    def __len__(self):
        return len(self.x)


def _lookup_packed(packed: np.ndarray, i: np.ndarray, j: np.ndarray):
    """Genotype codes at entries (i, j) of the packed (L, W) matrix."""
    byte = packed[j, i >> 2]
    shift = (2 * (i & 3)).astype(np.uint8)
    return ((byte >> shift) & 3).astype(np.int8)


def _recode_missing_packed(packed: np.ndarray, i: np.ndarray, j: np.ndarray):
    """Set entries (i, j) to MISSING in place (MISSING = 0b11: OR mask).

    Duplicate (i, j) pairs are harmless (idempotent), but numpy fancy
    in-place OR with duplicated indices drops repeats — callers pass
    de-duplicated entries anyway.
    """
    shift = (2 * (i & 3)).astype(np.uint8)
    np.bitwise_or.at(packed, (j, i >> 2), np.uint8(3) << shift)


def _missing_rate(packed: np.ndarray, n: int, l: int,
                  rng: np.random.Generator) -> float:
    """Fraction of MISSING among the n*l real entries.

    Exact via a per-byte popcount LUT when the matrix is small; sampled
    estimate at biobank scale (one probe pass, ~1M entries).
    """
    if packed.size <= (1 << 24):
        total_missing = int(_MISS_LUT[packed].sum())
        # padding positions (beyond n in the last byte) are MISSING by
        # construction and not real entries
        pad = (4 * packed.shape[1] - n) * l
        return max(total_missing - pad, 0) / max(n * l, 1)
    probe = 1 << 20
    pi = rng.integers(0, n, size=probe)
    pj = rng.integers(0, l, size=probe)
    return float((_lookup_packed(packed, pi, pj) == MISSING).mean())


def _carve_entries(packed: np.ndarray, n: int, l: int, n_val: int,
                   n_held: int, rng: np.random.Generator,
                   snp_pool: int = 0):
    """Sample distinct non-missing entries, split val/heldout, recode
    MISSING in `packed` (in place). Returns (validation, heldout).

    Rejection sampling against the packed matrix — never materializes
    np.nonzero of the full matrix. The loop is bounded: if successive
    rounds stop finding new entries (requested count exceeds the true
    non-missing population), it truncates with a warning instead of
    spinning forever.

    snp_pool > 0 restricts all eval entries to a random pool of that many
    SNPs: the 'local' lambda mode re-solves each unique eval SNP against
    all N individuals per check, so bounding UNIQUE SNPs (not entries)
    keeps eval cost O(snp_pool * N) while the entry count — which sets
    the MC error of the convergence signal — stays large.
    """
    want = n_val + n_held
    if not want:
        return None, None
    pool = None
    if snp_pool and snp_pool < l:
        pool = rng.choice(l, size=snp_pool, replace=False).astype(np.int64)
    miss_rate = _missing_rate(packed, n, l, rng)
    ii = np.empty(0, np.int64)
    stall = 0
    while len(ii) < want and stall < 3:
        m = int((want - len(ii) + 1024) / max(1.0 - miss_rate, 1e-6) * 1.2)
        ci = rng.integers(0, n, size=m)
        if pool is None:
            cj = rng.integers(0, l, size=m)
        else:
            cj = pool[rng.integers(0, len(pool), size=m)]
        ok = _lookup_packed(packed, ci, cj) != MISSING
        cand = np.concatenate([ii, cj[ok] * np.int64(n) + ci[ok]])
        new = np.unique(cand)                            # sorted, distinct
        stall = stall + 1 if len(new) == len(ii) else 0
        ii = new
    if len(ii) < want:
        log.warning(
            "eval carve: only %d distinct non-missing entries found "
            "(requested %d); truncating eval sets proportionally",
            len(ii), want)
        n_val = int(round(len(ii) * n_val / want))
        n_held = len(ii) - n_val
        want = len(ii)
    ii = rng.permutation(ii)[:want]
    obs_j = (ii // n).astype(np.int32)
    obs_i = (ii % n).astype(np.int32)

    def make(sel):
        i, j = obs_i[sel], obs_j[sel]
        es = EntrySet(ind_idx=i, snp_idx=j,
                      x=_lookup_packed(packed, i, j))
        _recode_missing_packed(packed, i, j)             # exclude from training
        return es

    validation = make(slice(0, n_val)) if n_val else None
    heldout = make(slice(n_val, want)) if n_held else None
    return validation, heldout


def carve_eval_device(packed_dev, n: int, *, validation_frac: float = 0.005,
                      heldout_frac: float = 0.005, seed: int = 0,
                      max_eval_entries: Optional[int] = None,
                      eval_snp_pool: int = 2048):
    """Eval-set carve for a DEVICE-resident packed matrix.

    Counterpart of GenotypeData.from_packed for matrices that were
    simulated (or assembled) directly on device and must not round-trip
    to host (simulate_packed_device_resident): entry lookups run on
    device, only the (small) entry index/value arrays and candidate masks
    cross to host, and the MISSING recode is one donated in-place
    scatter-OR. Entries are always restricted to a SNP pool (local-mode
    eval cost is O(pool * N); see _carve_entries).

    Returns (packed_dev, validation, heldout, pool, eval_rows) where
    pool is the sorted (S,) int32 eval-SNP pool and eval_rows the
    post-recode device (S, W) rows (feed both to GenotypeData's
    eval_row_snps / eval_rows_full so 'local' lambda-mode scoring never
    touches the full matrix on host).
    """
    import functools

    import jax
    import jax.numpy as jnp

    l, w = packed_dev.shape
    if w != packed_width(n):
        raise ValueError(f"packed width {w} != ceil({n}/4)")

    @jax.jit
    def _lookup_dev(packed, i, j):
        byte = packed[j, i >> 2].astype(jnp.int32)
        return (byte >> (2 * (i & 3))) & 3

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _mask_dev(packed, jj, bb, mm):
        return packed.at[jj, bb].set(packed[jj, bb] | mm)

    rng = np.random.default_rng(seed + 1_000_003)
    pool = np.sort(rng.choice(l, size=min(eval_snp_pool, l),
                              replace=False).astype(np.int64))

    def lookup(i, j):
        return np.asarray(_lookup_dev(
            packed_dev, jnp.asarray(i, jnp.int32), jnp.asarray(j, jnp.int32)))

    # Missing-rate probe (sampled, as _missing_rate does at biobank scale).
    probe = 1 << 20
    miss_rate = float((lookup(rng.integers(0, n, size=probe),
                              rng.integers(0, l, size=probe)) == MISSING
                       ).mean())
    nnz = int(n * l * (1.0 - miss_rate))
    cap = (GenotypeData.MAX_EVAL_ENTRIES if max_eval_entries is None
           else max_eval_entries)
    n_val = min(int(round(validation_frac * nnz)), cap)
    n_held = min(int(round(heldout_frac * nnz)), cap)
    want = n_val + n_held
    if not want:
        return packed_dev, None, None, pool.astype(np.int32), None

    ii = np.empty(0, np.int64)
    stall = 0
    while len(ii) < want and stall < 3:
        m = int((want - len(ii) + 1024) / max(1.0 - miss_rate, 1e-6) * 1.2)
        ci = rng.integers(0, n, size=m)
        cj = pool[rng.integers(0, len(pool), size=m)]
        ok = lookup(ci, cj) != MISSING
        cand = np.concatenate([ii, cj[ok] * np.int64(n) + ci[ok]])
        new = np.unique(cand)
        stall = stall + 1 if len(new) == len(ii) else 0
        ii = new
    if len(ii) < want:
        log.warning("device eval carve: only %d distinct non-missing "
                    "entries (requested %d); truncating", len(ii), want)
        n_val = int(round(len(ii) * n_val / want))
        n_held = len(ii) - n_val
        want = len(ii)
    ii = rng.permutation(ii)[:want]
    obs_j = (ii // n).astype(np.int32)
    obs_i = (ii % n).astype(np.int32)
    vals = lookup(obs_i, obs_j).astype(np.int8)

    # OR-combine masks per touched byte on host (entries sharing a byte
    # merge), then one donated in-place scatter-OR on device.
    ib = obs_i >> 2
    m8 = (np.uint8(3) << (2 * (obs_i & 3)).astype(np.uint8))
    bkey = obs_j.astype(np.int64) * w + ib
    order = np.argsort(bkey, kind="stable")
    bkey_s, m8_s = bkey[order], m8[order]
    starts = np.flatnonzero(np.r_[True, bkey_s[1:] != bkey_s[:-1]])
    mm = np.bitwise_or.reduceat(m8_s, starts)
    ub = bkey_s[starts]
    packed_dev = _mask_dev(packed_dev,
                           jnp.asarray((ub // w).astype(np.int32)),
                           jnp.asarray((ub % w).astype(np.int32)),
                           jnp.asarray(mm))

    def make(sel):
        return EntrySet(ind_idx=obs_i[sel], snp_idx=obs_j[sel], x=vals[sel])

    validation = make(slice(0, n_val)) if n_val else None
    heldout = make(slice(n_val, want)) if n_held else None
    eval_rows = jax.jit(lambda p, q: p[q])(
        packed_dev, jnp.asarray(pool.astype(np.int32)))
    return packed_dev, validation, heldout, pool.astype(np.int32), eval_rows


@dataclasses.dataclass
class GenotypeData:
    """Packed training matrix + eval sets. n individuals, l SNPs.

    `packed` may hold only a byte-column slice of the global matrix (the
    multi-host ingest path — each host loads just its individuals'
    columns, parallel/multihost.local_byte_cols); then `byte_col_offset`
    records the slice origin and eval sets still index globally.
    """

    n: int
    l: int
    packed: np.ndarray                    # uint8 (l, W) train codes
    validation: Optional[EntrySet] = None
    heldout: Optional[EntrySet] = None
    ind_ids: Optional[list] = None        # individual labels (.indv file)
    snp_ids: Optional[list] = None
    byte_col_offset: int = 0              # origin of packed's byte columns
    # Full-width (all individuals) packed rows of the unique eval SNPs +
    # their sorted SNP indices — set by the multi-host loader so 'local'
    # lambda-mode scoring works when `packed` is a byte-column slice.
    eval_rows_full: Optional[np.ndarray] = None   # (S, ceil(n/4)) uint8
    eval_row_snps: Optional[np.ndarray] = None    # (S,) int32 sorted

    # Per-set eval cap: scoring cost is O(set size) (plus a lambda
    # re-solve over the unique eval SNPs in the 'local' lambda mode);
    # ~500K entries already give MC error ~1e-3 nats while biobank
    # matrices have billions.
    MAX_EVAL_ENTRIES = 500_000

    @property
    def is_local_slice(self) -> bool:
        return (self.byte_col_offset != 0
                or self.packed.shape[1] < packed_width(self.n))

    @classmethod
    def from_packed(
        cls,
        packed: np.ndarray,               # uint8 (l, ceil(n/4)), our codes
        n: int,
        *,
        validation_frac: float = 0.005,
        heldout_frac: float = 0.005,
        seed: int = 0,
        ind_ids=None,
        snp_ids=None,
        max_eval_entries: Optional[int] = None,
        eval_snp_pool: int = 0,
        copy: bool = False,
    ) -> "GenotypeData":
        """Carve eval sets directly on a packed matrix (mutated in place
        unless copy=True) — the biobank-scale ingest path.

        eval_snp_pool bounds the number of UNIQUE SNPs carrying eval
        entries (see _carve_entries) — set it at big N so the 'local'
        lambda mode's per-check eval stays cheap without capping entries.
        """
        l = packed.shape[0]
        if packed.shape[1] != packed_width(n):
            raise ValueError(
                f"packed width {packed.shape[1]} != ceil({n}/4); for "
                "byte-column slices construct GenotypeData directly")
        if copy:
            packed = packed.copy()
        rng = np.random.default_rng(seed + 1_000_003)
        cap = (cls.MAX_EVAL_ENTRIES if max_eval_entries is None
               else max_eval_entries)
        miss_rate = _missing_rate(packed, n, l, rng)
        nnz = int(n * l * (1.0 - miss_rate))
        n_val = min(int(round(validation_frac * nnz)), cap)
        n_held = min(int(round(heldout_frac * nnz)), cap)
        validation, heldout = _carve_entries(
            packed, n, l, n_val, n_held, rng, snp_pool=eval_snp_pool)
        return cls(
            n=n, l=l, packed=packed,
            validation=validation, heldout=heldout,
            ind_ids=ind_ids, snp_ids=snp_ids,
        )

    @classmethod
    def from_bed(
        cls,
        path: str,
        *,
        validation_frac: float = 0.005,
        heldout_frac: float = 0.005,
        seed: int = 0,
        max_eval_entries: Optional[int] = None,
        eval_snp_pool: int = 0,
    ) -> "GenotypeData":
        """PLINK .bed (+ sibling .fam/.bim) -> packed-native dataset.

        Single-pass ingest straight into the working representation
        (reference SNP::read_bed parity, SURVEY.md §2.1): peak host
        memory is O(packed) = n*l/4 bytes, never the dense n*l.
        """
        from terastructure_tpu.data.bed import read_bed

        packed, ind_ids, snp_ids = read_bed(path)
        return cls.from_packed(
            packed, len(ind_ids),
            validation_frac=validation_frac, heldout_frac=heldout_frac,
            seed=seed, ind_ids=ind_ids, snp_ids=snp_ids,
            max_eval_entries=max_eval_entries, eval_snp_pool=eval_snp_pool,
        )

    @classmethod
    def from_dense(
        cls,
        x: np.ndarray,                    # (n, l) int in {0,1,2,MISSING}
        *,
        validation_frac: float = 0.005,
        heldout_frac: float = 0.005,
        seed: int = 0,
        ind_ids=None,
        snp_ids=None,
        max_eval_entries: Optional[int] = None,
        eval_snp_pool: int = 0,
    ) -> "GenotypeData":
        n, l = x.shape
        xt = np.ascontiguousarray(x.T).astype(np.int8)   # (l, n) SNP-major
        return cls.from_packed(
            pack2bit(xt), n,
            validation_frac=validation_frac, heldout_frac=heldout_frac,
            seed=seed, ind_ids=ind_ids, snp_ids=snp_ids,
            max_eval_entries=max_eval_entries, eval_snp_pool=eval_snp_pool,
        )

    def dense(self) -> np.ndarray:
        """Unpack the training matrix to (n, l) int8 (tests/small data only)."""
        return unpack2bit(self.packed, self.n).T

    @property
    def width(self) -> int:
        return packed_width(self.n)

    def pad_snps(self, multiple: int) -> "GenotypeData":
        """Pad L up to a multiple (rows of all-MISSING) for even sharding.

        Padding SNPs are all-missing so they contribute nothing if sampled;
        samplers should still prefer drawing from [0, l) of the *original* l
        — engine code receives both `l` and `l_padded`.
        """
        lp = ((self.l + multiple - 1) // multiple) * multiple
        if lp == self.packed.shape[0]:
            return self
        pad = np.full((lp - self.packed.shape[0], self.packed.shape[1]),
                      0xFF, dtype=np.uint8)              # 0xFF = 4x MISSING
        return dataclasses.replace(self, packed=np.concatenate([self.packed, pad]))
