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
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from terastructure_tpu.data.pack import pack2bit, packed_width, unpack2bit
from terastructure_tpu.models.psd import MISSING


@dataclasses.dataclass
class EntrySet:
    """A COO set of (individual, SNP, genotype) entries."""

    ind_idx: np.ndarray   # (M,) int32
    snp_idx: np.ndarray   # (M,) int32
    x: np.ndarray         # (M,) int8 in {0,1,2}

    def __len__(self):
        return len(self.x)


@dataclasses.dataclass
class GenotypeData:
    """Packed training matrix + eval sets. n individuals, l SNPs."""

    n: int
    l: int
    packed: np.ndarray                    # uint8 (l, ceil(n/4)), train codes
    validation: Optional[EntrySet] = None
    heldout: Optional[EntrySet] = None
    ind_ids: Optional[list] = None        # individual labels (.indv file)
    snp_ids: Optional[list] = None

    # Per-set eval cap: scoring cost is O(set size) (and, in the 'local'
    # lambda mode, O(N * unique eval SNPs)); ~500K entries already give
    # MC error ~1e-3 nats while biobank matrices have billions.
    MAX_EVAL_ENTRIES = 500_000

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
    ) -> "GenotypeData":
        n, l = x.shape
        xt = np.ascontiguousarray(x.T).astype(np.int8)   # (l, n) SNP-major
        rng = np.random.default_rng(seed + 1_000_003)
        cap = (cls.MAX_EVAL_ENTRIES if max_eval_entries is None
               else max_eval_entries)

        # Entry counts from the missing rate (sampled estimate at biobank
        # scale — exact nnz would need a full pass; the fractions are
        # approximate targets anyway).
        if xt.size > (1 << 26):
            probe = rng.integers(0, xt.size, size=1 << 20)
            miss_rate = float((xt.ravel()[probe] == MISSING).mean())
        else:
            miss_rate = float((xt == MISSING).mean())
        nnz = int(xt.size * (1.0 - miss_rate))
        n_val = min(int(round(validation_frac * nnz)), cap)
        n_held = min(int(round(heldout_frac * nnz)), cap)

        # Rejection-sample distinct non-missing entries — never
        # materializes np.nonzero of the full matrix (2 x int64 x n*l).
        want = n_val + n_held
        ii = np.empty(0, np.int64)
        while len(ii) < want and want:
            m = int((want - len(ii) + 1024) / max(1.0 - miss_rate, 1e-6) * 1.2)
            ci = rng.integers(0, n, size=m)
            cj = rng.integers(0, l, size=m)
            ok = xt[cj, ci] != MISSING
            cand = np.concatenate([ii, cj[ok] * np.int64(n) + ci[ok]])
            ii = np.unique(cand)                         # sorted, distinct
        if want:
            ii = rng.permutation(ii)[:want]
        obs_j, obs_i = ii // n, ii % n

        def make(sel):
            i = obs_i[sel].astype(np.int32)
            j = obs_j[sel].astype(np.int32)
            es = EntrySet(ind_idx=i, snp_idx=j, x=xt[j, i].copy())
            xt[j, i] = MISSING                           # exclude from training
            return es

        validation = make(slice(0, n_val)) if n_val else None
        heldout = make(slice(n_val, want)) if n_held else None
        return cls(
            n=n, l=l, packed=pack2bit(xt),
            validation=validation, heldout=heldout,
            ind_ids=ind_ids, snp_ids=snp_ids,
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
