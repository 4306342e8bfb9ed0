"""Run configuration — the TPU-native equivalent of the reference's `Env`.

The reference (src/env.{hh,cc}, per SURVEY.md §2) holds every CLI option as a
field on an `Env` struct and derives an output directory named
``n{N}-k{K}-l{L}-{label}``. We keep that run-dir convention for tooling
parity but replace the hand-rolled argv parsing with a frozen dataclass that
is hashable (so it can be a static argument to ``jax.jit``).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional


@dataclasses.dataclass(frozen=True)
class SVIConfig:
    """Hyperparameters and run options for SVI on the PSD model.

    Defaults follow the reference semantics reconstructed in SURVEY.md §1.2:
    symmetric Dirichlet prior ``alpha = 1/K``, uniform Beta(1,1) prior on
    allele frequencies, Robbins–Monro step size ``rho_t = (tau0 + t)^-kappa``.
    """

    n: int = 0                  # individuals
    l: int = 0                  # SNPs (loci)
    k: int = 3                  # ancestral populations

    # Priors.
    alpha: Optional[float] = None   # None -> 1/K (reference default [MED])
    beta_a: float = 1.0             # Beta prior on allele freqs
    beta_b: float = 1.0

    # Robbins–Monro step-size schedule.
    tau0: float = 1.0
    kappa: float = 0.5

    # Minibatch of SNPs per iteration. The reference subsamples loci
    # (SURVEY.md §1.2); we batch many per step to feed the MXU.
    batch_size: int = 64

    # SNP-group sampling granularity: the minibatch is drawn as
    # batch_size/snp_group uniform groups of snp_group consecutive SNPs.
    # Group draws keep the gamma natural-gradient estimate unbiased
    # (every SNP equally likely; scale L/B unchanged) while turning the
    # per-step HBM gathers/scatters into few large contiguous reads —
    # per-row gathers are latency-bound on TPU (~0.6 us/row). Set 1
    # (default) for fully independent draws (reference behavior); groups
    # only engage at biobank L (engine falls back to 1 when L <= 65536).
    # Measured on 1 v5e chip the grouped gather did NOT win (the lambda
    # scatter-through-reshape copies dominate) — kept as an option for
    # multi-host runs where gather latency compounds.
    snp_group: int = 1

    # Local coordinate-ascent (phi <-> lambda) iterations per minibatch.
    # Default 7 pairs with local_accel below (5 loop passes + 2 unrolled
    # feeding the extrapolation); set 16 with local_accel=False for the
    # reference's plain schedule (SURVEY.md §1.2 "until local
    # convergence").
    local_iters: int = 7
    local_tol: float = 1e-4     # mean |delta lambda| early-exit threshold

    # Aitken-accelerated local solve: apply one per-coordinate Aitken
    # delta^2 extrapolation at the LAST coordinate-ascent iteration
    # (ops/stats_dense.aitken_final). The plain fixed point contracts
    # slowly (~5e-2 relative lambda error left after 16 passes at
    # TGP-like shapes); 6 passes + one extrapolation land ~7x closer
    # for ~2.6x fewer sweeps (study: benchmarks/results/
    # local_accel_ab.json). DEFAULT ON since round 4: with the
    # ratio-clamped safeguard (aitken_final rmax) the measured
    # end-to-end quality at the TGP config matches plain16 within MC
    # error (heldout delta 4e-5 nats, theta MAE 0.00929 vs 0.0099) at
    # +77% sustained throughput (565.9K vs 319.8K SNP-updates/s/chip,
    # 1x v5e — benchmarks/results/local_accel_ab.json
    # "tpu_end_to_end").
    local_accel: bool = True

    # Big-N inner-loop subsampling: run the lambda coordinate-ascent
    # ITERATIONS on a per-step random subsample of this many individuals
    # (N/Ns-scaled statistics), then take ONE exact full-N pass for the
    # final lambda + gamma statistics. The K<=32 MXU lane padding makes
    # every full sweep cost ~128/K more than its useful FLOPs, and the
    # solve runs ~16 sweeps — subsampling cuts that to ~1 full-sweep
    # equivalent with per-step lambda noise ~1/sqrt(Ns) that the exact
    # final pass reduces to one coordinate-ascent step's worth. 0
    # disables; active only when padded N >= 4x this value.
    local_sub_n: int = 8192

    # With local_sub_n active: run one exact full-N refinement sweep
    # between the subsampled solve and the final stats pass. The stats
    # pass is itself a full-N lambda iteration (new lambda = prior +
    # exact stats), so the extra sweep only contracts the subsample
    # perturbation in the t-factors the GAMMA statistic sees. Measured
    # (1x v5e, benchmarks/results/refine_ab.json): switching it OFF is
    # +28% step throughput at 100Kx100K K=10 (14.8 vs 18.9 ms/step) with
    # heldout-ll delta 7e-5 nats and theta-MAE delta 5e-4 at 32Kx10K —
    # within run noise, matching the eval scorer's lambda re-solve
    # (svi/postprocess.solve_lambda_blocks), which never refined.
    local_refine_full: bool = False

    # With local_sub_n active: decode the subsample's allele counts ONCE
    # per step into (B, 4, W_sub) bf16 planes (exact — counts are
    # {0,1,2}) and iterate lambda_stats_acat over them, instead of
    # re-running the 2-bit unpack chain (shift/mask/compare/cast/select,
    # the VPU-bound share of the iteration) every coordinate-ascent
    # pass. Costs one extra HBM round-trip of 2*B*4W_sub bf16 per step,
    # repaid local_iters times. Pallas path only.
    sub_decode_once: bool = True

    # With local_sub_n active: compute the phi-ratio divides of the
    # SUBSAMPLED solve iterations with the VPU's fast reciprocal
    # approximation (~2^-12 relative error) instead of exact division.
    # The subsampled lambda already carries ~1/sqrt(sub_n) statistical
    # noise, so the approximation is far below the noise floor; the
    # exact full-N passes (refinement, final stats) always use the true
    # divide. Only affects the Pallas path.
    local_sub_approx_div: bool = True

    # Which Pallas kernel computes the exact full-N stats pass of the
    # per-iteration path (engine.step_core_packed):
    #   "pair"     — two kernels (lambda-stats + gamma-stats), each with
    #                its own unpack and D = T.U^T dot;
    #   "fused"    — one kernel, lambda accumulated by dynamic-slice
    #                read-modify-write (v1; measured slower than pair);
    #   "fused_v2" — one kernel, lambda emitted as per-w-tile partials
    #                (no revisits) reduced outside; shares one unpack and
    #                one D-dot per tile between lambda and gamma.
    stats_kernel: str = "fused_v2"

    # Compute the exact stats pass's phi-ratio divides with the VPU fast
    # reciprocal too (stats_kernel="fused_v2" only). Unlike
    # local_sub_approx_div this perturbs the FINAL lambda/gamma
    # statistics (~2^-12 relative), not just the inner iterations — keep
    # it off unless the quality A/B at your config shows the delta is
    # below MC error (benchmarks/results/bigN_quality_ab.json).
    stats_approx_div: bool = False

    # Gather minibatch rows with the Pallas DMA block-gather kernel
    # (ops/gather.py: concurrent HBM->HBM copies of 8-row-aligned
    # blocks) instead of XLA's latency-bound row gather (~1 us/row on
    # v5e). Implies the minibatch is drawn as batch_size/8 uniform
    # blocks of 8 consecutive SNPs — unbiased for the gamma estimate,
    # same argument as snp_group (single-row HBM DMAs are illegal under
    # Mosaic int8 tiling). Engages on TPU at L >= dma_gather_min_l when
    # L % 8 == 0 and batch_size % 128 == 0; elsewhere packed[idx].
    dma_gather: bool = True
    # Smallest L the DMA block-gather engages at. The default keeps the
    # historical "biobank L only" heuristic (independent per-SNP draws
    # at small L); lower it when N is huge but L modest — e.g. a
    # resident N=1M x L=32K fit, where the 1 GB/step row gather is the
    # point of the kernel regardless of L.
    dma_gather_min_l: int = 65537

    # Heldout/validation entry fractions (SURVEY.md §1.2 step 5).
    validation_frac: float = 0.005
    heldout_frac: float = 0.005

    # Heldout predictive form (SURVEY.md §3.3 [LOW] — which one the
    # reference uses is unverified while the mount is empty):
    # "plugin" = Binom(2, E[theta]^T E[beta]); "variational" = the
    # proper E_q[Binom(2, s)] in closed form (models/psd.py). Both are
    # implemented; config.json records the one in use for every run.
    predictive: str = "plugin"

    # Convergence assessment.
    rfreq: int = 100            # validation log-lik every rfreq iterations
    max_steps: int = 10_000
    conv_tol: float = 1e-5      # relative validation-ll improvement floor
    conv_patience: int = 3      # consecutive non-improving checks to stop

    # Numerics: dtype for the hot matmuls. f32 matches reference doubles
    # closely; bf16 runs the MXU at full rate with stochastic robustness.
    compute_dtype: str = "float32"

    # Hot-loop implementation: "dense" (jnp matmuls, materializes (B, N)
    # intermediates), "pallas" (per-iteration fused kernels,
    # ops/stats_pallas.py), "fused" (one kernel per step with in-kernel
    # row DMA, ops/fused_step.py), or "auto" (fused on TPU when the
    # shape fits its VMEM budget, else pallas on TPU, dense elsewhere).
    kernel: str = "auto"

    # Lambda handling. "local" (default, TPU-native): lambda is treated
    # as the local variable it is (SURVEY.md §1.2) — each minibatch's
    # coordinate ascent cold-starts from the Beta prior, nothing is
    # gathered/scattered from the (L, K, 2) array during stepping (that
    # HBM traffic is latency-bound, ~1.4 ms/step at L=1M), and
    # validation/export lambdas are recomputed from the current gamma on
    # demand (always-converged — slightly better-calibrated heldout
    # scores). "stored": reference-style — warm-start from and scatter
    # back into the stored lambda array every step.
    lambda_mode: str = "local"

    # Init scale for gamma (reference inits gamma from a gsl rng [MED]).
    gamma_init_scale: float = 0.1

    # gamma initialization: "random" (reference behavior) or "spectral"
    # (svi/init.py - randomized-PCA + soft k-means warm start; cuts the
    # random-init wander phase without biasing the fixed point).
    init: str = "random"

    seed: int = 0
    label: str = "run"

    # Sharding (parallel/mesh.py): mesh axis sizes; 0 = auto.
    ind_shards: int = 0
    snp_shards: int = 0

    # Software-pipeline the sharded chunk runner: issue step t+1's
    # minibatch gather between step t's gamma all-reduce and the gamma
    # update that consumes it, so the (N/I, K) collective — the
    # dominant communication term at high chip counts — can run
    # asynchronously under XLA's latency-hiding scheduler. EXACT: only
    # instruction order changes (pipelined == per-step bitwise,
    # tests/test_sharded.py). Off = per-step shard_map loop.
    comm_overlap: bool = True

    # Reduction dtype for the gamma natural-gradient statistic's
    # psum('snp') — the one collective whose payload is proportional to
    # N and independent of B, i.e. the dependency bound at high chip
    # counts under fixed batch (benchmarks/results/scaling_model.md).
    # "bf16" halves the wire payload (partials are rounded to bf16 and
    # the ring accumulates in bf16); the engine path rounds the whole
    # statistic once so single-device fits share the semantics. The
    # rounding (~2^-8 relative) sits far below the 1/sqrt(B) minibatch
    # noise the Robbins-Monro update already averages over — measured
    # quality A/B in benchmarks/results/gamma_bf16_ab.json. Default
    # stays exact f32: the 8-chip acceptance row clears without it.
    gamma_psum_dtype: str = "f32"

    def __post_init__(self):
        if self.k <= 0:
            raise ValueError(f"k must be positive, got {self.k}")
        if self.batch_size <= 0:
            raise ValueError("batch_size must be positive")
        if self.gamma_psum_dtype not in ("f32", "bf16"):
            raise ValueError("gamma_psum_dtype must be 'f32' or 'bf16', "
                             f"got {self.gamma_psum_dtype!r}")

    @property
    def alpha_value(self) -> float:
        return (1.0 / self.k) if self.alpha is None else self.alpha

    def rho(self, t):
        """Robbins–Monro step size at iteration t (works on traced values)."""
        return (self.tau0 + t) ** (-self.kappa)

    # ---- run-dir convention (reference: Env creates n{N}-k{K}-l{L}-{label}/)
    def run_dir_name(self) -> str:
        return f"n{self.n}-k{self.k}-l{self.l}-{self.label}"

    def make_run_dir(self, base: str = ".") -> str:
        path = os.path.join(base, self.run_dir_name())
        os.makedirs(path, exist_ok=True)
        return path

    # ---- (de)serialization for checkpoints / CLI round-trips
    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, s: str) -> "SVIConfig":
        return cls(**json.loads(s))

    def replace(self, **kw) -> "SVIConfig":
        return dataclasses.replace(self, **kw)
