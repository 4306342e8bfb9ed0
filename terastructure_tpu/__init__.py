"""terastructure_tpu — TPU-native inference engine for the PSD/admixture model.

A brand-new JAX/XLA/Pallas framework (not a port) with the capabilities of
StoreyLab/terastructure: stochastic variational inference for the
Pritchard–Stephens–Donnelly admixture model

    x_ij ~ Binomial(2, theta_i^T beta_j),   theta_i ~ Dir(alpha),
    beta_kj ~ Beta(a, b)

at biobank scale, plus NUTS/HMC and SMC validators for small-K posterior
checks.

Reference parity map (upstream files are cited per SURVEY.md; the reference
mount was empty during the survey so citations are upstream-repo-relative
without line numbers):

    src/main.cc            -> terastructure_tpu.cli
    src/env.{hh,cc}        -> terastructure_tpu.config
    src/snp.{hh,cc}        -> terastructure_tpu.data (bed, pack, dataset)
    src/snpsamplinge.{hh,cc} -> terastructure_tpu.svi (engine, driver)
                               + terastructure_tpu.ops (dense & Pallas kernels)
    src/matrix.hh, GSL     -> jax.numpy / jax.scipy.special
    pthreads               -> terastructure_tpu.parallel (mesh + shard_map)
    (absent upstream)      -> terastructure_tpu.mcmc (HMC/NUTS/SMC validators)
"""

__version__ = "0.1.0"

from terastructure_tpu.config import SVIConfig  # noqa: F401
