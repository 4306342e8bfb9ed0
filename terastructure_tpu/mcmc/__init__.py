from terastructure_tpu.mcmc.potential import PSDPotential  # noqa: F401
from terastructure_tpu.mcmc.hmc import run_hmc  # noqa: F401
from terastructure_tpu.mcmc.nuts import run_nuts  # noqa: F401
from terastructure_tpu.mcmc.chees import run_chees  # noqa: F401
from terastructure_tpu.mcmc.smc import run_smc  # noqa: F401
