from terastructure_tpu.svi.engine import SVIState, init_state, make_step, make_run_chunk  # noqa: F401
from terastructure_tpu.svi.driver import fit, FitResult  # noqa: F401
