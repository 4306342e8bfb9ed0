from terastructure_tpu.parallel.mesh import make_mesh, MeshSpec  # noqa: F401
from terastructure_tpu.parallel.sharded import (  # noqa: F401
    make_sharded_step, make_sharded_run_chunk, shard_state, shard_packed,
)
from terastructure_tpu.parallel.fit import fit_sharded  # noqa: F401
