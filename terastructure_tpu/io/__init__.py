from terastructure_tpu.io.export import save_model, load_matrix  # noqa: F401
from terastructure_tpu.io.checkpoint import save_checkpoint, restore_checkpoint  # noqa: F401
