from terastructure_tpu.ops import stats_dense  # noqa: F401
