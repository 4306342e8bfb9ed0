from terastructure_tpu.utils.labels import align_columns, mean_abs_theta_error  # noqa: F401
