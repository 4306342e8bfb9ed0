from terastructure_tpu.models import psd  # noqa: F401
