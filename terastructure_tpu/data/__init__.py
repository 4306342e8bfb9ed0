from terastructure_tpu.data.dataset import GenotypeData  # noqa: F401
from terastructure_tpu.data.pack import pack2bit, unpack2bit  # noqa: F401
from terastructure_tpu.data.simulate import simulate_psd  # noqa: F401
