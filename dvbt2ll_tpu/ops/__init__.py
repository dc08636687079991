"""Hand-written TPU kernels (Pallas) for hot ops where they beat XLA."""
from .ldpc_pallas import qc_ldpc_parity_pallas  # noqa: F401
