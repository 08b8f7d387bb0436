from .spectral import etdrk4_solve, generate_ks_data, generate_burgers_data
from .loader import WindowedLoader, native_available

__all__ = [
    "etdrk4_solve",
    "generate_ks_data",
    "generate_burgers_data",
    "WindowedLoader",
    "native_available",
]
