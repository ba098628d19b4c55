"""Kernel library — import all modules so every kernel registers."""

from tsfresh_spark.kernels.registry import KERNELS, KernelInfo, get_kernel, kernel  # noqa: F401

# importing for registration side effects
from tsfresh_spark.kernels import statistics  # noqa: F401, E402
from tsfresh_spark.kernels import ordered  # noqa: F401, E402
from tsfresh_spark.kernels import entropy  # noqa: F401, E402
from tsfresh_spark.kernels import spectral  # noqa: F401, E402
from tsfresh_spark.kernels import model  # noqa: F401, E402
