"""weatherbench2_tpu: a TPU-native forecast verification framework.

A from-scratch rebuild of the capabilities of google-research/weatherbench2
(mounted read-only at /root/reference) designed for TPU hardware:

  * dense ``(init, lead, level, lat, lon[, member])`` arrays resident in HBM
    instead of xarray chunks flowing through Apache Beam;
  * metrics as JAX kernels (jit-fused; Pallas for hot reductions);
  * scale-out via ``jax.sharding.Mesh`` + collectives over ICI instead of a
    Beam shuffle service;
  * a small host-side labeled-array layer (``weatherbench2_tpu.xds``) for
    IO, coordinates, and selection logic (xarray-free).
"""

__version__ = "0.1.0"

from . import xds  # noqa: F401
from . import schema  # noqa: F401
from . import flag_utils  # noqa: F401


def __getattr__(name):
  # lazy imports to keep `import weatherbench2_tpu` light
  import importlib

  if name in (
      "config",
      "derived_variables",
      "evaluation",
      "metrics",
      "ops",
      "parallel",
      "regions",
      "regridding",
      "thresholds",
      "utils",
      "visualization",
      "test_utils",
  ):
    return importlib.import_module(f"weatherbench2_tpu.{name}")
  raise AttributeError(name)
