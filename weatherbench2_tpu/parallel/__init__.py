"""Parallel/distributed runtime: device meshes, streaming evaluation,
checkpointable accumulators.

This package is the TPU-native replacement for the reference's Apache
Beam / xarray-beam layer (reference evaluation.py:555-828 and the Rechunk/
Mean/CoGroupByKey idioms in scripts/): data parallelism over a
``jax.sharding.Mesh`` with XLA collectives over ICI instead of a runner
shuffle service.
"""
from .mesh import make_mesh  # noqa: F401
