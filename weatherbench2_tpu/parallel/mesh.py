"""Device mesh helpers.

Scale-out model (replaces the reference's Beam data parallelism,
SURVEY §2.3): chunks of the (init_)time axis are sharded across a 1-D
``batch`` mesh axis; spatial dims stay local so area-weighted reductions
are single-chip; the tiny per-chunk metric results are summed across the
mesh by XLA (psum over ICI) when outputs are requested replicated.
"""
from typing import Optional, Sequence

import numpy as np


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("batch",),
    devices=None,
):
  """Create a 1-D (or reshaped) jax Mesh over available devices."""
  import jax
  from jax.sharding import Mesh

  if devices is None:
    devices = jax.devices()
  if n_devices is not None:
    devices = devices[:n_devices]
  arr = np.asarray(devices)
  if len(axis_names) > 1:
    # factor devices evenly across axes: first axis gets the remainder
    sizes = [1] * len(axis_names)
    remaining = arr.size
    sizes[0] = remaining
    arr = arr.reshape(sizes)
  return Mesh(arr, axis_names=tuple(axis_names))
