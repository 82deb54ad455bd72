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
    axis_sizes: Optional[Sequence[int]] = None,
):
  """Create a jax Mesh over available devices.

  1-D ``("batch",)`` meshes shard the streaming time axis (pure data
  parallelism).  2-D ``("batch", "spatial")`` meshes additionally shard the
  latitude axis: spatial weighted means then reduce with an XLA-inserted
  psum over ICI while each chip holds a latitude band.
  """
  import jax
  from jax.sharding import Mesh

  if devices is None:
    devices = jax.devices()
  if n_devices is not None:
    devices = devices[:n_devices]
  arr = np.asarray(devices)
  if len(axis_names) > 1:
    if axis_sizes is None:
      # split roughly evenly: give the last axis a power-of-two factor
      total = arr.size
      last = 1
      while last * 2 <= total and total % (last * 2) == 0 and last < (
          total // last
      ):
        last *= 2
      axis_sizes = [total // last] + [1] * (len(axis_names) - 2) + [last]
    arr = arr.reshape(axis_sizes)
  return Mesh(arr, axis_names=tuple(axis_names))
