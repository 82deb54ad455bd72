"""JAX pytree registration for xds containers.

Dataset/DataArray/Variable register as pytrees with data payloads as leaves
and (dims, coords, attrs) as static aux data.  Coordinates hash by value
digest, so jit tracing is always *correct*: a cached trace is reused only
for calls whose coordinate values are identical.  The streaming engine
normalizes per-chunk time coords to placeholders before entering jit so
that every chunk shares one trace (see weatherbench2_tpu/parallel).
"""
from __future__ import annotations

import numpy as np

from . import core


def _freeze(obj):
  if isinstance(obj, dict):
    return tuple(sorted((k, _freeze(v)) for k, v in obj.items()))
  if isinstance(obj, (list, tuple)):
    return tuple(_freeze(v) for v in obj)
  if isinstance(obj, np.ndarray):
    return (obj.shape, str(obj.dtype), obj.tobytes())
  return obj


class _StaticCoords:
  """Hashable-by-value wrapper for a coords dict (numpy payloads)."""

  __slots__ = ("coords", "_hash")

  def __init__(self, coords: dict):
    self.coords = coords
    self._hash = None

  def _digest(self):
    items = []
    for name in sorted(self.coords):
      v = self.coords[name]
      data = core._to_numpy(v.data)
      items.append((name, v.dims, data.shape, str(data.dtype),
                    hash(data.tobytes())))
    return tuple(items)

  def __hash__(self):
    if self._hash is None:
      self._hash = hash(self._digest())
    return self._hash

  def __eq__(self, other):
    if not isinstance(other, _StaticCoords):
      return False
    if set(self.coords) != set(other.coords):
      return False
    for name, v in self.coords.items():
      o = other.coords[name]
      if v.dims != o.dims:
        return False
      a, b = core._to_numpy(v.data), core._to_numpy(o.data)
      if a.shape != b.shape or a.dtype != b.dtype:
        return False
      if not np.array_equal(a, b):
        return False
    return True


def register():
  import jax

  def variable_flatten(v: core.Variable):
    return (v.data,), (v.dims, _freeze(v.attrs))

  def variable_unflatten(aux, children):
    dims, attrs = aux
    v = object.__new__(core.Variable)
    v.dims = dims
    v.data = children[0]
    v.attrs = dict(attrs)
    return v

  jax.tree_util.register_pytree_node(
      core.Variable, variable_flatten, variable_unflatten
  )

  def dataarray_flatten(da: core.DataArray):
    return (da.variable.data,), (
        da.variable.dims,
        _freeze(da.variable.attrs),
        _StaticCoords(da.coords),
        da.name,
    )

  def dataarray_unflatten(aux, children):
    dims, attrs, coords, name = aux
    v = object.__new__(core.Variable)
    v.dims = dims
    v.data = children[0]
    v.attrs = dict(attrs)
    da = object.__new__(core.DataArray)
    da.variable = v
    da.coords = coords.coords
    da.name = name
    return da

  jax.tree_util.register_pytree_node(
      core.DataArray, dataarray_flatten, dataarray_unflatten
  )

  def dataset_flatten(ds: core.Dataset):
    names = tuple(ds._variables)
    children = tuple(ds._variables[n].data for n in names)
    dims = tuple(ds._variables[n].dims for n in names)
    attrs_per_var = tuple(_freeze(ds._variables[n].attrs) for n in names)
    aux = (
        names,
        dims,
        attrs_per_var,
        _StaticCoords(ds._coords),
        _freeze(ds.attrs),
    )
    return children, aux

  def dataset_unflatten(aux, children):
    names, dims, attrs_per_var, coords, attrs = aux
    ds = object.__new__(core.Dataset)
    ds._variables = {}
    for name, d, a, data in zip(names, dims, attrs_per_var, children):
      v = object.__new__(core.Variable)
      v.dims = d
      v.data = data
      v.attrs = dict(a)
      ds._variables[name] = v
    # shallow-copy: every unflatten of a cached treedef hands out the
    # SAME _StaticCoords dict, so an in-place coord mutation on one jit
    # output would leak into all others and corrupt the cached aux hash
    ds._coords = dict(coords.coords)
    ds.attrs = dict(attrs)
    return ds

  jax.tree_util.register_pytree_node(
      core.Dataset, dataset_flatten, dataset_unflatten
  )


_registered = False


def ensure_registered():
  global _registered
  if not _registered:
    register()
    _registered = True
