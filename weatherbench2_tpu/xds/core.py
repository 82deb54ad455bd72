"""A minimal, TPU-friendly labeled-array data model.

This module provides ``Variable``, ``DataArray`` and ``Dataset`` — a small,
self-contained replacement for the subset of xarray semantics that
WeatherBench-style verification pipelines rely on (named dimensions,
label-based selection including vectorized/pointwise indexing, broadcasting
by dimension name, NaN-aware and weighted reductions, time accessors).

Design notes (TPU-first):
  * Data payloads may be ``numpy.ndarray`` **or** ``jax.Array``.  All
    arithmetic dispatches to ``jax.numpy`` as soon as either operand lives on
    device, so expressions written against this API trace cleanly under
    ``jax.jit`` (datasets are registered as pytrees; coordinates are static).
  * Coordinates are always host-side numpy arrays (they carry datetime64 /
    str values which have no device representation) and are treated as
    metadata: label→position resolution happens on host, producing integer
    gather indices that run on device.
  * There is no lazy/dask layer: arrays are either resident (host or HBM) or
    streamed explicitly by the evaluation engine in weatherbench2_tpu.

Behavioral reference: mirrors the conventions the upstream WeatherBench 2
pipeline assumes of xarray (see /root/reference/weatherbench2/schema.py:25-44
for time conventions and metrics.py:141-163 for weighted spatial averaging),
re-implemented from scratch without xarray.
"""
from __future__ import annotations

from collections.abc import Iterable, Mapping, Sequence
import functools
from typing import Any

import numpy as np


class LazyArrayBase:
  """Marker base for lazily-backed array payloads (see io_zarr.LazyArray).

  Implementations provide shape/dtype/ndim, basic-slicing __getitem__
  (returning a lazy view when possible, numpy otherwise), and __array__
  for materialization.  numpy functions consume them via __array__.
  """


class LazyCast(LazyArrayBase):
  """A dtype cast deferred over a lazy payload (cast happens per read)."""

  __slots__ = ("_base", "dtype")

  def __init__(self, base, dtype):
    self._base = base
    self.dtype = np.dtype(dtype)

  @property
  def shape(self):
    return self._base.shape

  @property
  def ndim(self):
    return len(self._base.shape)

  @property
  def size(self):
    return int(np.prod(self._base.shape)) if self._base.shape else 1

  def __getitem__(self, key):
    piece = self._base[key]
    if isinstance(piece, LazyArrayBase):
      return LazyCast(piece, self.dtype)
    return np.asarray(piece).astype(self.dtype)

  def __array__(self, dtype=None, copy=None):
    out = np.asarray(self._base).astype(self.dtype)
    return out.astype(dtype) if dtype is not None else out

  def __repr__(self):
    return f"LazyCast({self._base!r}, dtype={self.dtype})"


class LazyStack(LazyArrayBase):
  """Same-shaped payloads stacked along a new LEADING axis, lazily.

  Built by the pressure-level-suffix decode (evaluation.py): an official
  0.25-degree suffixed store holds one zarr array per (variable, level),
  and stacking them eagerly would materialize the whole forecast in host
  RAM.  Basic indexing composes into part views; integer/array selection
  on the stack axis picks parts; advanced indexing inside a part defers
  to the part's own bounded gather (io_zarr.LazyArray).  The reference
  decodes suffixed stores lazily on dask the same way (reference
  evaluation.py:71-89).
  """

  __slots__ = ("_parts", "dtype")

  def __init__(self, parts):
    parts = list(parts)
    if not parts:
      raise ValueError("LazyStack needs at least one part")
    shapes = {tuple(p.shape) for p in parts}
    if len(shapes) != 1:
      raise ValueError(f"mismatched part shapes: {sorted(shapes)}")
    self._parts = parts
    self.dtype = np.result_type(*[p.dtype for p in parts])

  @property
  def shape(self):
    return (len(self._parts),) + tuple(self._parts[0].shape)

  @property
  def ndim(self):
    return len(self.shape)

  @property
  def size(self):
    return int(np.prod(self.shape))

  def __getitem__(self, key):
    if not isinstance(key, tuple):
      key = (key,)
    if any(k is Ellipsis for k in key):
      i = key.index(Ellipsis)
      fill = (slice(None),) * (self.ndim - (len(key) - 1))
      key = key[:i] + fill + key[i + 1:]
    key = key + (slice(None),) * (self.ndim - len(key))
    k0, rest = key[0], key[1:]

    def _advanced(k):
      return not isinstance(k, slice) and (
          getattr(np.asarray(k), "ndim", 0) >= 1
      )

    if _advanced(k0) and any(
        not isinstance(r, slice) for r in rest
    ):
      # numpy pairs/broadcasts multiple advanced indexers (and moves
      # their axes per the placement rule); per-part application would
      # silently compute an outer product instead — materialize and
      # defer to numpy for exact semantics
      return np.asarray(self)[key]
    # numpy's placement rule: advanced indexers (scalar ints count) that
    # are NON-CONTIGUOUS in the key move their broadcast block to axis 0
    # of the result.  Per-part application evaluates placement against
    # the PART's key (stack axis stripped), which can disagree with the
    # full key — same shape, transposed values.
    adv_pos = [i for i, r in enumerate(rest) if not isinstance(r, slice)]
    has_arr = any(_advanced(rest[i]) for i in adv_pos)
    if has_arr and isinstance(k0, (int, np.integer)) \
        and not isinstance(k0, (bool, np.bool_)):
      # An int k0 is itself advanced: the full key's advanced positions
      # are {0} ∪ {rest+1}, contiguous only when rest's block starts at
      # position 0.  Non-contiguous → replay full semantics on the ONE
      # selected part (a 0-d array indexer at axis 0 reproduces the int's
      # advanced placement), bounding the materialization to that part.
      if adv_pos[0] != 0 or adv_pos[-1] + 1 != len(adv_pos):
        part = np.asarray(self._parts[int(k0)])[np.newaxis]
        return part[(np.asarray(0),) + rest]
    elif has_arr and not isinstance(k0, (bool, np.bool_)):
      # Stack axis survives (k0 slice/array/mask): a non-contiguous
      # advanced block in rest goes to axis 0 of the full result, ahead
      # of the stack axis — materialize for exact semantics.
      if adv_pos[-1] - adv_pos[0] + 1 != len(adv_pos):
        return np.asarray(self)[key]
    rest_trivial = all(
        isinstance(r, slice) and r == slice(None) for r in rest
    )

    def sub(p):
      return p if rest_trivial else p[rest]

    if isinstance(k0, (bool, np.bool_)):
      # numpy scalar-bool semantics (newaxis + mask) — materialize
      return np.asarray(self)[key]
    if isinstance(k0, (int, np.integer)):
      return sub(self._parts[int(k0)])
    if isinstance(k0, slice):
      parts = self._parts[k0]
    else:
      arr = np.asarray(k0)
      if arr.ndim != 1:
        return np.asarray(self)[key]
      if arr.dtype == bool:
        # boolean mask selects parts; int() of True/False would pick
        # part 1/0 instead
        if arr.shape[0] != len(self._parts):
          raise IndexError(
              f"boolean index of length {arr.shape[0]} does not match "
              f"stack axis of length {len(self._parts)}"
          )
        arr = np.nonzero(arr)[0]
      parts = [self._parts[int(i)] for i in arr]
    parts = [sub(p) for p in parts]
    if parts and all(isinstance(p, LazyArrayBase) for p in parts):
      return LazyStack(parts)
    return np.stack([np.asarray(p) for p in parts], axis=0)

  def __array__(self, dtype=None, copy=None):
    out = np.stack([np.asarray(p) for p in self._parts], axis=0)
    return out.astype(dtype) if dtype is not None else out

  def __repr__(self):
    return f"LazyStack({len(self._parts)} x {self._parts[0].shape})"


def _is_jax(x) -> bool:
  import jax  # local import: keep numpy-only paths importable without jax

  return isinstance(x, jax.Array)


def _xp(*arrays):
  """Array namespace: jax.numpy if any operand is a jax.Array else numpy."""
  for a in arrays:
    if _is_jax(a):
      import jax.numpy as jnp

      return jnp
  return np


def _asarray(data):
  if _is_jax(data) or isinstance(data, LazyArrayBase):
    return data
  return np.asarray(data)


def _to_numpy(data) -> np.ndarray:
  return np.asarray(data)


class Variable:
  """A named-dimension array: ``dims`` + data payload + attrs."""

  __slots__ = ("dims", "data", "attrs")

  def __init__(self, dims, data, attrs=None):
    if isinstance(dims, str):
      dims = (dims,)
    data = _asarray(data)
    dims = tuple(dims)
    if len(dims) != data.ndim:
      raise ValueError(
          f"dims {dims} do not match data of rank {data.ndim} "
          f"(shape {data.shape})"
      )
    self.dims = dims
    self.data = data
    self.attrs = dict(attrs) if attrs else {}

  # -- basic properties ------------------------------------------------------
  @property
  def shape(self):
    return self.data.shape

  @property
  def dtype(self):
    return self.data.dtype

  @property
  def ndim(self):
    return self.data.ndim

  @property
  def size(self):
    return int(np.prod(self.data.shape)) if self.data.ndim else 1

  @property
  def sizes(self):
    return dict(zip(self.dims, self.data.shape))

  def copy(self, data=None):
    return Variable(self.dims, self.data if data is None else data, self.attrs)

  def __repr__(self):
    return f"Variable{self.dims} {self.dtype} {self.shape}"

  # -- structural ops --------------------------------------------------------
  def transpose(self, *dims):
    if not dims:
      dims = self.dims[::-1]
    missing = [d for d in dims if d not in self.dims]
    if missing:
      raise ValueError(f"transpose: dims {missing} not found in {self.dims}")
    order = [self.dims.index(d) for d in dims]
    extra = [i for i in range(self.ndim) if i not in order]
    if extra:
      raise ValueError("transpose must list all dims")
    data = self.data
    if isinstance(data, LazyArrayBase):
      data = np.asarray(data)
    xp = _xp(data)
    return Variable(dims, xp.transpose(data, order), self.attrs)

  def rename_dims(self, mapping: Mapping[str, str]):
    return Variable(
        tuple(mapping.get(d, d) for d in self.dims), self.data, self.attrs
    )

  def expand_dims_var(self, dim: str, size: int = 1, axis: int = 0):
    xp = _xp(self.data)
    # normalize negative axes up front: list.insert and the slice-based
    # broadcast below interpret them differently from xp.expand_dims,
    # which would silently mislabel every dim after the insertion point
    if axis < 0:
      axis = self.ndim + 1 + axis
    data = xp.expand_dims(self.data, axis)
    if size != 1:
      data = xp.broadcast_to(
          data, data.shape[:axis] + (size,) + data.shape[axis + 1 :]
      )
    dims = list(self.dims)
    dims.insert(axis, dim)
    return Variable(tuple(dims), data, self.attrs)

  def broadcast_to_dims(self, dims: Sequence[str], sizes: Mapping[str, int],
                        xp=None):
    """Transpose/reshape/broadcast this variable to the given dims order.

    Pass the *common* array namespace as ``xp`` when broadcasting against
    jax operands: a numpy ``broadcast_to`` view would otherwise be baked
    into traced programs as a full-size dense constant, while
    ``jnp.broadcast_to`` keeps a small constant + in-graph broadcast.
    """
    dims = tuple(dims)
    # transpose own dims into target order
    own = [d for d in dims if d in self.dims]
    v = self.transpose(*own) if tuple(own) != self.dims else self
    if isinstance(v.data, LazyArrayBase):
      v = Variable(v.dims, np.asarray(v.data), v.attrs)
    if xp is None:
      xp = _xp(v.data)
    shape = tuple(v.sizes.get(d, 1) for d in dims)
    data = v.data.reshape(shape)
    full = tuple(sizes[d] for d in dims)
    if shape != full:
      data = xp.broadcast_to(data, full)
    return Variable(dims, data, self.attrs)

  def isel_var(self, indexers: Mapping[str, Any]):
    """Positional selection; values may be int, slice, or 1-d int arrays."""
    key = []
    dims = []
    for d in self.dims:
      if d in indexers:
        idx = indexers[d]
        key.append(idx)
        if isinstance(idx, slice) or (
            hasattr(idx, "ndim") and getattr(idx, "ndim", 0) >= 1
        ):
          dims.append(d)
        # scalar int: dim dropped
      else:
        key.append(slice(None))
        dims.append(d)
    # Orthogonal indexing: numpy fancy indexing with multiple arrays is
    # pointwise, so apply array indexers one axis at a time.
    data = self.data
    xp = _xp(data)
    arr_axes = [
        i
        for i, k in enumerate(key)
        if not isinstance(k, slice) and getattr(_asarray(k), "ndim", 0) >= 1
    ]
    int_axes = [
        i
        for i, k in enumerate(key)
        if not isinstance(k, slice) and getattr(_asarray(k), "ndim", 1) == 0
    ]
    # The one-shot path is only safe when numpy's advanced-index
    # placement rule cannot trigger: a scalar int is itself an advanced
    # index, so int + array separated by a slice silently moves the
    # broadcast axis to the front (transposed, mislabeled data).
    if not arr_axes or (len(arr_axes) == 1 and not int_axes):
      data = data[tuple(key)]
    else:
      for ax_i, k in enumerate(key):
        if isinstance(k, slice) and k == slice(None):
          continue
        sub_key = [slice(None)] * data.ndim
        # account for dropped scalar axes before ax_i
        offset = sum(
            1
            for j in range(ax_i)
            if not isinstance(key[j], slice)
            and getattr(_asarray(key[j]), "ndim", 1) == 0
        )
        sub_key[ax_i - offset] = k
        data = data[tuple(sub_key)]
    return Variable(tuple(dims), data, self.attrs)

  def values_numpy(self):
    return _to_numpy(self.data)


def broadcast_dims_order(*dims_tuples: Sequence[str]) -> tuple[str, ...]:
  """Result dims = order of first appearance across operands (xarray rule)."""
  out = []
  for dims in dims_tuples:
    for d in dims:
      if d not in out:
        out.append(d)
  return tuple(out)


def _merge_sizes(*variables: Variable) -> dict[str, int]:
  sizes: dict[str, int] = {}
  for v in variables:
    for d, s in v.sizes.items():
      if d in sizes and sizes[d] != s:
        raise ValueError(
            f"conflicting sizes for dim {d!r}: {sizes[d]} vs {s}"
        )
      sizes[d] = s
  return sizes


def broadcast_variables(*variables: Variable):
  dims = broadcast_dims_order(*(v.dims for v in variables))
  sizes = _merge_sizes(*variables)
  xp = _xp(*(v.data for v in variables))
  return [v.broadcast_to_dims(dims, sizes, xp=xp) for v in variables]


# ---------------------------------------------------------------------------
# Label-based index resolution
# ---------------------------------------------------------------------------


def _parse_datetime_label(label, dtype):
  """Parse a scalar label against a datetime64/timedelta64 index dtype."""
  if np.issubdtype(dtype, np.datetime64):
    if isinstance(label, str):
      return label  # handled by partial-string logic
    return np.datetime64(label).astype(dtype)
  if np.issubdtype(dtype, np.timedelta64):
    if isinstance(label, str):
      import pandas as pd

      return np.timedelta64(pd.Timedelta(label)).astype(dtype)
    return np.timedelta64(label).astype(dtype)
  return label


def _partial_string_bounds(label: str):
  """[start, stop) datetime64[ns] bounds for a partial ISO string.

  pandas Period inference covers every resolution (year, month, day,
  hour, minute, second), matching xarray's partial-string indexing; the
  bounds are built from integer nanoseconds (``np.datetime64(Timestamp)``
  truncates to microseconds, which previously collapsed sub-second
  intervals to empty)."""
  import pandas as pd

  try:
    per = pd.Period(label)
    return (
        np.datetime64(per.start_time.value, "ns"),
        np.datetime64(per.end_time.value + 1, "ns"),
    )
  except Exception:
    start = pd.Timestamp(label)
    s = np.datetime64(start.value, "ns")
    return s, s + np.timedelta64(1, "ns")


class Index:
  """Label → position lookup over a 1-d coordinate array."""

  def __init__(self, values: np.ndarray):
    self.values = np.asarray(values)
    if self.values.ndim != 1:
      raise ValueError("index must be 1-d")
    self._lookup = None
    self._sorted_cache = None

  def _get_lookup(self):
    if self._lookup is None:
      self._lookup = {}
      for i, v in enumerate(self.values.tolist()):
        self._lookup.setdefault(v, i)
    return self._lookup

  def _sorted_view(self):
    """(sorted values, argsort order) for vectorized exact lookups."""
    if self._sorted_cache is None:
      vals = self.values
      if vals.dtype.kind in ("M", "m"):
        vals = vals.astype(np.int64)
      order = np.argsort(vals, kind="stable")
      self._sorted_cache = (vals[order], order, vals)
    return self._sorted_cache

  def _positions_vectorized(self, flat: np.ndarray):
    """Exact label positions via searchsorted; None if dtype unsuitable."""
    if self.values.dtype.kind not in ("M", "m", "i", "u"):
      return None
    sorted_vals, order, _ = self._sorted_view()
    q = flat.astype(np.int64, copy=False) if flat.dtype.kind in (
        "M", "m"
    ) else flat
    if q.dtype.kind not in ("i", "u"):
      return None
    pos = np.searchsorted(sorted_vals, q)
    pos_clipped = np.minimum(pos, len(sorted_vals) - 1)
    found = sorted_vals[pos_clipped] == q
    if not found.all():
      missing = np.asarray(flat)[~found]
      raise KeyError(f"label {missing.ravel()[0]!r} not found in index")
    return order[pos_clipped]

  def positions_for_labels(self, labels, method=None, tolerance=None):
    """Resolve an array of labels to integer positions."""
    if method not in (None, "nearest"):
      # silently falling back to exact-match would make pad/ffill/bfill
      # callers fail only intermittently
      raise NotImplementedError(
          f"selection method {method!r} is not supported "
          "(only None and 'nearest')"
      )
    labels = np.asarray(labels)
    scalar = labels.ndim == 0
    flat = np.atleast_1d(labels)
    if np.issubdtype(self.values.dtype, np.datetime64):
      flat = flat.astype(self.values.dtype)
    elif np.issubdtype(self.values.dtype, np.timedelta64):
      if flat.dtype.kind == "U":
        import pandas as pd

        flat = np.array(
            [np.timedelta64(pd.Timedelta(x)) for x in flat.tolist()]
        ).astype(self.values.dtype)
      else:
        flat = flat.astype(self.values.dtype)

    if method == "nearest":
      # searchsorted needs ascending values: use the cached sorted view
      # and map back (descending latitude is the native ERA5 ordering).
      # datetime/timedelta indexes compare in int64 ns — float64 loses
      # ~256 ns of precision at modern epochs.
      sorted_vals, order, _ = self._sorted_view()
      if self.values.dtype.kind in ("M", "m"):
        vals = sorted_vals.astype(np.int64)
        q = flat.astype(self.values.dtype).astype(np.int64)
        tol = (
            None if tolerance is None
            else np.timedelta64(tolerance).astype("timedelta64[ns]")
            .astype(np.int64)
        )
      else:
        vals = sorted_vals.astype(np.float64)
        q = flat.astype(np.float64)
        tol = None if tolerance is None else float(tolerance)
      pos = np.searchsorted(vals, q)
      pos = np.clip(pos, 1, len(vals) - 1)
      left = vals[pos - 1]
      right = vals[pos]
      # strict <: equidistant labels resolve to the LARGER value,
      # matching pandas get_indexer(method='nearest')
      pos = pos - (np.abs(q - left) < np.abs(right - q))
      if tol is not None:
        bad = np.abs(vals[pos] - q) > tol
        if np.any(bad):
          raise KeyError(
              f"labels {flat[bad]} not within tolerance {tolerance}"
          )
      result = order[pos]
    else:
      fast = self._positions_vectorized(flat.ravel())
      if fast is not None:
        result = fast.reshape(labels.shape)
        return int(result) if labels.ndim == 0 else result
      lookup = self._get_lookup()
      result = np.empty(flat.size, dtype=np.int64)
      for i, v in enumerate(flat.ravel().tolist()):
        if v in lookup:
          result[i] = lookup[v]
        else:
          # fall back to approximate float equality for coordinate values
          matches = np.nonzero(np.isclose(self.values, v))[0] if (
              np.issubdtype(self.values.dtype, np.number)
              and isinstance(v, (int, float))
          ) else []
          if len(matches):
            result[i] = matches[0]
          else:
            raise KeyError(f"label {v!r} not found in index")
      result = result.reshape(flat.shape)
    result = result.reshape(labels.shape)
    return int(result) if scalar else result

  def slice_positions(self, sl: slice) -> slice:
    """Label slice → positional slice (inclusive of both endpoints)."""
    vals = self.values
    start, stop, step = sl.start, sl.stop, sl.step
    increasing = len(vals) < 2 or bool(vals[0] <= vals[-1])

    def bound(label, side):
      if label is None:
        return None
      if np.issubdtype(vals.dtype, np.datetime64) and isinstance(label, str):
        lo, hi = _partial_string_bounds(label)
        if increasing:
          return (
              int(np.searchsorted(vals, lo, side="left"))
              if side == "start"
              else int(np.searchsorted(vals, hi, side="left"))
          )
        else:
          rev = vals[::-1]
          if side == "start":
            p = int(np.searchsorted(rev, hi, side="left"))
            return len(vals) - p
          else:
            p = int(np.searchsorted(rev, lo, side="left"))
            return len(vals) - p
      label = _parse_datetime_label(label, vals.dtype)
      if increasing:
        if side == "start":
          return int(np.searchsorted(vals, label, side="left"))
        return int(np.searchsorted(vals, label, side="right"))
      else:
        rev = vals[::-1]
        if side == "start":
          p = int(np.searchsorted(rev, label, side="right"))
          return len(vals) - p
        else:
          p = int(np.searchsorted(rev, label, side="left"))
          return len(vals) - p

    if step is not None and not isinstance(step, (int, np.integer)):
      raise TypeError("label-slice step must be an integer")
    return slice(bound(start, "start"), bound(stop, "stop"), step)


# ---------------------------------------------------------------------------
# DataArray
# ---------------------------------------------------------------------------


def _coords_for_dims(coords: Mapping[str, Variable], dims) -> dict:
  keep = {}
  dimset = set(dims)
  for name, cv in coords.items():
    if set(cv.dims) <= dimset:
      keep[name] = cv
  return keep


class _DTAccessor:
  """Datetime component accessor (``da.dt.dayofyear`` etc.)."""

  def __init__(self, obj: "DataArray"):
    self._obj = obj

  def _component(self, name) -> "DataArray":
    import pandas as pd

    values = _to_numpy(self._obj.variable.data)
    idx = pd.DatetimeIndex(values.ravel())
    comp = getattr(idx, name)
    out = np.asarray(comp).reshape(values.shape)
    return DataArray(
        Variable(self._obj.dims, out),
        coords=self._obj.coords,
        name=name,
    )

  @property
  def dayofyear(self):
    return self._component("dayofyear")

  @property
  def hour(self):
    return self._component("hour")

  @property
  def year(self):
    return self._component("year")

  @property
  def month(self):
    return self._component("month")

  @property
  def day(self):
    return self._component("day")

  def floor(self, freq: str) -> "DataArray":
    import pandas as pd

    values = _to_numpy(self._obj.variable.data)
    idx = pd.DatetimeIndex(values.ravel()).floor(freq)
    out = np.asarray(idx.values).reshape(values.shape)
    return DataArray(
        Variable(self._obj.dims, out), coords=self._obj.coords,
        name=self._obj.name,
    )


def _reduction(name, np_name, nan_name):
  def method(self, dim=None, skipna=False, ddof=None, keepdims=False, **kw):
    return self._reduce(np_name, nan_name, dim, skipna, ddof, keepdims)

  method.__name__ = name
  return method


class DataArray:
  """A Variable with coordinates and an optional name."""

  __slots__ = ("variable", "coords", "name")

  def __init__(self, data, dims=None, coords=None, name=None, attrs=None):
    if isinstance(data, DataArray):
      variable = data.variable
      coords = coords if coords is not None else data.coords
      name = name if name is not None else data.name
    elif isinstance(data, Variable):
      variable = data
    else:
      data = _asarray(data)
      if dims is None:
        raise ValueError("dims required when constructing from raw array")
      variable = Variable(dims, data, attrs)
    if attrs:
      variable = Variable(variable.dims, variable.data, attrs)
    self.variable = variable
    norm_coords = {}
    if coords:
      for cname, cval in coords.items():
        norm_coords[cname] = _as_coord_variable(cname, cval)
    self.coords = _coords_for_dims(norm_coords, variable.dims)
    self.name = name

  # -- properties ------------------------------------------------------------
  @property
  def dims(self):
    return self.variable.dims

  @property
  def data(self):
    return self.variable.data

  @property
  def values(self):
    return _to_numpy(self.variable.data)

  @property
  def shape(self):
    return self.variable.shape

  @property
  def dtype(self):
    return self.variable.dtype

  @property
  def ndim(self):
    return self.variable.ndim

  @property
  def size(self):
    return self.variable.size

  @property
  def sizes(self):
    return self.variable.sizes

  @property
  def attrs(self):
    return self.variable.attrs

  @property
  def dt(self):
    return _DTAccessor(self)

  def coords_dict(self):
    """Coordinate variables, Dataset-compatible accessor (regions and
    other dataset-polymorphic code paths call this on either type)."""
    return dict(self.coords)

  @property
  def nbytes(self):
    return self.values.nbytes

  def __repr__(self):
    return (
        f"<DataArray {self.name or ''} {self.dims} {self.dtype}"
        f" shape={self.shape}>"
    )

  def item(self):
    return self.values.item()

  def __len__(self):
    if not self.dims:
      raise TypeError("len() of 0-d array")
    return self.shape[0]

  def __iter__(self):
    for i in range(len(self)):
      yield self.isel({self.dims[0]: i})

  def __getattr__(self, name):
    # coordinate access, e.g. da.latitude
    coords = object.__getattribute__(self, "coords")
    if name in coords:
      return DataArray(coords[name], coords=coords, name=name)
    raise AttributeError(name)

  # -- conversion ------------------------------------------------------------
  def astype(self, dtype):
    data = self.data
    if isinstance(data, LazyArrayBase):
      # defer the cast: materializing a lazily opened store here would
      # read the whole variable into host memory
      return self.copy(data=LazyCast(data, dtype))
    return self.copy(data=data.astype(dtype))

  def to_jax(self):
    import jax.numpy as jnp

    if _is_jax(self.data):
      return self
    return self.copy(data=jnp.asarray(self.data))

  def to_numpy_da(self):
    return self.copy(data=_to_numpy(self.data))

  def copy(self, data=None):
    v = self.variable.copy(data=data)
    return DataArray(v, coords=self.coords, name=self.name)

  def rename(self, name):
    return DataArray(self.variable, coords=self.coords, name=name)

  def rename_dims(self, mapping):
    v = self.variable.rename_dims(mapping)
    coords = {
        mapping.get(k, k): c.rename_dims(mapping) for k, c in self.coords.items()
    }
    return DataArray(v, coords=coords, name=self.name)

  def assign_coords(self, coords=None, **kw):
    new = dict(self.coords)
    updates = dict(coords or {})
    updates.update(kw)
    for cname, cval in updates.items():
      cv = _as_coord_variable(cname, cval)
      if cv.ndim == 0 or set(cv.dims) <= set(self.dims):
        new[cname] = cv
      else:
        raise ValueError(
            f"coord {cname} has dims {cv.dims} not in array dims {self.dims}"
        )
    return DataArray(self.variable, coords=new, name=self.name)

  def drop_vars(self, names):
    if isinstance(names, str):
      names = [names]
    new = {k: v for k, v in self.coords.items() if k not in names}
    return DataArray(self.variable, coords=new, name=self.name)

  def expand_dims(self, dim=None, axis=0, **dim_kwargs):
    return _expand_dims_impl(self, dim, axis, dim_kwargs, is_dataset=False)

  def transpose(self, *dims):
    if not dims:
      dims = self.dims[::-1]
    return DataArray(
        self.variable.transpose(*dims), coords=self.coords, name=self.name
    )

  def squeeze(self, dim=None):
    dims = [dim] if isinstance(dim, str) else (
        dim if dim is not None else [d for d in self.dims if self.sizes[d] == 1]
    )
    out = self
    for d in dims:
      if out.sizes[d] != 1:
        raise ValueError(f"cannot squeeze dim {d} of size {out.sizes[d]}")
      out = out.isel({d: 0})
    return out

  # -- selection -------------------------------------------------------------
  def get_index(self, dim) -> Index:
    if dim not in self.coords:
      raise KeyError(f"no index coordinate for dim {dim!r}")
    return Index(_to_numpy(self.coords[dim].data))

  def isel(self, indexers=None, drop=False, **kw):
    indexers = dict(indexers or {})
    indexers.update(kw)
    return _isel_impl(self, indexers, drop)

  def sel(self, indexers=None, method=None, tolerance=None, drop=False, **kw):
    indexers = dict(indexers or {})
    indexers.update(kw)
    return _sel_impl(self, indexers, method, tolerance, drop)

  def thin(self, indexers=None, **kw):
    indexers = dict(indexers or {})
    indexers.update(kw)
    return self.isel({d: slice(None, None, s) for d, s in indexers.items()})

  def diff(self, dim, n=1):
    xp = _xp(self.data)
    ax = self.dims.index(dim)
    data = self.data
    for _ in range(n):
      data = xp.diff(data, axis=ax) if xp is np else data[
          tuple(
              slice(1, None) if i == ax else slice(None)
              for i in range(data.ndim)
          )
      ] - data[
          tuple(
              slice(None, -1) if i == ax else slice(None)
              for i in range(data.ndim)
          )
      ]
    out = DataArray(Variable(self.dims, data), coords={}, name=self.name)
    # coords: index coord of dim shrinks (label of the *right* element)
    new_coords = {}
    for cname, cv in self.coords.items():
      if dim in cv.dims:
        cidx = [slice(None)] * cv.ndim
        cidx[cv.dims.index(dim)] = slice(n, None)
        new_coords[cname] = Variable(cv.dims, cv.data[tuple(cidx)], cv.attrs)
      else:
        new_coords[cname] = cv
    return DataArray(out.variable, coords=new_coords, name=self.name)

  def roll(self, shifts=None, **kw):
    shifts = dict(shifts or {})
    shifts.update(kw)
    xp = _xp(self.data)
    data = self.data
    for d, s in shifts.items():
      data = xp.roll(data, s, axis=self.dims.index(d))
    return self.copy(data=data)

  def pad_wrap(self, pad_width: Mapping[str, int]):
    """Pad with wrap mode along named dims (coords of padded dims dropped)."""
    xp = _xp(self.data)
    widths = [(0, 0)] * self.ndim
    for d, w in pad_width.items():
      widths[self.dims.index(d)] = (w, w)
    data = xp.pad(self.data, widths, mode="wrap")
    coords = {
        k: v
        for k, v in self.coords.items()
        if not (set(v.dims) & set(pad_width))
    }
    return DataArray(Variable(self.dims, data), coords=coords, name=self.name)

  def differentiate(self, dim):
    """Central differences with respect to the dim's coordinate values.

    Matches numpy.gradient / xarray.differentiate (edge_order=1), including
    non-uniform spacing (e.g. pressure levels).
    """
    xp = _xp(self.data)
    ax = self.dims.index(dim)
    x = _to_numpy(self.coords[dim].data).astype(np.float64)
    f = self.data
    n = f.shape[ax]
    if n < 2:
      raise ValueError("differentiate needs at least 2 points")

    def sl(i):
      key = [slice(None)] * f.ndim
      key[ax] = i
      return tuple(key)

    shape = [1] * f.ndim
    h = np.diff(x)
    # interior: nonuniform central difference
    hd = h[1:]
    hs = h[:-1]
    def bcast(a):
      s = list(shape)
      s[ax] = len(a)
      return a.reshape(s)

    interior = (
        f[sl(slice(2, None))] * bcast(hs / (hd * (hd + hs)))
        + f[sl(slice(1, -1))] * bcast((hd - hs) / (hd * hs))
        - f[sl(slice(None, -2))] * bcast(hd / (hs * (hd + hs)))
    )
    first = (f[sl(slice(1, 2))] - f[sl(slice(0, 1))]) / h[0]
    last = (f[sl(slice(-1, None))] - f[sl(slice(-2, -1))]) / h[-1]
    data = xp.concatenate([first, interior, last], axis=ax)
    return self.copy(data=data)

  def integrate(self, dim):
    """Trapezoidal integration over the dim's coordinate values."""
    xp = _xp(self.data)
    ax = self.dims.index(dim)
    x = _to_numpy(self.coords[dim].data).astype(np.float64)
    f = self.data

    def sl(i):
      key = [slice(None)] * f.ndim
      key[ax] = i
      return tuple(key)

    dx = np.diff(x)
    shape = [1] * f.ndim
    shape[ax] = len(dx)
    dxb = dx.reshape(shape)
    data = (0.5 * (f[sl(slice(1, None))] + f[sl(slice(None, -1))]) * dxb).sum(
        axis=ax
    )
    dims = tuple(d for d in self.dims if d != dim)
    coords = {
        k: v for k, v in self.coords.items() if dim not in v.dims
    }
    return DataArray(Variable(dims, data), coords=coords, name=self.name)

  def rolling_sum(self, dim, window):
    """Trailing rolling-window sum; first window-1 entries are NaN.

    NaNs propagate within a window (matches xarray rolling().sum() with
    min_periods=window and no skipna).
    """
    xp = _xp(self.data)
    ax = self.dims.index(dim)
    f = self.data
    n = f.shape[ax]
    if window > n:
      return self.copy(data=xp.full_like(f, np.nan))
    acc = f
    for k in range(1, window):
      key = [slice(None)] * f.ndim
      key[ax] = slice(None, n - k)
      pad_key = [slice(None)] * f.ndim
      pad_key[ax] = slice(k, None)
      shifted_part = f[tuple(key)]
      pad_shape = list(f.shape)
      pad_shape[ax] = k
      nanpad = xp.full(pad_shape, np.nan, dtype=f.dtype)
      shifted = xp.concatenate([nanpad, shifted_part], axis=ax)
      acc = acc + shifted
    return self.copy(data=acc)

  def sortby(self, dim):
    idx = np.argsort(_to_numpy(self.coords[dim].data))
    return self.isel({dim: idx})

  def argsort_dim(self, dim) -> "DataArray":
    xp = _xp(self.data)
    ax = self.dims.index(dim)
    return self.copy(data=xp.argsort(self.data, axis=ax))

  # -- arithmetic ------------------------------------------------------------
  def _binop(self, other, op, reflexive=False):
    if isinstance(other, Dataset):
      return NotImplemented
    if isinstance(other, DataArray):
      a, b = align_arrays(self, other)
      va, vb = broadcast_variables(a.variable, b.variable)
      xp = _xp(va.data, vb.data)
      data = op(vb.data, va.data) if reflexive else op(va.data, vb.data)
      coords = _merge_coords_dicts(a.coords, b.coords)
      return DataArray(
          Variable(va.dims, data), coords=coords, name=self.name
      )
    # scalar or raw array
    other_arr = other
    self_data = (
        np.asarray(self.data)
        if isinstance(self.data, LazyArrayBase)
        else self.data
    )
    data = (
        op(other_arr, self_data) if reflexive else op(self_data, other_arr)
    )
    return DataArray(
        Variable(self.dims, data), coords=self.coords, name=self.name
    )

  __add__ = functools.partialmethod(_binop, op=lambda a, b: a + b)
  __radd__ = functools.partialmethod(_binop, op=lambda a, b: a + b, reflexive=True)
  __sub__ = functools.partialmethod(_binop, op=lambda a, b: a - b)
  __rsub__ = functools.partialmethod(_binop, op=lambda a, b: a - b, reflexive=True)
  __mul__ = functools.partialmethod(_binop, op=lambda a, b: a * b)
  __rmul__ = functools.partialmethod(_binop, op=lambda a, b: a * b, reflexive=True)
  __truediv__ = functools.partialmethod(_binop, op=lambda a, b: a / b)
  __rtruediv__ = functools.partialmethod(
      _binop, op=lambda a, b: a / b, reflexive=True
  )
  __pow__ = functools.partialmethod(_binop, op=lambda a, b: a**b)
  __mod__ = functools.partialmethod(_binop, op=lambda a, b: a % b)
  __floordiv__ = functools.partialmethod(_binop, op=lambda a, b: a // b)
  __gt__ = functools.partialmethod(_binop, op=lambda a, b: a > b)
  __ge__ = functools.partialmethod(_binop, op=lambda a, b: a >= b)
  __lt__ = functools.partialmethod(_binop, op=lambda a, b: a < b)
  __le__ = functools.partialmethod(_binop, op=lambda a, b: a <= b)
  __and__ = functools.partialmethod(_binop, op=lambda a, b: a & b)
  __or__ = functools.partialmethod(_binop, op=lambda a, b: a | b)

  def __eq__(self, other):  # elementwise, like xarray
    return self._binop(other, op=lambda a, b: a == b)

  def __ne__(self, other):
    return self._binop(other, op=lambda a, b: a != b)

  def __hash__(self):
    return id(self)

  def __neg__(self):
    return self.copy(data=-self.data)

  def __pos__(self):
    return self

  def __abs__(self):
    xp = _xp(self.data)
    return self.copy(data=xp.abs(self.data))

  def __array__(self, dtype=None):
    v = self.values
    return v.astype(dtype) if dtype is not None else v

  def isnull(self):
    xp = _xp(self.data)
    dt = np.dtype(self.dtype) if not isinstance(self.dtype, np.dtype) else self.dtype
    if np.issubdtype(dt, np.floating) or np.issubdtype(dt, np.complexfloating):
      return self.copy(data=xp.isnan(self.data))
    if np.issubdtype(dt, np.datetime64) or np.issubdtype(dt, np.timedelta64):
      return self.copy(data=np.isnat(self.values))
    return self.copy(data=np.zeros(self.shape, dtype=bool))

  def notnull(self):
    n = self.isnull()
    return n.copy(data=~n.data)

  def fillna(self, value):
    if isinstance(value, DataArray):
      a, b = broadcast_variables(self.variable, value.variable)
      xp = _xp(a.data, b.data)
      data = xp.where(xp.isnan(a.data), b.data, a.data)
      return DataArray(
          Variable(a.dims, data), coords=self.coords, name=self.name
      )
    xp = _xp(self.data)
    return self.copy(data=xp.where(xp.isnan(self.data), value, self.data))

  def where(self, cond, other=np.nan):
    """Keep values where cond; else ``other`` (xarray semantics)."""
    cond_da = cond if isinstance(cond, DataArray) else None
    other_da = other if isinstance(other, DataArray) else None
    operands = [self.variable]
    if cond_da is not None:
      operands.append(cond_da.variable)
    if other_da is not None:
      operands.append(other_da.variable)
    bvars = broadcast_variables(*operands)
    xp = _xp(*(v.data for v in bvars))
    self_b = bvars[0]
    i = 1
    if cond_da is not None:
      cond_data = bvars[i].data
      i += 1
    else:
      cond_data = cond
    if other_da is not None:
      other_data = bvars[i].data
    else:
      other_data = other
    data = xp.where(cond_data, self_b.data, other_data)
    coords = self.coords
    if cond_da is not None:
      coords = _merge_coords_dicts(coords, cond_da.coords)
    return DataArray(Variable(self_b.dims, data), coords=coords, name=self.name)

  def clip(self, min=None, max=None):
    xp = _xp(self.data)
    return self.copy(data=xp.clip(self.data, min, max))

  # -- reductions ------------------------------------------------------------
  def _reduce(self, np_name, nan_name, dim, skipna, ddof, keepdims=False):
    xp = _xp(self.data)
    if dim is None:
      axes = tuple(range(self.ndim))
      dims = []
    else:
      if isinstance(dim, str):
        dim = [dim]
      axes = tuple(self.dims.index(d) for d in dim)
      dims = [d for d in self.dims if d not in dim]
    is_float = np.issubdtype(self.dtype, np.floating)
    fname = nan_name if (skipna and is_float) else np_name
    fn = getattr(xp, fname)
    kwargs = {}
    if ddof is not None:
      kwargs["ddof"] = ddof
    if xp is np and fname.startswith("nan"):
      # all-NaN slices legitimately reduce to NaN under skipna; silence
      # numpy's "Mean of empty slice" warning like xarray does
      import warnings as _warnings

      with _warnings.catch_warnings():
        _warnings.filterwarnings(
            "ignore", r"All-NaN (slice|axis) encountered"
        )
        _warnings.filterwarnings(
            "ignore", r"Mean of empty slice", category=RuntimeWarning
        )
        _warnings.filterwarnings(
            "ignore", r"Degrees of freedom <= 0", category=RuntimeWarning
        )
        data = fn(self.data, axis=axes, **kwargs)
    else:
      data = fn(self.data, axis=axes, **kwargs)
    if keepdims:
      for ax in sorted(axes):
        data = xp.expand_dims(data, ax)
      dims = list(self.dims)
    coords = {
        k: v
        for k, v in self.coords.items()
        if set(v.dims) <= set(dims)
    }
    return DataArray(Variable(tuple(dims), data), coords=coords, name=self.name)

  def mean(self, dim=None, skipna=False, **kw):
    return self._reduce("mean", "nanmean", dim, skipna, None)

  def sum(self, dim=None, skipna=False, **kw):
    return self._reduce("sum", "nansum", dim, skipna, None)

  def std(self, dim=None, ddof=0, skipna=False, **kw):
    return self._reduce("std", "nanstd", dim, skipna, ddof)

  def var(self, dim=None, ddof=0, skipna=False, **kw):
    return self._reduce("var", "nanvar", dim, skipna, ddof)

  def min(self, dim=None, skipna=False, **kw):
    return self._reduce("min", "nanmin", dim, skipna, None)

  def max(self, dim=None, skipna=False, **kw):
    return self._reduce("max", "nanmax", dim, skipna, None)

  def cumsum(self, dim, skipna=False):
    xp = _xp(self.data)
    ax = self.dims.index(dim)
    fn = xp.nancumsum if skipna else xp.cumsum
    return self.copy(data=fn(self.data, axis=ax))

  def any(self, dim=None):
    return self._reduce("any", "any", dim, False, None)

  def all(self, dim=None):
    return self._reduce("all", "all", dim, False, None)

  def quantile(self, q, dim=None, skipna=False):
    xp = _xp(self.data)
    if dim is None:
      dim = list(self.dims)  # xarray semantics: reduce over all dims
    if isinstance(dim, str):
      dim = [dim]
    axes = tuple(self.dims.index(d) for d in dim)
    fn = xp.nanquantile if skipna else xp.quantile
    data = fn(self.data, np.asarray(q), axis=axes)
    qdim = () if np.ndim(q) == 0 else ("quantile",)
    dims = qdim + tuple(d for d in self.dims if d not in dim)
    coords = {
        k: v for k, v in self.coords.items() if set(v.dims) <= set(dims)
    }
    if np.ndim(q) != 0:
      coords["quantile"] = Variable(("quantile",), np.asarray(q))
    return DataArray(Variable(dims, data), coords=coords, name=self.name)

  def weighted(self, weights: "DataArray"):
    return Weighted(self, weights)

  def to_dataset(self, name=None):
    nm = name or self.name
    if nm is None:
      raise ValueError("cannot convert unnamed DataArray to Dataset")
    return Dataset({nm: self}, coords=self.coords)

  def equals(self, other: "DataArray") -> bool:
    if self.dims != other.dims or self.shape != other.shape:
      return False

    def _arrays_equal(a, b):
      if a.dtype.kind == "f":
        return bool(np.array_equal(a, b, equal_nan=True))
      return bool(np.array_equal(a, b))

    # coordinates participate (xarray semantics): identical values with
    # shifted time/lat labels must NOT compare equal
    if set(self.coords) != set(other.coords):
      return False
    for k in self.coords:
      ca, cb = self.coords[k], other.coords[k]
      if ca.dims != cb.dims or ca.shape != cb.shape:
        return False
      if not _arrays_equal(_to_numpy(ca.data), _to_numpy(cb.data)):
        return False
    return _arrays_equal(self.values, other.values)

  def compute(self, **kw):
    return self

  def load(self, **kw):
    return self

  def chunk(self, *a, **kw):
    return self


def _as_coord_variable(name, value) -> Variable:
  if isinstance(value, Variable):
    return value
  if isinstance(value, DataArray):
    return value.variable
  arr = np.asarray(value)
  if arr.ndim == 0:
    return Variable((), arr)
  if arr.ndim == 1:
    return Variable((name,), arr)
  raise ValueError(
      f"coordinate {name!r} from raw array must be 0-d or 1-d; pass a "
      "Variable/DataArray for multi-dimensional coords"
  )


def _merge_coords_dicts(*dicts) -> dict:
  out: dict[str, Variable] = {}
  for d in dicts:
    for k, v in d.items():
      if k not in out:
        out[k] = v
  return out


class Weighted:
  """Weighted reductions, mirroring xarray.core.weighted semantics."""

  def __init__(self, obj, weights: DataArray):
    self.obj = obj
    self.weights = weights

  def _apply_da(self, da: DataArray, dim, skipna, stat) -> DataArray:
    if isinstance(dim, str):
      dim = [dim]
    w = self.weights
    a, wb = broadcast_variables(da.variable, w.variable)
    xp = _xp(a.data, wb.data)
    axes = tuple(a.dims.index(d) for d in dim if d in a.dims)
    valid = ~xp.isnan(a.data) if np.issubdtype(
        np.asarray(a.data).dtype if not _is_jax(a.data) else a.data.dtype,
        np.floating,
    ) else xp.ones(a.data.shape, bool)
    wdata = xp.where(valid, wb.data, 0)
    sum_w = wdata.sum(axis=axes)
    x = xp.where(valid, a.data, 0) if skipna else a.data
    num = (x * wb.data if not skipna else x * wdata).sum(axis=axes)
    mean = num / sum_w
    if stat == "mean":
      data = mean
    elif stat in ("var", "std"):
      mean_full = mean
      for ax in sorted(axes):
        mean_full = xp.expand_dims(mean_full, ax)
      dev = (a.data - mean_full) ** 2
      dev = xp.where(valid, dev, 0) if skipna else dev
      devw = (dev * (wdata if skipna else wb.data)).sum(axis=axes)
      data = devw / sum_w
      if stat == "std":
        data = xp.sqrt(data)
    elif stat == "sum":
      data = num
    else:
      raise NotImplementedError(stat)
    dims = tuple(d for d in a.dims if d not in dim)
    coords = {
        k: v for k, v in da.coords.items() if set(v.dims) <= set(dims)
    }
    return DataArray(Variable(dims, data), coords=coords, name=da.name)

  def mean(self, dim, skipna=False):
    if isinstance(self.obj, Dataset):
      return self.obj.map(
          lambda da: self._apply_da(da, dim, skipna, "mean"), keep_attrs=True
      )
    return self._apply_da(self.obj, dim, skipna, "mean")

  def std(self, dim, skipna=False):
    if isinstance(self.obj, Dataset):
      return self.obj.map(
          lambda da: self._apply_da(da, dim, skipna, "std"), keep_attrs=True
      )
    return self._apply_da(self.obj, dim, skipna, "std")

  def var(self, dim, skipna=False):
    if isinstance(self.obj, Dataset):
      return self.obj.map(
          lambda da: self._apply_da(da, dim, skipna, "var"), keep_attrs=True
      )
    return self._apply_da(self.obj, dim, skipna, "var")

  def sum(self, dim, skipna=False):
    if isinstance(self.obj, Dataset):
      return self.obj.map(
          lambda da: self._apply_da(da, dim, skipna, "sum"), keep_attrs=True
      )
    return self._apply_da(self.obj, dim, skipna, "sum")


# ---------------------------------------------------------------------------
# Selection implementation shared by DataArray and Dataset
# ---------------------------------------------------------------------------


def _resolve_label_indexer(index: Index, label, method, tolerance):
  """Convert a label-indexer to a positional indexer.

  Returns (positional, indexer_dims, indexer_coord_values):
    * positional: int, slice, or integer ndarray
    * indexer_dims: dims of the (vectorized) indexer, or None
    * new coord values for the selected labels
  """
  if isinstance(label, slice):
    pos = index.slice_positions(label)
    return pos, None, None
  if isinstance(label, (DataArray, Variable)):
    var = label.variable if isinstance(label, DataArray) else label
    vals = _to_numpy(var.data)
    pos = index.positions_for_labels(vals, method, tolerance)
    return pos, var.dims, vals
  arr = np.asarray(label)
  if (
      arr.ndim == 0
      and arr.dtype.kind == "U"
      and np.issubdtype(index.values.dtype, np.datetime64)
  ):
    # partial string selection, e.g. ds.sel(time='2020')
    lo, hi = _partial_string_bounds(str(arr))
    mask = (index.values >= lo) & (index.values < hi)
    pos = np.nonzero(mask)[0]
    if pos.size == 0:
      raise KeyError(f"no labels match {label!r}")
    if len(str(arr)) >= 19:
      return int(pos[0]), None, None
    return pos, None, None
  pos = index.positions_for_labels(arr, method, tolerance)
  if arr.ndim == 0:
    return pos, None, None
  return pos, None, None


def _as_slice_if_contiguous(arr: np.ndarray):
  """Convert an evenly-strided index array to a cheap (view/lazy) slice."""
  if arr.ndim != 1 or arr.size == 0 or arr.dtype.kind not in ("i", "u"):
    return arr
  start = int(arr[0])
  if arr.size == 1:
    return slice(start, start + 1)
  step = int(arr[1]) - start
  if step == 0:
    return arr
  if np.array_equal(arr, np.arange(start, start + step * arr.size, step)):
    stop = start + step * (arr.size - 1) + (1 if step > 0 else -1)
    if step < 0 and stop < 0:
      stop = None
    return slice(start, stop, step)
  return arr


def _isel_impl(obj, indexers, drop=False):
  """Positional selection on DataArray or Dataset."""
  # Normalize: split into basic (slice/scalar/1d-on-own-dim) vs vectorized
  vec: dict[str, Variable] = {}
  basic: dict[str, Any] = {}
  for d, idx in indexers.items():
    if isinstance(idx, (DataArray, Variable)):
      var = idx.variable if isinstance(idx, DataArray) else idx
      if var.ndim == 1 and var.dims == (d,) and not _is_jax(var.data):
        basic[d] = _as_slice_if_contiguous(_to_numpy(var.data))
      else:
        vec[d] = var
    else:
      arr = idx if isinstance(idx, slice) else np.asarray(idx)
      if isinstance(arr, slice):
        basic[d] = arr
      elif arr.ndim <= 1:
        basic[d] = (
            _as_slice_if_contiguous(arr) if arr.ndim else int(arr)
        )
      else:
        vec[d] = Variable((f"__i{d}",), arr)  # unlikely path
  if isinstance(obj, Dataset):
    return _dataset_isel(obj, basic, vec, drop)
  return _dataarray_isel(obj, basic, vec, drop)


def _dataarray_isel(da: DataArray, basic, vec, drop):
  var = da.variable.isel_var(basic)
  new_coords = {}
  for cname, cv in da.coords.items():
    cbasic = {d: basic[d] for d in cv.dims if d in basic}
    sub = cv.isel_var(cbasic) if cbasic else cv
    if sub.ndim == 0 and drop:
      continue
    new_coords[cname] = sub
  if vec:
    var, new_coords = _vectorized_gather(var, new_coords, vec)
  return DataArray(var, coords=new_coords, name=da.name)


def _dataset_isel(ds: "Dataset", basic, vec, drop):
  new_vars = {}
  for name, v in ds._variables.items():
    vbasic = {d: basic[d] for d in v.dims if d in basic}
    nv = v.isel_var(vbasic) if vbasic else v
    if vec:
      vvec = {d: iv for d, iv in vec.items() if d in nv.dims}
      if vvec:
        nv, _ = _vectorized_gather(nv, {}, vvec)
    new_vars[name] = nv
  new_coords = {}
  for cname, cv in ds._coords.items():
    cbasic = {d: basic[d] for d in cv.dims if d in basic}
    sub = cv.isel_var(cbasic) if cbasic else cv
    if vec:
      cvec = {d: iv for d, iv in vec.items() if d in sub.dims}
      if cvec:
        sub, _ = _vectorized_gather(sub, {}, cvec)
    if sub.ndim == 0 and drop:
      continue
    new_coords[cname] = sub
  if vec:
    # add indexer dims' coords? (vectorized indexer coords handled in sel)
    pass
  return Dataset(new_vars, coords=new_coords, attrs=ds.attrs)


def _vectorized_gather(var: Variable, coords: dict, vec: Mapping[str, Variable]):
  """Vectorized (pointwise) indexing: replace dims by indexer dims.

  All indexer variables broadcast against each other; the indexed dims are
  removed and the broadcast indexer dims are inserted at the position of the
  first indexed dim.
  """
  if not set(vec) & set(var.dims):
    return var, coords

  if isinstance(var.data, LazyArrayBase):
    # Bound the storage read to the indexed positions BEFORE any
    # transpose: transposing a lazy payload materializes the whole
    # array (e.g. a 100s-of-GB climatology).  Reads are CLUSTERED, not
    # a single [min, max] window: a winter chunk's dayofyear values
    # {355..366, 1..10} would otherwise bound the entire year and
    # materialize the whole axis.  Negative indices are normalized
    # first (numpy semantics).
    def _clusters(uniq, max_gap=16):
      slices = []
      start = prev = int(uniq[0])
      for p in uniq[1:]:
        p = int(p)
        if p - prev > max_gap:
          slices.append(slice(start, prev + 1))
          start = p
        prev = p
      slices.append(slice(start, prev + 1))
      return slices

    data = var.data
    new_vec = {}
    for ax, d in enumerate(var.dims):
      if d not in vec:
        continue
      size_d = var.shape[ax] if hasattr(var, "shape") else var.sizes[d]
      iv = vec[d]
      arr = np.asarray(_to_numpy(iv.data)).astype(np.int64)
      arr = np.where(arr < 0, arr + size_d, arr)
      full_key = lambda sl: tuple(
          sl if i == ax else slice(None)
          for i in range(len(var.dims))
      )
      if arr.size == 0:
        data = np.asarray(data[full_key(slice(0, 0))])
        new_vec[d] = Variable(iv.dims, arr, iv.attrs)
        continue
      pos_map = np.full(size_d, -1, np.int64)
      pieces = []
      cum = 0
      for sl in _clusters(np.unique(arr)):
        n = sl.stop - sl.start
        pos_map[sl] = np.arange(cum, cum + n)
        cum += n
        pieces.append(np.asarray(data[full_key(sl)]))
      data = pieces[0] if len(pieces) == 1 else np.concatenate(
          pieces, axis=ax
      )
      new_vec[d] = Variable(iv.dims, pos_map[arr], iv.attrs)
    var = Variable(var.dims, np.asarray(data), var.attrs)
    vec = {**vec, **new_vec}

  ivars = broadcast_variables(*vec.values())
  idx_dims = ivars[0].dims
  idx_shape = ivars[0].shape
  ivals = dict(zip(vec.keys(), [iv.data for iv in ivars]))

  xp = _xp(var.data)
  # Build advanced-index key: for indexed dims use the broadcast integer
  # arrays (reshaped to broadcast together), non-indexed dims use slices.
  # numpy semantics: all advanced indexes broadcast; result dims placed at
  # position of first advanced index when contiguous.
  sel_axes = [i for i, d in enumerate(var.dims) if d in vec]
  first = min(sel_axes)
  # Move all indexed axes to the front-contiguous block starting at `first`
  order = (
      [d for d in var.dims[:first] if d not in vec]
      + [d for d in var.dims if d in vec]
      + [d for d in var.dims[first:] if d not in vec]
  )
  v = var.transpose(*order)
  key = []
  for d in v.dims:
    if d in vec:
      key.append(ivals[d] if not _is_jax(v.data) else ivals[d])
    else:
      key.append(slice(None))
  if _is_jax(v.data):
    import jax.numpy as jnp

    key = [jnp.asarray(k) if not isinstance(k, slice) else k for k in key]
  data = v.data[tuple(key)]
  non_indexed = [d for d in v.dims if d not in vec]
  new_dims = tuple(non_indexed[:first]) + idx_dims + tuple(non_indexed[first:])
  out_var = Variable(new_dims, data, var.attrs)

  new_coords = {}
  for cname, cv in coords.items():
    cvec = {d: Variable(idx_dims, ivals[d]) for d in cv.dims if d in vec}
    if cvec:
      gathered, _ = _vectorized_gather(cv, {}, {d: Variable(idx_dims, ivals[d]) for d in cvec})
      new_coords[cname] = gathered
    else:
      new_coords[cname] = cv
  return out_var, new_coords


def _sel_impl(obj, indexers, method, tolerance, drop):
  basic: dict[str, Any] = {}
  vec: dict[str, Variable] = {}
  vec_coords: dict[str, tuple] = {}
  for d, label in indexers.items():
    if isinstance(obj, Dataset):
      index = obj.get_index(d)
    else:
      index = obj.get_index(d)
    pos, idx_dims, idx_vals = _resolve_label_indexer(
        index, label, method, tolerance
    )
    if idx_dims is not None:
      vec[d] = Variable(idx_dims, pos)
      vec_coords[d] = (idx_dims, idx_vals, label)
    else:
      basic[d] = pos
  out = _isel_impl(obj, {**basic, **vec}, drop=drop)
  # vectorized sel: selected-dim coords become indexer-valued coords
  for d, (idx_dims, idx_vals, label) in vec_coords.items():
    if isinstance(label, DataArray):
      # adopt the indexer's own coords for its dims
      existing = (
          out.coords_dict() if isinstance(out, Dataset) else out.coords
      )
      for cn, cv in label.coords.items():
        if cn not in existing:
          out = out.assign_coords({cn: cv})
    out = out.assign_coords({d: Variable(idx_dims, idx_vals)})
  return out


def align_arrays(a: DataArray, b: DataArray):
  """Inner-join alignment on shared dims whose index coords differ."""
  shared = set(a.dims) & set(b.dims)
  sel_a = {}
  sel_b = {}
  for d in shared:
    ca = a.coords.get(d)
    cb = b.coords.get(d)
    if ca is None or cb is None or ca.ndim != 1 or cb.ndim != 1:
      if a.sizes[d] != b.sizes[d]:
        raise ValueError(
            f"cannot align dim {d!r} with sizes {a.sizes[d]} vs {b.sizes[d]} "
            "and no index coords"
        )
      continue
    av = _to_numpy(ca.data)
    bv = _to_numpy(cb.data)
    if av is bv or (av.shape == bv.shape and np.array_equal(av, bv)):
      continue
    # order-preserving inner join (pandas/xarray keep the FIRST
    # operand's label order; np.intersect1d would sort ascending and
    # silently flip descending latitude axes)
    mask_a = np.isin(av, bv)
    ia = np.nonzero(mask_a)[0]
    if ia.size == 0:
      raise ValueError(f"no overlapping labels on dim {d!r}")
    b_pos = {v: i for i, v in enumerate(bv.tolist())}
    ib = np.asarray([b_pos[v] for v in av[ia].tolist()])
    sel_a[d] = ia
    sel_b[d] = ib
  if sel_a:
    a = a.isel(sel_a)
  if sel_b:
    b = b.isel(sel_b)
  return a, b


# ---------------------------------------------------------------------------
# Dataset
# ---------------------------------------------------------------------------


class Dataset:
  """A dict of named Variables sharing dimensions, plus coordinates."""

  __slots__ = ("_variables", "_coords", "attrs")

  def __init__(self, data_vars=None, coords=None, attrs=None):
    self._variables: dict[str, Variable] = {}
    self._coords: dict[str, Variable] = {}
    self.attrs = dict(attrs) if attrs else {}
    if coords:
      for name, c in coords.items():
        self._coords[name] = _as_coord_variable(name, c)
    if data_vars:
      for name, v in data_vars.items():
        self[name] = v
    self._check_sizes()

  def _check_sizes(self):
    sizes: dict[str, int] = {}
    for v in list(self._variables.values()) + list(self._coords.values()):
      for d, s in v.sizes.items():
        if d in sizes and sizes[d] != s:
          raise ValueError(
              f"conflicting sizes for dim {d!r}: {sizes[d]} vs {s}"
          )
        sizes[d] = s

  # -- mapping interface -----------------------------------------------------
  def __contains__(self, name):
    return name in self._variables

  def __iter__(self):
    return iter(self._variables)

  def __len__(self):
    return len(self._variables)

  def keys(self):
    return self._variables.keys()

  def items(self):
    return ((k, self[k]) for k in self._variables)

  def values(self):
    return (self[k] for k in self._variables)

  @property
  def data_vars(self):
    return {k: self[k] for k in self._variables}

  def variables_dict(self):
    return self._variables

  def coords_dict(self):
    return self._coords

  @property
  def coords(self):
    return _CoordAccessor(self)

  @property
  def dims(self):
    return self.sizes

  @property
  def sizes(self):
    sizes: dict[str, int] = {}
    for v in self._variables.values():
      sizes.update(v.sizes)
    for v in self._coords.values():
      for d, s in v.sizes.items():
        sizes.setdefault(d, s)
    return sizes

  @property
  def nbytes(self):
    return sum(_to_numpy(v.data).nbytes for v in self._variables.values())

  def __getitem__(self, key):
    if isinstance(key, (list, tuple, set)):
      keys = list(key)
      missing = [k for k in keys if k not in self._variables]
      if missing:
        raise KeyError(missing)
      return Dataset(
          {k: self._variables[k] for k in keys},
          coords=self._coords,
          attrs=self.attrs,
      )
    if key in self._variables:
      return DataArray(self._variables[key], coords=self._coords, name=key)
    if key in self._coords:
      return DataArray(self._coords[key], coords=self._coords, name=key)
    raise KeyError(key)

  def __setitem__(self, name, value):
    if isinstance(value, tuple) and len(value) in (2, 3):
      dims, data = value[0], value[1]
      attrs = value[2] if len(value) == 3 else None
      self._variables[name] = Variable(dims, data, attrs)
    elif isinstance(value, DataArray):
      self._variables[name] = value.variable
      for cname, cv in value.coords.items():
        if cname not in self._coords:
          self._coords[cname] = cv
    elif isinstance(value, Variable):
      self._variables[name] = value
    else:
      arr = _asarray(value)
      if arr.ndim == 0:
        self._variables[name] = Variable((), arr)
      else:
        raise ValueError(
            "assigning a raw array to a Dataset requires (dims, data)"
        )
    self._check_sizes()

  def __getattr__(self, name):
    variables = object.__getattribute__(self, "_variables")
    coords = object.__getattribute__(self, "_coords")
    if name in variables or name in coords:
      return self[name]
    raise AttributeError(name)

  def __repr__(self):
    lines = [f"<xds.Dataset dims={self.sizes}>"]
    lines.append("Coordinates:")
    for k, v in self._coords.items():
      lines.append(f"  {k} {v.dims} {v.dtype}")
    lines.append("Data variables:")
    for k, v in self._variables.items():
      lines.append(f"  {k} {v.dims} {v.dtype}")
    return "\n".join(lines)

  # -- structure -------------------------------------------------------------
  def copy(self, data=None, deep=False):
    if data is None:
      return Dataset(dict(self._variables), dict(self._coords), self.attrs)
    new_vars = {}
    for k, v in self._variables.items():
      if k in data:
        arr = data[k]
        arr = arr.data if isinstance(arr, (DataArray, Variable)) else arr
        new_vars[k] = Variable(v.dims, arr, v.attrs)
      else:
        new_vars[k] = v
    return Dataset(new_vars, dict(self._coords), self.attrs)

  def drop_vars(self, names, errors="raise"):
    if isinstance(names, str):
      names = [names]
    new_vars = {k: v for k, v in self._variables.items() if k not in names}
    new_coords = {k: v for k, v in self._coords.items() if k not in names}
    if errors == "raise":
      missing = [
          n for n in names if n not in self._variables and n not in self._coords
      ]
      if missing:
        raise KeyError(missing)
    return Dataset(new_vars, new_coords, self.attrs)

  drop = drop_vars

  def rename(self, mapping=None, **kw):
    mapping = dict(mapping or {})
    mapping.update(kw)
    new_vars = {}
    for k, v in self._variables.items():
      new_vars[mapping.get(k, k)] = v.rename_dims(mapping)
    new_coords = {}
    for k, v in self._coords.items():
      new_coords[mapping.get(k, k)] = v.rename_dims(mapping)
    return Dataset(new_vars, new_coords, self.attrs)

  def swap_dims(self, mapping):
    """Swap a dim to an existing coord, e.g. {'time': 'dayofyear'}."""
    out = self
    for old, new in mapping.items():
      if new not in out._coords:
        raise KeyError(new)
      new_coord = out._coords[new]
      renamed_vars = {
          k: v.rename_dims({old: new}) for k, v in out._variables.items()
      }
      renamed_coords = {}
      for k, v in out._coords.items():
        # the old index coord survives as a NON-DIM coord re-labeled
        # onto the new dim (xarray semantics) — keeping it on the old
        # dim name would leave a phantom dim that selection never touches
        renamed_coords[k] = v.rename_dims({old: new})
      out = Dataset(renamed_vars, renamed_coords, out.attrs)
    return out

  def assign_coords(self, coords=None, **kw):
    updates = dict(coords or {})
    updates.update(kw)
    new_coords = dict(self._coords)
    for name, c in updates.items():
      new_coords[name] = _as_coord_variable(name, c)
    return Dataset(dict(self._variables), new_coords, self.attrs)

  def assign_attrs(self, *args, **kw):
    attrs = dict(self.attrs)
    if args:
      attrs.update(args[0])
    attrs.update(kw)
    return Dataset(dict(self._variables), dict(self._coords), attrs)

  def expand_dims(self, dim=None, axis=0, **dim_kwargs):
    return _expand_dims_impl(self, dim, axis, dim_kwargs, is_dataset=True)

  def transpose(self, *dims):
    new_vars = {}
    for k, v in self._variables.items():
      own = [d for d in dims if d in v.dims]
      rest = [d for d in v.dims if d not in dims]
      new_vars[k] = v.transpose(*(own + rest)) if own else v
    return Dataset(new_vars, dict(self._coords), self.attrs)

  def squeeze(self, dim=None):
    sizes = self.sizes
    dims = (
        [dim]
        if isinstance(dim, str)
        else (dim if dim is not None else [d for d in sizes if sizes[d] == 1])
    )
    out = self
    for d in dims:
      if sizes[d] != 1:
        raise ValueError(f"cannot squeeze dim {d} of size {sizes[d]}")
      out = out.isel({d: 0})
    return out

  # -- selection -------------------------------------------------------------
  def get_index(self, dim) -> Index:
    if dim in self._coords:
      return Index(_to_numpy(self._coords[dim].data))
    raise KeyError(f"no index coordinate for dim {dim!r}")

  def isel(self, indexers=None, drop=False, **kw):
    indexers = dict(indexers or {})
    indexers.update(kw)
    return _isel_impl(self, indexers, drop)

  def sel(self, indexers=None, method=None, tolerance=None, drop=False, **kw):
    indexers = dict(indexers or {})
    indexers.update(kw)
    return _sel_impl(self, indexers, method, tolerance, drop)

  def drop_sel(self, indexers=None, **kw):
    indexers = dict(indexers or {})
    indexers.update(kw)
    out = self
    for d, labels in indexers.items():
      idx = out.get_index(d)
      pos = idx.positions_for_labels(np.asarray(labels))
      keep = np.setdiff1d(np.arange(len(idx.values)), np.atleast_1d(pos))
      out = out.isel({d: keep})
    return out

  def drop_isel(self, indexers=None, **kw):
    indexers = dict(indexers or {})
    indexers.update(kw)
    out = self
    for d, pos in indexers.items():
      n = out.sizes[d]
      keep = np.setdiff1d(np.arange(n), np.atleast_1d(np.asarray(pos)) % n)
      out = out.isel({d: keep})
    return out

  def thin(self, indexers=None, **kw):
    indexers = dict(indexers or {})
    indexers.update(kw)
    return self.isel({d: slice(None, None, s) for d, s in indexers.items()})

  # -- math ------------------------------------------------------------------
  def _binop_ds(self, other, op, reflexive=False):
    if isinstance(other, Dataset):
      names = [k for k in self._variables if k in other._variables]
      out = {}
      for k in names:
        out[k] = self[k]._binop(other[k], op, reflexive)
      ds = Dataset({}, coords={}, attrs=self.attrs)
      for k, da in out.items():
        ds[k] = da
      # coords reachable through the result variables are inherited
      # above; also keep non-conflicting dataset-level coords from both
      # operands (xarray's binary-op merge retains them)
      for src in (self, other):
        for cn, cv in src._coords.items():
          if cn in ds._coords:
            continue
          if all(
              ds.sizes.get(d, cv.sizes[d]) == cv.sizes[d]
              for d in cv.dims
          ):
            ds._coords[cn] = cv
      return ds
    if isinstance(other, DataArray):
      return self.map(lambda da: da._binop(other, op, reflexive))
    return self.map(lambda da: da._binop(other, op, reflexive))

  __add__ = functools.partialmethod(_binop_ds, op=lambda a, b: a + b)
  __radd__ = functools.partialmethod(
      _binop_ds, op=lambda a, b: a + b, reflexive=True
  )
  __sub__ = functools.partialmethod(_binop_ds, op=lambda a, b: a - b)
  __rsub__ = functools.partialmethod(
      _binop_ds, op=lambda a, b: a - b, reflexive=True
  )
  __mul__ = functools.partialmethod(_binop_ds, op=lambda a, b: a * b)
  __rmul__ = functools.partialmethod(
      _binop_ds, op=lambda a, b: a * b, reflexive=True
  )
  __truediv__ = functools.partialmethod(_binop_ds, op=lambda a, b: a / b)
  __rtruediv__ = functools.partialmethod(
      _binop_ds, op=lambda a, b: a / b, reflexive=True
  )
  __pow__ = functools.partialmethod(_binop_ds, op=lambda a, b: a**b)
  __gt__ = functools.partialmethod(_binop_ds, op=lambda a, b: a > b)
  __ge__ = functools.partialmethod(_binop_ds, op=lambda a, b: a >= b)
  __lt__ = functools.partialmethod(_binop_ds, op=lambda a, b: a < b)
  __le__ = functools.partialmethod(_binop_ds, op=lambda a, b: a <= b)

  def __neg__(self):
    return self.map(lambda da: -da)

  def __abs__(self):
    return self.map(abs)

  def map(self, func, keep_attrs=False, **kwargs):
    results = {k: func(self[k], **kwargs) for k in self._variables}
    # coords survive if their dims still exist in some result variable
    result_dims = set()
    for res in results.values():
      result_dims.update(res.dims)
    coords = {
        k: v
        for k, v in self._coords.items()
        if set(v.dims) <= result_dims
    }
    out = Dataset({}, coords=coords, attrs=self.attrs)
    for k, res in results.items():
      out[k] = res
    return out

  def isnull(self):
    return self.map(lambda da: da.isnull())

  def notnull(self):
    return self.map(lambda da: da.notnull())

  def fillna(self, value):
    if isinstance(value, Dataset):
      out = Dataset({}, coords=dict(self._coords), attrs=self.attrs)
      for k in self._variables:
        out[k] = self[k].fillna(value[k]) if k in value else self[k]
      return out
    return self.map(lambda da: da.fillna(value))

  def where(self, cond, other=np.nan):
    if isinstance(cond, Dataset):
      out = Dataset({}, coords=dict(self._coords), attrs=self.attrs)
      for k in self._variables:
        c = cond[k] if k in cond else cond
        out[k] = self[k].where(c, other)
      return out
    return self.map(lambda da: da.where(cond, other))

  def astype(self, dtype):
    return self.map(lambda da: da.astype(dtype))

  def clip(self, min=None, max=None):
    return self.map(lambda da: da.clip(min, max))

  # -- reductions ------------------------------------------------------------
  def _reduce_ds(self, method_name, dim, skipna=False, ddof=None):
    def f(da):
      dims = (
          [dim]
          if isinstance(dim, str)
          else (list(dim) if dim is not None else None)
      )
      if dims is not None:
        dims = [d for d in dims if d in da.dims]
        if not dims:
          return da
      kwargs = dict(skipna=skipna)
      if ddof is not None:
        kwargs["ddof"] = ddof
      return getattr(da, method_name)(dims, **kwargs)

    return self.map(f)

  def mean(self, dim=None, skipna=False, **kw):
    return self._reduce_ds("mean", dim, skipna)

  def sum(self, dim=None, skipna=False, **kw):
    return self._reduce_ds("sum", dim, skipna)

  def std(self, dim=None, ddof=0, skipna=False, **kw):
    return self._reduce_ds("std", dim, skipna, ddof)

  def var(self, dim=None, ddof=0, skipna=False, **kw):
    return self._reduce_ds("var", dim, skipna, ddof)

  def min(self, dim=None, skipna=False, **kw):
    return self._reduce_ds("min", dim, skipna)

  def max(self, dim=None, skipna=False, **kw):
    return self._reduce_ds("max", dim, skipna)

  def cumsum(self, dim, skipna=False):
    return self.map(
        lambda da: da.cumsum(dim, skipna) if dim in da.dims else da
    )

  def quantile(self, q, dim=None, skipna=False):
    if dim is None:
      return self.map(lambda da: da.quantile(q, None, skipna))
    dims = set([dim] if isinstance(dim, str) else dim)

    def per_var(da):
      # reduce each variable over the dims it actually has (xarray
      # semantics — mixed surface/pressure-level stores reduce t2m over
      # time while z reduces over time AND level)
      present = [d for d in da.dims if d in dims]
      return da.quantile(q, present, skipna) if present else da

    return self.map(per_var)

  def weighted(self, weights):
    return Weighted(self, weights)

  def equals(self, other: "Dataset") -> bool:
    if set(self._variables) != set(other._variables):
      return False
    for k in self._variables:
      if not self[k].equals(other[k]):
        return False
    return True

  # -- conversion/compat -----------------------------------------------------
  def compute(self, **kw):
    return self

  def load(self, **kw):
    return self

  def chunk(self, *a, **kw):
    return self

  def to_jax(self):
    import jax.numpy as jnp

    return self.copy(
        data={
            k: jnp.asarray(v.data)
            for k, v in self._variables.items()
            if not _is_jax(v.data)
        }
    )

  def to_numpy_ds(self):
    return self.copy(
        data={k: _to_numpy(v.data) for k, v in self._variables.items()}
    )


class _CoordAccessor(Mapping):
  def __init__(self, ds: Dataset):
    self._ds = ds

  def __getitem__(self, key):
    return DataArray(
        self._ds._coords[key], coords=self._ds._coords, name=key
    )

  def __iter__(self):
    return iter(self._ds._coords)

  def __len__(self):
    return len(self._ds._coords)

  def __contains__(self, key):
    return key in self._ds._coords


def _expand_dims_impl(obj, dim, axis, dim_kwargs, is_dataset):
  """expand_dims accepting name, {name: size|values}, or kwargs."""
  specs: list[tuple[str, Any]] = []
  if isinstance(dim, str):
    specs.append((dim, 1))
  elif isinstance(dim, Mapping):
    specs.extend(dim.items())
  elif isinstance(dim, Iterable) and dim is not None:
    specs.extend((d, 1) for d in dim)
  specs.extend(dim_kwargs.items())

  out = obj
  for name, val in specs:
    if isinstance(val, DataArray):
      coord_vals = val.values
      size = coord_vals.shape[0] if coord_vals.ndim else 1
      # also adopt the DataArray's own coords (used by metric/region dims)
      extra_coords = val.coords
    elif isinstance(val, (int, np.integer)):
      coord_vals = None
      size = int(val)
      extra_coords = {}
    else:
      coord_vals = np.asarray(val)
      size = coord_vals.shape[0] if coord_vals.ndim else 1
      extra_coords = {}
    if is_dataset:
      new_vars = {
          k: v.expand_dims_var(name, size, axis)
          for k, v in out._variables.items()
      }
      new_coords = dict(out._coords)
      if coord_vals is not None:
        new_coords[name] = Variable((name,), np.atleast_1d(coord_vals))
      for cn, cv in extra_coords.items():
        if cn not in new_coords:
          new_coords[cn] = cv if isinstance(cv, Variable) else cv.variable
      out = Dataset(new_vars, new_coords, out.attrs)
    else:
      v = out.variable.expand_dims_var(name, size, axis)
      new_coords = dict(out.coords)
      if coord_vals is not None:
        new_coords[name] = Variable((name,), np.atleast_1d(coord_vals))
      for cn, cv in extra_coords.items():
        if cn not in new_coords:
          new_coords[cn] = cv if isinstance(cv, Variable) else cv.variable
      out = DataArray(v, coords=new_coords, name=out.name)
  return out


# ---------------------------------------------------------------------------
# concat / merge / zeros_like etc.
# ---------------------------------------------------------------------------


def concat(objs, dim):
  """Concatenate DataArrays or Datasets along a (new or existing) dim."""
  objs = list(objs)
  if not objs:
    raise ValueError("need at least one object to concatenate")

  coord_vals = None
  coord_name = None
  if isinstance(dim, DataArray):
    coord_name = dim.dims[0] if dim.ndim else (dim.name or "concat_dim")
    coord_vals = dim.values
    extra_coords = {dim.name: dim.variable} if (
        dim.name and dim.name != coord_name
    ) else {}
    dim = coord_name
  elif isinstance(dim, str):
    extra_coords = {}
  else:
    raise TypeError(f"unsupported concat dim: {dim!r}")

  if isinstance(objs[0], DataArray):
    das = []
    for o in objs:
      if dim not in o.dims:
        o = o.expand_dims(dim)
      das.append(o)
    xp = _xp(*(o.data for o in das))
    ax = das[0].dims.index(dim)
    # align other dims by transposing to match first
    base_dims = das[0].dims
    datas = [
        (o if o.dims == base_dims else o.transpose(*base_dims)).data
        for o in das
    ]
    data = xp.concatenate(datas, axis=ax)
    coords = {}
    for o in das:
      for k, v in o.coords.items():
        if dim not in v.dims and k not in coords:
          coords[k] = v
    # concat index coords along dim
    if all(dim in o.coords for o in das):
      cat = np.concatenate(
          [np.atleast_1d(_to_numpy(o.coords[dim].data)) for o in das]
      )
      coords[dim] = Variable((dim,), cat)
    elif coord_vals is not None:
      coords[dim] = Variable((dim,), np.atleast_1d(coord_vals))
    for k, v in extra_coords.items():
      coords.setdefault(k, v)
    return DataArray(
        Variable(base_dims, data), coords=coords, name=das[0].name
    )

  # Dataset concat
  dss = []
  for o in objs:
    if dim not in o.sizes:
      o = o.expand_dims(dim)
    dss.append(o)
  names = list(dss[0].keys())
  out = Dataset({}, coords={}, attrs=dss[0].attrs)
  for name in names:
    out[name] = concat([ds[name] for ds in dss], dim)
  for k, v in dss[0].coords_dict().items():
    if dim not in v.dims and k not in out.coords_dict():
      out = out.assign_coords({k: v})
  if coord_vals is not None and dim not in out.coords_dict():
    out = out.assign_coords({dim: np.atleast_1d(coord_vals)})
  elif all(dim in ds.coords_dict() for ds in dss) and dim not in out.coords_dict():
    cat = np.concatenate(
        [np.atleast_1d(_to_numpy(ds.coords_dict()[dim].data)) for ds in dss]
    )
    out = out.assign_coords({dim: cat})
  return out


def merge(objs) -> Dataset:
  """Merge datasets/named-DataArrays; conflicting variables must be equal."""
  out = Dataset({}, coords={})
  for o in objs:
    if isinstance(o, DataArray):
      o = o.to_dataset()
    for k, v in o.variables_dict().items():
      if k in out.variables_dict():
        prev = out.variables_dict()[k]
        same = prev.dims == v.dims and prev.shape == v.shape
        if same:
          pa, pb = _to_numpy(prev.data), _to_numpy(v.data)
          same = (
              np.array_equal(pa, pb, equal_nan=True)
              if pa.dtype.kind == "f"
              else np.array_equal(pa, pb)
          )
        if not same:
          raise ValueError(
              f"merge: conflicting values for variable {k!r} "
              "(xarray raises MergeError here; silently keeping the "
              "first would lose data)"
          )
        continue
      out[k] = v
    for k, c in o.coords_dict().items():
      if k not in out.coords_dict():
        out = out.assign_coords({k: c})
  return out


def combine_by_coords(objs: Sequence[Dataset]) -> Dataset:
  """Combine datasets along dims whose coords tile a larger index.

  Handles the common case of recombining per-chunk results: group datasets
  by which single dim differs, concat along it (sorted by coord), then merge.
  """
  objs = [o for o in objs if o is not None]
  if len(objs) == 1:
    return objs[0]
  first = objs[0]
  # find dims whose coords differ across objs
  varying = set()
  for o in objs[1:]:
    for d in set(first.sizes) | set(o.sizes):
      c0 = first.coords_dict().get(d)
      c1 = o.coords_dict().get(d)
      if c0 is None or c1 is None:
        continue
      a, b = _to_numpy(c0.data), _to_numpy(c1.data)
      if a.shape != b.shape or not np.array_equal(a, b):
        varying.add(d)
  if not varying:
    return merge(objs)
  if len(varying) > 1:
    raise NotImplementedError(
        f"combine_by_coords along multiple dims {varying} not supported"
    )
  (d,) = varying
  out = concat(objs, d)
  idx = np.argsort(_to_numpy(out.coords_dict()[d].data), kind="stable")
  return out.isel({d: idx})


def zeros_like(obj):
  if isinstance(obj, Dataset):
    return obj.map(zeros_like)
  xp = _xp(obj.data)
  return obj.copy(data=xp.zeros_like(obj.data))


def ones_like(obj):
  if isinstance(obj, Dataset):
    return obj.map(ones_like)
  xp = _xp(obj.data)
  return obj.copy(data=xp.ones_like(obj.data))


def full_like(obj, fill):
  if isinstance(obj, Dataset):
    return obj.map(lambda da: full_like(da, fill))
  xp = _xp(obj.data)
  return obj.copy(data=xp.full_like(obj.data, fill))


def where(cond, x, y):
  """Module-level where with xarray-style broadcasting."""
  if isinstance(cond, Dataset):
    out = Dataset({}, coords=dict(cond.coords_dict()))
    for k in cond.keys():
      xx = x[k] if isinstance(x, Dataset) else x
      yy = y[k] if isinstance(y, Dataset) else y
      out[k] = where(cond[k], xx, yy)
    return out
  if isinstance(x, Dataset):
    out = Dataset({}, coords=dict(x.coords_dict()))
    for k in x.keys():
      yy = y[k] if isinstance(y, Dataset) else y
      out[k] = where(cond, x[k], yy)
    return out
  operands = [o for o in (cond, x, y) if isinstance(o, DataArray)]
  if not operands:
    return np.where(cond, x, y)
  vars_ = []
  for o in (cond, x, y):
    if isinstance(o, DataArray):
      vars_.append(o.variable)
  b = broadcast_variables(*vars_)
  dims = b[0].dims
  sizes = b[0].sizes
  vals = []
  i = 0
  for o in (cond, x, y):
    if isinstance(o, DataArray):
      vals.append(b[i].data)
      i += 1
    else:
      vals.append(o)
  xp = _xp(*(v for v in vals if hasattr(v, "dtype")))
  data = xp.where(*vals)
  coords = _merge_coords_dicts(*(o.coords for o in operands))
  coords = _coords_for_dims(coords, dims)
  name = next((o.name for o in operands if o.name), None)
  return DataArray(Variable(dims, data), coords=coords, name=name)


def dot(a: DataArray, b: DataArray, dims) -> DataArray:
  """Tensor contraction over named dims (like xr.dot)."""
  if isinstance(dims, str):
    dims = [dims]
  av, bv = a.variable, b.variable
  allv = broadcast_variables(av, bv)
  xp = _xp(*(v.data for v in allv))
  prod = allv[0].data * allv[1].data
  axes = tuple(allv[0].dims.index(d) for d in dims)
  data = prod.sum(axis=axes)
  out_dims = tuple(d for d in allv[0].dims if d not in dims)
  coords = _merge_coords_dicts(a.coords, b.coords)
  coords = _coords_for_dims(coords, out_dims)
  return DataArray(Variable(out_dims, data), coords=coords, name=a.name)


def apply_ufunc(func, *args, **kwargs):
  """Minimal apply_ufunc: ELEMENTWISE application preserving metadata.

  Unsupported xarray options (input_core_dims etc.) raise instead of
  being silently discarded; payloads pass through as-is (jax arrays and
  tracers stay on device — ``.values`` would break under jit).
  """
  if kwargs:
    raise NotImplementedError(
        f"apply_ufunc options {sorted(kwargs)} are not supported by this "
        "minimal elementwise implementation"
    )
  das = [a for a in args if isinstance(a, DataArray)]
  if not das:
    return func(*args)
  template = das[0]
  vals = [
      (np.asarray(a.data) if isinstance(a.data, LazyArrayBase) else a.data)
      if isinstance(a, DataArray)
      else a
      for a in args
  ]
  out = func(*vals)
  return template.copy(data=out)
