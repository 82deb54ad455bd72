"""Zarr v2 IO for xds Datasets, backed by tensorstore.

Follows the xarray on-disk convention: one zarr array per variable, with an
``_ARRAY_DIMENSIONS`` attribute naming its dims, a group-level ``.zgroup``,
and optional consolidated metadata in ``.zmetadata``.  Datetime64 and
timedelta64 values are CF-encoded as int64 with a ``units`` attribute, so
stores written here can express the same time coordinates the reference
pipelines use (see /root/reference/weatherbench2/schema.py for the time
conventions).

String-valued coordinates (e.g. ``metric`` / ``region`` axes of result
datasets) are stored as JSON in the group attrs under ``_xds_string_arrays``
since raw zarr has no portable unicode dtype.
"""
from __future__ import annotations

import concurrent.futures
import json
import os
from typing import Any, Mapping, Optional

import numpy as np

from . import core

_TS = None


def _ts():
  global _TS
  if _TS is None:
    import tensorstore

    _TS = tensorstore
  return _TS


# --- storage scheme dispatch -------------------------------------------------
#
# Paths may be local filesystem paths or URLs; the scheme picks the
# tensorstore kvstore driver, so every CLI accepts e.g. a gs:// store
# directly (the reference opens gs://weatherbench2/datasets/... via
# xarray/gcsfs, /root/reference/weatherbench2/evaluation.py:92-136).

_SCHEME_DRIVERS = {"gs": "gcs", "s3": "s3"}


def _split_scheme(path: str):
  for scheme in ("gs", "s3", "http", "https", "memory"):
    prefix = scheme + "://"
    if path.startswith(prefix):
      return scheme, path[len(prefix):]
  return None, path


def is_remote(path: str) -> bool:
  return _split_scheme(path)[0] is not None


def _join_key(*parts: str) -> str:
  return "/".join(p.strip("/") for p in parts if p)


def _cache_context() -> dict:
  """Optional tensorstore read-cache context (WB2_TS_CACHE_BYTES env)."""
  limit = os.environ.get("WB2_TS_CACHE_BYTES")
  if not limit:
    return {}
  return {
      "context": {"cache_pool": {"total_bytes_limit": int(limit)}},
      "recheck_cached_data": "open",
  }


def kvstore_spec(path: str, child: str = ""):
  """tensorstore kvstore spec for a local path or gs/s3/http(s) URL."""
  scheme, rest = _split_scheme(path)
  if scheme is None:
    spec: dict = {"driver": "file",
                  "path": os.path.join(path, child) if child else path}
    if os.environ.get("WB2_FILE_IO_SYNC", "0") != "1":
      # skip the per-chunk fsync (measured ~1.5-2x local write throughput
      # on sustained streams): chunk writes are idempotent in the
      # template+region-write model, so a torn write after a crash is
      # re-written on resume; set WB2_FILE_IO_SYNC=1 for strict
      # durability
      spec["file_io_sync"] = False
    return spec
  if scheme in _SCHEME_DRIVERS:
    bucket, _, prefix = rest.partition("/")
    return {
        "driver": _SCHEME_DRIVERS[scheme],
        "bucket": bucket,
        "path": _join_key(prefix, child),
    }
  if scheme in ("http", "https"):
    return {
        "driver": "http",
        "base_url": f"{scheme}://{rest.rstrip('/')}/",
        "path": child.strip("/"),
    }
  if scheme == "memory":
    return {"driver": "memory", "path": _join_key(rest, child)}
  raise ValueError(f"unsupported storage scheme in {path!r}")


_COMPRESSORS = {
    # bit-shuffled zstd: best ratio for smooth geophysical fields
    "zstd3": {"id": "blosc", "cname": "zstd", "clevel": 3, "shuffle": 2},
    # fast path: high-entropy data (ensembles, synthetic noise) gains
    # nothing from zstd but pays its single-core (de)compression cost
    "lz4": {"id": "blosc", "cname": "lz4", "clevel": 1, "shuffle": 0},
    "none": None,
}


def default_compressor(compressor="default"):
  """Resolve a compressor name to zarr metadata (reference encodes via
  xarray/zarr `encoding=`; here WB2_ZARR_COMPRESSOR or an explicit
  writer argument picks from _COMPRESSORS)."""
  if compressor == "default":
    compressor = os.environ.get("WB2_ZARR_COMPRESSOR", "zstd3")
  if isinstance(compressor, str):
    try:
      return _COMPRESSORS[compressor]
    except KeyError:
      raise ValueError(
          f"unknown compressor {compressor!r}; "
          f"options: {sorted(_COMPRESSORS)}"
      ) from None
  return compressor


def _array_spec(path: str, name: str, metadata=None, create=False,
                delete_existing=False) -> dict:
  spec: dict[str, Any] = {
      "driver": "zarr",
      "kvstore": kvstore_spec(path, name),
  }
  if metadata is not None:
    spec["metadata"] = metadata
  if create:
    spec["create"] = True
  if delete_existing:
    spec["delete_existing"] = True
  spec.update(_cache_context())
  return spec


def _kv_open(path: str):
  return _ts().KvStore.open(kvstore_spec(path)).result()


def _read_json_key(path: str, key: str):
  """Read+parse a JSON key from the store; None when absent."""
  if not is_remote(path):
    full = os.path.join(path, key)
    if not os.path.exists(full):
      return None
    with open(full) as f:
      return json.load(f)
  result = _kv_open(path).read(key).result()
  if result.state != "value":
    return None
  return json.loads(bytes(result.value).decode())


def _write_json_key(path: str, key: str, obj) -> None:
  data = json.dumps(obj, indent=2, default=str)
  if not is_remote(path):
    full = os.path.join(path, key)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    with open(full, "w") as f:
      f.write(data)
    return
  _kv_open(path).write(key, data.encode()).result()


def _list_array_names(path: str) -> list[str]:
  """Child array names (directories containing .zarray)."""
  names = set()
  if not is_remote(path):
    for name in os.listdir(path):
      if os.path.exists(os.path.join(path, name, ".zarray")):
        names.add(name)
  else:
    for key in _kv_open(path).list().result():
      key = key.decode() if isinstance(key, bytes) else str(key)
      parts = key.split("/")
      if len(parts) == 2 and parts[1] == ".zarray":
        names.add(parts[0])
  return sorted(names)


_CF_UNITS = {
    "nanoseconds": "ns",
    "microseconds": "us",
    "milliseconds": "ms",
    "seconds": "s",
    "minutes": "m",
    "hours": "h",
    "days": "D",
}


def _encode_cf(values: np.ndarray):
  """Encode datetime64/timedelta64 as (int64, attrs)."""
  if np.issubdtype(values.dtype, np.datetime64):
    data = values.astype("datetime64[ns]").astype(np.int64)
    return data, {"units": "nanoseconds since 1970-01-01", "calendar": "proleptic_gregorian"}
  if np.issubdtype(values.dtype, np.timedelta64):
    data = values.astype("timedelta64[ns]").astype(np.int64)
    return data, {"units": "nanoseconds"}
  return values, {}


def _offsets_to_ns(data: np.ndarray, step_ns: int) -> np.ndarray:
  """CF offsets × unit-in-ns → int64 ns, handling float encodings.

  xarray writes float offsets when they are fractional (e.g. 0.5 days);
  a bare astype(int64) would truncate those and turn NaN fills into
  garbage. Floats are scaled first and rounded; NaN maps to INT64_MIN
  (numpy's NaT).
  """
  if np.issubdtype(data.dtype, np.floating):
    ns = np.asarray(data, np.float64) * step_ns
    out = np.where(
        np.isnan(ns), np.iinfo(np.int64).min, np.round(ns)
    ).astype(np.int64)
    return out
  return data.astype(np.int64) * step_ns


def _decode_cf(data: np.ndarray, attrs: Mapping[str, Any]) -> np.ndarray:
  units = attrs.get("units")
  if not isinstance(units, str):
    return data
  parts = units.split(" since ")
  if len(parts) == 2:
    unit_name, epoch = parts
    np_unit = _CF_UNITS.get(unit_name.strip())
    if np_unit is None:
      return data
    epoch64 = np.datetime64(epoch.strip().replace(" ", "T"), "ns")
    step_ns = int(np.timedelta64(1, np_unit) // np.timedelta64(1, "ns"))
    ns = _offsets_to_ns(data, step_ns)
    vals = (epoch64.astype(np.int64) + ns).astype("datetime64[ns]")
    if np.issubdtype(data.dtype, np.floating):
      vals = np.where(
          ns == np.iinfo(np.int64).min, np.datetime64("NaT", "ns"), vals
      ).astype("datetime64[ns]")
    return vals
  unit_name = units.strip()
  np_unit = _CF_UNITS.get(unit_name)
  if np_unit is not None and (
      np.issubdtype(data.dtype, np.integer)
      or np.issubdtype(data.dtype, np.floating)
  ):
    step_ns = int(np.timedelta64(1, np_unit) // np.timedelta64(1, "ns"))
    return _offsets_to_ns(data, step_ns).astype("timedelta64[ns]")
  return data


def merged_cf_attrs(var_attrs, cf_attrs) -> dict:
  """Merge a variable's attrs with fresh CF-encoding attrs.

  The encoding attrs must win AND evict any stale source units/calendar
  (e.g. "hours since 1900-01-01" surviving from an xarray-written store):
  the payload being written is int64 nanoseconds, and a stale units attr
  would make every reader mis-decode the axis.
  """
  out = dict(var_attrs)
  if cf_attrs:
    out.pop("units", None)
    out.pop("calendar", None)
    out.update(cf_attrs)
  return out


def _dtype_str(dtype: np.dtype) -> str:
  return dtype.newbyteorder("<").str


def _var_chunks(shape, chunks_spec, dims):
  if chunks_spec is None:
    return [max(1, s) for s in shape]
  out = []
  for d, s in zip(dims, shape):
    c = chunks_spec.get(d, -1)
    out.append(s if c in (-1, None) else min(c, max(s, 1)))
  return [max(1, c) for c in out]


def to_zarr(
    ds: core.Dataset,
    path: str,
    chunks: Optional[Mapping[str, int]] = None,
    mode: str = "w",
    compressor="default",
) -> None:
  """Write a Dataset to a zarr v2 store (local path or gs/s3/http URL)."""
  if not is_remote(path):
    os.makedirs(path, exist_ok=True)
  _write_json_key(path, ".zgroup", {"zarr_format": 2})

  group_attrs: dict[str, Any] = dict(ds.attrs)
  string_arrays: dict[str, Any] = {}
  consolidated: dict[str, Any] = {".zgroup": {"zarr_format": 2}}

  all_vars: dict[str, tuple[core.Variable, bool]] = {}
  for name, v in ds.coords_dict().items():
    all_vars[name] = (v, True)
  for name, v in ds.variables_dict().items():
    all_vars[name] = (v, False)

  # CF/xarray convention: data vars carry a "coordinates" attr naming the
  # non-dimension coords, so coord-ness round-trips without name heuristics
  nondim_coords = [
      name for name, (v, is_coord) in all_vars.items()
      if is_coord and name not in v.dims
  ]

  futures = []
  ts = _ts()
  for name, (var, is_coord) in all_vars.items():
    values = core._to_numpy(var.data)
    if values.dtype.kind in ("U", "O", "S"):
      string_arrays[name] = {
          "dims": list(var.dims),
          "values": np.asarray(values, dtype=str).tolist(),
          "coord": is_coord,
      }
      continue
    data, cf_attrs = _encode_cf(values)
    zattrs = {"_ARRAY_DIMENSIONS": list(var.dims),
              **merged_cf_attrs(var.attrs, cf_attrs)}
    if not is_coord and nondim_coords:
      zattrs.setdefault("coordinates", " ".join(nondim_coords))
    chunk_shape = _var_chunks(data.shape, chunks, var.dims)
    metadata = {
        "shape": list(data.shape),
        "chunks": chunk_shape if data.ndim else [],
        "dtype": _dtype_str(data.dtype),
        "compressor": default_compressor(compressor),
        "fill_value": None,
        "filters": None,
        "order": "C",
        "zarr_format": 2,
    }
    arr = ts.open(
        _array_spec(path, name, metadata, create=True,
                    delete_existing=mode == "w")
    ).result()
    futures.append(arr.write(data))
    _write_json_key(path, f"{name}/.zattrs", zattrs)
    zarray = _read_json_key(path, f"{name}/.zarray")
    consolidated[f"{name}/.zarray"] = metadata if zarray is None else zarray
    consolidated[f"{name}/.zattrs"] = zattrs

  for f in futures:
    f.result()

  if string_arrays:
    group_attrs["_xds_string_arrays"] = string_arrays
  _write_json_key(path, ".zattrs", group_attrs)
  consolidated[".zattrs"] = group_attrs
  _write_json_key(
      path, ".zmetadata",
      {"metadata": consolidated, "zarr_consolidated_format": 1},
  )


def create_zarr_template(
    ds: core.Dataset,
    path: str,
    chunks: Optional[Mapping[str, int]] = None,
    compressor="default",
) -> None:
  """Create a zarr store with metadata and coords but unwritten data vars.

  Float variables get fill_value NaN so unwritten regions read as NaN —
  this is the idempotent template+chunk-write output model (regions can be
  written concurrently/partially and re-runs overwrite cleanly).
  """
  if not is_remote(path):
    os.makedirs(path, exist_ok=True)
  _write_json_key(path, ".zgroup", {"zarr_format": 2})
  group_attrs: dict[str, Any] = dict(ds.attrs)
  string_arrays: dict[str, Any] = {}
  consolidated: dict[str, Any] = {".zgroup": {"zarr_format": 2}}
  ts = _ts()
  nondim_coords = [
      name for name, v in ds.coords_dict().items() if name not in v.dims
  ]

  # coords are small: write them eagerly
  for name, var in ds.coords_dict().items():
    values = core._to_numpy(var.data)
    if values.dtype.kind in ("U", "O", "S"):
      string_arrays[name] = {
          "dims": list(var.dims),
          "values": np.asarray(values, dtype=str).tolist(),
          "coord": True,
      }
      continue
    data, cf_attrs = _encode_cf(values)
    metadata = {
        "shape": list(data.shape),
        "chunks": [max(1, s) for s in data.shape] if data.ndim else [],
        "dtype": _dtype_str(data.dtype),
        "compressor": default_compressor(compressor),
        "fill_value": None,
        "filters": None,
        "order": "C",
        "zarr_format": 2,
    }
    ts.open(
        _array_spec(path, name, metadata, create=True, delete_existing=True)
    ).result().write(data).result()
    zattrs = {"_ARRAY_DIMENSIONS": list(var.dims),
              **merged_cf_attrs(var.attrs, cf_attrs)}
    _write_json_key(path, f"{name}/.zattrs", zattrs)
    consolidated[f"{name}/.zarray"] = metadata
    consolidated[f"{name}/.zattrs"] = zattrs

  # data vars: create metadata only; NaN fill for floats; datetime and
  # timedelta payloads store CF-encoded as int64 (RegionWriter encodes
  # at write time; open_zarr decodes via the units attr)
  for name, var in ds.variables_dict().items():
    values_dtype = np.dtype(var.dtype)
    cf_attrs = {}
    if np.issubdtype(values_dtype, np.datetime64):
      values_dtype = np.dtype(np.int64)
      cf_attrs = {"units": "nanoseconds since 1970-01-01",
                  "calendar": "proleptic_gregorian"}
    elif np.issubdtype(values_dtype, np.timedelta64):
      values_dtype = np.dtype(np.int64)
      cf_attrs = {"units": "nanoseconds"}
    shape = [var.sizes[d] for d in var.dims]
    chunk_shape = _var_chunks(shape, chunks, var.dims)
    is_float = values_dtype.kind == "f"
    metadata = {
        "shape": shape,
        "chunks": chunk_shape,
        "dtype": _dtype_str(values_dtype),
        "compressor": default_compressor(compressor),
        "fill_value": "NaN" if is_float else None,
        "filters": None,
        "order": "C",
        "zarr_format": 2,
    }
    ts.open(
        _array_spec(path, name, metadata, create=True, delete_existing=True)
    ).result()
    zattrs = {"_ARRAY_DIMENSIONS": list(var.dims),
              **merged_cf_attrs(var.attrs, cf_attrs)}
    if nondim_coords:
      zattrs.setdefault("coordinates", " ".join(nondim_coords))
    _write_json_key(path, f"{name}/.zattrs", zattrs)
    consolidated[f"{name}/.zarray"] = metadata
    consolidated[f"{name}/.zattrs"] = zattrs

  if string_arrays:
    group_attrs["_xds_string_arrays"] = string_arrays
  _write_json_key(path, ".zattrs", group_attrs)
  consolidated[".zattrs"] = group_attrs
  _write_json_key(
      path, ".zmetadata",
      {"metadata": consolidated, "zarr_consolidated_format": 1},
  )


def open_zarr_array(path: str, name: str):
  """Open one zarr array as a reusable tensorstore handle."""
  return _ts().open(_array_spec(path, name)).result()


def write_zarr_region(path: str, name: str, key, data: np.ndarray):
  """Write a region of a zarr array; returns a tensorstore future.

  One-shot convenience — callers writing many regions should hold an
  ``open_zarr_array`` handle (RegionWriter does)."""
  arr = open_zarr_array(path, name)
  return arr[key].write(np.ascontiguousarray(data))


class LazyArray(core.LazyArrayBase):
  """Lazily-sliced zarr array payload (tensorstore view under the hood).

  Basic indexing (ints / slices, including negative steps) composes into a
  new lazy view; advanced (integer-array) indexing reads the bounding
  slice from storage and applies the gather in numpy — so streaming
  engines touch only the bytes of the chunk they ask for.  numpy consumes
  LazyArray transparently via ``__array__`` (with CF decode applied).
  """

  __slots__ = ("_ts", "_attrs", "dtype")

  def __init__(self, ts_view, attrs, dtype):
    self._ts = ts_view
    self._attrs = attrs
    self.dtype = dtype

  @property
  def shape(self):
    return tuple(self._ts.shape)

  @property
  def ndim(self):
    return len(self._ts.shape)

  @property
  def size(self):
    return int(np.prod(self.shape)) if self.shape else 1

  def __array__(self, dtype=None):
    out = _decode_cf(np.asarray(self._ts.read().result()), self._attrs)
    return out.astype(dtype) if dtype is not None else out

  def __getitem__(self, key):
    if not isinstance(key, tuple):
      key = (key,)
    basic = all(
        isinstance(k, (int, np.integer, slice)) for k in key
    )
    if basic:
      # numpy semantics: clamp slices to the axis extent (tensorstore
      # views would otherwise keep out-of-range bounds)
      clamped = []
      for axis, k in enumerate(key):
        if isinstance(k, slice):
          start, stop, step = k.indices(self.shape[axis])
          if step < 0 and stop < 0:
            stop = None
          clamped.append(slice(start, stop, step))
        else:
          clamped.append(k)
      key = tuple(clamped)
      try:
        ts = _ts()
        view = self._ts[key]
        # tensorstore views keep absolute origins; rebase to zero so
        # subsequent relative indexing composes like numpy
        view = view[ts.d[:].translate_to[0]]
        return LazyArray(view, self._attrs, self.dtype)
      except Exception:
        return np.asarray(self)[key]
    # advanced indexing: read the bounding basic slice, gather in numpy
    bound = []
    inner = []
    for k in key:
      if isinstance(k, (int, np.integer, slice)):
        bound.append(k)
        inner.append(slice(None) if isinstance(k, slice) else None)
      else:
        arr = np.asarray(k)
        if arr.size == 0:
          bound.append(slice(0, 0))
          inner.append(slice(None))
          continue
        lo, hi = int(arr.min()), int(arr.max())
        bound.append(slice(lo, hi + 1))
        inner.append(arr - lo)
    data = np.asarray(
        LazyArray(self._ts[tuple(bound)], self._attrs, self.dtype)
    )
    final_key = tuple(k for k in inner if k is not None)
    return data[final_key]

  def __repr__(self):
    return f"LazyArray(shape={self.shape}, dtype={self.dtype})"


class ZarrArray:
  """Lazy handle to a single zarr array (tensorstore-backed)."""

  def __init__(self, path: str, name: str, zattrs: Mapping[str, Any]):
    self.path = path
    self.name = name
    self.attrs = dict(zattrs)
    self.dims = tuple(self.attrs.pop("_ARRAY_DIMENSIONS"))
    self._store = None

  @property
  def store(self):
    if self._store is None:
      self._store = _ts().open(_array_spec(self.path, self.name)).result()
    return self._store

  @property
  def shape(self):
    return tuple(self.store.shape)

  def read(self, key=None) -> np.ndarray:
    st = self.store
    raw = (st[key] if key is not None else st).read().result()
    return _decode_cf(np.asarray(raw), self.attrs)


def open_zarr(path: str, lazy: bool = False) -> core.Dataset:
  """Open a zarr group as a Dataset.

  With ``lazy=True``, data variables are LazyArray views: coordinates load
  eagerly (they drive host-side selection), while variable bytes are read
  from storage only when a concrete (chunk-sized) slice is materialized —
  the streaming engine's zarr→HBM path.
  """
  entries: dict[str, dict] = {}
  group_attrs: dict[str, Any] = {}
  consolidated = _read_json_key(path, ".zmetadata")
  if consolidated is not None:
    meta = consolidated["metadata"]
    group_attrs = dict(meta.get(".zattrs", {}))
    for key, val in meta.items():
      if key.endswith("/.zattrs"):
        entries[key[: -len("/.zattrs")]] = val
  else:
    group_attrs = _read_json_key(path, ".zattrs") or {}
    for name in _list_array_names(path):
      entries[name] = _read_json_key(path, f"{name}/.zattrs") or {}

  string_arrays = group_attrs.pop("_xds_string_arrays", {})

  arrays: dict[str, ZarrArray] = {}
  dim_names = set()
  declared_coords: set[str] = set()
  has_declarations = False
  # xarray also records dataset-level non-dim coords (those referenced by
  # no data variable) in the GROUP "coordinates" attribute
  group_coords_attr = group_attrs.pop("coordinates", None)
  if group_coords_attr:
    has_declarations = True
    declared_coords.update(str(group_coords_attr).split())
  for name, zattrs in entries.items():
    if "_ARRAY_DIMENSIONS" not in zattrs:
      continue
    dim_names.update(zattrs["_ARRAY_DIMENSIONS"])
    coords_attr = zattrs.get("coordinates")
    if coords_attr is not None:
      has_declarations = True
      declared_coords.update(str(coords_attr).split())
    arrays[name] = ZarrArray(path, name, zattrs)

  def _is_coord_name(name: str) -> bool:
    # xarray rule: dimension coordinates by name; other coords only when
    # declared via the CF "coordinates" attribute.  The name whitelist is
    # a fallback for legacy stores that carry no declarations at all.
    if name in dim_names:
      return True
    if has_declarations:
      return name in declared_coords
    return name in _KNOWN_COORD_NAMES

  def _attrs_after_decode(attrs, decoded_dtype):
    """CF units/calendar consumed by decode are encoding, not attrs —
    leaving them visible would let a later write mislabel the payload."""
    if np.issubdtype(decoded_dtype, np.datetime64) or np.issubdtype(
        decoded_dtype, np.timedelta64
    ):
      return {
          k: v for k, v in attrs.items() if k not in ("units", "calendar")
      }
    return dict(attrs)

  variables: dict[str, core.Variable] = {}
  if lazy:
    # coords eager (they drive selection); data variables lazy
    for name, arr in arrays.items():
      if _is_coord_name(name):
        data = arr.read()
        variables[name] = core.Variable(
            arr.dims, data, _attrs_after_decode(arr.attrs, data.dtype)
        )
      else:
        store = arr.store
        probe = _decode_cf(
            np.zeros((), dtype=np.dtype(store.dtype.numpy_dtype)),
            arr.attrs,
        )
        variables[name] = core.Variable(
            arr.dims,
            LazyArray(store, arr.attrs, probe.dtype),
            _attrs_after_decode(arr.attrs, probe.dtype),
        )
  else:
    # read eagerly (in parallel threads; tensorstore releases the GIL)
    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as pool:
      results = {
          name: pool.submit(arr.read) for name, arr in arrays.items()
      }
      for name, fut in results.items():
        arr = arrays[name]
        data = fut.result()
        variables[name] = core.Variable(
            arr.dims, data, _attrs_after_decode(arr.attrs, data.dtype)
        )

  string_coords: set[str] = set()
  for name, spec in string_arrays.items():
    variables[name] = core.Variable(
        tuple(spec["dims"]), np.asarray(spec["values"], dtype=object)
    )
    dim_names.update(spec["dims"])
    is_coord = spec.get("coord")
    if is_coord or (is_coord is None and name in _KNOWN_COORD_NAMES):
      string_coords.add(name)

  coords = {}
  data_vars = {}
  for name, v in variables.items():
    if name in string_arrays:
      is_coord = name in string_coords or name in dim_names
    else:
      is_coord = _is_coord_name(name)
    v.attrs.pop("coordinates", None)  # encoding detail, not a real attr
    if is_coord:
      coords[name] = v
    else:
      data_vars[name] = v
  return core.Dataset(data_vars, coords=coords, attrs=group_attrs)


# Fallback classification for legacy stores with no "coordinates"
# declarations anywhere (see _is_coord_name in open_zarr).
_KNOWN_COORD_NAMES = {
    "latitude", "longitude", "level", "time", "init_time", "valid_time",
    "lead_time", "prediction_timedelta", "dayofyear", "hour", "quantile",
    "realization", "number", "metric", "region", "bins", "zonal_wavenumber",
    "wavelength", "frequency",
}
