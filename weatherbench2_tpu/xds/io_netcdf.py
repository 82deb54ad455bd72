"""NetCDF IO for xds Datasets: netCDF4/HDF5 (h5py) + NetCDF3 (scipy).

Result files written by the evaluation engine use the same output schema as
the reference (dims ``(metric, region, lead_time[, level])`` — see
/root/reference/weatherbench2/evaluation.py:497-508).  Files written to a
path default to netCDF4 (HDF5 with dimension scales — what the reference's
xarray emits and downstream tooling expects); in-memory bytes and explicit
``format="NETCDF3"`` use the scipy classic writer.  ``open_netcdf`` sniffs
the magic bytes and routes to the right reader.  Datetimes/timedeltas are
CF-encoded with ``units`` attrs in both formats.
"""
from __future__ import annotations

import io as _io
import numpy as np
from scipy.io import netcdf_file

from . import core
from .io_zarr import (_KNOWN_COORD_NAMES, _decode_cf, _encode_cf,
                      merged_cf_attrs)

_HDF5_MAGIC = b"\x89HDF\r\n\x1a\n"
_NC_DIM_ONLY = b"This is a netCDF dimension but not a netCDF variable."


def to_netcdf(ds: core.Dataset, filename_or_obj=None, format=None):
  """Write a Dataset to netCDF. Returns bytes if no filename given.

  format: "NETCDF4" (default for paths; HDF5 via h5py) or "NETCDF3"
  (scipy classic — always used for the in-memory bytes form).
  """
  if filename_or_obj is not None and (format or "NETCDF4") == "NETCDF4":
    try:
      import h5py  # noqa: F401
    except ImportError:  # pragma: no cover - h5py is in the image
      if format == "NETCDF4":
        # explicit request: do not silently hand back a classic file
        raise
      return _to_netcdf3(ds, filename_or_obj)
    return _to_netcdf4(ds, filename_or_obj)
  return _to_netcdf3(ds, filename_or_obj)


def _to_netcdf4(ds: core.Dataset, path: str) -> None:
  """netCDF4 writer: HDF5 datasets + dimension scales (h5py)."""
  import h5py

  coords = ds.coords_dict()
  dvars = ds.variables_dict()
  sizes = ds.sizes
  nondim_coords = [n for n, v in coords.items() if n not in v.dims]

  with h5py.File(path, "w") as f:

    def write_array(name, var, extra_attrs):
      values = core._to_numpy(var.data)
      if values.dtype.kind in ("U", "O", "S"):
        dt = h5py.string_dtype("utf-8")
        dset = f.create_dataset(name, shape=values.shape, dtype=dt)
        if values.size:
          dset[...] = np.asarray(
              [str(s) for s in values.ravel()], dtype=object
          ).reshape(values.shape)
        cf_attrs = {}
      else:
        data, cf_attrs = _encode_cf(values)
        dset = f.create_dataset(name, data=data)
      for k, val in {**merged_cf_attrs(var.attrs, cf_attrs),
                     **extra_attrs}.items():
        try:
          dset.attrs[k] = val
        except TypeError:
          dset.attrs[k] = str(val)
      return dset

    # dimensions first (as scales); dims without a coordinate variable get
    # the standard netCDF-4 dim-only marker dataset
    for dim, n in sizes.items():
      if dim in coords and coords[dim].dims == (dim,):
        dset = write_array(dim, coords[dim], {})
      else:
        dset = f.create_dataset(dim, shape=(n,), dtype="f4")
        dset.attrs["NAME"] = np.bytes_(
            _NC_DIM_ONLY + b" %10d" % n
        )
      dset.make_scale(dim)

    others = {
        n: v for n, v in coords.items()
        if not (n in sizes and v.dims == (n,))
    }
    others.update(dvars)
    for name, var in others.items():
      extra = {}
      if name in dvars and nondim_coords:
        extra["coordinates"] = " ".join(nondim_coords)
      dset = write_array(name, var, extra)
      for ax, d in enumerate(var.dims):
        dset.dims[ax].attach_scale(f[d])

    for k, val in ds.attrs.items():
      try:
        f.attrs[k] = val
      except TypeError:
        f.attrs[k] = str(val)


def _open_netcdf4(path) -> core.Dataset:
  """netCDF4/HDF5 reader (dimension-scale dims, CF time decode)."""
  import h5py

  variables: dict[str, core.Variable] = {}
  declared_coords: set[str] = set()
  has_declarations = False
  dim_names: set[str] = set()

  with h5py.File(path, "r") as f:
    for name, dset in f.items():
      if not isinstance(dset, h5py.Dataset):
        continue
      nm = dset.attrs.get("NAME", b"")
      if isinstance(nm, str):
        nm = nm.encode()
      if isinstance(nm, bytes) and nm.startswith(_NC_DIM_ONLY):
        dim_names.add(name)
        continue  # dim marker only, no data
      is_scale = h5py.h5ds.is_scale(dset.id)
      dims = []
      if is_scale and dset.ndim == 1:
        dims = [name.split("/")[-1]]
      else:
        for ax in range(dset.ndim):
          scales = dset.dims[ax].items()  # [(label, scale dataset), ...]
          if scales:
            dims.append(scales[0][1].name.split("/")[-1])
          else:
            dims.append(f"phony_dim_{ax}")
      dim_names.update(dims)

      attrs = {}
      for k, val in dset.attrs.items():
        if k in ("NAME", "CLASS", "DIMENSION_LIST", "REFERENCE_LIST",
                 "_Netcdf4Dimid", "_Netcdf4Coordinates"):
          continue
        if isinstance(val, bytes):
          val = val.decode()
        attrs[k] = val
      if "coordinates" in attrs:
        has_declarations = True
        declared_coords.update(str(attrs.pop("coordinates")).split())

      if h5py.check_string_dtype(dset.dtype):
        raw = dset.asstr()[()]
        data = np.asarray(raw, dtype=object)
      else:
        data = np.asarray(dset[()])
        units = attrs.get("units", "")
        if isinstance(units, str) and (
            "since" in units or units in (
                "microseconds", "nanoseconds", "seconds", "hours", "days"
            )
        ) and np.issubdtype(data.dtype, np.integer):
          decoded = _decode_cf(data.astype(np.int64), attrs)
          if decoded.dtype != data.dtype:
            data = decoded
            attrs.pop("units", None)
            attrs.pop("calendar", None)
      variables[name] = core.Variable(tuple(dims), data, attrs)

    global_attrs = {
        k: (v.decode() if isinstance(v, bytes) else v)
        for k, v in f.attrs.items()
    }

  coords = {}
  data_vars = {}
  for name, v in variables.items():
    if name in dim_names:
      is_coord = True
    elif has_declarations:
      is_coord = name in declared_coords
    else:
      is_coord = name in _KNOWN_COORD_NAMES
    if is_coord:
      coords[name] = v
    else:
      data_vars[name] = v
  return core.Dataset(data_vars, coords=coords, attrs=global_attrs)


def _to_netcdf3(ds: core.Dataset, filename_or_obj=None):
  """Write Dataset to NetCDF3. Returns bytes if no filename given."""
  buffer = None
  if filename_or_obj is None:
    buffer = _io.BytesIO()
    target = buffer
  else:
    target = filename_or_obj
  f = netcdf_file(target, "w")
  try:
    all_vars: dict[str, core.Variable] = {}
    all_vars.update(ds.coords_dict())
    all_vars.update(ds.variables_dict())

    sizes = ds.sizes
    str_dims: dict[str, int] = {}
    for name, var in all_vars.items():
      values = core._to_numpy(var.data)
      if values.dtype.kind in ("U", "O", "S"):
        maxlen = max((len(str(s)) for s in values.ravel()), default=1)
        str_dims[name] = max(maxlen, 1)

    for dim, size in sizes.items():
      f.createDimension(dim, size)
    for name, strlen in str_dims.items():
      f.createDimension(f"{name}_strlen", strlen)

    for name, var in all_vars.items():
      values = core._to_numpy(var.data)
      if values.dtype.kind in ("U", "O", "S"):
        strlen = str_dims[name]
        chars = np.zeros(values.shape + (strlen,), dtype="S1")
        flat = values.ravel()
        cview = chars.reshape(-1, strlen)
        for i, s in enumerate(flat):
          b = str(s).encode("utf-8")[:strlen]
          cview[i, : len(b)] = np.frombuffer(b, dtype="S1")
        v = f.createVariable(
            name, "c", tuple(var.dims) + (f"{name}_strlen",)
        )
        v[:] = chars
        v._xds_string = 1
        continue
      data, cf_attrs = _encode_cf(values)
      if data.dtype == np.int64:
        # netcdf3 has no int64: store as float64 (ns precision loss is
        # acceptable for our coords; use microseconds to stay exact)
        if "units" in cf_attrs and "nanoseconds" in cf_attrs["units"]:
          data = (data // 1000).astype(np.float64)
          cf_attrs = {
              k: v.replace("nanoseconds", "microseconds")
              for k, v in cf_attrs.items()
          }
        else:
          data = data.astype(np.float64)
      if data.dtype == np.bool_:
        data = data.astype(np.int8)
      v = f.createVariable(name, data.dtype.newbyteorder(">"), var.dims)
      if data.ndim:
        v[:] = data
      else:
        # scipy's assignValue chokes on 0-d arrays; write the item directly
        v.data[()] = data.item()
      for k, val in merged_cf_attrs(var.attrs, cf_attrs).items():
        if isinstance(val, str):
          setattr(v, k, val)
    f.flush()
  finally:
    if buffer is not None:
      result = buffer.getvalue()
      f.fp = None  # prevent scipy from closing the buffer badly
    f.close() if buffer is None else None
  if buffer is not None:
    return result
  return None


def open_netcdf(filename_or_obj) -> core.Dataset:
  """Read a netCDF file (netCDF4/HDF5 or NetCDF3, sniffed by magic)."""
  if isinstance(filename_or_obj, (bytes, bytearray)):
    if bytes(filename_or_obj[:8]) == _HDF5_MAGIC:
      return _open_netcdf4(_io.BytesIO(bytes(filename_or_obj)))
    filename_or_obj = _io.BytesIO(filename_or_obj)
  elif isinstance(filename_or_obj, str):
    with open(filename_or_obj, "rb") as fh:
      magic = fh.read(8)
    if magic == _HDF5_MAGIC:
      return _open_netcdf4(filename_or_obj)
  f = netcdf_file(filename_or_obj, "r", mmap=False)
  try:
    variables: dict[str, core.Variable] = {}
    for name, v in f.variables.items():
      attrs = {
          k: (val.decode() if isinstance(val, bytes) else val)
          for k, val in v._attributes.items()
      }
      data = np.asarray(v.data)
      dims = tuple(v.dimensions)
      if attrs.pop("_xds_string", None) or (
          data.dtype.kind == "S" and dims and dims[-1].endswith("_strlen")
      ):
        strings = np.array(
            [
                b"".join(row).decode("utf-8").rstrip("\x00")
                for row in data.reshape(-1, data.shape[-1])
            ],
            dtype=object,
        ).reshape(data.shape[:-1])
        variables[name] = core.Variable(dims[:-1], strings)
        continue
      units = attrs.get("units", "")
      if isinstance(units, str) and (
          "since" in units or units in ("microseconds", "nanoseconds",
                                        "seconds", "hours", "days")
      ):
        decoded = _decode_cf(data.astype(np.int64), attrs)
        if decoded.dtype != data.dtype:
          data = decoded
          attrs.pop("units", None)
          attrs.pop("calendar", None)
      variables[name] = core.Variable(dims, data, attrs)

    dim_names = set(f.dimensions)
    from .io_zarr import _KNOWN_COORD_NAMES

    coords = {}
    data_vars = {}
    for name, v in variables.items():
      if name in dim_names or name in _KNOWN_COORD_NAMES:
        coords[name] = v
      else:
        data_vars[name] = v
    attrs = {
        k: (val.decode() if isinstance(val, bytes) else val)
        for k, val in f._attributes.items()
    }
    return core.Dataset(data_vars, coords=coords, attrs=attrs)
  finally:
    f.fp = None if isinstance(filename_or_obj, _io.BytesIO) else f.fp
    try:
      f.close()
    except Exception:
      pass
