"""NetCDF3 IO for xds Datasets via scipy.io.netcdf.

Result files written by the evaluation engine use the same output schema as
the reference (dims ``(metric, region, lead_time[, level])`` — see
/root/reference/weatherbench2/evaluation.py:497-508).  NetCDF3 has no
datetime/string types, so we CF-encode datetimes/timedeltas as int64-ish
doubles with ``units`` attrs and strings as char matrices, decoding
symmetrically on read.
"""
from __future__ import annotations

import io as _io
import numpy as np
from scipy.io import netcdf_file

from . import core
from .io_zarr import _decode_cf, _encode_cf


def to_netcdf(ds: core.Dataset, filename_or_obj=None):
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
      for k, val in {**cf_attrs, **var.attrs}.items():
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
  """Read a NetCDF3 file into a Dataset."""
  if isinstance(filename_or_obj, (bytes, bytearray)):
    filename_or_obj = _io.BytesIO(filename_or_obj)
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
