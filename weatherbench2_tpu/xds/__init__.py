"""xds: minimal TPU-friendly labeled arrays (xarray-free).

Public API mirrors the subset of xarray used by WeatherBench-style
verification pipelines.
"""
from .core import (
    DataArray,
    Dataset,
    Index,
    Variable,
    apply_ufunc,
    align_arrays,
    broadcast_dims_order,
    broadcast_variables,
    combine_by_coords,
    concat,
    dot,
    full_like,
    merge,
    ones_like,
    where,
    zeros_like,
)
from .io_netcdf import open_netcdf, to_netcdf
from .io_zarr import (
    ZarrArray,
    create_zarr_template,
    open_zarr,
    to_zarr,
    write_zarr_region,
)
from . import stream
from .stream import (
    RegionWriter,
    ShapeStub,
    clustered_positions,
    iter_windows,
    orthogonal_select,
    streaming_transform,
    stub_variable,
    template_dataset,
)
from .tree import ensure_registered as register_pytree

try:  # register pytrees eagerly when jax is importable
  register_pytree()
except ImportError:  # pragma: no cover
  pass

__all__ = [
    "DataArray",
    "Dataset",
    "Index",
    "Variable",
    "apply_ufunc",
    "align_arrays",
    "broadcast_dims_order",
    "broadcast_variables",
    "combine_by_coords",
    "concat",
    "dot",
    "full_like",
    "merge",
    "ones_like",
    "where",
    "zeros_like",
    "open_netcdf",
    "to_netcdf",
    "open_zarr",
    "to_zarr",
    "ZarrArray",
    "RegionWriter",
    "ShapeStub",
    "clustered_positions",
    "iter_windows",
    "streaming_transform",
    "stub_variable",
    "template_dataset",
    "create_zarr_template",
    "write_zarr_region",
]
