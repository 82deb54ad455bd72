r"""CLI to add derived variables to a dataset.

Flag-compatible with the reference scripts/compute_derived_variables.py.
The input streams through in blocks over every dimension that is NOT a
core dim of any requested derived variable (so e.g. precipitation
accumulations always see the full lead_time axis, and spatial operators
the full lat/lon plane — the reference routes these through a rechunk
branch, /root/reference/scripts/compute_derived_variables.py:217-231);
results are written region-wise into a zarr template, so TB-scale inputs
process with bounded host memory.
"""
import ast

from absl import app
from absl import flags

from weatherbench2_tpu import derived_variables as dvs
from weatherbench2_tpu import flag_utils
from weatherbench2_tpu import xds

_DEFAULT_DERIVED_VARIABLES = [
    "wind_speed",
    "10m_wind_speed",
    "divergence",
    "vorticity",
    "vertical_velocity",
    "eddy_kinetic_energy",
    "geostrophic_wind_speed",
    "ageostrophic_wind_speed",
    "lapse_rate",
    "total_column_vapor",
    "integrated_vapor_transport",
    "relative_humidity",
    "total_precipitation_6hr",
    "total_precipitation_24hr",
]

INPUT_PATH = flag_utils.DEFINE_string("input_path", None, help="Input Zarr path")
OUTPUT_PATH = flag_utils.DEFINE_string("output_path", None, help="Output Zarr path")
DERIVED_VARIABLES = flag_utils.DEFINE_list(
    "derived_variables", _DEFAULT_DERIVED_VARIABLES,
    help="Derived variables to compute.")
PREEXISTING_VARIABLES_TO_REMOVE = flag_utils.DEFINE_list(
    "preexisting_variables_to_remove", [],
    help="Variables to remove from the source before computing.")
RENAME_RAW_TP_NAME = flag_utils.DEFINE_bool(
    "rename_raw_tp_name", False,
    'Rename raw tp name to "total_precipitation".')
RAW_TP_NAME = flag_utils.DEFINE_string(
    "raw_tp_name", "total_precipitation",
    help="Raw name of the total precipitation variable.")
RENAME_VARIABLES = flag_utils.DEFINE_string(
    "rename_variables", None,
    help='Dict literal of renames, e.g. {"2t": "2m_temperature"}')
WORKING_CHUNKS = flag_utils.DEFINE_chunks(
    "working_chunks", "",
    help="Streaming block sizes over non-core dims, e.g. "
         '"time=4". Default: 8 along the init/time dim, other dims full.')
RECHUNK_ITEMSIZE = flag_utils.DEFINE_integer(
    "rechunk_itemsize", 4, help="(accepted for compatibility; unused)")
MAX_MEM_GB = flag_utils.DEFINE_integer(
    "max_mem_gb", 1, help="(accepted for compatibility; unused)")
NUM_THREADS = flag_utils.DEFINE_integer(
    "num_threads", None, help="(accepted for compatibility; unused)")
RUNNER = flag_utils.DEFINE_string("runner", None, "(ignored)")


def _add_derived(block: xds.Dataset, to_compute) -> xds.Dataset:
  out = block.copy()
  for name, dv in to_compute:
    out[name] = dv.compute(
        block[[v for v in dv.base_variables if v in block]]
    )
  return out


def main(argv):
  ds = xds.open_zarr(INPUT_PATH.value, lazy=True)
  if PREEXISTING_VARIABLES_TO_REMOVE.value:
    present = [
        v for v in PREEXISTING_VARIABLES_TO_REMOVE.value if v in ds
    ]
    if present:
      ds = ds.drop_vars(present)
  if RENAME_RAW_TP_NAME.value and RAW_TP_NAME.value in ds:
    ds = ds.rename({RAW_TP_NAME.value: "total_precipitation"})
  if RENAME_VARIABLES.value:
    ds = ds.rename(ast.literal_eval(RENAME_VARIABLES.value))

  to_compute = []
  core_dims: set = set()
  for name in DERIVED_VARIABLES.value:
    dv = dvs.DERIVED_VARIABLE_DICT[name]
    missing = [v for v in dv.base_variables if v not in ds and v != "level"]
    if missing:
      continue  # skip derived variables whose inputs are absent
    to_compute.append((name, dv))
    core_dims |= dv.all_input_core_dims

  # stream over everything that is not a core dim of a requested variable
  sizes = dict(ds.sizes)
  stream_chunks = {}
  for d in ("time", "init_time"):
    if d in sizes and d not in core_dims:
      stream_chunks[d] = xds.stream.default_block(ds, d)
  for d, c in WORKING_CHUNKS.value.items():
    if d in core_dims and c not in (-1, None) and c < sizes.get(d, 0):
      raise ValueError(
          f"cannot chunk {d!r}: it is a core dim of a requested derived "
          "variable (the full axis must be resident per block)"
      )
    stream_chunks[d] = c

  streamed = [d for d, c in stream_chunks.items()
              if d in sizes and c not in (-1, None)]
  probe_window = {d: slice(0, 1) for d in streamed}
  probe = _add_derived(ds.isel(probe_window), to_compute)
  full_coords = {
      k: v for k, v in ds.coords_dict().items()
      if set(v.dims) & set(streamed)
  }
  template = xds.template_dataset(
      probe, {d: sizes[d] for d in streamed}, coords=full_coords
  )

  writer = xds.RegionWriter(OUTPUT_PATH.value, template,
                            stream_chunks=stream_chunks)
  first = True
  for window in xds.iter_windows(template.sizes, stream_chunks):
    if not window and not streamed:
      # nothing is streamed (no time dim): the probe already computed
      # the whole dataset — don't derive everything a second time
      piece = probe
    else:
      block = ds.isel(window) if window else ds
      piece = _add_derived(block, to_compute)
    if not first:  # static vars (no streamed dim) are written once
      static = [
          n for n, v in piece.variables_dict().items()
          if not set(v.dims) & set(window)
      ]
      if static:
        piece = piece.drop_vars(static)
    writer.write(piece, window)
    first = False
  writer.finish()


if __name__ == "__main__":
  app.run(main)
