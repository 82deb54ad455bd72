r"""CLI to add derived variables to a dataset.

Flag-compatible with the reference scripts/compute_derived_variables.py:
variables needing the full lead_time axis resident (e.g. precipitation
accumulations) are computed with lead_time unchunked; others stream with
the input chunking.  Here everything runs through dense array ops (device
when jax payloads) instead of two Beam branches with a Rechunk.
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
    "working_chunks", "", help="(accepted for compatibility; unused)")
RECHUNK_ITEMSIZE = flag_utils.DEFINE_integer(
    "rechunk_itemsize", 4, help="(accepted for compatibility; unused)")
MAX_MEM_GB = flag_utils.DEFINE_integer(
    "max_mem_gb", 1, help="(accepted for compatibility; unused)")
NUM_THREADS = flag_utils.DEFINE_integer(
    "num_threads", None, help="(accepted for compatibility; unused)")
RUNNER = flag_utils.DEFINE_string("runner", None, "(ignored)")


def main(argv):
  ds = xds.open_zarr(INPUT_PATH.value)
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

  for name in DERIVED_VARIABLES.value:
    dv = dvs.DERIVED_VARIABLE_DICT[name]
    missing = [v for v in dv.base_variables if v not in ds and v != "level"]
    if missing:
      continue  # skip derived variables whose inputs are absent
    ds[name] = dv.compute(ds[[v for v in dv.base_variables if v in ds]])

  xds.to_zarr(ds, OUTPUT_PATH.value)


if __name__ == "__main__":
  app.run(main)
