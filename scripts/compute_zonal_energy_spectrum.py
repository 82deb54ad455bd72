r"""CLI to compute zonal energy spectra (batched rFFT over longitude).

Flag-compatible with the reference scripts/compute_zonal_energy_spectrum.py:
each base variable VAR becomes a Parseval-normalized power spectrum over
``zonal_wavenumber`` (with per-latitude frequency/wavelength coords),
averaged over --averaging_dims.  The rFFT runs batched on the accelerator.
"""
from absl import app
from absl import flags
import numpy as np

from weatherbench2_tpu import flag_utils
from weatherbench2_tpu import xds
from weatherbench2_tpu.derived_variables import ZonalEnergySpectrum

_DEFAULT_BASE_VARIABLES = ["u_component_of_wind", "v_component_of_wind"]
_DEFAULT_LEVELS = ["500", "700", "850"]
_DEFAULT_AVERAGING_DIMS = ["time"]

INPUT_PATH = flag_utils.DEFINE_string("input_path", None, help="Input Zarr path")
OUTPUT_PATH = flag_utils.DEFINE_string("output_path", None, help="Output Zarr path")
BASE_VARIABLES = flag_utils.DEFINE_list(
    "base_variables", _DEFAULT_BASE_VARIABLES,
    help="Variables; each VAR yields a VAR spectrum in the output.")
TIME_DIM = flag_utils.DEFINE_string(
    "time_dim", "time", help="Name of the time dimension to slice on.")
TIME_START = flag_utils.DEFINE_string(
    "time_start", "2020-01-01", help="Inclusive start timestamp")
TIME_STOP = flag_utils.DEFINE_string(
    "time_stop", "2020-12-31", help="Inclusive stop timestamp")
LEVELS = flag_utils.DEFINE_list(
    "levels", _DEFAULT_LEVELS, help="Pressure levels (default 500/700/850).")
AVERAGING_DIMS = flag_utils.DEFINE_list(
    "averaging_dims", _DEFAULT_AVERAGING_DIMS,
    help="Dims to average the spectra over.")
FANOUT = flag_utils.DEFINE_integer("fanout", None, help="(ignored)")
NUM_THREADS = flag_utils.DEFINE_integer(
    "num_threads", None, help="(accepted for compatibility; unused)")
RUNNER = flag_utils.DEFINE_string("runner", None, "(ignored)")


def main(argv):
  ds = xds.open_zarr(INPUT_PATH.value)
  ds = ds[[v for v in BASE_VARIABLES.value]]
  sel = {}
  if TIME_DIM.value in ds.sizes:
    sel[TIME_DIM.value] = slice(TIME_START.value, TIME_STOP.value)
  if LEVELS.value and "level" in ds.sizes:
    sel["level"] = [int(l) for l in LEVELS.value]
  if sel:
    ds = ds.sel(sel)

  out = xds.Dataset({}, coords={})
  for name in BASE_VARIABLES.value:
    spectrum = ZonalEnergySpectrum(name).compute(ds[[name]])
    avg = [d for d in AVERAGING_DIMS.value if d in spectrum.dims]
    if avg:
      spectrum = spectrum.mean(avg)
    out[name] = spectrum
  xds.to_zarr(out, OUTPUT_PATH.value)


if __name__ == "__main__":
  app.run(main)
