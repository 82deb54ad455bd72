r"""CLI to realign forecasts from (init, lead) to (valid_time, lead).

Flag-compatible with the reference scripts/index_on_valid_time.py:
``--desired_time_dims=valid_and_delta`` produces dims (time, lead) keeping
every ``forecast_spacing``-th lead; ``valid_and_init`` keeps (time, init).
Missing (valid, lead) corners read as NaN straight from the template's
fill value — the streaming analogue of the reference's padding chunks
(/root/reference/scripts/index_on_valid_time.py:210-256).  Gather maps
are precomputed host-side (vectorized searchsorted) and valid-time
blocks stream from the lazy input into zarr region writes.
"""
from absl import app
from absl import flags
import numpy as np

from weatherbench2_tpu import flag_utils
from weatherbench2_tpu import xds

TIME = "time"
DELTA = "prediction_timedelta"
INIT = "init"

VALID_AND_DELTA = "valid_and_delta"
VALID_AND_INIT = "valid_and_init"

INPUT_PATH = flag_utils.DEFINE_string("input_path", None, help="Input Zarr path.")
OUTPUT_PATH = flag_utils.DEFINE_string("output_path", None, help="Output Zarr path.")
DESIRED_TIME_DIMS = flag_utils.DEFINE_string(
    "desired_time_dims", VALID_AND_DELTA,
    help=f'"{VALID_AND_DELTA}" or "{VALID_AND_INIT}".')
RUNNER = flag_utils.DEFINE_string("runner", None, "(ignored)")
NUM_THREADS = flag_utils.DEFINE_integer(
    "num_threads", None, help="(accepted for compatibility; unused)")


def get_forecast_offset_and_spacing(init_times, lead_times):
  """Offset & spacing between weather forecasts by valid time."""
  init_deltas = np.unique(np.diff(init_times))
  if init_deltas.size > 1:
    raise ValueError(
        f"initialization times are not equidistant: {init_deltas}"
    )
  (init_delta,) = init_deltas
  lead_deltas = np.unique(np.diff(lead_times))
  if lead_deltas.size > 1:
    raise ValueError(f"lead times are not equidistant: {lead_deltas}")
  (lead_delta,) = lead_deltas
  forecast_spacing, remainder = divmod(init_delta, lead_delta)
  if remainder:
    raise ValueError(
        "initialization times not spaced at a multiple of lead times: "
        f"{lead_delta=}, {init_delta=}"
    )
  if lead_times[0] == np.timedelta64(0, "h"):
    forecast_offset = 0
  else:
    forecast_offset = lead_times.tolist().index(
        forecast_spacing * lead_delta
    )
  return int(forecast_offset), int(forecast_spacing)


def _positions_in(haystack: np.ndarray, needed: np.ndarray) -> np.ndarray:
  """Positions of ``needed`` values in sorted ``haystack``; -1 if absent."""
  idx = np.searchsorted(haystack, needed)
  idx_cl = np.clip(idx, 0, len(haystack) - 1)
  ok = haystack[idx_cl] == needed
  return np.where(ok, idx_cl, -1).astype(np.int64)


def build_gather_maps(init_times, lead_times, desired: str):
  """(valid_index, other_dim, other_coord, gather_init, gather_other).

  ``gather_init[v, o]`` / ``gather_other[v, o]`` address the source
  (time=init, prediction_timedelta) entry landing at output
  (valid_index[v], other[o]); -1 marks a missing corner (NaN output).
  """
  n_init, n_lead = len(init_times), len(lead_times)
  valid_index = np.unique(
      (init_times[:, None] + lead_times[None, :]).ravel()
  )
  if desired == VALID_AND_DELTA:
    needed = valid_index[:, None] - lead_times[None, :]
    gather_init = _positions_in(init_times, needed)
    gather_other = np.broadcast_to(
        np.arange(n_lead, dtype=np.int64)[None, :], gather_init.shape
    )
    gather_other = np.where(gather_init >= 0, gather_other, -1)
    return valid_index, DELTA, lead_times, gather_init, gather_other
  elif desired == VALID_AND_INIT:
    needed = valid_index[:, None] - init_times[None, :]
    gather_other = _positions_in(lead_times, needed)
    gather_init = np.broadcast_to(
        np.arange(n_init, dtype=np.int64)[None, :], gather_other.shape
    )
    gather_init = np.where(gather_other >= 0, gather_init, -1)
    return valid_index, INIT, init_times, gather_init, gather_other
  raise ValueError(f"unknown desired_time_dims {desired!r}")


def main(argv):
  source = xds.open_zarr(INPUT_PATH.value, lazy=True)
  init_times = np.asarray(source.coords_dict()[TIME].data)
  lead_times = np.asarray(source.coords_dict()[DELTA].data)
  forecast_offset, forecast_spacing = get_forecast_offset_and_spacing(
      init_times, lead_times
  )
  if DESIRED_TIME_DIMS.value == VALID_AND_DELTA:
    # strided slice (not an index array) so lazy payloads stay lazy
    source = source.isel(
        {DELTA: slice(forecast_offset, None, forecast_spacing)}
    )
    lead_times = lead_times[forecast_offset::forecast_spacing]

  valid_index, other_dim, other_coord, gather_init, gather_other = (
      build_gather_maps(init_times, lead_times, DESIRED_TIME_DIMS.value)
  )
  n_valid, n_other = gather_init.shape

  coords = {
      k: v
      for k, v in source.coords_dict().items()
      if TIME not in v.dims and DELTA not in v.dims
  }
  coords[TIME] = xds.Variable((TIME,), valid_index)
  coords[other_dim] = xds.Variable((other_dim,), other_coord)

  all_vars = source.variables_dict()
  # variables without (time, lead) dims — e.g. a land_sea_mask — cannot
  # be realigned; pass them through to the output unchanged
  src_vars = {
      n: v for n, v in all_vars.items()
      if TIME in v.dims and DELTA in v.dims
  }
  static_vars = {n: v for n, v in all_vars.items() if n not in src_vars}
  template_vars = {}
  rest_dims = {}
  for name, var in src_vars.items():
    rest = tuple(d for d in var.dims if d not in (TIME, DELTA))
    rest_dims[name] = rest
    sizes = {TIME: n_valid, other_dim: n_other,
             **{d: var.sizes[d] for d in rest}}
    template_vars[name] = xds.stub_variable(
        (TIME, other_dim) + rest, sizes, np.float32, var.attrs
    )
  for name, var in static_vars.items():
    template_vars[name] = xds.stub_variable(
        var.dims, dict(var.sizes), np.float32, var.attrs
    )
  template = xds.Dataset(template_vars, coords=coords, attrs=source.attrs)

  block = xds.stream.default_block(source, TIME)
  writer = xds.RegionWriter(OUTPUT_PATH.value, template,
                            stream_chunks={TIME: block})
  for window in xds.iter_windows({TIME: n_valid}, {TIME: block}):
    sl = window.get(TIME, slice(0, n_valid))
    bi = gather_init[sl]
    bo = gather_other[sl]
    mask = bi >= 0
    if not mask.any():
      continue  # template fill value (NaN) already covers this block
    in0 = int(bi[mask].min())
    in1 = int(bi[mask].max()) + 1
    for name, var in src_vars.items():
      key = tuple(
          slice(in0, in1) if d == TIME else slice(None) for d in var.dims
      )
      vals = np.asarray(var.data[key], dtype=np.float32)
      # normalize axis order to (TIME, DELTA, rest...)
      order = [var.dims.index(TIME), var.dims.index(DELTA)] + [
          i for i, d in enumerate(var.dims) if d not in (TIME, DELTA)
      ]
      vals = np.transpose(vals, order)
      safe_i = np.where(mask, bi - in0, 0)
      safe_o = np.where(mask, np.where(bo >= 0, bo, 0), 0)
      picked = vals[safe_i, safe_o]
      picked = np.where(
          mask.reshape(mask.shape + (1,) * (picked.ndim - 2)),
          picked,
          np.nan,
      )
      writer.write_array(
          name,
          (sl, slice(None)) + (slice(None),) * len(rest_dims[name]),
          picked,
      )
  for name, var in static_vars.items():
    writer.write_array(
        name,
        tuple(slice(None) for _ in var.dims),
        np.asarray(var.data, dtype=np.float32),
    )
  writer.finish()


if __name__ == "__main__":
  app.run(main)
