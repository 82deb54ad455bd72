r"""CLI to realign forecasts from (init, lead) to (valid_time, lead).

Flag-compatible with the reference scripts/index_on_valid_time.py:
``--desired_time_dims=valid_and_delta`` produces dims (time, lead) keeping
every ``forecast_spacing``-th lead; ``valid_and_init`` keeps (time, init).
Missing (valid, lead) corners are NaN.  Implemented as one host-side index
shuffle (precomputed gather with NaN padding) instead of a keyed Beam
scatter.
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


def index_on_valid_time(source: xds.Dataset) -> xds.Dataset:
  """Realign a (time=init, prediction_timedelta) dataset to valid time."""
  init_times = np.asarray(source.coords_dict()[TIME].data)
  lead_times = np.asarray(source.coords_dict()[DELTA].data)
  forecast_offset, forecast_spacing = get_forecast_offset_and_spacing(
      init_times, lead_times
  )
  if DESIRED_TIME_DIMS.value == VALID_AND_DELTA:
    keep_leads = np.arange(forecast_offset, len(lead_times),
                           forecast_spacing)
    source = source.isel({DELTA: keep_leads})
    lead_times = lead_times[keep_leads]

  n_init, n_lead = len(init_times), len(lead_times)
  valid_all = (init_times[:, None] + lead_times[None, :]).ravel()
  valid_index = np.unique(valid_all)

  if DESIRED_TIME_DIMS.value == VALID_AND_DELTA:
    # out[valid, lead] = in[init_idx(valid - lead), lead]
    other_dim, n_other = DELTA, n_lead
    other_coord = lead_times
    init_pos = {v: i for i, v in enumerate(init_times.tolist())}
    gather_init = np.full((len(valid_index), n_lead), -1, dtype=np.int64)
    gather_other = np.broadcast_to(
        np.arange(n_lead)[None, :], gather_init.shape
    )
    for j, lead in enumerate(lead_times):
      needed = valid_index - lead
      for i, t in enumerate(needed.tolist()):
        gather_init[i, j] = init_pos.get(t, -1)
  else:
    # out[valid, init] = in[init, lead_idx(valid - init)]
    other_dim, n_other = INIT, n_init
    other_coord = init_times
    lead_pos = {v: i for i, v in enumerate(lead_times.tolist())}
    gather_init = np.broadcast_to(
        np.arange(n_init)[None, :], (len(valid_index), n_init)
    ).copy()
    gather_other = np.full((len(valid_index), n_init), -1, dtype=np.int64)
    for j, init in enumerate(init_times):
      needed = valid_index - init
      for i, t in enumerate(needed.tolist()):
        gather_other[i, j] = lead_pos.get(t, -1)
    gather_init = np.where(gather_other >= 0, gather_init, -1)

  coords = {
      k: v
      for k, v in source.coords_dict().items()
      if TIME not in v.dims and DELTA not in v.dims
  }
  coords[TIME] = valid_index
  coords[other_dim] = other_coord
  out = xds.Dataset({}, coords=coords)
  valid_mask = (gather_init >= 0) & (gather_other >= 0)
  safe_init = np.where(valid_mask, gather_init, 0)
  safe_other = np.where(valid_mask, np.where(gather_other >= 0,
                                             gather_other, 0), 0)
  for name in source.keys():
    da = source[name]
    order = [TIME, DELTA] + [d for d in da.dims if d not in (TIME, DELTA)]
    arranged = da.transpose(*order)
    vals = np.asarray(arranged.values, dtype=np.float32)
    picked = vals[safe_init, safe_other]
    picked = np.where(
        valid_mask.reshape(valid_mask.shape + (1,) * (picked.ndim - 2)),
        picked,
        np.nan,
    )
    out[name] = xds.Variable(
        (TIME, other_dim) + tuple(order[2:]), picked
    )
  return out


def main(argv):
  source = xds.open_zarr(INPUT_PATH.value)
  out = index_on_valid_time(source)
  xds.to_zarr(out, OUTPUT_PATH.value)


if __name__ == "__main__":
  app.run(main)
