r"""CLI to compute quantiles over arbitrary dimensions.

Flag-compatible with the reference scripts/compute_quantiles.py: adds a
``quantile`` dimension; with ``--name_suffix=_quantile`` the output is
usable as climatology input for thresholded metrics.  Each streamed tile
is device_put and the quantile sorts run per pencil on the accelerator
(host numpy fallback via WB2_NO_DEVICE=1); the tile stream replaces the
reference's rechunk-sort pipeline
(/root/reference/scripts/compute_quantiles.py:223-256).
"""
from absl import app
from absl import flags
import numpy as np

from weatherbench2_tpu import flag_utils
from weatherbench2_tpu import xds

INPUT_PATH = flag_utils.DEFINE_string("input_path", None, help="Path to input zarr")
OUTPUT_PATH = flag_utils.DEFINE_string("output_path", None, help="Path to output zarr")
QUANTILES = flag_utils.DEFINE_list(
    "quantiles", None, help="Quantiles in [0, 1].")
DIM = flag_utils.DEFINE_list(
    "dim", [], help="Dimensions to reduce over.")
NAME_SUFFIX = flag_utils.DEFINE_string(
    "name_suffix", "", help='Suffix for variable names (e.g. "_quantile").')
SKIPNA = flag_utils.DEFINE_boolean(
    "skipna", False, help="Skip NaNs when computing quantiles.")
LEVELS = flag_utils.DEFINE_list(
    "levels", None, help="Pressure levels to select (default: all).")
TIME_DIM = flag_utils.DEFINE_string(
    "time_dim", "time", help="Time dimension name for slicing.")
TIME_START = flag_utils.DEFINE_string(
    "time_start", "2020-01-01", help="Inclusive start timestamp")
TIME_STOP = flag_utils.DEFINE_string(
    "time_stop", "2020-12-31", help="Inclusive stop timestamp")
VARIABLES = flag_utils.DEFINE_list(
    "variables", None, help="Variables to include (default: all).")
WORKING_CHUNKS = flag_utils.DEFINE_chunks(
    "working_chunks", "",
    help="Streaming tile sizes over the non-reduced dims, e.g. "
         '"latitude=8". Default: adaptive tiles over the first '
         "non-reduced spatial dim.")
OUTPUT_CHUNKS = flag_utils.DEFINE_chunks(
    "output_chunks", "", help="Chunking of the output store.")
NUM_THREADS = flag_utils.DEFINE_integer(
    "num_threads", None, help="(accepted for compatibility; unused)")
RUNNER = flag_utils.DEFINE_string("runner", None, "(ignored)")


def main(argv):
  ds = xds.open_zarr(INPUT_PATH.value, lazy=True)
  if VARIABLES.value is not None:
    ds = ds[list(VARIABLES.value)]
  sel = {}
  if TIME_DIM.value in ds.sizes:
    sel[TIME_DIM.value] = slice(TIME_START.value, TIME_STOP.value)
  if LEVELS.value and "level" in ds.sizes:
    sel["level"] = [float(l) for l in LEVELS.value]
  if sel:
    ds = ds.sel(sel)
  empty = {d: n for d, n in ds.sizes.items() if n == 0}
  if empty:
    raise SystemExit(
        f"selection left dimensions empty: {empty} — check "
        f"--time_start/--time_stop against the input's time range"
    )

  quantiles = [float(q) for q in QUANTILES.value]
  reduce_dims = list(DIM.value)

  on_device = xds.stream.use_device()

  def _quantile_core(block):
    out = block.quantile(quantiles, dim=reduce_dims, skipna=SKIPNA.value)
    if NAME_SUFFIX.value:
      out = out.rename({v: f"{v}{NAME_SUFFIX.value}" for v in out.keys()})
    return out

  if on_device:
    import jax

    # jit: one compiled program per tile shape instead of eager per-op
    # dispatch (a remote accelerator pays a round-trip per op otherwise)
    _quantile_jit = jax.jit(_quantile_core)

  def compute(block, stream_dims=None):
    if on_device:
      # h2d boundary: per-pencil quantile sorts run on the accelerator.
      # Streamed tile coords (e.g. each tile's latitude band labels) are
      # normalized to placeholders first — coord values are static jit
      # aux (xds/tree.py), so distinct per-tile labels would retrace +
      # recompile every tile; region writes are positional and take
      # real labels from the template.
      if stream_dims:
        block = xds.stream.normalize_stream_coords(block, stream_dims)
      return _quantile_jit(xds.stream.to_device(block))
    return _quantile_core(block)

  # the reduced axes must be fully resident per tile (on-device sorts);
  # stream tiles over the remaining dims — the analogue of the
  # reference's rechunk-reduce-rechunk pipeline
  # (/root/reference/scripts/compute_quantiles.py:223-256)
  kept = [d for d in ds.sizes if d not in reduce_dims]
  stream_chunks = dict(WORKING_CHUNKS.value)
  if not stream_chunks:
    for cand in ("latitude", "longitude", *kept):
      if cand in kept:
        stream_chunks = {cand: xds.stream.default_block(ds, cand)}
        break
  stream_chunks = {
      d: c for d, c in stream_chunks.items() if d in kept
  }
  if not kept or not stream_chunks:
    xds.to_zarr(compute(ds), OUTPUT_PATH.value,
                chunks=dict(OUTPUT_CHUNKS.value))
    return

  probe = compute(ds.isel({d: slice(0, 1) for d in stream_chunks}))
  coords = {
      k: v for k, v in ds.coords_dict().items()
      if set(v.dims) & set(stream_chunks)
  }
  template = xds.template_dataset(
      probe, {d: ds.sizes[d] for d in stream_chunks}, coords=coords
  )
  writer = xds.RegionWriter(
      OUTPUT_PATH.value, template, chunks=dict(OUTPUT_CHUNKS.value) or None,
      stream_chunks=stream_chunks,
  )
  for window in xds.iter_windows(template.sizes, stream_chunks):
    writer.write(compute(ds.isel(window), stream_dims=set(stream_chunks)),
                 window)
  writer.finish()


if __name__ == "__main__":
  app.run(main)
