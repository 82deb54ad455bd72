r"""CLI to slice a Zarr dataset (sel/isel/drop_sel/drop_isel/variables).

Flag grammar parity with the reference scripts/slice_dataset.py:
``--sel=DIM_start=...,DIM_stop=...,DIM_step=...,DIM_list=a+b+c``.

All selection logic runs on a coords-only skeleton (per-dim position
arrays), then the chosen positions stream window-by-window from the lazy
input into a zarr template — copying a slice of a TB-scale store reads
only the selected bytes, unlike the reference's full Beam pipeline
(/root/reference/scripts/slice_dataset.py).
"""
import re

import numpy as np
from absl import app
from absl import flags

from weatherbench2_tpu import flag_utils
from weatherbench2_tpu import xds

INPUT_PATH = flag_utils.DEFINE_string("input_path", None, help="Input Zarr path.")
OUTPUT_PATH = flag_utils.DEFINE_string("output_path", None, help="Output Zarr path.")
SEL = flag_utils.DEFINE_dim_value_pairs(
    "sel", "",
    help="DIM_{start,stop,step,list} pairs for label selection.")
SEL_STRINGS = flag_utils.DEFINE_dim_value_pairs(
    "sel_strings", "",
    help="Like --sel but values kept as strings (e.g. years).")
ISEL = flag_utils.DEFINE_dim_value_pairs(
    "isel", "",
    help="DIM_{start,stop,step,list} pairs for positional selection.")
DROP_SEL = flag_utils.DEFINE_dim_value_pairs(
    "drop_sel", "", help="Labels to drop.")
DROP_SEL_STRINGS = flag_utils.DEFINE_dim_value_pairs(
    "drop_sel_strings", "", help="String labels to drop.")
DROP_ISEL = flag_utils.DEFINE_dim_value_pairs(
    "drop_isel", "", help="Positions to drop.")
DROP_VARIABLES = flag_utils.DEFINE_list(
    "drop_variables", None, help="Variables to drop.")
KEEP_VARIABLES = flag_utils.DEFINE_list(
    "keep_variables", None, help="Variables to keep (default: all).")
MAKE_DIMS_INCREASING = flag_utils.DEFINE_list(
    "make_dims_increasing", [],
    help="Dimensions to make increasing, reversing order if needed.")
OUTPUT_CHUNKS = flag_utils.DEFINE_chunks(
    "output_chunks", "", help="Chunking of the output store.")
RUNNER = flag_utils.DEFINE_string("runner", None, "(ignored)")
NUM_THREADS = flag_utils.DEFINE_integer(
    "num_threads", None, help="(accepted for compatibility; unused)")

_SUFFIXES = ("start", "stop", "step", "list")


def parse_selection_grammar(pairs: dict, force_string: bool = False) -> dict:
  """Parse DIM_{start,stop,step,list} pairs into {dim: slice|list}."""
  slices: dict = {}
  lists: dict = {}
  for key, value in pairs.items():
    m = re.fullmatch(r"(\w+)_(start|stop|step|list)", key)
    if not m:
      raise ValueError(
          f"flag key {key!r} does not match VARNAME_(start|stop|step|list)"
      )
    dim, kind = m.group(1), m.group(2)
    if kind == "list":
      items = [
          flag_utils.get_dim_value(v) if not force_string else str(v)
          for v in str(value).split("+")
      ]
      lists[dim] = items
    else:
      slices.setdefault(dim, {})[kind] = (
          str(value) if force_string and kind != "step" else value
      )
  out = {}
  for dim, parts in slices.items():
    out[dim] = slice(
        parts.get("start"), parts.get("stop"),
        int(parts["step"]) if "step" in parts else None,
    )
  out.update(lists)
  return out


def main(argv):
  ds = xds.open_zarr(INPUT_PATH.value, lazy=True)

  # run every selection on a coords-only skeleton carrying per-dim
  # position arrays; the data variables are never touched here
  skel = xds.Dataset(
      {f"__pos_{d}": xds.Variable((d,), np.arange(n, dtype=np.int64))
       for d, n in ds.sizes.items()},
      coords=dict(ds.coords_dict()),
  )

  # reference semantics (slice_dataset.py:_maybe_make_some_dims_increasing):
  # reversals apply BEFORE any selection; non-monotonic dims are an error
  for dim in MAKE_DIMS_INCREASING.value or []:
    x = np.asarray(skel[dim].values)
    increasing = np.diff(x) > 0
    if increasing.all():
      pass
    elif (~increasing).all():
      skel = skel.isel({dim: slice(None, None, -1)})
    else:
      raise ValueError(
          f"Cannot make non-monotonic dimension {dim} increasing"
      )

  sel = parse_selection_grammar(SEL.value)
  sel.update(parse_selection_grammar(SEL_STRINGS.value, force_string=True))
  if sel:
    skel = skel.sel(sel)

  isel = parse_selection_grammar(ISEL.value)
  if isel:
    skel = skel.isel(isel)

  drop_sel = parse_selection_grammar(DROP_SEL.value)
  drop_sel.update(
      parse_selection_grammar(DROP_SEL_STRINGS.value, force_string=True)
  )
  if drop_sel:
    skel = skel.drop_sel(drop_sel)

  drop_isel = parse_selection_grammar(DROP_ISEL.value)
  if drop_isel:
    skel = skel.drop_isel(drop_isel)

  pos = {
      d: np.asarray(skel[f"__pos_{d}"].values, dtype=np.int64)
      for d in ds.sizes
  }

  names = list(ds.keys())
  if KEEP_VARIABLES.value is not None:
    names = [n for n in names if n in set(KEEP_VARIABLES.value)]
  if DROP_VARIABLES.value:
    names = [n for n in names if n not in set(DROP_VARIABLES.value)]

  out_sizes = {d: len(p) for d, p in pos.items()}
  src_vars = ds.variables_dict()
  template = xds.Dataset(
      {
          n: xds.stub_variable(
              src_vars[n].dims, out_sizes, src_vars[n].dtype,
              src_vars[n].attrs,
          )
          for n in names
      },
      coords={
          k: v for k, v in skel.coords_dict().items()
      },
      attrs=ds.attrs,
  )

  # stream over the largest output dim
  stream_chunks = {}
  if out_sizes:
    big = max(out_sizes, key=lambda d: out_sizes[d])
    tmp = xds.Dataset(
        {n: template.variables_dict()[n] for n in names}, coords={}
    )
    stream_chunks[big] = xds.stream.default_block(tmp, big)

  writer = xds.RegionWriter(
      OUTPUT_PATH.value, template, chunks=dict(OUTPUT_CHUNKS.value) or None,
      stream_chunks=stream_chunks,
  )
  for window in xds.iter_windows(out_sizes, stream_chunks):
    for n in names:
      var = src_vars[n]
      keys = [
          pos[d][window.get(d, slice(None))] for d in var.dims
      ]
      data = xds.orthogonal_select(var.data, keys)
      writer.write_array(
          n, tuple(window.get(d, slice(None)) for d in var.dims), data
      )
  writer.finish()


if __name__ == "__main__":
  app.run(main)
