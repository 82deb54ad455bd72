r"""CLI to slice a Zarr dataset (sel/isel/drop_sel/drop_isel/variables).

Flag grammar parity with the reference scripts/slice_dataset.py:
``--sel=DIM_start=...,DIM_stop=...,DIM_step=...,DIM_list=a+b+c``.
"""
import re

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
  ds = xds.open_zarr(INPUT_PATH.value)

  sel = parse_selection_grammar(SEL.value)
  sel.update(parse_selection_grammar(SEL_STRINGS.value, force_string=True))
  if sel:
    ds = ds.sel(sel)

  isel = parse_selection_grammar(ISEL.value)
  if isel:
    ds = ds.isel(isel)

  drop_sel = parse_selection_grammar(DROP_SEL.value)
  drop_sel.update(
      parse_selection_grammar(DROP_SEL_STRINGS.value, force_string=True)
  )
  if drop_sel:
    ds = ds.drop_sel(drop_sel)

  drop_isel = parse_selection_grammar(DROP_ISEL.value)
  if drop_isel:
    ds = ds.drop_isel(drop_isel)

  if KEEP_VARIABLES.value is not None:
    ds = ds[list(KEEP_VARIABLES.value)]
  if DROP_VARIABLES.value:
    ds = ds.drop_vars(list(DROP_VARIABLES.value), errors="ignore")

  xds.to_zarr(ds, OUTPUT_PATH.value, chunks=dict(OUTPUT_CHUNKS.value))


if __name__ == "__main__":
  app.run(main)
