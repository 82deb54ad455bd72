"""Streaming transform harness: chunk windows + zarr template region writes.

This is the shared scaffolding that lets every pipeline CLI process
terabyte-scale zarr stores with bounded host memory, replacing the
reference's Beam ``DatasetToChunks -> transform -> ChunksToZarr`` pattern
(e.g. /root/reference/scripts/resample_in_time.py:312-451,
/root/reference/scripts/compute_derived_variables.py:245-308):

  * ``iter_windows`` enumerates per-dimension slice windows (the analogue
    of xarray-beam chunk keys);
  * ``template_dataset`` builds an output template whose data variables
    are shape/dtype stubs only — no full-size allocation — suitable for
    ``create_zarr_template`` (NaN-filled, idempotent region writes);
  * ``RegionWriter`` creates the template store and writes computed
    pieces region-wise with a bounded number of in-flight tensorstore
    futures, so peak RSS is set by the chunk budget, not the dataset.

Inputs are expected to be opened with ``open_zarr(path, lazy=True)`` so
only the bytes of the window being processed are ever read.
"""
from __future__ import annotations

import collections
import os
from typing import Any, Callable, Iterator, Mapping, Optional, Sequence

import numpy as np

from . import core
from . import io_zarr


_DEVICE_OK: Optional[bool] = None


def use_device() -> bool:
  """Whether streaming-transform CLIs should run blocks on the accelerator.

  The transform kernels (regrid matmuls, zonal rFFT, quantile sorts)
  dispatch on payload type; lazy zarr windows materialize as numpy, so
  without an explicit ``device_put`` the CLIs compute on host — the
  reference's own regrid kernel is jit-compiled JAX wherever it runs
  (/root/reference/weatherbench2/regridding.py:35-36,505-536).  Default
  ON whenever a jax backend is importable; ``WB2_NO_DEVICE=1`` forces
  the host path (the fallback for machines without an accelerator where
  even CPU-jax dispatch overhead is unwanted).
  """
  global _DEVICE_OK
  if os.environ.get("WB2_NO_DEVICE", "0") == "1":
    return False
  if _DEVICE_OK is None:
    try:
      import jax

      jax.devices()
      _DEVICE_OK = True
    except Exception:  # pragma: no cover - jax/backend unavailable
      _DEVICE_OK = False
  return _DEVICE_OK


def normalize_stream_coords(obj, dims):
  """Replace coord values that depend on streamed dims with placeholders.

  jit cache keys include coordinate VALUES (xds/tree.py: _StaticCoords is
  static aux), so streamed blocks carrying distinct time/latitude labels
  would retrace — and recompile — the transform program on EVERY block;
  over a remote accelerator each recompile is a full round-trip.  No
  transform kernel's math depends on the streamed dim's labels, so equal-
  shaped blocks can share ONE compiled trace: the streamed index coord
  becomes an arange placeholder and other label coords along it are
  dropped.  Output region writes are positional (RegionWriter.write), so
  real labels always come from the output template, never from the
  computed piece.  (Same trick as the evaluation engine's
  _normalize_chunk_coords, weatherbench2_tpu/parallel/streaming.py.)
  """
  dims = {dims} if isinstance(dims, str) else set(dims)
  if isinstance(obj, core.DataArray):
    ds = obj.to_dataset(name=obj.name or "__da__")
    out = normalize_stream_coords(ds, dims)
    return out[obj.name or "__da__"]
  coords = {}
  for name, cv in obj.coords_dict().items():
    if set(cv.dims) & dims:
      if name in dims and cv.ndim == 1:
        coords[name] = core.Variable((name,), np.arange(obj.sizes[name]))
    else:
      coords[name] = cv
  return core.Dataset(dict(obj.variables_dict()), coords=coords,
                      attrs=dict(obj.attrs))


def to_device(obj):
  """device_put a Dataset/DataArray's variable payloads (coords stay host).

  Materializes lazy windows in the process: this is the h2d boundary of
  the streaming-transform CLIs.  Dimension coordinates and label logic
  remain host-side — only the bulk field bytes ride to the accelerator.

  With WB2_STREAM_VERBOSE=1 each call logs its bytes and wall in the
  same phase-line format as the evaluation engine, so transform-CLI runs
  record their h2d stream (tools/north_star.py parses these lines).
  """
  import time as _time

  import jax

  t0 = _time.perf_counter()
  nbytes = 0

  def _put(data):
    nonlocal nbytes
    arr = np.asarray(data)
    nbytes += arr.nbytes
    return jax.device_put(arr)

  if isinstance(obj, core.Dataset):
    out = core.Dataset(
        {}, coords=dict(obj.coords_dict()), attrs=dict(obj.attrs)
    )
    for k, v in obj.variables_dict().items():
      out[k] = core.Variable(v.dims, _put(v.data), v.attrs)
  elif isinstance(obj, core.DataArray):
    out = obj.copy(data=_put(obj.data))
  else:
    out = _put(obj)
  if os.environ.get("WB2_STREAM_VERBOSE"):
    ts = _time.strftime("%H:%M:%S")
    # neutral label: these are transform-CLI block bytes, not forecast
    # bytes — the phase parser (tools/north_star.py) reads both forms
    print(
        f"[stream {ts}] block to_device: h2d bytes block={nbytes}",
        flush=True,
    )
    print(
        f"[stream {ts}] block to_device: host prepare + h2d "
        f"[{_time.perf_counter() - t0:.2f}s]",
        flush=True,
    )
  return out


class ShapeStub(core.LazyArrayBase):
  """Shape/dtype-only array payload for output templates.

  Accepted by ``core.Variable`` (it is a LazyArrayBase) but holds no
  bytes; materializing it is an error — templates are metadata only.
  """

  __slots__ = ("shape", "dtype")

  def __init__(self, shape: Sequence[int], dtype):
    self.shape = tuple(int(s) for s in shape)
    self.dtype = np.dtype(dtype)

  @property
  def ndim(self) -> int:
    return len(self.shape)

  @property
  def size(self) -> int:
    return int(np.prod(self.shape)) if self.shape else 1

  def __array__(self, dtype=None):
    raise ValueError(
        "ShapeStub is a template-only payload and holds no data; "
        "write real chunks through RegionWriter instead."
    )

  def __getitem__(self, key):
    raise ValueError("ShapeStub payloads cannot be sliced.")

  def __repr__(self):
    return f"ShapeStub(shape={self.shape}, dtype={self.dtype})"


def stub_variable(dims: Sequence[str], sizes: Mapping[str, int],
                  dtype, attrs=None) -> core.Variable:
  """A template Variable with no allocated data."""
  return core.Variable(
      tuple(dims), ShapeStub([sizes[d] for d in dims], dtype), attrs
  )


def template_dataset(
    probe: core.Dataset,
    full_sizes: Mapping[str, int],
    coords: Optional[Mapping[str, core.Variable]] = None,
) -> core.Dataset:
  """Expand a probe-chunk output to a full-size, allocation-free template.

  ``probe`` is the result of running the transform on one small window.
  Every dim present in ``full_sizes`` is expanded to its full extent;
  other dims keep the probe's size.  ``coords`` supplies full-size
  coordinates for the expanded dims (probe coords are kept for the rest).
  """
  tvars = {}
  for name, v in probe.variables_dict().items():
    sizes = {
        d: int(full_sizes.get(d, v.sizes[d])) for d in v.dims
    }
    tvars[name] = stub_variable(v.dims, sizes, v.dtype, v.attrs)
  out_coords = dict(probe.coords_dict())
  if coords:
    for k, v in coords.items():
      out_coords[k] = v
  # probe coords still probe-sized along an expanded dim are an error:
  # writing the template would bake truncated coordinate values in
  for k in list(out_coords):
    v = out_coords[k]
    for d in v.dims:
      if d in full_sizes and v.sizes[d] != int(full_sizes[d]):
        raise ValueError(
            f"template coord {k!r} has size {v.sizes[d]} along {d!r} but "
            f"the full extent is {full_sizes[d]}; pass a full-size coord."
        )
  return core.Dataset(tvars, coords=out_coords, attrs=dict(probe.attrs))


def iter_windows(
    sizes: Mapping[str, int],
    chunks: Mapping[str, int],
) -> Iterator[dict[str, slice]]:
  """Yield dicts of dim -> slice covering ``sizes`` in C order.

  Dims absent from ``chunks`` (or with chunk -1/None) are not iterated:
  each window spans them fully (and omits them from the dict).
  """
  dims = [
      d for d in chunks
      if d in sizes and chunks[d] not in (-1, None) and chunks[d] < sizes[d]
  ]
  if not dims:
    yield {}
    return
  steps = [int(chunks[d]) for d in dims]
  for d, s in zip(dims, steps):
    if s <= 0:
      raise ValueError(f"chunk size for {d!r} must be positive, got {s}")

  def rec(i: int) -> Iterator[dict[str, slice]]:
    if i == len(dims):
      yield {}
      return
    d, step = dims[i], steps[i]
    for start in range(0, sizes[d], step):
      head = {d: slice(start, min(start + step, sizes[d]))}
      for rest in rec(i + 1):
        yield {**head, **rest}

  yield from rec(0)


class RegionWriter:
  """Create a zarr template and write Dataset pieces into regions.

  Keeps at most ``max_inflight`` tensorstore write futures pending so the
  writer, not the dataset size, bounds memory.  Pieces are transposed to
  the template's dim order and cast to the template dtype.
  """

  def __init__(
      self,
      path: str,
      template: core.Dataset,
      chunks: Optional[Mapping[str, int]] = None,
      max_inflight: int = 8,
      stream_chunks: Optional[Mapping[str, int]] = None,
      compressor="default",
  ):
    """``chunks`` sets the store chunking; when absent, ``stream_chunks``
    (the streaming block sizes) is used so each region write lands on
    chunk boundaries instead of read-modify-writing one whole-array
    chunk."""
    self.path = path
    self.template = template
    self.max_inflight = int(max_inflight)
    self._futures: collections.deque = collections.deque()
    if not chunks:
      chunks = {k: v for k, v in (stream_chunks or {}).items()
                if v not in (-1, None)}
    io_zarr.create_zarr_template(
        template, path, chunks=chunks or None, compressor=compressor
    )
    self._tvars = template.variables_dict()
    self._handles: dict = {}

  def _drain(self, down_to: int) -> None:
    while len(self._futures) > down_to:
      self._futures.popleft().result()

  def _handle(self, name: str):
    """One tensorstore handle per variable for the writer's lifetime —
    re-opening per region write re-reads .zarray metadata (a network
    round-trip per variable per window on remote stores)."""
    h = self._handles.get(name)
    if h is None:
      h = io_zarr.open_zarr_array(self.path, name)
      self._handles[name] = h
    return h

  def write_array(self, name: str, region_key: tuple, data: np.ndarray):
    self._drain(self.max_inflight - 1)
    data, _ = io_zarr._encode_cf(np.asarray(data))
    self._futures.append(
        self._handle(name)[region_key].write(np.ascontiguousarray(data))
    )

  def write(self, piece: core.Dataset, region: Mapping[str, Any]) -> None:
    """Write every data variable of ``piece`` at ``region``.

    ``region`` maps dim name -> slice (in template index space).  Dims of
    a variable not present in ``region`` are written in full.
    """
    for name, v in piece.variables_dict().items():
      tvar = self._tvars.get(name)
      if tvar is None:
        raise KeyError(f"{name!r} is not in the output template")
      if v.dims != tvar.dims:
        v = v.transpose(*tvar.dims)
      key = tuple(region.get(d, slice(None)) for d in tvar.dims)
      data = np.asarray(v.data)
      if data.dtype != tvar.dtype:
        data = data.astype(tvar.dtype)
      self.write_array(name, key, data)

  def finish(self) -> None:
    self._drain(0)


def streaming_transform(
    out_template: core.Dataset,
    out_path: str,
    stream_chunks: Mapping[str, int],
    compute: Callable[[dict[str, slice]], core.Dataset],
    output_chunks: Optional[Mapping[str, int]] = None,
    max_inflight: int = 8,
) -> None:
  """Stream ``compute(window) -> piece`` into a zarr template.

  Windows iterate over the *output* index space (``out_template`` sizes
  restricted to ``stream_chunks``); ``compute`` maps each output window
  to the Dataset piece covering it, reading whatever input it needs.
  """
  writer = RegionWriter(
      out_path, out_template, chunks=output_chunks,
      max_inflight=max_inflight, stream_chunks=stream_chunks,
  )
  for window in iter_windows(out_template.sizes, stream_chunks):
    writer.write(compute(window), window)
  writer.finish()


def orthogonal_select(payload, keys: Sequence[Any]) -> np.ndarray:
  """Outer (per-axis independent) selection on a lazy/numpy payload.

  ``keys`` has one entry per axis: a slice or an integer array.  Integer
  arrays are read via their bounding slice (so a lazy payload only
  touches the bytes spanned by this window) and gathered per axis —
  orthogonal semantics, unlike numpy's broadcasting fancy indexing.
  """
  bound = []
  post = []
  for ax, k in enumerate(keys):
    if isinstance(k, slice):
      bound.append(k)
      continue
    arr = np.asarray(k, dtype=np.int64)
    if arr.size == 0:
      bound.append(slice(0, 0))
      continue
    sl = core._as_slice_if_contiguous(arr)
    if isinstance(sl, slice) and (sl.step or 1) > 0:
      bound.append(sl)
      continue
    lo, hi = int(arr.min()), int(arr.max())
    bound.append(slice(lo, hi + 1))
    post.append((ax, arr - lo))
  data = payload[tuple(bound)]
  data = np.asarray(data)
  for ax, idx in post:
    data = np.take(data, idx, axis=ax)
  return data


def default_block(ds: core.Dataset, dim: str,
                  target_bytes: Optional[int] = None) -> int:
  """Block size along ``dim`` so one block reads ~``target_bytes``.

  Sums the per-step bytes of every data variable carrying ``dim`` (other
  dims at full extent) — the adaptive analogue of the reference's
  per-resolution --input_chunks recommendations
  (/root/reference/docs/source/official-evaluation.md:19,281,546).
  Default target: 256 MB host / 1 GB device (each device block is one
  compiled program execution, and a remote accelerator pays a fixed
  round-trip per execution — bigger blocks amortize it), overridable
  via WB2_BLOCK_BYTES (e.g. smaller on memory-constrained hosts).
  """
  if target_bytes is None:
    default = 2 ** 30 if use_device() else 2 ** 28
    target_bytes = int(float(os.environ.get("WB2_BLOCK_BYTES", default)))
  per_step = 0
  for v in ds.variables_dict().values():
    if dim in v.dims:
      itemsize = np.dtype(v.dtype).itemsize
      per_step += itemsize * v.size // max(1, v.sizes[dim])
  if per_step <= 0:
    return int(ds.sizes.get(dim, 1))
  return max(1, int(target_bytes // per_step))


def clustered_positions(positions: np.ndarray,
                        max_gap: int = 16) -> list[slice]:
  """Group sorted unique positions into contiguous-ish read slices.

  Returns slices covering all positions, starting a new slice whenever
  the gap between consecutive positions exceeds ``max_gap`` — so a
  scattered gather over a huge axis (e.g. climatological samples across
  60 years) turns into a few bounded reads instead of one bounding-box
  read of the entire axis.
  """
  pos = np.unique(np.asarray(positions, dtype=np.int64))
  if pos.size == 0:
    return []
  breaks = np.nonzero(np.diff(pos) > max_gap)[0]
  starts = np.concatenate([[0], breaks + 1])
  ends = np.concatenate([breaks, [pos.size - 1]])
  return [slice(int(pos[a]), int(pos[b]) + 1) for a, b in zip(starts, ends)]
