"""Fused multi-region weighted reduction kernels (Pallas TPU).

The verification hot loop is `error-stat → ×(area weights × region mask) →
spatial sum` for every metric × region (reference metrics.py:141-163 via the
Beam map; SURVEY §6 north star).  Computed naively, each metric × region
re-reads the forecast/truth chunk from HBM.  This kernel reads each chunk
ONCE per grid tile into VMEM, computes all error statistics in registers,
and reduces them against a (region, cell) weight matrix on the MXU:

    sums[s, r, b] = Σ_l stat_s[b, l] · W[r, l]

with W = area_weights × region_mask folded host-side — one matmul per stat
while the tile is resident.  NaN handling supports both reference semantics:
``skipna=False`` (NaN inside a region poisons that region's result, NaN
outside is ignored — the reference's ``where(weights > 0, 0)`` guard) and
``skipna=True`` (valid-weighted means).

Statistics (per batch row b and region r), with a = f - clim, c = t - clim:
    0: sum w·(f-t)        (bias)
    1: sum w·(f-t)²       (mse)
    2: sum w·|f-t|        (mae)
    3: sum w·a·c          (ACC numerator)
    4: sum w·a²           (ACC denominator, forecast)
    5: sum w·c²           (ACC denominator, truth)
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Sequence

import numpy as np

STAT_NAMES = ("bias", "mse", "mae", "acc_num", "acc_fvar", "acc_tvar")
N_STATS = len(STAT_NAMES)

_LANE = 128
_SUBLANE = 8


def _round_up(x: int, m: int) -> int:
  return -(-x // m) * m


def _halve_tile(tile: int) -> int:
  """Largest lane-aligned tile <= tile/2.

  Mosaic requires the last two block dims be multiples of (8, 128); a
  plain ``//= 2`` on a non-power-of-two tile (e.g. 1152 -> 576) breaks
  lane alignment and fails lowering on small odd grids.
  """
  return max(_LANE, (tile // 2) // _LANE * _LANE)


def _select_tiles(rows, cols, row_tile, col_tile, budget):
  """Lane-aligned (row_tile, col_tile) within the VMEM element budget.

  Both returned tiles are multiples of 128 (Mosaic block alignment for
  the row axis too: it is the LAST dim of the output blocks).  The
  column tile shrinks first — row tiles amortize the weight-matrix
  loads."""
  row_tile = max(_LANE, _round_up(min(row_tile, rows), _LANE))
  col_tile = min(col_tile, _round_up(cols, _LANE))
  while row_tile * col_tile > budget and col_tile > _LANE:
    col_tile = _halve_tile(col_tile)
  while row_tile * col_tile > budget and row_tile > _LANE:
    row_tile = _halve_tile(row_tile)
  return row_tile, col_tile


def make_region_weight_matrix(
    lat_weights: np.ndarray,
    region_masks: Sequence[np.ndarray],
    n_lon: int,
) -> np.ndarray:
  """(R, n_lon*n_lat) matrix of area weights × region masks.

  Args:
    lat_weights: (n_lat,) normalized cell-area weights.
    region_masks: list of (n_lat, n_lon) multiplicative masks.
    n_lon: number of longitudes.
  """
  rows = []
  for mask in region_masks:
    w = lat_weights[None, :] * np.asarray(mask).T  # (n_lon, n_lat)
    rows.append(w.ravel())
  return np.asarray(rows, dtype=np.float32)


def _compute_stats(f, t, clim, xp):
  diff = f - t
  a = f - clim
  c = t - clim
  return (
      diff,
      diff * diff,
      xp.abs(diff),
      a * c,
      a * a,
      c * c,
  )


def _true_f32_matmul(a, b, xp=np):
  """a @ b in true float32.

  The TPU MXU decomposes a default-precision f32×f32 matmul into bfloat16
  passes (~1e-3 relative error — measured 6.4e-4 drift on Brier scores vs
  the per-region weighted means); region weight reductions must match the
  reference's float32 numerics, so force HIGHEST precision on device.
  """
  if xp is np:
    return a @ b
  import jax

  return xp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def fused_deterministic_sums_reference(
    forecast: np.ndarray,
    truth: np.ndarray,
    clim: np.ndarray,
    region_w: np.ndarray,
    xp=np,
):
  """XLA/numpy reference of the fused kernel (also the CPU fallback).

  Args:
    forecast, truth, clim: (B, L) arrays.
    region_w: (R, L) weight matrix.

  Returns:
    sums: (N_STATS, R, B); wsum_valid: (R, B); nan_w: (R, B).
  """
  nan_mask = xp.isnan(forecast) | xp.isnan(truth) | xp.isnan(clim)
  valid = (~nan_mask).astype(forecast.dtype)
  f0 = xp.where(nan_mask, 0.0, forecast)
  t0 = xp.where(nan_mask, 0.0, truth)
  c0 = xp.where(nan_mask, 0.0, clim)
  stats = _compute_stats(f0, t0, c0, xp)
  mm = functools.partial(_true_f32_matmul, xp=xp)
  sums = xp.stack([mm(s, region_w.T) for s in stats]).transpose(0, 2, 1)
  wsum_valid = mm(valid, region_w.T).T
  nan_w = mm(
      nan_mask.astype(forecast.dtype),
      (region_w > 0).astype(forecast.dtype).T,
  ).T
  return sums, wsum_valid, nan_w


def _fused_kernel(l_real, l_tile, f_ref, t_ref, c_ref, w_ref, wpos_ref,
                  sums_ref, wsum_ref, nanw_ref):
  """Pallas kernel body: one (batch-tile, cell-tile) step.

  Grid is (n_batch_tiles, n_cell_tiles); the cell axis is accumulated into
  the outputs (output blocks are indexed by the batch tile only).

  Blocks need not divide the array: inputs are NOT padded in HBM (a copy
  of three chunk-sized arrays would double the kernel's memory traffic).
  Mosaic fills out-of-range block regions with undefined values, so every
  load is masked against the real column count here in VMEM, and writes to
  out-of-range output rows/columns are dropped by the hardware.
  """
  import jax
  import jax.numpy as jnp
  from jax.experimental import pallas as pl

  j = pl.program_id(1)
  col_ok = (
      jax.lax.broadcasted_iota(jnp.int32, (1, l_tile), 1) + j * l_tile
      < l_real
  )

  f = f_ref[:]
  t = t_ref[:]
  c = c_ref[:]
  nan_mask = (jnp.isnan(f) | jnp.isnan(t) | jnp.isnan(c)) & col_ok
  good = (~jnp.isnan(f)) & (~jnp.isnan(t)) & (~jnp.isnan(c)) & col_ok
  valid = good.astype(jnp.float32)
  f = jnp.where(good, f, 0.0)
  t = jnp.where(good, t, 0.0)
  c = jnp.where(good, c, 0.0)

  w_t = jnp.where(col_ok, w_ref[:], 0.0).T  # (lT, R)
  wpos_t = jnp.where(col_ok, wpos_ref[:], 0.0).T  # (lT, R)

  diff = f - t
  a = f - c
  cc = t - c
  stats = (diff, diff * diff, jnp.abs(diff), a * cc, a * a, cc * cc)

  @pl.when(j == 0)
  def _():
    sums_ref[:] = jnp.zeros_like(sums_ref)
    wsum_ref[:] = jnp.zeros_like(wsum_ref)
    nanw_ref[:] = jnp.zeros_like(nanw_ref)

  # HIGHEST precision: default f32 dots run as bfloat16 MXU passes
  # (~1e-3 relative error), which breaks reference-parity numerics.
  hi = jax.lax.Precision.HIGHEST
  for s, stat in enumerate(stats):
    part = jnp.dot(
        stat, w_t, preferred_element_type=jnp.float32, precision=hi
    )  # (bT, R)
    sums_ref[s, :, :] += part.T
  wsum_ref[:, :] += jnp.dot(
      valid, w_t, preferred_element_type=jnp.float32, precision=hi
  ).T
  nanw_ref[:, :] += jnp.dot(
      nan_mask.astype(jnp.float32), wpos_t,
      preferred_element_type=jnp.float32, precision=hi,
  ).T


def _check_block_alignment(**tiles):
  """Fail fast on Mosaic's (8, 128) block-dim rule.

  Interpret-mode tests do not enforce Mosaic's alignment constraints,
  so a misaligned tile schedule would only surface on real TPUs (it
  did once: a //=2 shrink produced a 576-wide tile); this static check
  makes the contract visible on every backend."""
  for name, (tile, multiple) in tiles.items():
    if tile % multiple:
      raise ValueError(
          f"{name}={tile} must be a multiple of {multiple} "
          "(Mosaic block alignment)"
      )


@functools.lru_cache(maxsize=32)
def _build_pallas_call(b, l, r, r_pad, b_tile, l_tile, interpret):
  import jax
  import jax.numpy as jnp
  from jax.experimental import pallas as pl

  _check_block_alignment(
      b_tile=(b_tile, _LANE), l_tile=(l_tile, _LANE),
      r_pad=(r_pad, _SUBLANE),
  )

  try:
    from jax.experimental.pallas import tpu as pltpu

    vmem = pltpu.VMEM
  except ImportError:  # pragma: no cover
    vmem = None

  def spec(shape, index_map):
    kwargs = {}
    if vmem is not None and not interpret:
      kwargs["memory_space"] = vmem
    return pl.BlockSpec(shape, index_map, **kwargs)

  grid = (-(-b // b_tile), -(-l // l_tile))
  return pl.pallas_call(
      functools.partial(_fused_kernel, l, l_tile),
      grid=grid,
      in_specs=[
          spec((b_tile, l_tile), lambda i, j: (i, j)),  # forecast
          spec((b_tile, l_tile), lambda i, j: (i, j)),  # truth
          spec((b_tile, l_tile), lambda i, j: (i, j)),  # clim
          spec((r_pad, l_tile), lambda i, j: (0, j)),  # region weights
          spec((r_pad, l_tile), lambda i, j: (0, j)),  # region >0 masks
      ],
      out_specs=[
          spec((N_STATS, r_pad, b_tile), lambda i, j: (0, 0, i)),
          spec((r_pad, b_tile), lambda i, j: (0, i)),
          spec((r_pad, b_tile), lambda i, j: (0, i)),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((N_STATS, r, b), jnp.float32),
          jax.ShapeDtypeStruct((r, b), jnp.float32),
          jax.ShapeDtypeStruct((r, b), jnp.float32),
      ],
      interpret=bool(interpret),
  )


def fused_deterministic_sums(
    forecast,
    truth,
    clim=None,
    region_w: np.ndarray = None,
    b_tile: int = 128,
    l_tile: int = 2048,
    interpret: Optional[bool] = None,
):
  """Fused multi-region weighted sums on TPU (Pallas).

  Args:
    forecast, truth: (B, L) float32 arrays (batch rows × flattened grid).
    clim: optional (B, L) climatology (zeros if None; ACC stats then
      degenerate to raw products).
    region_w: (R, L) float32 region-weight matrix.
    b_tile, l_tile: VMEM tile sizes (batch × cells).
    interpret: force interpreter mode (default: auto — True off-TPU).

  Returns:
    sums (N_STATS, R, B), wsum_valid (R, B), nan_w (R, B).
  """
  import jax
  import jax.numpy as jnp

  if region_w is None:
    raise ValueError("region_w is required (build it with "
                     "make_region_weight_matrix)")
  if interpret is None:
    interpret = jax.default_backend() != "tpu"

  forecast = jnp.asarray(forecast, jnp.float32)
  truth = jnp.asarray(truth, jnp.float32)
  if clim is None:
    clim = jnp.zeros_like(forecast)
  else:
    clim = jnp.asarray(clim, jnp.float32)

  b, l = forecast.shape
  r = region_w.shape[0]
  # Mosaic requires the last two dims of every BLOCK be (8k, 128m)-aligned;
  # the batch axis is the LAST dim of the output blocks, so tile it in
  # multiples of 128.  The arrays themselves stay unpadded: edge blocks are
  # masked inside the kernel (columns) or clipped on write (rows/batch),
  # avoiding a full HBM copy of three chunk-sized inputs.
  # VMEM guard: three double-buffered input blocks plus the
  # HIGHEST-precision dot scratch for six stat matmuls must fit in the
  # 16 MB of VMEM.  128x2048 was fastest at default precision but the
  # true-f32 passes overflow scoped vmem at r_pad=16 (measured: 17.8 MB
  # at the official 13-region 240x121 shape), so the budget is one tile
  # step smaller; 128x1024 measured 1.04 ms vs 0.89 ms at bench geometry.
  # WB2_PALLAS_TILE_BUDGET overrides (tools/sweep_tiles.py explores it).
  tile_budget = int(os.environ.get("WB2_PALLAS_TILE_BUDGET", 131072))
  b_tile, l_tile = _select_tiles(b, l, b_tile, l_tile, tile_budget)
  r_pad = _round_up(r, _SUBLANE)

  w = jnp.asarray(region_w, jnp.float32)
  wpos = (w > 0).astype(jnp.float32)

  call = _build_pallas_call(
      int(b), int(l), int(r), int(r_pad), int(b_tile), int(l_tile),
      bool(interpret),
  )
  return call(forecast, truth, clim, w, wpos)


def fused_region_sums_reference(x, region_w, xp=np):
  """XLA/numpy reference of `fused_region_sums`.

  Args:
    x: (N, L) rows of pointwise statistics (NaNs allowed).
    region_w: (R, L) region-weight matrix.

  Returns:
    sums (R, N), wsum_valid (R, N), nan_w (R, N) — per-row weighted sums
    with each row's own NaN accounting.
  """
  nan_mask = xp.isnan(x)
  valid = (~nan_mask).astype(x.dtype)
  x0 = xp.where(nan_mask, 0.0, x)
  mm = functools.partial(_true_f32_matmul, xp=xp)
  sums = mm(x0, region_w.T).T
  wsum = mm(valid, region_w.T).T
  nanw = mm(nan_mask.astype(x.dtype), (region_w > 0).astype(x.dtype).T).T
  return sums, wsum, nanw


def _region_sums_kernel(l_real, l_tile, x_ref, w_ref, wpos_ref,
                        sums_ref, wsum_ref, nanw_ref):
  """Pallas body: one (row-tile, cell-tile) step of the generic reduction.

  Same masking scheme as `_fused_kernel` (unpadded inputs; out-of-range
  columns masked in VMEM, out-of-range rows clipped on write)."""
  import jax
  import jax.numpy as jnp
  from jax.experimental import pallas as pl

  j = pl.program_id(1)
  col_ok = (
      jax.lax.broadcasted_iota(jnp.int32, (1, l_tile), 1) + j * l_tile
      < l_real
  )
  x = x_ref[:]
  nan_mask = jnp.isnan(x) & col_ok
  good = (~jnp.isnan(x)) & col_ok
  x = jnp.where(good, x, 0.0)
  w_t = jnp.where(col_ok, w_ref[:], 0.0).T  # (lT, R)
  wpos_t = jnp.where(col_ok, wpos_ref[:], 0.0).T

  @pl.when(j == 0)
  def _():
    sums_ref[:] = jnp.zeros_like(sums_ref)
    wsum_ref[:] = jnp.zeros_like(wsum_ref)
    nanw_ref[:] = jnp.zeros_like(nanw_ref)

  hi = jax.lax.Precision.HIGHEST  # true-f32 dots (see _fused_kernel)
  sums_ref[:, :] += jnp.dot(
      x, w_t, preferred_element_type=jnp.float32, precision=hi
  ).T
  wsum_ref[:, :] += jnp.dot(
      good.astype(jnp.float32), w_t, preferred_element_type=jnp.float32,
      precision=hi,
  ).T
  nanw_ref[:, :] += jnp.dot(
      nan_mask.astype(jnp.float32), wpos_t,
      preferred_element_type=jnp.float32, precision=hi,
  ).T


@functools.lru_cache(maxsize=32)
def _build_region_sums_call(n, l, r, r_pad, n_tile, l_tile, interpret):
  import jax
  import jax.numpy as jnp

  _check_block_alignment(
      n_tile=(n_tile, _LANE), l_tile=(l_tile, _LANE),
      r_pad=(r_pad, _SUBLANE),
  )
  from jax.experimental import pallas as pl

  try:
    from jax.experimental.pallas import tpu as pltpu

    vmem = pltpu.VMEM
  except ImportError:  # pragma: no cover
    vmem = None

  def spec(shape, index_map):
    kwargs = {}
    if vmem is not None and not interpret:
      kwargs["memory_space"] = vmem
    return pl.BlockSpec(shape, index_map, **kwargs)

  grid = (-(-n // n_tile), -(-l // l_tile))
  return pl.pallas_call(
      functools.partial(_region_sums_kernel, l, l_tile),
      grid=grid,
      in_specs=[
          spec((n_tile, l_tile), lambda i, j: (i, j)),  # x rows
          spec((r_pad, l_tile), lambda i, j: (0, j)),  # region weights
          spec((r_pad, l_tile), lambda i, j: (0, j)),  # region >0 masks
      ],
      out_specs=[
          spec((r_pad, n_tile), lambda i, j: (0, i)),
          spec((r_pad, n_tile), lambda i, j: (0, i)),
          spec((r_pad, n_tile), lambda i, j: (0, i)),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((r, n), jnp.float32),
          jax.ShapeDtypeStruct((r, n), jnp.float32),
          jax.ShapeDtypeStruct((r, n), jnp.float32),
      ],
      interpret=bool(interpret),
  )


def fused_region_sums(
    x,
    region_w: np.ndarray = None,
    n_tile: int = 128,
    l_tile: int = 2048,
    interpret: Optional[bool] = None,
):
  """Generic fused multi-region weighted reduction on TPU (Pallas).

  One HBM pass over ``x`` (rows of pointwise statistics) computing every
  region's weighted sum, valid-weight sum, and NaN-hit weight — the
  region epilogue shared by the probabilistic metric suite.

  Args:
    x: (N, L) float32 rows (e.g. K stats × B batch flattened together).
    region_w: (R, L) float32 region-weight matrix.

  Returns:
    sums (R, N), wsum_valid (R, N), nan_w (R, N).
  """
  import jax
  import jax.numpy as jnp

  if region_w is None:
    raise ValueError("region_w is required (build it with "
                     "make_region_weight_matrix)")
  if interpret is None:
    interpret = jax.default_backend() != "tpu"
  x = jnp.asarray(x, jnp.float32)
  n, l = x.shape
  r = region_w.shape[0]
  # env-tunable schedule (tools/sweep_tiles.py region_sums sweep): this
  # kernel's VMEM holds ONE input block (vs three for the deterministic
  # kernel), so its budget default is the larger of the two
  env_tiles = os.environ.get("WB2_REGION_TILES")
  if env_tiles:
    n_tile, l_tile = (int(v) for v in env_tiles.split(","))
  budget = int(os.environ.get("WB2_REGION_TILE_BUDGET", 262144))
  n_tile, l_tile = _select_tiles(n, l, n_tile, l_tile, budget)
  r_pad = _round_up(r, _SUBLANE)
  w = jnp.asarray(region_w, jnp.float32)
  wpos = (w > 0).astype(jnp.float32)
  call = _build_region_sums_call(
      int(n), int(l), int(r), int(r_pad), int(n_tile), int(l_tile),
      bool(interpret),
  )
  return call(x, w, wpos)


def fused_deterministic_metrics(
    forecast,
    truth,
    clim=None,
    region_w: np.ndarray = None,
    skipna: bool = False,
    use_pallas: bool = True,
):
  """Latitude-weighted bias/mse/mae/acc per (region, batch row), fused.

  Returns a dict of (R, B) arrays: bias, mse, mae (plus rmse) and, when
  `clim` is given, acc.  Matches metrics._spatial_average semantics for
  masked regions under both skipna modes.
  """
  import jax.numpy as jnp

  if region_w is None:
    raise ValueError("region_w is required (build it with "
                     "make_region_weight_matrix)")
  if use_pallas:
    sums, wsum, nanw = fused_deterministic_sums(
        forecast, truth, clim, region_w
    )
  else:
    sums, wsum, nanw = fused_deterministic_sums_reference(
        jnp.asarray(forecast, jnp.float32),
        jnp.asarray(truth, jnp.float32),
        jnp.zeros_like(jnp.asarray(forecast, jnp.float32))
        if clim is None
        else jnp.asarray(clim, jnp.float32),
        jnp.asarray(region_w, jnp.float32),
        xp=jnp,
    )
  means = sums / wsum[None, :, :]
  if not skipna:
    means = jnp.where(nanw[None] > 0, jnp.nan, means)
  out = {
      "bias": means[0],
      "mse": means[1],
      "mae": means[2],
      "rmse": jnp.sqrt(means[1]),
  }
  if clim is not None:
    out["acc"] = means[3] / jnp.sqrt(means[4] * means[5])
  return out
