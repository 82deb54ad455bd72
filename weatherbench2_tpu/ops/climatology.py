"""Device (TPU) kernels for climatology statistics.

The reference computes rolling day-of-year climatologies by stacking years
and applying an xarray rolling window per spatial pencil inside Beam
workers (reference utils.py:88-166, compute_climatology.py).  On TPU the
weighted circular window over day-of-year is a CIRCULANT MATMUL: with
M[d, e] = wrap-window weight of source day e for target day d,

    mean[d, ...] = Σ_y Σ_e M[d, e] · x[y, e, ...] / Σ_y Σ_e M[d, e] · valid

— one (366 × 366) × (366 × pixels) matmul per year batch on the MXU, with
NaN masks folded into the denominator.  Std uses the two-pass form on
coarse-centered data for f32 accuracy; quantiles run as windowed gathers +
one device sort per pencil.
"""
from __future__ import annotations

import numpy as np


def circulant_window_matrix(
    window_weights: np.ndarray, n_days: int = 366
) -> np.ndarray:
  """(n_days, n_days) circulant matrix of wrapped window weights."""
  w = np.asarray(window_weights, dtype=np.float32)
  window = len(w)
  half = window // 2
  m = np.zeros((n_days, n_days), dtype=np.float32)
  for k in range(window):
    offset = k - half
    idx = (np.arange(n_days) + offset) % n_days
    m[np.arange(n_days), idx] += w[k]
  return m


def device_rolling_clim(
    values,
    window_weights: np.ndarray,
    stat: str = "mean",
):
  """Weighted circular-window climatology on device.

  Args:
    values: (years, n_days, *pixels) array (NaN = missing, e.g. day 366 of
      non-leap years — matching the host path after its fillna handling,
      any remaining NaNs are excluded via the weight mask).
    window_weights: (window,) triangular weights.
    stat: 'mean' or 'std'.

  Returns:
    (n_days, *pixels) jax array.
  """
  import jax.numpy as jnp

  x = jnp.asarray(values, jnp.float32)
  n_years, n_days = x.shape[0], x.shape[1]
  pixel_shape = x.shape[2:]
  m = jnp.asarray(circulant_window_matrix(window_weights, n_days))

  flat = x.reshape(n_years, n_days, -1)
  nan_mask = jnp.isnan(flat)
  valid = (~nan_mask).astype(jnp.float32)
  x0 = jnp.where(nan_mask, 0.0, flat)

  # coarse center for f32 accuracy of the variance
  center = (x0.sum(axis=(0, 1)) / jnp.maximum(valid.sum(axis=(0, 1)), 1.0))
  xc = jnp.where(nan_mask, 0.0, flat - center)

  # numerator/denominator via circulant matmuls, summed over years
  num = jnp.einsum("de,yep->dp", m, xc, precision="highest")
  den = jnp.einsum("de,yep->dp", m, valid, precision="highest")
  mean_c = num / den
  if stat == "mean":
    out = mean_c + center
  elif stat == "std":
    sq = jnp.einsum("de,yep->dp", m, xc * xc, precision="highest")
    var = sq / den - mean_c * mean_c
    out = jnp.sqrt(jnp.maximum(var, 0.0))
  else:
    raise NotImplementedError(stat)
  return out.reshape((n_days,) + pixel_shape)


def device_window_quantile(
    values,
    window_size: int,
    quantiles,
    window_weights: np.ndarray = None,
):
  """Weighted interpolated quantiles over the wrapped (window, year) pool.

  Matches utils.weighted_quantile semantics (positions
  p_k = (cumw_k - w_k/2) / W over sorted values) with triangular window
  weights; runs as a windowed gather + one sort per (day, pixel) pencil.

  Args:
    values: (years, n_days, *pixels).
    window_size: circular window width in days.
    quantiles: sequence of quantiles in [0, 1].
    window_weights: optional (window,) weights (default triangular).

  Returns:
    (len(quantiles), n_days, *pixels) jax array.
  """
  import os

  import jax
  import jax.numpy as jnp

  x = jnp.asarray(values, jnp.float32)
  n_years, n_days = x.shape[0], x.shape[1]
  pixel_shape = x.shape[2:]
  q = jnp.asarray(np.atleast_1d(quantiles), jnp.float32)
  n_q = len(np.atleast_1d(quantiles))

  half = window_size // 2
  idx = (
      np.arange(n_days)[:, None] + np.arange(-half, window_size - half)
  ) % n_days  # (n_days, window)

  if window_weights is None:
    from weatherbench2_tpu.utils import create_window_weights

    window_weights = create_window_weights(window_size).values
  w_win = jnp.asarray(np.asarray(window_weights), jnp.float32)

  flat = x.reshape(n_years, n_days, -1)
  npix = flat.shape[-1]
  n_pool = n_years * window_size

  # The (day, year×window, pixel) gather pool plus its sort temporaries
  # is ~6 arrays of n_days × n_pool × npix f32 — 90+ GB at the official
  # 30-year geometry, far beyond HBM (observed compile-time OOM at
  # 240×121).  Day-blocks under lax.map bound peak memory to the block;
  # every shape stays static.
  budget = int(os.environ.get("WB2_CLIM_QUANTILE_BYTES", 2 << 30))
  per_day = max(1, npix * n_pool * 4 * 6)
  day_block = int(np.clip(budget // per_day, 1, n_days))
  n_blocks = -(-n_days // day_block)
  pad = n_blocks * day_block - n_days
  idx_pad = np.concatenate([idx, idx[:pad]], axis=0) if pad else idx
  idx_blocks = jnp.asarray(
      idx_pad.reshape(n_blocks, day_block, window_size), jnp.int32
  )

  def one_block(idx_blk):
    # (years, B, window, pixels)
    pool = flat[:, idx_blk, :]
    nan_mask = jnp.isnan(pool)
    w = jnp.broadcast_to(w_win[None, None, :, None], pool.shape)
    w = jnp.where(nan_mask, 0.0, w)

    # pool axis = (years × window): move to last, sort once.  Zero-weight
    # entries (NaNs and window-edge zero weights) sort to the end via an
    # infinite key and are excluded as interpolation anchors, matching
    # utils.weighted_quantile which drops them outright.
    vals = jnp.moveaxis(pool, (0, 2), (2, 3)).reshape(
        day_block, npix, -1
    )
    wb = jnp.moveaxis(w, (0, 2), (2, 3)).reshape(day_block, npix, -1)
    key = jnp.where(wb > 0, vals, jnp.inf)
    order = jnp.argsort(key, axis=-1)
    v_sorted = jnp.take_along_axis(vals, order, axis=-1)
    w_sorted = jnp.take_along_axis(wb, order, axis=-1)
    cumw = jnp.cumsum(w_sorted, axis=-1)
    total = cumw[..., -1:]
    positions = (cumw - 0.5 * w_sorted) / total
    n_valid = (w_sorted > 0).sum(axis=-1)  # (B, pixels)

    # vectorized interp of q over (positions, v_sorted) per pencil
    # idx_hi = first k with positions[k] >= q, clamped to valid entries
    ge = (positions[..., None, :] >= q[:, None]).astype(jnp.int32)
    # shape: (B, pixels, Q, pool)
    idx_hi = jnp.argmax(ge, axis=-1)
    found = ge.max(axis=-1) > 0
    idx_hi = jnp.where(found, idx_hi, n_pool - 1)
    idx_hi = jnp.minimum(idx_hi, jnp.maximum(n_valid - 1, 0)[..., None])
    idx_lo = jnp.maximum(idx_hi - 1, 0)
    p_hi = jnp.take_along_axis(positions[..., None, :], idx_hi[..., None],
                               axis=-1)[..., 0]
    p_lo = jnp.take_along_axis(positions[..., None, :], idx_lo[..., None],
                               axis=-1)[..., 0]
    v_hi = jnp.take_along_axis(v_sorted[..., None, :], idx_hi[..., None],
                               axis=-1)[..., 0]
    v_lo = jnp.take_along_axis(v_sorted[..., None, :], idx_lo[..., None],
                               axis=-1)[..., 0]
    span = jnp.where(p_hi > p_lo, p_hi - p_lo, 1.0)
    frac = jnp.clip((q[None, None, :] - p_lo) / span, 0.0, 1.0)
    out = v_lo + frac * (v_hi - v_lo)
    # clamp to edges (q below first position / above last)
    return jnp.where(q[None, None, :] <= positions[..., :1], v_lo, out)

  # (n_blocks, B, pixels, Q), blocks sequential, block internals vector
  outs = jax.lax.map(one_block, idx_blocks)
  out = outs.reshape(n_blocks * day_block, npix, n_q)[:n_days]
  # (n_days, pixels, Q) -> (Q, n_days, pixels)
  out = jnp.moveaxis(out, -1, 0)
  return out.reshape((n_q, n_days) + pixel_shape)
