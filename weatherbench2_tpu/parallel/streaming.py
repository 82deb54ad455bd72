"""Streaming sharded evaluation engine.

This is the TPU-native replacement for the reference's Beam pipeline
(`_EvaluateAllMetrics` + `xbeam.Mean`, reference evaluation.py:555-755):

  * the (init_)time axis is processed in chunks that stream host→HBM;
  * per chunk, one jit-compiled program evaluates every jit-capable
    metric × region and reduces over the chunk's time entries — XLA fuses
    the elementwise error math into the weighted-reduction epilogues;
  * running (sum, count) accumulators live on device; the temporal mean is
    ``sum / count`` at the end (replacing the Beam tree-combiner);
  * with a ``jax.sharding.Mesh``, chunk arrays are sharded along the time
    axis over the ``batch`` mesh axis; XLA inserts the psum over ICI for
    the replicated accumulator outputs;
  * coordinate-dependent work (truth alignment gathers, climatology /
    threshold gathers, baseline substitution) happens host-side per chunk
    via ``Metric.prepare_chunk``; per-chunk time coords are normalized to
    placeholders so every full-size chunk reuses ONE compiled trace.

Checkpoint/resume: accumulator state is a pytree of small arrays; see
``StreamingState.save`` / ``load`` (the reference relies on Dataflow
retries instead — SURVEY §5).
"""
from __future__ import annotations

import dataclasses
import os
import pickle
import time
from typing import Any, Mapping, Optional

import numpy as np

_VERBOSE = os.environ.get("WB2_STREAM_VERBOSE", "") not in ("", "0")


def _vlog(msg: str, t0=None):
  if _VERBOSE:
    dt = f" [{time.perf_counter() - t0:.2f}s]" if t0 is not None else ""
    print(f"[stream {time.strftime('%H:%M:%S')}] {msg}{dt}", flush=True)

from weatherbench2_tpu import derived_variables
from weatherbench2_tpu import xds
from weatherbench2_tpu import utils
from weatherbench2_tpu.evaluation import merge_metric_results


def _normalize_chunk_coords(ds: xds.Dataset, chunk_dim: str) -> xds.Dataset:
  """Replace chunk-dim-dependent coords with canonical placeholders.

  After `prepare_chunk`, no metric math depends on the actual time coord
  values, so chunks of equal shape can share a single jit trace.
  """
  coords = {}
  n = ds.sizes.get(chunk_dim)
  for name, cv in ds.coords_dict().items():
    if chunk_dim in cv.dims:
      if name == chunk_dim and cv.ndim == 1:
        coords[name] = xds.Variable((chunk_dim,), np.arange(n))
      # other chunk-dependent coords (valid_time, 2-d init_time) dropped
    else:
      coords[name] = cv
  return xds.Dataset(dict(ds.variables_dict()), coords=coords,
                     attrs=ds.attrs)


def _reorder_like(ref, obj):
  """Rebuild ``obj`` with ``ref``'s Dataset variable ordering.

  xds Datasets flatten to pytrees with variable names in insertion
  order, so two trees with identical contents but different variable
  order have different treedefs and cannot be tree_map-merged.  Used to
  align a resumed checkpoint's accumulators (possibly saved by an older
  build with hash-randomized order) to this run's chunk-program
  structure.  Non-Dataset nodes (dicts, tuples, None counts) recurse;
  anything else passes through untouched.
  """
  if isinstance(ref, dict) and isinstance(obj, dict):
    return {k: _reorder_like(ref[k], obj[k]) if k in obj else obj[k]
            for k in obj}
  if isinstance(ref, (list, tuple)) and isinstance(obj, (list, tuple)):
    if len(ref) == len(obj):
      return type(obj)(_reorder_like(r, o) for r, o in zip(ref, obj))
    return obj
  if isinstance(ref, xds.Dataset) and isinstance(obj, xds.Dataset):
    ref_names = list(ref.variables_dict())
    obj_vars = obj.variables_dict()
    if set(ref_names) == set(obj_vars) and ref_names != list(obj_vars):
      return xds.Dataset(
          {n: obj_vars[n] for n in ref_names},
          coords=dict(obj.coords_dict()), attrs=obj.attrs,
      )
    return obj
  return obj


def _first_leaf(tree):
  """One array payload out of a (possibly nested) dict of xds results —
  used as a completion token for device-memory backpressure."""
  if isinstance(tree, dict):
    for v in tree.values():
      leaf = _first_leaf(v)
      if leaf is not None:
        return leaf
    return None
  if isinstance(tree, xds.Dataset):
    for v in tree.variables_dict().values():
      return v.data
    return None
  if isinstance(tree, (xds.DataArray, xds.Variable)):
    return tree.data
  return tree


def _normalize_any(obj, chunk_dim):
  if isinstance(obj, xds.Dataset):
    return _normalize_chunk_coords(obj, chunk_dim)
  if isinstance(obj, xds.DataArray):
    ds = obj.to_dataset(name=obj.name or "__da__")
    norm = _normalize_chunk_coords(ds, chunk_dim)
    return norm[obj.name or "__da__"]
  if isinstance(obj, dict):
    return {k: _normalize_any(v, chunk_dim) for k, v in obj.items()}
  if isinstance(obj, (list, tuple)):
    return type(obj)(_normalize_any(v, chunk_dim) for v in obj)
  return obj


def _to_device(obj, sharding_fn=None):
  """Move numpy payloads in a pytree of xds objects to jax, optionally
  with a sharding chosen per-variable.

  WB2_TRANSFER_DTYPE=bfloat16 ships large float payloads as bfloat16 and
  upcasts to float32 on device — halves host→HBM bytes (the measured
  bottleneck, PERF.md) at ~3 significant digits of metric accuracy.
  bfloat16 shares float32's exponent range so geopotential-scale values
  cannot overflow (float16 would); this is an opt-in throughput mode, off
  by default to preserve reference-parity numerics.
  """
  import jax
  import jax.numpy as jnp

  compress = os.environ.get("WB2_TRANSFER_DTYPE", "") == "bfloat16"

  def convert(x, dims):
    if (
        compress
        and not isinstance(x, jax.Array)
        and np.asarray(x).dtype in (np.float32, np.float64)
        and np.asarray(x).size > 4096
    ):
      import ml_dtypes

      arr = jnp.asarray(np.asarray(x).astype(ml_dtypes.bfloat16))
      if sharding_fn is not None:
        sh = sharding_fn(dims, np.shape(x))
        if sh is not None:
          arr = jax.device_put(arr, sh)
      return arr.astype(jnp.float32)
    arr = jnp.asarray(x) if not isinstance(x, jax.Array) else x
    if sharding_fn is not None:
      sh = sharding_fn(dims, np.shape(x))
      if sh is not None:
        arr = jax.device_put(arr, sh)
    return arr

  if isinstance(obj, xds.Dataset):
    out = xds.Dataset({}, coords=dict(obj.coords_dict()), attrs=obj.attrs)
    for k, v in obj.variables_dict().items():
      out[k] = xds.Variable(v.dims, convert(v.data, v.dims), v.attrs)
    return out
  if isinstance(obj, xds.DataArray):
    return obj.copy(data=convert(obj.data, obj.dims))
  if isinstance(obj, dict):
    return {k: _to_device(v, sharding_fn) for k, v in obj.items()}
  if isinstance(obj, (list, tuple)):
    return type(obj)(_to_device(v, sharding_fn) for v in obj)
  return obj


def batched_device_get(tree):
  """``jax.device_get`` with ONE d2h round-trip per dtype, not per leaf.

  Over a tunneled accelerator every fetch is a network round-trip.  The
  accumulator tree carries hundreds of tiny (region, lead[, level])
  leaves — per-leaf fetches cost minutes of pure latency (observed:
  multi-minute stalls at every checkpoint save on the 0.25-degree
  official run).  Pack all same-dtype jax leaves into one flat device
  buffer (a single concatenate the device executes asynchronously) and
  fetch that once.
  """
  import jax
  import jax.numpy as jnp

  leaves, treedef = jax.tree_util.tree_flatten(tree)
  by_dtype: dict = {}
  for i, leaf in enumerate(leaves):
    if isinstance(leaf, jax.Array) and leaf.size:
      by_dtype.setdefault(np.dtype(leaf.dtype), []).append(i)
  out = list(leaves)
  for dtype, idxs in by_dtype.items():
    flat = (
        jnp.concatenate([jnp.ravel(leaves[i]) for i in idxs])
        if len(idxs) > 1
        else jnp.ravel(leaves[idxs[0]])
    )
    host = np.asarray(jax.device_get(flat))
    off = 0
    for i in idxs:
      n = leaves[i].size
      out[i] = host[off:off + n].reshape(leaves[i].shape)
      off += n
  for i, leaf in enumerate(leaves):
    if isinstance(leaf, jax.Array) and not leaf.size:
      out[i] = np.asarray(leaf)
  return jax.tree_util.tree_unflatten(treedef, out)


@dataclasses.dataclass
class StreamingState:
  """Checkpointable accumulator state for a streaming evaluation.

  ``chunk_size``/``total`` fingerprint the chunking the state was taken
  under: chunk_index counts CHUNKS, so resuming with a different chunk
  size would silently skip the wrong time range.

  Round-4 generalization (replacing the reference's Dataflow bundle
  retries for the two north-star shapes, reference evaluation.py:758-828):

  * ``configs`` maps eval-config name -> (sums, counts) so a GROUPED
    multi-config stream (e.g. probabilistic + ensemble_binary sharing one
    chunk stream) checkpoints every config's accumulators together.
  * ``lead_index``/``n_lead_slices``/``completed_leads`` capture
    lead_time-chunked runs: completed lead slices' finalized results are
    carried whole (host datasets), the in-flight slice resumes from its
    accumulators.

  ``sums``/``counts`` remain as the legacy single-config v1 fields so
  pre-round-4 checkpoints still load and resume.
  """

  sums: Any = None
  counts: Any = None
  chunk_index: int = 0
  chunk_size: Optional[int] = None
  total: Optional[int] = None
  configs: Any = None  # {cname: (sums, counts)}
  lead_index: int = 0
  n_lead_slices: Optional[int] = None
  completed_leads: Any = None  # [ {cname: results Dataset}, ... ]

  def save(self, path: str) -> None:
    # ONE packed d2h per dtype: jax.device_get still fetches PER LEAF
    # over the tunnel (minutes of latency for the official accumulator
    # trees); batched_device_get concatenates on device and fetches once
    host = batched_device_get((self.sums, self.counts, self.configs))
    with open(path, "wb") as f:
      pickle.dump(
          {"version": 2,
           "sums": host[0], "counts": host[1],
           "chunk_index": self.chunk_index,
           "chunk_size": self.chunk_size, "total": self.total,
           "configs": host[2],
           "lead_index": self.lead_index,
           "n_lead_slices": self.n_lead_slices,
           "completed_leads": self.completed_leads},
          f,
      )

  @classmethod
  def load(cls, path: str) -> "StreamingState":
    with open(path, "rb") as f:
      d = pickle.load(f)
    return cls(sums=d["sums"], counts=d["counts"],
               chunk_index=d["chunk_index"],
               chunk_size=d.get("chunk_size"), total=d.get("total"),
               configs=d.get("configs"),
               lead_index=d.get("lead_index", 0),
               n_lead_slices=d.get("n_lead_slices"),
               completed_leads=d.get("completed_leads"))


def _region_weight_setup(regions, forecast):
  """(region_names, region_w) for the fused kernels, or None if the
  config's regions/grid don't map to static (lat, lon) weight masks."""
  from weatherbench2_tpu import metrics as m

  if None in regions:
    return None
  coords = forecast.coords_dict()
  if "latitude" not in coords or "longitude" not in coords:
    return None
  for v in forecast.variables_dict().values():
    if "latitude" not in v.dims or "longitude" not in v.dims:
      return None
  lat = np.asarray(coords["latitude"].data)
  lon = np.asarray(coords["longitude"].data)
  w = m._cell_area_from_latitude(np.deg2rad(lat))
  w = (w / w.mean()).astype(np.float32)
  try:
    masks = [r.mask_weights(lat, lon) for r in regions.values()]
  except (NotImplementedError, KeyError, ValueError):
    return None
  from weatherbench2_tpu import ops

  region_w = ops.make_region_weight_matrix(w, masks, len(lon))
  return np.asarray(list(regions.keys()), dtype=object), region_w


def _use_pallas_default() -> bool:
  import jax

  # the Pallas kernels avoid materializing the stat arrays in HBM
  # (measured 2.1x the XLA einsum formulation on a v5e chip at the
  # bench geometry); default on for TPU, opt in elsewhere.
  return os.environ.get(
      "WB2_USE_PALLAS",
      "1" if jax.default_backend() == "tpu" else "0",
  ) == "1"


def _det_stat_of(metric):
  """Stat name in the fused deterministic kernel, or None.

  ACC is deliberately NOT routed here: the kernel shares one NaN mask
  (isnan(f)|isnan(t)|isnan(clim)) across all stats, which (a) would let
  climatology NaNs poison MSE/Bias/MAE results that must not depend on
  the climatology, and (b) supports only one climatology per plan. ACC
  rides the pointwise tier instead, where each of its three anomaly
  products carries its own per-cell NaN accounting — exactly the
  reference's three independent `_spatial_average` masks
  (reference metrics.py:378-414).
  """
  from weatherbench2_tpu import metrics as m

  if type(metric) is m.MSE and not metric.wind_vector_mse:
    return "mse"
  if type(metric) is m.Bias:
    return "bias"
  if type(metric) is m.MAE:
    return "mae"
  if type(metric) is m.RMSESqrtBeforeTimeAvg and (
      not metric.wind_vector_rmse
  ):
    return "rmse"
  return None


def _build_fused_plan(jit_metrics, regions, forecast):
  """Detect deterministic metric suites that can run through the fused
  multi-region reduction kernel (weatherbench2_tpu.ops): one HBM pass per
  chunk computing every metric × region, instead of one reduction per
  metric × region.  Returns None when the config doesn't qualify."""
  if os.environ.get("WB2_FUSED", "1") == "0":
    return None

  stat_of = {}
  acc_name = None
  for name, metric in jit_metrics.items():
    stat = _det_stat_of(metric)
    if stat is None:
      return None
    stat_of[name] = stat
    if stat == "acc":
      acc_name = name
  if not stat_of:
    return None
  setup = _region_weight_setup(regions, forecast)
  if setup is None:
    return None
  region_names, region_w = setup
  return {
      "stat_of": stat_of,
      "acc_name": acc_name,
      "region_names": region_names,
      "region_w": region_w,
      "use_pallas": _use_pallas_default(),
  }


# probabilistic metrics expressible as region-means of pointwise fields
# derived from one member-axis pass: spread (single-sort PWM), skill,
# squared ensemble-mean error, and ddof=1 ensemble variance
_PROB_FIELD_DEPS = {
    "crps": ("skill", "spread"),
    "spread": ("spread",),
    "skill": ("skill",),
    "meansq": ("meansq",),
    "debiased": ("meansq", "var", "debiased"),
    "var": ("var",),
    "rmse_mean": ("meansq",),
    "stddev": ("var",),
}


def _prob_stat_of(metric):
  """Stat name in the fused probabilistic (CRPS-family) plan, or None."""
  from weatherbench2_tpu import metrics as m

  return {
      m.CRPS: "crps",
      m.CRPSSpread: "spread",
      m.CRPSSkill: "skill",
      m.EnsembleMeanMSE: "meansq",
      m.DebiasedEnsembleMeanMSE: "debiased",
      m.EnsembleVariance: "var",
      m.EnsembleMeanRMSESqrtBeforeTimeAvg: "rmse_mean",
      m.EnsembleStddevSqrtBeforeTimeAvg: "stddev",
  }.get(type(metric))


def _build_prob_fused_plan(jit_metrics, regions, forecast, skipna):
  """Fused plan for the probabilistic (CRPS-family / ensemble) suite.

  One member-axis pass computes the pointwise fields; ONE generic
  region-matmul kernel call reduces all fields × regions (reference hot
  loop: metrics.py:611-846 evaluated per metric × region).  Under
  skipna=True the member pass carries per-cell valid counts (the
  reference's xarray skipna member means); under skipna=False member
  NaNs propagate through the pointwise math exactly as the reference's
  non-skipna means do.
  """
  if os.environ.get("WB2_FUSED", "1") == "0":
    return None

  stat_of = {}
  ens_dims = set()
  for name, metric in jit_metrics.items():
    stat = _prob_stat_of(metric)
    if stat is None:
      return None
    stat_of[name] = stat
    ens_dims.add(metric.ensemble_dim)
  if not stat_of or len(ens_dims) != 1:
    return None
  (ensemble_dim,) = ens_dims
  if forecast.sizes.get(ensemble_dim, 0) < 2:
    return None  # degenerate 1-member semantics differ per metric
  setup = _region_weight_setup(regions, forecast)
  if setup is None:
    return None
  region_names, region_w = setup
  fields = sorted({
      f for stat in stat_of.values() for f in _PROB_FIELD_DEPS[stat]
  })
  return {
      "stat_of": stat_of,
      "ensemble_dim": ensemble_dim,
      "fields": fields,
      "region_names": region_names,
      "region_w": region_w,
      "use_pallas": _use_pallas_default(),
  }


def _fused_chunk_results(plan, f_c, t_c, prepared, skipna):
  """Per-time metric values for all fused metrics, dims (region, ...)."""
  import jax.numpy as jnp

  from weatherbench2_tpu import ops

  stat_idx = {"bias": 0, "mse": 1, "mae": 2}
  region_w = jnp.asarray(plan["region_w"])
  n_regions = plan["region_w"].shape[0]

  clim_gathered = None
  if plan["acc_name"] is not None:
    p = prepared[plan["acc_name"]]
    sel = {"dayofyear": p["indices"]["doy"]}
    if "hour" in p["indices"]:
      sel["hour"] = p["indices"]["hour"]
    clim_gathered = p["clim"].isel(sel)

  results = {
      name: xds.Dataset(
          {}, coords={"region": plan["region_names"]}
      )
      for name in plan["stat_of"]
  }
  # variable intersection: the forecast may carry aux-only variables
  # (e.g. '<var>_std') that truth lacks, and vice versa — the generic
  # path scores common variables only (xds binop semantics)
  for v in f_c.keys():
    if v not in t_c.keys():
      continue
    fvar = f_c.variables_dict()[v]
    tvar = t_c.variables_dict()[v]
    operands = [fvar, tvar]
    if clim_gathered is not None:
      operands.append(clim_gathered.variables_dict()[v])
    all_dims = xds.broadcast_dims_order(*(o.dims for o in operands))
    # spatial dims last, (lon, lat) order to match the weight matrix
    other = [d for d in all_dims if d not in ("longitude", "latitude")]
    all_dims = tuple(other) + ("longitude", "latitude")
    sizes = {}
    for o in operands:
      sizes.update(o.sizes)
    f_b = fvar.broadcast_to_dims(all_dims, sizes, xp=jnp).data
    t_b = tvar.broadcast_to_dims(all_dims, sizes, xp=jnp).data
    if clim_gathered is not None:
      c_b = operands[2].broadcast_to_dims(all_dims, sizes, xp=jnp).data
    else:
      c_b = jnp.zeros_like(f_b)
    other_shape = f_b.shape[:-2]
    l = f_b.shape[-2] * f_b.shape[-1]
    b = int(np.prod(other_shape)) if other_shape else 1
    f2 = f_b.reshape(b, l)
    t2 = t_b.reshape(b, l)
    c2 = c_b.reshape(b, l)
    if plan["use_pallas"]:
      sums, wsum, nanw = ops.fused_deterministic_sums(
          f2, t2, c2, plan["region_w"]
      )
    else:
      sums, wsum, nanw = ops.fused_deterministic_sums_reference(
          f2, t2, c2, region_w, xp=jnp
      )
    means = sums / wsum[None]
    if not skipna:
      means = jnp.where(nanw[None] > 0, jnp.nan, means)
    out_dims = ("region",) + tuple(other)
    coords = {
        k: cv
        for k, cv in f_c.coords_dict().items()
        if set(cv.dims) <= set(other)
    }
    coords["region"] = xds.Variable(("region",), plan["region_names"])
    for name, stat in plan["stat_of"].items():
      if stat == "rmse":
        arr = jnp.sqrt(means[stat_idx["mse"]])
      elif stat == "acc":
        arr = means[3] / jnp.sqrt(means[4] * means[5])
      else:
        arr = means[stat_idx[stat]]
      arr = arr.reshape((n_regions,) + other_shape)
      results[name][v] = xds.DataArray(
          xds.Variable(out_dims, arr), coords=coords, name=v
      )
  return results


def _fused_prob_chunk_results(plan, f_c, t_c, skipna):
  """Per-time probabilistic metric values via one member pass + one
  region-matmul kernel call per variable; dims (region, ...)."""
  import jax.numpy as jnp

  from weatherbench2_tpu import ops

  ens = plan["ensemble_dim"]
  field_names = plan["fields"]
  n_regions = plan["region_w"].shape[0]
  region_w = jnp.asarray(plan["region_w"])

  results = {
      name: xds.Dataset({}, coords={"region": plan["region_names"]})
      for name in plan["stat_of"]
  }
  for v in t_c.keys():
    if v not in f_c.keys():
      continue  # score common variables only (xds binop semantics)
    fvar = f_c.variables_dict()[v]
    tvar = t_c.variables_dict()[v]
    all_dims = xds.broadcast_dims_order(
        tuple(d for d in fvar.dims if d != ens), tvar.dims
    )
    other = [d for d in all_dims if d not in ("longitude", "latitude")]
    all_dims = tuple(other) + ("longitude", "latitude")
    sizes = {**tvar.sizes, **fvar.sizes}
    f_b = fvar.broadcast_to_dims((ens,) + all_dims, sizes, xp=jnp).data
    t_b = tvar.broadcast_to_dims(all_dims, sizes, xp=jnp).data
    m = f_b.shape[0]
    other_shape = f_b.shape[1:-2]
    l = f_b.shape[-2] * f_b.shape[-1]
    b = int(np.prod(other_shape)) if other_shape else 1
    f3 = f_b.reshape(m, b, l)
    t2 = t_b.reshape(b, l)

    fields = {}
    if skipna:
      # per-cell valid member counts: xarray's skipna member means use
      # the count of non-NaN members at each cell, while the PWM rank
      # coefficients and the debiased correction keep the global M
      # (metrics._pointwise_crps_spread / _debiased_ensemble_mean_mse)
      valid = ~jnp.isnan(f3)
      mc = valid.sum(axis=0).astype(jnp.float32)
    if "spread" in field_names:
      # single-sort PWM form (see metrics._pointwise_crps_spread)
      xs = jnp.sort(f3, axis=0)
      coef = (2 * jnp.arange(1, m + 1) - m - 1).reshape(m, 1, 1)
      if skipna:
        # NaNs sort last; a valid value at sorted position i has ordinal
        # rank i+1 among ALL members (ties broken by order), so the
        # rank-form sum restricted to the first mc positions equals the
        # generic path's skipna mean numerator
        i_idx = jnp.arange(m, dtype=jnp.float32).reshape(m, 1, 1)
        contrib = jnp.where(i_idx < mc[None], coef * xs, 0.0)
        fields["spread"] = 2 * contrib.sum(axis=0) / mc / (m - 1)
      else:
        fields["spread"] = 2 * (coef * xs).mean(axis=0) / (m - 1)
    if "skill" in field_names:
      if skipna:
        ad = jnp.abs(f3 - t2[None])
        fields["skill"] = jnp.where(valid, ad, 0.0).sum(axis=0) / mc
      else:
        fields["skill"] = jnp.abs(f3 - t2[None]).mean(axis=0)
    if "meansq" in field_names or "var" in field_names:
      if skipna:
        xbar = jnp.where(valid, f3, 0.0).sum(axis=0) / mc
      else:
        xbar = f3.mean(axis=0)
      if "meansq" in field_names:
        fields["meansq"] = (xbar - t2) ** 2
      if "var" in field_names:
        if skipna:
          sq = jnp.where(valid, (f3 - xbar[None]) ** 2, 0.0)
          fields["var"] = sq.sum(axis=0) / (mc - 1)
        else:
          fields["var"] = ((f3 - xbar[None]) ** 2).sum(axis=0) / (m - 1)
      if "debiased" in field_names:
        # per-CELL debiased field: combining the meansq and var REGIONAL
        # means instead would average the two terms over different NaN
        # cell sets under skipna (a truth-NaN cell drops from meansq but
        # not var), diverging from the generic per-cell formula
        # (metrics._debiased_ensemble_mean_mse)
        fields["debiased"] = fields["meansq"] - fields["var"] / m

    stack = jnp.stack([fields[k] for k in field_names])  # (K, B, L)
    k = len(field_names)
    x2d = stack.reshape(k * b, l)
    if plan["use_pallas"]:
      sums, wsum, nanw = ops.fused_region_sums(x2d, plan["region_w"])
    else:
      sums, wsum, nanw = ops.fused_region_sums_reference(
          x2d, region_w, xp=jnp
      )
    means = sums / wsum
    if not skipna:
      means = jnp.where(nanw > 0, jnp.nan, means)
    means = means.reshape(n_regions, k, b)
    mean_of = {
        name: means[:, i].reshape((n_regions,) + other_shape)
        for i, name in enumerate(field_names)
    }

    out_dims = ("region",) + tuple(other)
    coords = {
        kk: cv
        for kk, cv in f_c.coords_dict().items()
        if set(cv.dims) <= set(other)
    }
    coords["region"] = xds.Variable(("region",), plan["region_names"])
    for name, stat in plan["stat_of"].items():
      if stat == "crps":
        arr = mean_of["skill"] - 0.5 * mean_of["spread"]
      elif stat == "spread":
        arr = mean_of["spread"]
      elif stat == "skill":
        arr = mean_of["skill"]
      elif stat == "meansq":
        arr = mean_of["meansq"]
      elif stat == "debiased":
        arr = mean_of["debiased"]
      elif stat == "var":
        arr = mean_of["var"]
      elif stat == "rmse_mean":
        arr = jnp.sqrt(mean_of["meansq"])
      elif stat == "stddev":
        arr = jnp.sqrt(mean_of["var"])
      else:  # pragma: no cover
        raise AssertionError(stat)
      results[name][v] = xds.DataArray(
          xds.Variable(out_dims, arr), coords=coords, name=v
      )
  return results


def _build_pointwise_plan(jit_metrics, regions, forecast):
  """Plan for metrics implementing the pointwise-fused protocol
  (Metric.pointwise_chunk / finalize_fused): every metric's per-cell
  fields are stacked into ONE (rows, cells) matrix and reduced against
  all region weights by a single fused_region_sums kernel call per chunk
  — one HBM pass for the whole suite instead of one weighted reduction
  per metric × region (the reference's `_metric_and_region_loop`,
  reference evaluation.py:388-438)."""
  if os.environ.get("WB2_FUSED", "1") == "0" or not jit_metrics:
    return None
  setup = _region_weight_setup(regions, forecast)
  if setup is None:
    return None
  region_names, region_w = setup
  return {
      "names": list(jit_metrics),
      "region_names": region_names,
      "region_w": region_w,
      "use_pallas": _use_pallas_default(),
  }


def _pointwise_chunk_results(plan, metrics, f_c, t_c, prepared, skipna):
  """Evaluate all pointwise-fused metrics, one kernel call per metric.

  Returns (results_by_metric, leftover_names): metrics whose
  ``pointwise_chunk`` declines at trace time (missing variables/members)
  fall back to the caller's per-region loop.
  """
  import jax.numpy as jnp

  from weatherbench2_tpu import ops

  region_w = plan["region_w"]
  n_regions = region_w.shape[0]

  rows = []
  manifest = []  # (metric_name, [(var, other_dims, other_shape, coords)])
  attrs_of = {}
  leftover = []
  for mname in plan["names"]:
    metric = metrics[mname]
    fields = metric.pointwise_chunk(f_c, t_c, prepared[mname], skipna)
    if fields is None or not len(list(fields.keys())) or any(
        "latitude" not in v.dims or "longitude" not in v.dims
        for v in fields.variables_dict().values()
    ):
      leftover.append(mname)
      continue
    attrs_of[mname] = dict(fields.attrs)
    entries = []
    for vname in fields.keys():
      v = fields.variables_dict()[vname]
      other = tuple(d for d in v.dims if d not in ("longitude", "latitude"))
      vv = v.transpose(*(other + ("longitude", "latitude")))
      other_shape = vv.shape[:-2]
      l = vv.shape[-2] * vv.shape[-1]
      b = int(np.prod(other_shape)) if other_shape else 1
      rows.append(jnp.asarray(vv.data, jnp.float32).reshape(b, l))
      coords = {
          k: cv
          for k, cv in fields.coords_dict().items()
          if cv.dims and set(cv.dims) <= set(other)
      }
      entries.append((vname, other, other_shape, coords, b))
    manifest.append((mname, entries))

  results = {}
  if not manifest:
    return results, leftover
  # Kernel calls are bounded by row bytes, not issued per metric: even a
  # per-metric concatenate of every variable's chunk-sized fields is one
  # matrix of (fields × chunk) rows — at 0.25° the official 13-variable
  # ACC products alone are ~11 GB, which OOMs 16 GB HBM before the kernel
  # runs (measured: f32[2898, 1038240] concat).  Fields are greedily
  # packed into groups under WB2_FUSED_GROUP_BYTES; the kernel reduces
  # the cell axis away, so per-group outputs are tiny and re-join along
  # the column axis.  Small geometries still land in one group (one
  # kernel call per metric, the previous behavior).
  group_cap = int(os.environ.get("WB2_FUSED_GROUP_BYTES", 1 << 30))
  row_iter = iter(rows)
  region_coord = xds.Variable(("region",), plan["region_names"])
  for mname, entries in manifest:
    metric = metrics[mname]
    nan_mode = metric.fused_nan_mode
    m_rows = [next(row_iter) for _ in entries]
    groups = []
    cur, cur_bytes = [], 0
    for r in m_rows:
      rb = 4 * int(r.shape[0]) * int(r.shape[1])
      if cur and cur_bytes + rb > group_cap:
        groups.append(cur)
        cur, cur_bytes = [], 0
      cur.append(r)
      cur_bytes += rb
    if cur:
      groups.append(cur)
    parts = []
    for g in groups:
      x = g[0] if len(g) == 1 else jnp.concatenate(g, axis=0)
      if plan["use_pallas"]:
        parts.append(ops.fused_region_sums(x, region_w))
      else:
        parts.append(ops.fused_region_sums_reference(
            x, jnp.asarray(region_w), xp=jnp
        ))
    if len(parts) == 1:
      sums, wsum, nanw = parts[0]
    else:
      sums = jnp.concatenate([p[0] for p in parts], axis=-1)
      wsum = jnp.concatenate([p[1] for p in parts], axis=-1)
      nanw = jnp.concatenate([p[2] for p in parts], axis=-1)
    means_all = sums / wsum

    col = 0
    ds = xds.Dataset({}, coords={"region": region_coord})
    for vname, other, other_shape, coords, b in entries:
      mcols = means_all[:, col:col + b]
      if nan_mode == "global" and not skipna:
        mcols = jnp.where(nanw[:, col:col + b] > 0, jnp.nan, mcols)
      col += b
      arr = mcols.reshape((n_regions,) + other_shape)
      da = xds.DataArray(
          xds.Variable(("region",) + other, arr),
          coords={"region": region_coord, **coords},
          name=vname,
      )
      ds[vname] = da
    result = metric.finalize_fused(ds, skipna=skipna)
    if attrs_of[mname]:
      result = result.assign_attrs(**attrs_of[mname])
    results[mname] = result
  return results, leftover


def _partition_fused(jit_metrics, regions, forecast, skipna, fused_ok):
  """Partition a config's metrics across the fused execution tiers.

  Returns (det_plan, prob_plan, pointwise_plan, generic_metrics):
  the 6-stat deterministic kernel first, then the shared-member-pass
  CRPS-family plan, then the generic pointwise-fused tier; anything
  left runs the per-metric × region loop (still inside the same jit
  program).
  """
  remaining = dict(jit_metrics)
  det_plan = prob_plan = pw_plan = None
  if fused_ok:
    det_sub = {n: m for n, m in remaining.items() if _det_stat_of(m)}
    if det_sub:
      det_plan = _build_fused_plan(det_sub, regions, forecast)
      if det_plan is not None:
        for n in det_sub:
          remaining.pop(n)
    prob_sub = {n: m for n, m in remaining.items() if _prob_stat_of(m)}
    if prob_sub:
      prob_plan = _build_prob_fused_plan(prob_sub, regions, forecast, skipna)
      if prob_plan is not None:
        for n in prob_sub:
          remaining.pop(n)
    pw_sub = {
        n: m for n, m in remaining.items() if m.supports_pointwise_fused
    }
    if pw_sub:
      pw_plan = _build_pointwise_plan(pw_sub, regions, forecast)
      if pw_plan is not None:
        for n in pw_sub:
          remaining.pop(n)
  return det_plan, prob_plan, pw_plan, remaining


def _chunk_slices(total: int, size: int):
  for start in range(0, total, size):
    yield slice(start, min(start + size, total))


def _auto_chunk_size(
    forecast, chunk_dim: str, batch: int, companions: int = 2
) -> int:
  """Pick a chunk size targeting ~WB2_CHUNK_BYTES of HBM per chunk.

  Used when the caller gives no --input_chunks: one full-dataset "chunk"
  OOMs at official geometries, so size chunks to a budget (default 1.5 GB
  of forecast payload; truth roughly doubles it, and HBM must also hold
  the prefetched next chunk).  ``companions`` counts the chunk-shaped
  datasets in flight per chunk (forecast + truth = 2; +1 when a
  climatology gathers per chunk instead of staying HBM-resident) — the
  budget is scaled down accordingly so the steady-state footprint stays
  roughly constant.
  """
  budget = float(os.environ.get("WB2_CHUNK_BYTES", 1.5e9))
  if companions > 2:
    budget *= 2.0 / companions
  total = forecast.sizes[chunk_dim]
  per_entry = 0
  for v in forecast.variables_dict().values():
    if chunk_dim not in v.dims:
      continue
    cells = 1
    for d, s in zip(v.dims, v.shape):
      if d != chunk_dim:
        cells *= s
    per_entry += cells * np.dtype(getattr(v.data, "dtype", np.float32)).itemsize
  if per_entry <= 0:
    return total
  size = max(1, int(budget // per_entry))
  if batch > 1:
    size = max(batch, (size // batch) * batch)
  return min(total, size)


def _pad_chunk(ds: xds.Dataset, chunk_dim: str, target: int) -> xds.Dataset:
  """Pad the chunk dim to `target` by repeating the last entry."""
  n = ds.sizes[chunk_dim]
  if n == target:
    return ds
  idx = np.concatenate([np.arange(n), np.full(target - n, n - 1)])
  return ds.isel({chunk_dim: idx})


_UTIME = "__utime"


def _rename_utime_var(v):
  if "time" not in v.dims:
    return v
  return xds.Variable(
      tuple(_UTIME if d == "time" else d for d in v.dims), v.data, v.attrs
  )


def _rename_utime(obj):
  """Rename the deduped truth-time dim 'time' -> '__utime' in a pytree.

  Applied AFTER prepare_chunk (so metric/threshold preparation sees a
  normal truth chunk) and before device transfer; coords carrying the
  time dim are dropped (their datetime values differ per chunk and would
  retrace the jit program — same rule as _normalize_chunk_coords)."""
  if isinstance(obj, xds.Dataset):
    if "time" not in obj.sizes:
      return obj
    data = {
        k: _rename_utime_var(v) for k, v in obj.variables_dict().items()
    }
    coords = {
        k: v
        for k, v in obj.coords_dict().items()
        if "time" not in v.dims and k != "time"
    }
    return xds.Dataset(data, coords=coords, attrs=obj.attrs)
  if isinstance(obj, xds.DataArray):
    if "time" not in obj.dims:
      return obj
    coords = {
        k: v
        for k, v in obj.coords.items()
        if "time" not in v.dims and k != "time"
    }
    return xds.DataArray(
        _rename_utime_var(obj.variable), coords=coords, name=obj.name
    )
  if isinstance(obj, dict):
    return {k: _rename_utime(v) for k, v in obj.items()}
  if isinstance(obj, (list, tuple)):
    return type(obj)(_rename_utime(v) for v in obj)
  return obj


def _expand_utime(obj, uinv):
  """Expand deduped unique-time tensors to chunk shape on device.

  Any Dataset/DataArray carrying the `__utime` dim gets a vectorized
  take with `uinv` (dims = the forecast chunk's (init, lead) layout) —
  the device-side half of the truth h2d dedup."""
  if isinstance(obj, xds.Dataset):
    if _UTIME in obj.sizes:
      return obj.isel({_UTIME: uinv})
    return obj
  if isinstance(obj, xds.DataArray):
    if _UTIME in obj.dims:
      return obj.isel({_UTIME: uinv})
    return obj
  if isinstance(obj, dict):
    return {k: _expand_utime(v, uinv) for k, v in obj.items()}
  if isinstance(obj, (list, tuple)):
    return type(obj)(_expand_utime(v, uinv) for v in obj)
  return obj


def evaluate_streaming(
    forecast: xds.Dataset,
    truth: xds.Dataset,
    climatology: Optional[xds.Dataset],
    eval_config,
    data_config,
    input_chunks: Mapping[str, int],
    skipna: bool = False,
    mesh=None,
    state: Optional[StreamingState] = None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
) -> xds.Dataset:
  """Stream chunks through a fused metric program; return results dataset."""
  return evaluate_streaming_multi(
      forecast,
      truth,
      climatology,
      {"": eval_config},
      data_config,
      input_chunks,
      skipna=skipna,
      mesh=mesh,
      state=state,
      checkpoint_path=checkpoint_path,
      checkpoint_every=checkpoint_every,
  )[""]


def evaluate_streaming_multi(
    forecast: xds.Dataset,
    truth: xds.Dataset,
    climatology: Optional[xds.Dataset],
    eval_configs: Mapping[str, Any],
    data_config,
    input_chunks: Mapping[str, int],
    skipna: bool = False,
    mesh=None,
    state: Optional[StreamingState] = None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
) -> dict:
  """Stream chunks ONCE through the jit programs of several eval configs.

  The reference's Beam pipeline reads each chunk once and fans it out to
  every eval config's metric branch (reference evaluation.py:693-746);
  this is the mesh-engine equivalent: one host read + one h2d transfer
  per chunk, one jit chunk-program per config.  All configs must share
  the inputs exactly, i.e. identical baseline-substitution flags,
  derived variables, and against_analysis — `evaluate_with_mesh` groups
  configs by that key before calling this.

  Returns {config_name: results dataset}.  Checkpoint/resume (`state`,
  `checkpoint_path`) covers grouped multi-config and lead_time-chunked
  runs: every config's accumulators snapshot together, and completed
  lead slices' results ride in the state (see StreamingState).
  """
  import jax
  import jax.numpy as jnp

  cfg0 = next(iter(eval_configs.values()))
  for cfg in eval_configs.values():
    if (
        cfg.evaluate_climatology != cfg0.evaluate_climatology
        or cfg.evaluate_persistence != cfg0.evaluate_persistence
        or cfg.evaluate_probabilistic_climatology
        != cfg0.evaluate_probabilistic_climatology
        or cfg.against_analysis != cfg0.against_analysis
        or sorted(cfg.derived_variables) != sorted(cfg0.derived_variables)
    ):
      raise ValueError(
          "evaluate_streaming_multi requires configs with identical "
          "input construction (baselines/derived/against_analysis)"
      )
  if state is not None or checkpoint_path:
    # per-time (temporal_mean=False) results live in a host-side list,
    # not in StreamingState: resuming would silently drop every
    # already-completed chunk's rows from the output
    for cname, cfg in eval_configs.items():
      if not cfg.temporal_mean:
        raise ValueError(
            "checkpoint/resume requires temporal_mean=True (config "
            f"{cname!r} emits per-time results, which the accumulator "
            "state does not capture)"
        )

  # Persistent compilation cache: metric programs are compiled remotely on
  # some backends (tens of seconds); identical eval configs reuse them.
  # TPU-only: caching CPU programs pins host-specific AOT artifacts that
  # can SIGILL when the cache directory outlives the machine that wrote
  # them, and CPU compiles are cheap anyway.
  if (
      jax.config.jax_compilation_cache_dir is None
      and jax.default_backend() == "tpu"
  ):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("WB2_COMPILE_CACHE", "/tmp/wb2_jax_compile_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

  # Optional profiling hook (SURVEY §5: the reference has no tracing; we
  # add jax.profiler + phase timing). Set WB2_PROFILE_DIR to capture a
  # trace of the streaming evaluation.
  profile_dir = os.environ.get("WB2_PROFILE_DIR")
  if profile_dir:
    jax.profiler.start_trace(profile_dir)

  by_init = data_config.by_init
  chunk_dim = "init_time" if by_init else "time"
  total = forecast.sizes[chunk_dim]
  spatial_shards = 1
  if mesh is not None:
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    batch = int(axis_sizes.get("batch", 1))
    spatial_shards = int(axis_sizes.get("spatial", 1))
    if spatial_shards > 1:
      n_lat = forecast.sizes.get("latitude")
      if n_lat is not None and n_lat % spatial_shards != 0:
        # Refuse rather than silently replicate: official grids have
        # awkward latitude counts (721 = 7 x 103 at 0.25 deg; 121 at
        # 1.5 deg), so a power-of-two `spatial` axis would quietly buy
        # nothing.  Batch-only meshes are the recommended layout at
        # these geometries — see docs/scaling.md ("Choosing a mesh").
        divisors = [d for d in range(2, n_lat + 1) if n_lat % d == 0]
        raise ValueError(
            f"mesh axis 'spatial'={spatial_shards} does not divide the "
            f"latitude size {n_lat}; valid spatial shard counts are "
            f"{divisors[:8]}{'...' if len(divisors) > 8 else ''} — or "
            "use a batch-only mesh (recommended at official "
            "geometries, docs/scaling.md)"
        )
  else:
    batch = 1
  if chunk_dim in input_chunks:
    chunk_size = int(input_chunks[chunk_dim])
  else:
    companions = 2
    if climatology is not None:
      clim_bytes = sum(
          4 * v.size for v in climatology.variables_dict().values()
      )
      if clim_bytes > float(
          os.environ.get("WB2_CLIM_DEVICE_BYTES", 2e9)
      ):
        # the climatology gathers per chunk (ACC host-gather mode) and
        # rides HBM alongside forecast + truth — but deduped to unique
        # (dayofyear, hour) rows it is a small fraction of a chunk, so
        # budget a half companion rather than a full one
        companions = 2.5
    chunk_size = _auto_chunk_size(forecast, chunk_dim, batch, companions)
  chunk_size = max(chunk_size, batch)
  if batch > 1:
    # batch-sharded device_put needs an evenly divisible chunk axis
    # (ragged trailing chunks are zero-padded to chunk_size separately)
    chunk_size = -(-chunk_size // batch) * batch

  lead_chunk = int(input_chunks.get("lead_time", 0)) or None
  if lead_chunk and lead_chunk < forecast.sizes.get("lead_time", 0):
    # lead-dependent derived variables (e.g. precip accumulation) need the
    # full lead axis resident; chunk boundaries would silently corrupt the
    # accumulation (the reference routes these through a full-lead rechunk
    # branch, reference compute_derived_variables.py:217-231)
    for cfg in eval_configs.values():
      for dname, dv in cfg.derived_variables.items():
        if {"lead_time", "prediction_timedelta"} & set(
            dv.all_input_core_dims
        ):
          raise ValueError(
              f"derived variable {dname!r} requires the full lead_time "
              "axis per chunk; remove lead_time from input_chunks or "
              "drop the derived variable"
          )

  # --- probabilistic climatology baseline is built once from truth
  # (identical flags across the group — validated above)
  prob_clim = None
  if cfg0.evaluate_probabilistic_climatology:
    prob_clim = utils.make_probabilistic_climatology(
        truth,
        cfg0.probabilistic_climatology_start_year,
        cfg0.probabilistic_climatology_end_year,
        cfg0.probabilistic_climatology_hour_interval,
    )

  jit_metrics_by = {
      c: {k: m for k, m in cfg.metrics.items() if m.supports_jit}
      for c, cfg in eval_configs.items()
  }
  host_metrics_by = {
      c: {k: m for k, m in cfg.metrics.items() if not m.supports_jit}
      for c, cfg in eval_configs.items()
  }
  regions_by = {
      c: (cfg.regions or {None: None}) for c, cfg in eval_configs.items()
  }
  any_temporal = any(cfg.temporal_mean for cfg in eval_configs.values())

  # Truth h2d dedup gate: by-init runs whose metrics all run in-program
  # (host metrics need a chunk-shaped host truth) and whose truth has no
  # dim named like the marker.  WB2_TRUTH_DEDUP=0 disables.
  truth_dedup = (
      data_config.by_init
      and os.environ.get("WB2_TRUTH_DEDUP", "1") == "1"
      and all(
          m.supports_jit
          for cfg in eval_configs.values()
          for m in cfg.metrics.values()
      )
      # lead-core-dim derived variables (precip accumulation) compute on
      # the TRUTH chunk too — the compact unique-time truth has no lead
      # axis, so those need the lead-aligned chunk-shaped truth
      and not any(
          {"lead_time", "prediction_timedelta"}
          & set(dv.all_input_core_dims)
          for cfg in eval_configs.values()
          for dv in cfg.derived_variables.values()
      )
      and "time" in truth.sizes
      and _UTIME not in truth.sizes
  )

  # The fused paths reshape (lon, lat) into one cell axis, which would
  # force a resharding gather under spatial sharding — use the generic
  # (GSPMD-partitioned reductions) path there instead.  Each config's
  # metrics are partitioned across the fused tiers; leftovers run the
  # per-metric × region loop inside the same jit program.
  plans_by = {
      c: _partition_fused(
          jit_metrics_by[c], regions_by[c], forecast, skipna,
          spatial_shards == 1,
      )
      for c in eval_configs
  }

  # ---- one fused per-chunk program (jit) per eval config ------------------
  def make_chunk_program(cname):
    eval_config = eval_configs[cname]
    jit_metrics = jit_metrics_by[cname]
    regions = regions_by[cname]
    det_plan, prob_plan, pw_plan, generic_metrics = plans_by[cname]

    def chunk_program(forecast_c, truth_c, prepared_by_metric, time_mask,
                      uinv):
      """Evaluate all jit metrics × regions; reduce over the chunk dim."""
      if truth_dedup:
        truth_c = _expand_utime(truth_c, uinv)
        prepared_by_metric = _expand_utime(prepared_by_metric, uinv)
      results = {}
      generic_names = list(generic_metrics)
      if det_plan is not None:
        results.update(
            _fused_chunk_results(
                det_plan, forecast_c, truth_c, prepared_by_metric, skipna
            )
        )
      if prob_plan is not None:
        results.update(
            _fused_prob_chunk_results(prob_plan, forecast_c, truth_c, skipna)
        )
      if pw_plan is not None:
        pw_results, leftover = _pointwise_chunk_results(
            pw_plan, jit_metrics, forecast_c, truth_c,
            prepared_by_metric, skipna,
        )
        results.update(pw_results)
        generic_names.extend(leftover)

      sums = {}
      counts = {}
      for name, result in results.items():
        if eval_config.temporal_mean:
          s, c = _masked_sum_count(result, chunk_dim, time_mask, skipna)
          sums[name], counts[name] = s, c
        else:
          sums[name], counts[name] = result, None
      for name in generic_names:
        metric = jit_metrics[name]
        region_results = []
        for region_name, region in regions.items():
          res = metric.compute_chunk_prepared(
              forecast_c,
              truth_c,
              prepared_by_metric[name],
              region=region,
              skipna=skipna,
          )
          if region_name is not None:
            res = res.expand_dims(
                region=np.asarray([region_name], dtype=object)
            )
          region_results.append(res)
        result = (
            xds.concat(region_results, "region")
            if len(region_results) > 1 or None not in regions
            else region_results[0]
        )
        if eval_config.temporal_mean:
          s, c = _masked_sum_count(result, chunk_dim, time_mask, skipna)
          sums[name] = s
          counts[name] = c
        else:
          sums[name] = result
          counts[name] = None
      return sums, counts

    return chunk_program

  def _masked_sum_count(result, dim, mask, skipna_):
    sum_ds = xds.Dataset({}, coords={
        k: v for k, v in result.coords_dict().items() if dim not in v.dims
    })
    cnt_ds = xds.Dataset({}, coords=dict(sum_ds.coords_dict()))
    for vname in result.keys():
      da = result[vname]
      if dim not in da.dims:
        # no time dependence (shouldn't happen) — count as one sample
        sum_ds[vname] = da
        cnt_ds[vname] = da.copy(data=jnp.ones_like(da.data))
        continue
      ax = da.dims.index(dim)
      m_shape = [1] * da.ndim
      m_shape[ax] = da.shape[ax]
      m = mask.reshape(m_shape)
      vals = da.data
      if skipna_:
        valid = jnp.logical_and(m > 0, ~jnp.isnan(vals))
        s = jnp.where(valid, vals, 0.0).sum(axis=ax)
        c = valid.sum(axis=ax)
      else:
        s = jnp.where(m > 0, vals, 0.0).sum(axis=ax)
        c = jnp.broadcast_to(m, vals.shape).sum(axis=ax)
      dims = tuple(d for d in da.dims if d != dim)
      sum_ds[vname] = xds.Variable(dims, s)
      cnt_ds[vname] = xds.Variable(dims, c)
    return sum_ds, cnt_ds

  chunk_program_jit_by = {
      c: jax.jit(make_chunk_program(c)) for c in eval_configs
  }

  # ---- sharding ------------------------------------------------------------
  sharding_fn = None
  if mesh is not None:
    from jax.sharding import NamedSharding, PartitionSpec

    def sharding_fn(dims, shape):
      spec = [None] * len(dims)
      used = False
      if chunk_dim in dims and batch > 1:
        spec[dims.index(chunk_dim)] = "batch"
        used = True
      if (
          spatial_shards > 1
          and "latitude" in dims
          and shape[dims.index("latitude")] % spatial_shards == 0
      ):
        spec[dims.index("latitude")] = "spatial"
        used = True
      if used:
        return NamedSharding(mesh, PartitionSpec(*spec))
      return NamedSharding(mesh, PartitionSpec())

  # ---- chunk loop ----------------------------------------------------------
  if state is None:
    state = StreamingState()
  # normalize legacy v1 single-config states to the v2 `configs` form
  if state.configs is None and state.sums is not None:
    if len(eval_configs) > 1:
      raise ValueError(
          "legacy single-config checkpoint cannot resume a grouped "
          "multi-config run; delete the checkpoint or stream the config "
          "alone"
      )
    only = next(iter(eval_configs))
    state.configs = {only: (state.sums, state.counts)}
  resume_lead = int(state.lead_index or 0)
  resume_chunk = int(state.chunk_index or 0)
  resume_configs = state.configs
  completed_leads = list(state.completed_leads or [])
  if resume_configs is not None and set(resume_configs) != set(eval_configs):
    raise ValueError(
        f"checkpoint covers configs {sorted(resume_configs)} but this "
        f"run streams {sorted(eval_configs)}; pass the same config group "
        "to resume"
    )
  if (resume_chunk or resume_lead) and resume_configs is None:
    raise ValueError(
        "checkpoint records chunk progress but carries no accumulators; "
        "resuming would silently drop the covered chunks"
    )
  if state.chunk_index:
    # chunk_index counts chunks: resuming under a different chunk size
    # would silently skip the wrong time range (a different TOTAL is
    # fine — e.g. a partial-slice run resumed over the full range — as
    # long as the chunk grid lines up from the start)
    if state.chunk_size is not None and state.chunk_size != chunk_size:
      raise ValueError(
          f"checkpoint was taken with chunk_size={state.chunk_size} but "
          f"this run uses chunk_size={chunk_size}; pass the same "
          "--input_chunks to resume"
      )
    # compare in CHUNKS, not entries: the final chunk is ragged, so a
    # state at chunk_index == n_chunks legitimately covers the range
    # even though chunk_index * chunk_size exceeds `total`
    n_chunks = -(-total // chunk_size)
    if state.chunk_index > n_chunks:
      raise ValueError(
          f"checkpoint covers {state.chunk_index} chunks of "
          f"{chunk_size} but this run has only {total} entries "
          f"({n_chunks} chunks)"
      )
  nontemporal_results = {c: [] for c in eval_configs}

  def _prepare_one(ci, sl, lead_sl):
    """Host-side work for one chunk: slice, align, derive, prepare, pad.

    The chunk is read, aligned, derived and transferred ONCE; only the
    (cheap, host-side) `prepare_chunk` gathers are per config.
    """
    f_chunk = forecast.isel({chunk_dim: sl})
    if lead_sl != slice(None):
      f_chunk = f_chunk.isel(lead_time=lead_sl)
    n_real = f_chunk.sizes[chunk_dim]
    target = chunk_size if any_temporal else (
        -(-n_real // batch) * batch if mesh is not None else n_real
    )
    f_chunk = _pad_chunk(f_chunk, chunk_dim, target)
    time_mask = np.zeros(target, dtype=np.float64)
    time_mask[:n_real] = 1.0
    uinv = np.zeros((1, 1), dtype=np.int32)  # dummy when dedup is off
    if truth_dedup:
      # Truth h2d dedup: the valid-time-aligned truth chunk repeats each
      # truth time in ~every lead slot (a 21-lead chunk ships each time
      # up to 21x).  Select the chunk's UNIQUE valid times once (a
      # bounded lazy read), ship that small block, and expand on device
      # with an integer take — the same trick as the ACC climatology
      # dedup.  prepare_chunk below sees the compact (time, ...) truth;
      # its time-aligned products (e.g. threshold gathers) carry the
      # same unique axis and expand alongside in the chunk program.
      vt = np.asarray(f_chunk["valid_time"].data)
      uniq, inv = np.unique(vt.ravel(), return_inverse=True)
      n_u = len(uniq)
      # bucket: stable shapes across chunks (vs. per-chunk recompiles).
      # Tunable: a 1-init x 7-lead official chunk has 7 unique times, so
      # the default 16 ships 2.3x the needed truth bytes — lead-chunked
      # 0.25-degree runs set 8 (same shape stability, half the padding)
      bucket = max(1, int(os.environ.get("WB2_UTIME_BUCKET", "16")))
      n_pad = -(-n_u // bucket) * bucket
      if n_pad > n_u:
        uniq = np.concatenate([uniq, np.repeat(uniq[-1:], n_pad - n_u)])
      uinv = inv.reshape(vt.shape).astype(np.int32)
      f_chunk, t_chunk = _make_truth_chunk(
          f_chunk, truth, climatology, prob_clim, cfg0, data_config,
          unique_times=uniq,
      )
    else:
      f_chunk, t_chunk = _make_truth_chunk(
          f_chunk, truth, climatology, prob_clim, cfg0, data_config
      )
    for dname, dv in cfg0.derived_variables.items():
      f_chunk[dname] = derived_variables.compute_on(dv, f_chunk)
      t_chunk[dname] = derived_variables.compute_on(dv, t_chunk)
    prepared = {
        c: {
            name: m.prepare_chunk(f_chunk, t_chunk)
            for name, m in jit_metrics_by[c].items()
        }
        for c in eval_configs
    }
    if truth_dedup:
      t_chunk = _rename_utime(t_chunk)
      prepared = _rename_utime(prepared)
    f_dev = _to_device(_normalize_any(f_chunk, chunk_dim), sharding_fn)
    t_dev = _to_device(_normalize_any(t_chunk, chunk_dim), sharding_fn)
    p_dev = _to_device(_normalize_any(prepared, chunk_dim), sharding_fn)
    if _VERBOSE:
      # byte accounting for the h2d stream: forecast/truth payloads plus
      # everything prepare_chunk ships (e.g. ACC's deduped climatology
      # rows) — lets a run assert how many bytes each companion added
      def _nb(obj):
        if isinstance(obj, xds.Dataset):
          return sum(_nb(v) for v in obj.variables_dict().values())
        if isinstance(obj, (xds.DataArray, xds.Variable)):
          # size * itemsize, never np.asarray: materializing a
          # still-lazy payload here would re-read the chunk from
          # storage just to count its bytes.  jax arrays are already
          # device-resident (e.g. the cached ACC climatology) — they
          # do not cross host->device again, so count 0.
          data = obj.data
          from weatherbench2_tpu.xds.core import _is_jax

          if _is_jax(data):
            return 0
          itemsize = np.dtype(getattr(data, "dtype", np.float32)).itemsize
          return int(getattr(data, "size", 0)) * itemsize
        if isinstance(obj, dict):
          return sum(_nb(v) for v in obj.values())
        if isinstance(obj, (list, tuple)):
          return sum(_nb(v) for v in obj)
        return int(getattr(obj, "nbytes", 0))

      _vlog(
          f"chunk {ci}: h2d bytes forecast={_nb(f_chunk)} "
          f"truth={_nb(t_chunk)} prepared={_nb(prepared)}"
      )
    uinv_da = xds.DataArray(
        uinv,
        dims=f_chunk["valid_time"].dims if truth_dedup else ("a", "b"),
    )
    u_dev = _to_device(
        _normalize_any(uinv_da, chunk_dim), sharding_fn
    )
    return (ci, n_real, sl, f_chunk, t_chunk, f_dev, t_dev, p_dev,
            time_mask, u_dev)

  lead_results = []
  lead_slices = (
      list(_chunk_slices(forecast.sizes["lead_time"], lead_chunk))
      if (lead_chunk and "lead_time" in forecast.sizes)
      else [slice(None)]
  )

  # Lead-chunked resume integrity: the state's slice grid must line up
  # with this run's, and every completed slice's results must be present
  # (they ride in the state so a resumed run never recomputes them).
  if resume_configs is not None or resume_chunk or resume_lead:
    if (state.n_lead_slices is not None
        and state.n_lead_slices != len(lead_slices)):
      raise ValueError(
          f"checkpoint was taken with {state.n_lead_slices} lead slices "
          f"but this run has {len(lead_slices)}; pass the same "
          "--input_chunks lead_time to resume"
      )
    if resume_lead >= len(lead_slices) or len(completed_leads) < resume_lead:
      raise ValueError(
          f"checkpoint lead_index={resume_lead} with "
          f"{len(completed_leads)} completed slices does not fit a run "
          f"of {len(lead_slices)} lead slices"
      )

  for lead_i, lead_sl in enumerate(lead_slices):
    if lead_i < resume_lead:
      # finalized in a previous run; carried whole inside the checkpoint
      lead_results.append(completed_leads[lead_i])
      continue
    if lead_i == resume_lead and resume_configs is not None:
      sums_acc = {c: resume_configs[c][0] for c in eval_configs}
      counts_acc = {c: resume_configs[c][1] for c in eval_configs}
      # Checkpoints saved by an older build could carry hash-randomized
      # Dataset variable order (see evaluation._add_base_variables);
      # align to this run's chunk-program structure on first merge.
      needs_align = {c: True for c in eval_configs}
    else:
      sums_acc = {c: None for c in eval_configs}
      counts_acc = {c: None for c in eval_configs}
      needs_align = {c: False for c in eval_configs}
    chunk_list = [
        (ci, sl)
        for ci, sl in enumerate(_chunk_slices(total, chunk_size))
        if not (lead_i == resume_lead and ci < resume_chunk)
    ]

    # Prefetch pipeline: host-side slicing/alignment/prepare/h2d-dispatch
    # for the next `depth` chunks overlaps the device execution of the
    # current one (zarr reads, numpy gathers and transfer dispatch all
    # release the GIL, so two preparations make real progress in parallel).
    import concurrent.futures as _futures

    depth = max(1, int(os.environ.get("WB2_PREFETCH", "2")))
    pool = _futures.ThreadPoolExecutor(max_workers=depth)
    ckpt_pool = (
        _futures.ThreadPoolExecutor(max_workers=1)
        if checkpoint_path and checkpoint_every else None
    )
    ckpt_futures: list = []

    def _ckpt_wait():
      while ckpt_futures:
        ckpt_futures.pop(0).result()

    exec_tokens: list = []
    max_device_inflight = max(
        1, int(os.environ.get("WB2_DEVICE_INFLIGHT", "2"))
    )
    pending = [
        pool.submit(_prepare_one, ci, sl, lead_sl)
        for ci, sl in chunk_list[:depth]
    ]
    try:
      for idx in range(len(chunk_list)):
        t0 = time.perf_counter()
        try:
          (ci, n_real, sl, f_chunk, t_chunk, f_dev, t_dev, p_dev,
           time_mask, u_dev) = pending.pop(0).result()
        except Exception:  # pragma: no cover - transient IO/backend error
          # one retry: storage and tunneled-accelerator transfers can fail
          # transiently (the reference leans on Dataflow bundle retries
          # for this — SURVEY §5; here the chunk is simply re-prepared)
          ci_r, sl_r = chunk_list[idx]
          _vlog(f"chunk {ci_r}: prepare failed, retrying once")
          time.sleep(5)
          (ci, n_real, sl, f_chunk, t_chunk, f_dev, t_dev, p_dev,
           time_mask, u_dev) = _prepare_one(ci_r, sl_r, lead_sl)
        _vlog(f"chunk {ci}: host prepare + h2d", t0)
        if idx + depth < len(chunk_list):
          pending.append(
              pool.submit(_prepare_one, *chunk_list[idx + depth], lead_sl)
          )

        t0 = time.perf_counter()
        chunk_token = None
        for cname, eval_config in eval_configs.items():
          sums, counts = chunk_program_jit_by[cname](
              f_dev, t_dev, p_dev[cname], jnp.asarray(time_mask), u_dev
          )
          if chunk_token is None:
            # sums, not counts: temporal_mean=False configs carry
            # counts=None leaves, which would leave the backpressure
            # bound disengaged for exactly the largest per-time outputs
            chunk_token = _first_leaf(sums)
          if chunk_token is None:
            chunk_token = _first_leaf(counts)

          # host metrics (custom non-jit Metric subclasses) run eagerly
          for name, metric in host_metrics_by[cname].items():
            res = _eval_host_metric(
                metric, f_chunk, t_chunk, regions_by[cname], skipna,
                n_real, chunk_dim, eval_config.temporal_mean,
            )
            sums[name], counts[name] = res

          if eval_config.temporal_mean:
            if sums_acc[cname] is None:
              sums_acc[cname], counts_acc[cname] = sums, counts
            else:
              if needs_align.get(cname):
                sums_acc[cname] = _reorder_like(sums, sums_acc[cname])
                counts_acc[cname] = _reorder_like(
                    counts, counts_acc[cname]
                )
                needs_align[cname] = False
              sums_acc[cname] = jax.tree_util.tree_map(
                  lambda a, b: a + b, sums_acc[cname], sums
              )
              counts_acc[cname] = jax.tree_util.tree_map(
                  lambda a, b: a + b, counts_acc[cname], counts
              )
          else:
            # un-padded per-time results with original coords restored
            for name in sums:
              res = sums[name]
              res = res.isel({chunk_dim: np.arange(n_real)})
              res = res.assign_coords({
                  chunk_dim: np.asarray(
                      forecast.coords_dict()[chunk_dim].data
                  )[sl]
              })
              nontemporal_results[cname].append((name, ci, res))
        _vlog(f"chunk {ci}: program dispatch", t0)

        # Device-memory backpressure: dispatch is async, so when the
        # device (or a remote tunnel in front of it) drains executions
        # slower than the host prepares chunks, every queued execution's
        # input buffers stay resident in HBM — an unbounded pile-up that
        # OOMs exactly when the device is slowest.  Bound the pipeline:
        # before moving past chunk n, wait for chunk n-K's program to
        # finish (its chunk buffers then free).  K=2 keeps one execution
        # overlapped with the next chunk's transfer.
        if chunk_token is not None:
          exec_tokens.append(chunk_token)
          while len(exec_tokens) > max_device_inflight:
            t0 = time.perf_counter()
            jax.block_until_ready(exec_tokens.pop(0))
            _vlog(f"chunk {ci}: backpressure wait", t0)

        state.chunk_index = ci + 1
        state.lead_index = lead_i
        if checkpoint_path and checkpoint_every and (
            (ci + 1) % checkpoint_every == 0
        ):
          only = next(iter(eval_configs))
          snap = StreamingState(
              # legacy fields kept populated for single-config readers
              sums_acc[only] if len(eval_configs) == 1 else None,
              counts_acc[only] if len(eval_configs) == 1 else None,
              ci + 1,
              chunk_size=chunk_size, total=total,
              configs={c: (sums_acc[c], counts_acc[c])
                       for c in eval_configs},
              lead_index=lead_i,
              n_lead_slices=len(lead_slices),
              # finalized results of lead slices 0..lead_i-1 (host data)
              completed_leads=list(lead_results),
          )

          # async save: the device_get inside save() drains the device
          # queue, which would stall the prefetch pipeline for the
          # duration of every queued remote execution; the accumulators
          # are immutable jax arrays so a background thread can fetch
          # and write them while streaming continues.  One worker +
          # os.replace keeps saves ordered and the file always whole.
          def _save_snapshot(s=snap):
            tmp = checkpoint_path + ".tmp"
            s.save(tmp)
            os.replace(tmp, checkpoint_path)

          if ckpt_pool is not None:
            _ckpt_wait()  # at most one save in flight
            ckpt_futures.append(ckpt_pool.submit(_save_snapshot))
    finally:
      pool.shutdown(wait=True)
      if ckpt_pool is not None:
        _ckpt_wait()
        ckpt_pool.shutdown(wait=True)

    # fetch all configs' accumulators to host in one packed device_get
    t0 = time.perf_counter()
    sums_acc, counts_acc = batched_device_get((sums_acc, counts_acc))
    _vlog("final device_get", t0)
    per_config = {}
    for cname, eval_config in eval_configs.items():
      if eval_config.temporal_mean:
        per_metric = []
        for name in eval_config.metrics:
          mean_ds = _finalize_mean(
              sums_acc[cname][name], counts_acc[cname][name]
          )
          mean_ds = mean_ds.expand_dims(
              metric=np.asarray([name], dtype=object)
          )
          per_metric.append(mean_ds)
        per_config[cname] = merge_metric_results(per_metric)
      else:
        by_metric = {}
        for name, ci, res in nontemporal_results[cname]:
          by_metric.setdefault(name, []).append((ci, res))
        per_metric = []
        for name, items in by_metric.items():
          items.sort()
          cat = xds.concat(
              [r for _, r in items], chunk_dim
          ).to_numpy_ds()
          per_metric.append(
              cat.expand_dims(metric=np.asarray([name], dtype=object))
          )
        per_config[cname] = merge_metric_results(per_metric)
        nontemporal_results[cname] = []
    lead_results.append(per_config)

  if profile_dir:
    jax.profiler.stop_trace()

  if len(lead_results) == 1:
    return lead_results[0]
  return {
      c: xds.concat([lr[c] for lr in lead_results], "lead_time")
      for c in eval_configs
  }


def _finalize_mean(sum_ds: xds.Dataset, count_ds: xds.Dataset) -> xds.Dataset:
  out = xds.Dataset({}, coords=dict(sum_ds.coords_dict()))
  for k in sum_ds.keys():
    s = np.asarray(xds.core._to_numpy(sum_ds[k].data), dtype=np.float64)
    c = np.asarray(xds.core._to_numpy(count_ds[k].data), dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
      mean = np.where(c > 0, s / np.maximum(c, 1), np.nan)
    out[k] = xds.Variable(sum_ds[k].dims, mean)
  return out


def _eval_host_metric(metric, f_chunk, t_chunk, regions, skipna, n_real,
                      chunk_dim, temporal_mean):
  """Evaluate a non-jit metric eagerly on host, masked-accumulated."""
  f_host = f_chunk.to_numpy_ds()
  t_host = t_chunk.to_numpy_ds()
  region_results = []
  for region_name, region in regions.items():
    res = metric.compute_chunk(
        f_host, t_host, region=region, skipna=skipna
    )
    if region_name is not None:
      res = res.expand_dims(region=np.asarray([region_name], dtype=object))
    region_results.append(res)
  result = (
      xds.concat(region_results, "region")
      if len(region_results) > 1 or None not in regions
      else region_results[0]
  )
  if not temporal_mean:
    return result, None
  sum_ds = xds.Dataset({}, coords={
      k: v
      for k, v in result.coords_dict().items()
      if chunk_dim not in v.dims
  })
  cnt_ds = xds.Dataset({}, coords=dict(sum_ds.coords_dict()))
  for vname in result.keys():
    da = result[vname]
    ax = da.dims.index(chunk_dim)
    vals = np.asarray(da.values, dtype=np.float64)
    key = [slice(None)] * vals.ndim
    key[ax] = slice(0, n_real)
    vals = vals[tuple(key)]
    if skipna:
      valid = ~np.isnan(vals)
      s = np.where(valid, vals, 0.0).sum(axis=ax)
      c = valid.sum(axis=ax)
    else:
      s = vals.sum(axis=ax)
      c = np.full(s.shape, vals.shape[ax])
    dims = tuple(d for d in da.dims if d != chunk_dim)
    sum_ds[vname] = xds.Variable(dims, s)
    cnt_ds[vname] = xds.Variable(dims, c)
  return sum_ds, cnt_ds


def _make_truth_chunk(
    f_chunk, truth, climatology, prob_clim, eval_config, data_config,
    unique_times=None,
):
  """Align truth to the forecast chunk; substitute baseline forecasts.

  With ``unique_times`` (truth h2d dedup) the truth chunk is the compact
  (time=unique, ...) selection; the chunk program expands it on device.
  """
  by_init = data_config.by_init

  if unique_times is not None:
    t_chunk = truth.sel(time=unique_times)
  elif by_init:
    t_chunk = truth.sel(time=f_chunk["valid_time"])
  else:
    t_chunk = truth.sel(time=f_chunk.coords_dict()["time"].data)

  # baseline forecast substitution (climatology / prob-clim / persistence)
  if eval_config.evaluate_climatology and climatology is not None:
    from weatherbench2_tpu.evaluation import (
        substitute_climatology_forecast,
    )

    f_chunk = substitute_climatology_forecast(
        f_chunk, climatology, by_init
    )
  elif eval_config.evaluate_probabilistic_climatology and (
      prob_clim is not None
  ):
    time_dim = "valid_time" if by_init else "time"
    names = list(f_chunk.keys())
    sel = dict(dayofyear=f_chunk[time_dim].dt.dayofyear)
    if "hour" in prob_clim.sizes:
      sel["hour"] = f_chunk[time_dim].dt.hour
    new_f = prob_clim[names].sel(sel)
    for cn, cv in f_chunk.coords_dict().items():
      if cn not in new_f.coords_dict():
        new_f = new_f.assign_coords({cn: cv})
    f_chunk = new_f
  elif eval_config.evaluate_persistence:
    if not by_init:
      raise NotImplementedError(
          "Persistence in streaming mode requires by-init format."
      )
    from weatherbench2_tpu.evaluation import (
        create_persistence_forecast_by_init,
    )

    f_chunk = create_persistence_forecast_by_init(f_chunk, truth)

  return f_chunk, t_chunk
