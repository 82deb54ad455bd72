"""Tile-schedule sweep for the fused deterministic kernel (real TPU).

Round-2 swept tiles only at the bench geometry (B=11529, L=2048,
3 regions) where the kernel hits 320 GB/s; at the official 0.25-degree
shape (B=126, L=1,038,240, 13 regions) it measured 187 GB/s with the
default schedule — wide-L/small-B collapses the grid to one row-tile and
many tiny column-steps, so per-step overhead dominates.  This sweeps
(b_tile, l_tile, vmem budget) at both geometries, catching Mosaic VMEM
failures, and reports effective read bandwidth.

Timing protocol per the sandbox rules (the tunneled TPU memoizes
identical executions): inputs vary per scan iteration via an in-scan
increment, and each schedule runs under ONE lax.scan so dispatch RTT
amortizes.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/sweep_tiles.py [n_iters]
"""
import json
import os
import sys
import time

# `python tools/sweep_tiles.py` puts tools/ (not the repo root) on
# sys.path — bootstrap the root and the axon TPU client site so the
# sweep runs without a PYTHONPATH incantation (chain5's sweep leg
# failed all schedules on exactly this).
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for _p in (_REPO, "/root/.axon_site"):
  if os.path.isdir(_p) and _p not in sys.path:
    sys.path.insert(0, _p)

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/wb2_jax_compile_cache"
)

GEOMETRIES = {
    # (B, L, n_regions)
    "official_0p25": (126, 1440 * 721, 13),
    "bench": (11529, 2048, 3),
}

# (b_tile, l_tile, tile_budget)
SCHEDULES = [
    (128, 1024, 131072),        # current default
    (128, 2048, 262144),
    (128, 4096, 524288),
    (128, 8192, 1048576),
    (256, 2048, 524288),
    (512, 1024, 524288),
    (1024, 1024, 1048576),
]


def _bw(seconds, b, l, iters):
  gb = 3 * b * l * 4 * iters / 1e9
  return gb / seconds


def run_schedule(b, l, r, b_tile, l_tile, budget, iters):
  import jax
  import jax.numpy as jnp

  from weatherbench2_tpu import ops

  os.environ["WB2_PALLAS_TILE_BUDGET"] = str(budget)
  rng = np.random.default_rng(0)
  f = jnp.asarray(rng.standard_normal((b, l), dtype=np.float32))
  t = jnp.asarray(rng.standard_normal((b, l), dtype=np.float32))
  c = jnp.asarray(rng.standard_normal((b, l), dtype=np.float32))
  w = np.abs(rng.standard_normal((r, l))).astype(np.float32)
  w[:, :: max(1, l // 7)] = 0.0  # some zero weights (region masking)

  def step(carry, i):
    # vary inputs per iteration so the tunnel cannot memoize executions
    fi = f + i.astype(jnp.float32)
    sums, wsum, nanw = ops.fused_deterministic_sums(
        fi, t, c, w, b_tile=b_tile, l_tile=l_tile
    )
    return carry + sums.sum() + wsum.sum() + nanw.sum(), 0.0

  @jax.jit
  def scan_all(base):
    # `base` offsets every iteration's input: the timed pass must not be
    # byte-identical to the warm-up pass, or the tunnel's (program,
    # input) execution memoization serves it from cache and the row
    # measures dispatch RTT
    out, _ = jax.lax.scan(
        step, jnp.float32(0), base + jnp.arange(iters)
    )
    return out

  out = scan_all(jnp.int32(0))
  out.block_until_ready()  # compile + warm
  start = time.perf_counter()
  out = scan_all(jnp.int32(iters))
  out.block_until_ready()
  seconds = time.perf_counter() - start
  return seconds


# The pointwise-fused tier's kernel (fused_region_sums) has a different
# VMEM profile: ONE input block instead of three.  Its 0.25-degree shape
# is (fields x batch) rows by 1440*721 cells — at the official 13-var
# config with init_time=1 chunks, ACC alone stacks 3 stats x 42
# var-level rows.  Bandwidth counts 1 input read per cell.
REGION_GEOMETRIES = {
    "rs_official13_0p25": (126, 1440 * 721, 13),
    "rs_wide_rows_0p25": (1024, 1440 * 721, 13),
}

REGION_SCHEDULES = [
    (128, 2048, 262144),        # current default
    (128, 4096, 524288),
    (128, 8192, 1048576),
    (128, 16384, 2097152),
    (256, 8192, 2097152),
    (512, 4096, 2097152),
]


def run_region_schedule(n, l, r, n_tile, l_tile, budget, iters):
  import jax
  import jax.numpy as jnp

  from weatherbench2_tpu import ops

  os.environ["WB2_REGION_TILE_BUDGET"] = str(budget)
  rng = np.random.default_rng(0)
  x = jnp.asarray(rng.standard_normal((n, l), dtype=np.float32))
  w = np.abs(rng.standard_normal((r, l))).astype(np.float32)
  w[:, :: max(1, l // 7)] = 0.0

  def step(carry, i):
    xi = x + i.astype(jnp.float32)
    sums, wsum, nanw = ops.fused_region_sums(
        xi, w, n_tile=n_tile, l_tile=l_tile
    )
    return carry + sums.sum() + wsum.sum() + nanw.sum(), 0.0

  @jax.jit
  def scan_all(base):
    out, _ = jax.lax.scan(step, jnp.float32(0), base + jnp.arange(iters))
    return out

  out = scan_all(jnp.int32(0))
  out.block_until_ready()
  start = time.perf_counter()
  out = scan_all(jnp.int32(iters))
  out.block_until_ready()
  return time.perf_counter() - start


def _with_transient_retry(key, fn, *args, retries=2, backoff_s=90):
  """Retry a schedule on transient tunnel-infrastructure errors.

  The sweep's three prior in-chain attempts all died on
  `UNAVAILABLE .. remote_compile .. Network Error` — the tunnel's
  compile service flaking, not a property of the schedule (the same
  kernels compiled fine at this shape in the eval runs).  VMEM OOMs
  and other genuine Mosaic failures are NOT retried."""
  for attempt in range(retries + 1):
    try:
      return fn(*args)
    except Exception as e:  # noqa: BLE001
      msg = str(e)
      transient = ("UNAVAILABLE" in msg or "Network Error" in msg
                   or "remote_compile" in msg)
      if not transient or attempt == retries:
        raise
      print(f"{key}: transient backend error (attempt {attempt + 1}), "
            f"retrying in {backoff_s}s: {msg[:100]}",
            file=sys.stderr, flush=True)
      time.sleep(backoff_s)


def main(iters, geo_filter=None):
  results = []
  def _keep(name):
    return geo_filter is None or geo_filter in name
  for geo_name, (b, l, r) in GEOMETRIES.items():
    if not _keep(geo_name):
      continue
    for b_tile, l_tile, budget in SCHEDULES:
      key = f"{geo_name} b{b_tile}xl{l_tile} budget={budget}"
      try:
        seconds = _with_transient_retry(
            key, run_schedule, b, l, r, b_tile, l_tile, budget, iters)
      except Exception as e:  # noqa: BLE001 - VMEM OOM etc.
        print(f"{key}: FAILED {str(e)[:120]}", file=sys.stderr, flush=True)
        continue
      bw = _bw(seconds, b, l, iters)
      row = {
          "geometry": geo_name, "b_tile": b_tile, "l_tile": l_tile,
          "budget": budget,
          "ms_per_call": round(1000 * seconds / iters, 3),
          "read_gb_s": round(bw, 1),
      }
      results.append(row)
      print(json.dumps(row), flush=True)
  for geo_name, (n, l, r) in REGION_GEOMETRIES.items():
    if not _keep(geo_name):
      continue
    for n_tile, l_tile, budget in REGION_SCHEDULES:
      key = f"{geo_name} n{n_tile}xl{l_tile} budget={budget}"
      try:
        seconds = _with_transient_retry(
            key, run_region_schedule, n, l, r, n_tile, l_tile, budget,
            iters)
      except Exception as e:  # noqa: BLE001 - VMEM OOM etc.
        print(f"{key}: FAILED {str(e)[:120]}", file=sys.stderr, flush=True)
        continue
      gb = n * l * 4 * iters / 1e9  # one input matrix per call
      row = {
          "geometry": geo_name, "n_tile": n_tile, "l_tile": l_tile,
          "budget": budget,
          "ms_per_call": round(1000 * seconds / iters, 3),
          "read_gb_s": round(gb / seconds, 1),
      }
      results.append(row)
      print(json.dumps(row), flush=True)
  best = {}
  for row in results:
    g = row["geometry"]
    if g not in best or row["read_gb_s"] > best[g]["read_gb_s"]:
      best[g] = row
  print(json.dumps({"best": best}), flush=True)


if __name__ == "__main__":
  main(int(sys.argv[1]) if len(sys.argv) > 1 else 30,
       sys.argv[2] if len(sys.argv) > 2 else None)
