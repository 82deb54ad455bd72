"""Property-based tests of xds core semantics against numpy oracles."""
import numpy as np
from hypothesis import given, settings, strategies as st

from weatherbench2_tpu import xds

DIM_POOL = ("a", "b", "c", "d")
SIZES = {"a": 3, "b": 4, "c": 2, "d": 5}


def _dims_subset(draw, min_size=1):
  dims = draw(
      st.lists(
          st.sampled_from(DIM_POOL), min_size=min_size, max_size=3,
          unique=True,
      )
  )
  return tuple(dims)


@st.composite
def _two_arrays(draw):
  d1 = _dims_subset(draw)
  d2 = _dims_subset(draw)
  rs = np.random.RandomState(draw(st.integers(0, 2**31 - 1)))
  x = rs.randn(*[SIZES[d] for d in d1]).astype(np.float32)
  y = rs.randn(*[SIZES[d] for d in d2]).astype(np.float32)
  return (
      xds.DataArray(x, dims=d1),
      xds.DataArray(y, dims=d2),
      d1,
      d2,
  )


def _numpy_broadcast(x, y, d1, d2):
  """First-appearance-order named broadcasting in plain numpy."""
  out_dims = list(d1) + [d for d in d2 if d not in d1]
  xs = np.moveaxis(
      x.reshape(x.shape + (1,) * (len(out_dims) - x.ndim)),
      list(range(len(d1))),
      [out_dims.index(d) for d in d1],
  )
  ys = np.moveaxis(
      y.reshape(y.shape + (1,) * (len(out_dims) - y.ndim)),
      list(range(len(d2))),
      [out_dims.index(d) for d in d2],
  )
  return out_dims, xs + ys


@settings(max_examples=60, deadline=None)
@given(_two_arrays())
def test_named_broadcast_addition_matches_numpy(arrs):
  da1, da2, d1, d2 = arrs
  out = da1 + da2
  out_dims, expected = _numpy_broadcast(da1.values, da2.values, d1, d2)
  assert out.dims == tuple(out_dims)
  np.testing.assert_allclose(out.values, expected, rtol=1e-6)


@settings(max_examples=60, deadline=None)
@given(
    st.integers(0, 2**31 - 1),
    st.sampled_from(DIM_POOL),
    st.booleans(),
)
def test_mean_reduction_matches_numpy(seed, dim, skipna):
  rs = np.random.RandomState(seed)
  dims = ("a", "b", "c")
  x = rs.randn(*[SIZES[d] for d in dims]).astype(np.float64)
  x[rs.rand(*x.shape) < 0.2] = np.nan
  if dim not in dims:
    return
  da = xds.DataArray(x, dims=dims)
  got = da.mean(dim, skipna=skipna).values
  ax = dims.index(dim)
  want = np.nanmean(x, axis=ax) if skipna else np.mean(x, axis=ax)
  np.testing.assert_allclose(got, want, rtol=1e-12, equal_nan=True)


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 2**31 - 1), st.booleans())
def test_weighted_mean_matches_manual(seed, skipna):
  rs = np.random.RandomState(seed)
  x = rs.randn(4, 6).astype(np.float64)
  x[rs.rand(4, 6) < 0.25] = np.nan
  w = np.abs(rs.randn(6)) + 0.1
  da = xds.DataArray(x, dims=("t", "lat"),
                     coords={"lat": np.arange(6.0)})
  wda = xds.DataArray(w, dims=("lat",),
                      coords={"lat": np.arange(6.0)})
  got = da.weighted(wda).mean("lat", skipna=skipna).values
  if skipna:
    mask = ~np.isnan(x)
    num = np.nansum(x * w[None, :], axis=1)
    den = (mask * w[None, :]).sum(axis=1)
    want = num / den
  else:
    want = (x * w[None, :]).sum(axis=1) / w.sum()
  np.testing.assert_allclose(got, want, rtol=1e-12, equal_nan=True)


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_sel_isel_equivalence(seed):
  rs = np.random.RandomState(seed)
  n = 8
  labels = np.sort(rs.choice(1000, size=n, replace=False))
  x = rs.randn(n, 3).astype(np.float32)
  da = xds.DataArray(
      x, dims=("time", "k"), coords={"time": labels}
  )
  idx = rs.randint(0, n, size=4)
  np.testing.assert_array_equal(
      da.sel(time=labels[idx]).values, da.isel(time=idx).values
  )
  lo, hi = sorted(rs.choice(n, size=2, replace=False))
  np.testing.assert_array_equal(
      da.sel(time=slice(labels[lo], labels[hi])).values,
      da.isel(time=slice(lo, hi + 1)).values,
  )


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_transpose_roundtrip(seed):
  rs = np.random.RandomState(seed)
  dims = ("a", "b", "c")
  x = rs.randn(*[SIZES[d] for d in dims]).astype(np.float32)
  da = xds.DataArray(x, dims=dims)
  perm = list(dims)
  rs.shuffle(perm)
  out = da.transpose(*perm).transpose(*dims)
  np.testing.assert_array_equal(out.values, x)
  assert out.dims == dims


# ---- metric invariance properties -----------------------------------------


def _rand_pair(seed, ensemble=None, align=True):
  from weatherbench2_tpu import schema, utils

  kwargs = dict(
      variables_3d=[],
      variables_2d=["2m_temperature"],
      time_start="2020-01-01",
      time_stop="2020-01-12",
      spatial_resolution_in_degrees=30.0,
  )
  truth = utils.random_like(schema.mock_truth_data(**kwargs), seed=seed)
  fc = utils.random_like(
      schema.mock_forecast_data(
          ensemble_size=ensemble, lead_stop="2 days",
          **{**kwargs, "time_stop": "2020-01-08"},
      ),
      seed=seed + 1,
  )
  if align:
    truth = truth.sel(time=fc["time"].values)
  return fc, truth


def _scaled(ds, a, b):
  return ds.copy(
      data={k: a * v.values + b for k, v in ds.data_arrays().items()}
      if hasattr(ds, "data_arrays")
      else {k: a * ds[k].values + b for k in ds.keys()}
  )


@settings(max_examples=10, deadline=None)
@given(
    st.integers(0, 1000),
    st.floats(0.5, 4.0),
    st.floats(-3.0, 3.0),
)
def test_metric_scale_shift_equivariance(seed, a, b):
  """MAE/CRPS scale linearly and are shift-invariant; MSE scales as a²."""
  from weatherbench2_tpu import metrics

  fc, truth = _rand_pair(seed, ensemble=5)
  fc2 = _scaled(fc, a, b)
  truth2 = _scaled(truth, a, b)

  crps = metrics.CRPS().compute(fc, truth)["2m_temperature"].values
  crps2 = metrics.CRPS().compute(fc2, truth2)["2m_temperature"].values
  np.testing.assert_allclose(crps2, a * crps, rtol=2e-4)

  det = fc.isel(realization=0)
  det2 = fc2.isel(realization=0)
  mae = metrics.MAE().compute(det, truth)["2m_temperature"].values
  mae2 = metrics.MAE().compute(det2, truth2)["2m_temperature"].values
  np.testing.assert_allclose(mae2, a * mae, rtol=2e-4)

  mse = metrics.MSE().compute(det, truth)["2m_temperature"].values
  mse2 = metrics.MSE().compute(det2, truth2)["2m_temperature"].values
  np.testing.assert_allclose(mse2, a * a * mse, rtol=2e-4)


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 1000))
def test_crps_perfect_deterministic_forecast_is_zero(seed):
  """CRPS of a single-member forecast equal to truth is exactly 0."""
  from weatherbench2_tpu import metrics, schema

  fc, truth = _rand_pair(seed, ensemble=1, align=False)
  fc = schema.apply_time_conventions(fc, by_init=True)
  aligned = truth.sel(time=fc["valid_time"])
  target_dims = tuple(
      d for d in fc["2m_temperature"].dims if d != "realization"
  )
  vals = aligned["2m_temperature"].variable.broadcast_to_dims(
      target_dims,
      {d: fc.sizes[d] for d in target_dims},
  ).data
  perfect = fc.copy(
      data={
          "2m_temperature": np.broadcast_to(
              np.asarray(vals)[None], fc["2m_temperature"].shape
          )
      }
  )
  crps = metrics.CRPS().compute(perfect, aligned.rename(
      {"time": "init_time"} if "time" in aligned.sizes else {}
  ))["2m_temperature"].values
  np.testing.assert_allclose(crps, 0.0, atol=1e-6)


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(1, 5))
def test_concat_isel_roundtrip(seed, nsplit):
  rs = np.random.RandomState(seed)
  n = 12
  x = rs.randn(n, 3).astype(np.float32)
  da = xds.DataArray(
      x, dims=("t", "k"), coords={"t": np.arange(n)}
  )
  cuts = np.unique(rs.randint(1, n, size=nsplit))
  bounds = [0, *cuts.tolist(), n]
  pieces = [
      da.isel(t=slice(a, b)) for a, b in zip(bounds[:-1], bounds[1:])
      if b > a
  ]
  back = xds.concat(pieces, "t")
  np.testing.assert_array_equal(back.values, x)
  np.testing.assert_array_equal(
      np.asarray(back.coords["t"].data), np.arange(n)
  )


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_where_matches_numpy(seed):
  rs = np.random.RandomState(seed)
  x = rs.randn(5, 4).astype(np.float64)
  da = xds.DataArray(x, dims=("a", "b"))
  cond = da > 0
  np.testing.assert_array_equal(
      da.where(cond).values, np.where(x > 0, x, np.nan)
  )
  np.testing.assert_array_equal(
      da.where(cond, -1.0).values, np.where(x > 0, x, -1.0)
  )


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_expand_dims_then_reduce_is_identity(seed):
  rs = np.random.RandomState(seed)
  x = rs.randn(4, 3).astype(np.float32)
  da = xds.DataArray(x, dims=("a", "b"))
  out = da.expand_dims(c=np.arange(2)).mean("c")
  np.testing.assert_allclose(
      out.transpose("a", "b").values, x, rtol=1e-6
  )
