"""Tests for xds.stream (windows/template/RegionWriter) and storage dispatch.

The harness replaces the reference's Beam chunk pipeline scaffolding
(/root/reference/scripts/resample_in_time.py:312-451 template/chunk logic);
kvstore dispatch mirrors the reference opening cloud zarr directly
(/root/reference/weatherbench2/evaluation.py:92-136).
"""
import numpy as np
import pytest

from weatherbench2_tpu import xds
from weatherbench2_tpu.xds import io_zarr
from weatherbench2_tpu.xds import stream


def test_iter_windows_covers_exactly():
  sizes = {"time": 10, "lat": 4, "lon": 3}
  seen = np.zeros((10, 4), dtype=int)
  wins = list(stream.iter_windows(sizes, {"time": 3, "lat": 2}))
  for w in wins:
    assert set(w) == {"time", "lat"}
    seen[w["time"], w["lat"]] += 1
  np.testing.assert_array_equal(seen, 1)


def test_iter_windows_full_span_dims_omitted():
  wins = list(stream.iter_windows({"a": 5, "b": 2}, {"a": -1, "b": 5}))
  assert wins == [{}]
  wins = list(stream.iter_windows({"a": 5}, {}))
  assert wins == [{}]


def test_shape_stub_refuses_materialization():
  stub = stream.ShapeStub((3, 4), np.float32)
  assert stub.shape == (3, 4) and stub.ndim == 2 and stub.size == 12
  with pytest.raises(ValueError):
    np.asarray(stub)
  with pytest.raises(ValueError):
    stub[0]


def test_template_dataset_expands_probe(tmp_path):
  probe = xds.Dataset(
      {"x": xds.Variable(("time", "lat"), np.zeros((2, 3), np.float32))},
      coords={"time": np.arange(2), "lat": np.arange(3.0)},
  )
  full_time = np.arange(10)
  tpl = stream.template_dataset(
      probe, {"time": 10},
      coords={"time": xds.Variable(("time",), full_time)},
  )
  assert tpl["x"].shape == (10, 3)
  assert isinstance(tpl.variables_dict()["x"].data, stream.ShapeStub)
  # probe-sized coord along an expanded dim must be rejected
  with pytest.raises(ValueError):
    stream.template_dataset(probe, {"time": 10})


def test_region_writer_roundtrip(tmp_path):
  path = str(tmp_path / "out.zarr")
  rng = np.random.RandomState(0)
  full = rng.randn(8, 5).astype(np.float32)
  tpl = xds.Dataset(
      {"x": stream.stub_variable(("time", "lat"), {"time": 8, "lat": 5},
                                 np.float32)},
      coords={"time": np.arange(8), "lat": np.arange(5.0)},
  )
  writer = stream.RegionWriter(path, tpl, chunks={"time": 2}, max_inflight=2)
  for w in stream.iter_windows({"time": 8, "lat": 5}, {"time": 3}):
    piece = xds.Dataset(
        # deliberately transposed piece: writer must realign dims
        {"x": xds.Variable(("lat", "time"), full[w["time"]].T)},
        coords={"time": np.arange(8)[w["time"]], "lat": np.arange(5.0)},
    )
    writer.write(piece, w)
  writer.finish()
  out = xds.open_zarr(path)
  np.testing.assert_allclose(np.asarray(out["x"].values), full, rtol=1e-6)


def test_streaming_transform_matches_eager(tmp_path):
  src_path = str(tmp_path / "src.zarr")
  out_path = str(tmp_path / "out.zarr")
  rng = np.random.RandomState(1)
  data = rng.randn(12, 6, 4).astype(np.float32)
  src = xds.Dataset(
      {"t2m": xds.Variable(("time", "lat", "lon"), data)},
      coords={"time": np.arange(12), "lat": np.arange(6.0),
              "lon": np.arange(4.0)},
  )
  xds.to_zarr(src, src_path, chunks={"time": 2})
  lazy = xds.open_zarr(src_path, lazy=True)
  tpl = stream.template_dataset(
      xds.Dataset(
          {"t2m": xds.Variable(("time", "lat", "lon"),
                               np.zeros((1, 6, 4), np.float32))},
          coords={"lat": np.arange(6.0), "lon": np.arange(4.0)},
      ),
      {"time": 12},
      coords={"time": xds.Variable(("time",), np.arange(12))},
  )
  stream.streaming_transform(
      tpl, out_path, {"time": 5},
      compute=lambda w: (lazy.isel(w) * 2.0),
  )
  out = xds.open_zarr(out_path)
  np.testing.assert_allclose(np.asarray(out["t2m"].values), data * 2.0,
                             rtol=1e-6)


def test_clustered_positions():
  assert stream.clustered_positions([]) == []
  assert stream.clustered_positions([3]) == [slice(3, 4)]
  cl = stream.clustered_positions([0, 1, 2, 100, 101, 5000], max_gap=16)
  assert cl == [slice(0, 3), slice(100, 102), slice(5000, 5001)]
  # gaps <= max_gap merge into one read
  assert stream.clustered_positions([0, 10, 20], max_gap=16) == [
      slice(0, 21)
  ]


def test_kvstore_spec_dispatch():
  spec = io_zarr.kvstore_spec("gs://bucket/a/b", "temp/.zarray")
  assert spec == {"driver": "gcs", "bucket": "bucket",
                  "path": "a/b/temp/.zarray"}
  spec = io_zarr.kvstore_spec("s3://buck/pre")
  assert spec["driver"] == "s3" and spec["bucket"] == "buck"
  spec = io_zarr.kvstore_spec("https://host/data.zarr", "x")
  assert spec == {"driver": "http", "base_url": "https://host/data.zarr/",
                  "path": "x"}
  spec = io_zarr.kvstore_spec("/local/path", "x")
  assert spec == {"driver": "file", "path": "/local/path/x",
                  "file_io_sync": False}
  assert io_zarr.is_remote("gs://b/p") and not io_zarr.is_remote("/tmp/x")


def test_kvstore_spec_local_sync_opt_in(monkeypatch):
  """WB2_FILE_IO_SYNC=1 restores per-chunk fsync durability; remote
  drivers never carry the local-only option."""
  monkeypatch.setenv("WB2_FILE_IO_SYNC", "1")
  spec = io_zarr.kvstore_spec("/local/path", "x")
  assert "file_io_sync" not in spec
  monkeypatch.delenv("WB2_FILE_IO_SYNC")
  assert "file_io_sync" not in io_zarr.kvstore_spec("gs://bucket/p")


def test_remote_array_spec_has_cache_when_requested(monkeypatch):
  monkeypatch.setenv("WB2_TS_CACHE_BYTES", "1000000")
  spec = io_zarr._array_spec("gs://bucket/ds.zarr", "2m_temperature")
  assert spec["context"]["cache_pool"]["total_bytes_limit"] == 1000000
  assert spec["kvstore"]["driver"] == "gcs"
  monkeypatch.delenv("WB2_TS_CACHE_BYTES")
  spec = io_zarr._array_spec("gs://bucket/ds.zarr", "2m_temperature")
  assert "context" not in spec


def test_coord_classification_uses_declarations(tmp_path):
  # a data variable named "level" must stay a data variable (the name
  # whitelist only applies to legacy stores without declarations)
  path = str(tmp_path / "lv.zarr")
  ds = xds.Dataset(
      {"level": xds.Variable(("time",), np.arange(4.0)),
       "t": xds.Variable(("time",), np.ones(4))},
      coords={"time": np.arange(4),
              "valid_time": xds.Variable(
                  ("time",),
                  (np.datetime64("2020-01-01", "ns")
                   + np.arange(4) * np.timedelta64(1, "h")))},
  )
  xds.to_zarr(ds, path)
  back = xds.open_zarr(path)
  assert "level" in back.keys()           # still a data var
  assert "valid_time" in back.coords_dict()  # declared non-dim coord
  lazy = xds.open_zarr(path, lazy=True)
  assert "level" in lazy.keys()
  assert "valid_time" in lazy.coords_dict()
