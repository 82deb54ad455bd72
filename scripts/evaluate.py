r"""Run the WeatherBench-2-compatible evaluation pipeline on TPU.

CLI-compatible with the reference's scripts/evaluate.py (same flag names,
predefined regions, and eval-config names; see reference
scripts/evaluate.py:56-684), but dispatching to the TPU streaming engine
(`--use_mesh`, aliased from `--use_beam`) instead of an Apache Beam
pipeline.

Example:
  python scripts/evaluate.py \
    --forecast_path=/data/forecast.zarr \
    --obs_path=/data/era5.zarr \
    --climatology_path=/data/climatology.zarr \
    --output_dir=/data/evals/ \
    --input_chunks=init_time=64 \
    --eval_configs=deterministic \
    --use_mesh=True
"""
import ast
import sys

from absl import app
from absl import flags

from weatherbench2_tpu import config
from weatherbench2_tpu import evaluation
from weatherbench2_tpu import flag_utils
from weatherbench2_tpu import metrics
from weatherbench2_tpu import thresholds
from weatherbench2_tpu import xds
from weatherbench2_tpu.derived_variables import DERIVED_VARIABLE_DICT
from weatherbench2_tpu.regions import CombinedRegion, LandRegion, SliceRegion

_DEFAULT_VARIABLES = [
    "geopotential",
    "temperature",
    "u_component_of_wind",
    "v_component_of_wind",
    "specific_humidity",
    "2m_temperature",
    "mean_sea_level_pressure",
]

FORECAST_PATH = flag_utils.DEFINE_string(
    "forecast_path", None, help="Path to forecast Zarr store")
OBS_PATH = flag_utils.DEFINE_string(
    "obs_path", None, help="Path to ground-truth Zarr store")
CLIMATOLOGY_PATH = flag_utils.DEFINE_string(
    "climatology_path", None, help="Path to climatology (for ACC etc.)")
BY_INIT = flag_utils.DEFINE_bool(
    "by_init", True, help="Forecasts in by-init (vs by-valid) format.")
EVALUATE_PERSISTENCE = flag_utils.DEFINE_bool(
    "evaluate_persistence", False, "Evaluate persistence forecast.")
EVALUATE_CLIMATOLOGY = flag_utils.DEFINE_bool(
    "evaluate_climatology", False, "Evaluate climatology forecast.")
EVALUATE_PROBABILISTIC_CLIMATOLOGY = flag_utils.DEFINE_bool(
    "evaluate_probabilistic_climatology", False,
    "Evaluate probabilistic climatology (years as ensemble members).")
PROBABILISTIC_CLIMATOLOGY_START_YEAR = flag_utils.DEFINE_integer(
    "probabilistic_climatology_start_year", None,
    "First ground-truth year for probabilistic climatology")
PROBABILISTIC_CLIMATOLOGY_END_YEAR = flag_utils.DEFINE_integer(
    "probabilistic_climatology_end_year", None,
    "Last ground-truth year for probabilistic climatology")
PROBABILISTIC_CLIMATOLOGY_HOUR_INTERVAL = flag_utils.DEFINE_integer(
    "probabilistic_climatology_hour_interval", 6,
    "Hour interval for probabilistic climatology")
REGIONS = flag_utils.DEFINE_list(
    "regions", None,
    help='Predefined regions to evaluate ("all" for all of them).')
LSM_DATASET = flag_utils.DEFINE_string(
    "lsm_dataset", None,
    help="Dataset with land_sea_mask (defaults to obs dataset).")
COMPUTE_SEEPS = flag_utils.DEFINE_bool(
    "compute_seeps", False, "Compute SEEPS for precipitation.")
EVAL_CONFIGS = flag_utils.DEFINE_string(
    "eval_configs", "deterministic",
    help="Comma-separated list of eval configs to run.")
ENSEMBLE_DIM = flag_utils.DEFINE_string(
    "ensemble_dim", "number", help="Name of the ensemble dimension.")
RENAME_VARIABLES = flag_utils.DEFINE_string(
    "rename_variables", None,
    help='Dict literal of renames, e.g. {"2t": "2m_temperature"}')
SKIPNA = flag_utils.DEFINE_boolean(
    "skipna", False, help="Skip NaNs when evaluating.")
PRESSURE_LEVEL_SUFFIXES = flag_utils.DEFINE_bool(
    "pressure_level_suffixes", False,
    help="Decode pressure-level-suffixed variable names.")
LEVELS = flag_utils.DEFINE_list(
    "levels", ["500", "700", "850"], help="Pressure levels to evaluate.")
VARIABLES = flag_utils.DEFINE_list(
    "variables", _DEFAULT_VARIABLES, help="Variables to evaluate.")
AUX_VARIABLES = flag_utils.DEFINE_list(
    "aux_variables", None, help="Auxiliary forecast variables.")
DERIVED_VARIABLES = flag_utils.DEFINE_list(
    "derived_variables", [],
    help="Derived variables to compute on the fly.")
THRESHOLD_METHOD = flag_utils.DEFINE_string(
    "threshold_method", "quantile",
    help='"quantile" or "gaussian_quantile".')
QUANTILE_THRESHOLDS = flag_utils.DEFINE_list(
    "quantile_thresholds", [],
    help="Climatological quantiles for binary metrics.")
TIME_START = flag_utils.DEFINE_string(
    "time_start", "2020-01-01", help="Inclusive evaluation start time.")
TIME_STOP = flag_utils.DEFINE_string(
    "time_stop", "2020-12-31", help="Inclusive evaluation stop time.")
OUTPUT_DIR = flag_utils.DEFINE_string(
    "output_dir", None, help="Directory for results files.")
OUTPUT_FILE_PREFIX = flag_utils.DEFINE_string(
    "output_file_prefix", "", help="Prefix for results filenames.")
INPUT_CHUNKS = flag_utils.DEFINE_chunks(
    "input_chunks", "init_time=32",
    help="Chunk sizes for streaming the forecast through the engine.")
USE_MESH = flag_utils.DEFINE_bool(
    "use_mesh", False,
    "Run via the sharded streaming engine instead of fully in memory.")
USE_BEAM = flag_utils.DEFINE_bool(
    "use_beam", False,
    "Compatibility alias for --use_mesh (no Beam here).")
N_DEVICES = flag_utils.DEFINE_integer(
    "n_devices", None,
    help="Number of devices for the mesh (default: all available).")
# Accepted for CLI compatibility with the reference; ignored.
RUNNER = flag_utils.DEFINE_string("runner", None, "(ignored)")
FANOUT = flag_utils.DEFINE_integer("fanout", None, help="(ignored)")
NUM_THREADS = flag_utils.DEFINE_integer(
    "num_threads", None, help="IO threads (currently fixed).")
SHUFFLE_BEFORE_TEMPORAL_MEAN = flag_utils.DEFINE_bool(
    "shuffle_before_temporal_mean", False, help="(ignored)")
CHECKPOINT_PATH = flag_utils.DEFINE_string(
    "checkpoint_path", None,
    help="Base path for streaming accumulator checkpoints "
         "(one file per eval config); existing files resume the run. "
         "Only with --use_mesh.")
CHECKPOINT_EVERY = flag_utils.DEFINE_integer(
    "checkpoint_every", 0,
    help="Checkpoint the streaming accumulators every N chunks (0=off).")

_WIND_PAIRS = [
    ("u_component_of_wind", "v_component_of_wind", "wind_vector"),
    ("10m_u_component_of_wind", "10m_v_component_of_wind",
     "10m_wind_vector"),
    ("u_component_of_geostrophic_wind", "v_component_of_geostrophic_wind",
     "geostrophic_wind_vector"),
    ("u_component_of_ageostrophic_wind",
     "v_component_of_ageostrophic_wind", "ageostrophic_wind_vector"),
]


def _wind_vector_error(err_type: str):
  """WindVector[R]MSE metrics for each available U/V pair."""
  cls = {
      "mse": metrics.WindVectorMSE,
      "rmse": metrics.WindVectorRMSESqrtBeforeTimeAvg,
  }[err_type]
  available = set(VARIABLES.value).union(DERIVED_VARIABLES.value)
  return [
      cls(u_name=u, v_name=v, vector_name=name)
      for u, v, name in _WIND_PAIRS
      if u in available and v in available
  ]


def predefined_regions_dict(land_sea_mask=None) -> dict:
  """The 13 predefined box regions (+3 land regions when a mask exists)."""
  et_lats = [slice(None, -20), slice(20, None)]
  regions = {
      "global": SliceRegion(),
      "tropics": SliceRegion(lat_slice=slice(-20, 20)),
      "extra-tropics": SliceRegion(lat_slice=et_lats),
      "northern-hemisphere": SliceRegion(lat_slice=slice(20, None)),
      "southern-hemisphere": SliceRegion(lat_slice=slice(None, -20)),
      "europe": SliceRegion(
          lat_slice=slice(35, 75),
          lon_slice=[slice(360 - 12.5, None), slice(0, 42.5)],
      ),
      "north-america": SliceRegion(
          lat_slice=slice(25, 60), lon_slice=slice(360 - 120, 360 - 75)
      ),
      "north-atlantic": SliceRegion(
          lat_slice=slice(25, 65), lon_slice=slice(360 - 70, 360 - 10)
      ),
      "north-pacific": SliceRegion(
          lat_slice=slice(25, 60), lon_slice=slice(145, 360 - 130)
      ),
      "east-asia": SliceRegion(
          lat_slice=slice(25, 60), lon_slice=slice(102.5, 150)
      ),
      "ausnz": SliceRegion(
          lat_slice=slice(-45, -12.5), lon_slice=slice(120, 175)
      ),
      "arctic": SliceRegion(lat_slice=slice(60, 90)),
      "antarctic": SliceRegion(lat_slice=slice(-90, -60)),
  }
  if land_sea_mask is not None:
    lr = LandRegion(land_sea_mask=land_sea_mask)
    regions["global_land"] = lr
    regions["extra-tropics_land"] = CombinedRegion(
        regions=[SliceRegion(lat_slice=et_lats), lr]
    )
    regions["tropics_land"] = CombinedRegion(
        regions=[SliceRegion(lat_slice=slice(-20, 20)), lr]
    )
  return regions


def build_eval_configs(climatology, regions, threshold_list) -> dict:
  """All predefined eval configs, keyed by name (reference parity)."""
  ens = dict(ensemble_dim=ENSEMBLE_DIM.value)
  derived = {
      name: DERIVED_VARIABLE_DICT[name] for name in DERIVED_VARIABLES.value
  }
  prob_clim = dict(
      evaluate_probabilistic_climatology=(
          EVALUATE_PROBABILISTIC_CLIMATOLOGY.value
      ),
      probabilistic_climatology_start_year=(
          PROBABILISTIC_CLIMATOLOGY_START_YEAR.value
      ),
      probabilistic_climatology_end_year=(
          PROBABILISTIC_CLIMATOLOGY_END_YEAR.value
      ),
      probabilistic_climatology_hour_interval=(
          PROBABILISTIC_CLIMATOLOGY_HOUR_INTERVAL.value
      ),
  )
  baselines = dict(
      evaluate_persistence=EVALUATE_PERSISTENCE.value,
      evaluate_climatology=EVALUATE_CLIMATOLOGY.value,
  )

  deterministic_metrics = {
      "mse": metrics.MSE(wind_vector_mse=_wind_vector_error("mse")),
      "acc": metrics.ACC(climatology=climatology),
      "bias": metrics.Bias(),
      "mae": metrics.MAE(),
  }
  spatial_metrics = {
      "bias": metrics.SpatialBias(),
      "mse": metrics.SpatialMSE(),
      "mae": metrics.SpatialMAE(),
  }
  if COMPUTE_SEEPS.value:
    if climatology is None:
      raise ValueError(
          "--compute_seeps requires --climatology_path (SEEPS needs "
          "climatological dry fractions and thresholds)"
      )
    for name, precip, thresh in [
        ("seeps_24hr", "total_precipitation_24hr", 0.25),
        ("seeps_6hr", "total_precipitation_6hr", 0.1),
    ]:
      if f"{precip}_seeps_threshold" not in climatology:
        continue  # climatology lacks SEEPS stats for this accumulation
      deterministic_metrics[name] = metrics.SEEPS(
          climatology=climatology, precip_name=precip,
          dry_threshold_mm=thresh,
      )
      spatial_metrics[name] = metrics.SpatialSEEPS(
          climatology=climatology, precip_name=precip,
          dry_threshold_mm=thresh,
      )

  return {
      "deterministic": config.Eval(
          metrics=deterministic_metrics,
          regions=regions,
          derived_variables=derived,
          **baselines,
      ),
      "deterministic_spatial": config.Eval(
          metrics=spatial_metrics,
          derived_variables=derived,
          output_format="zarr",
          **baselines,
      ),
      "deterministic_temporal": config.Eval(
          metrics={
              **deterministic_metrics,
              "rmse_sqrt_before_time_avg": metrics.RMSESqrtBeforeTimeAvg(
                  wind_vector_rmse=_wind_vector_error("rmse")
              ),
          },
          regions=regions,
          derived_variables=derived,
          temporal_mean=False,
          **baselines,
      ),
      "deterministic_vs_analysis": config.Eval(
          metrics=deterministic_metrics,
          against_analysis=True,
          regions=regions,
          derived_variables=derived,
      ),
      "probabilistic": config.Eval(
          metrics={
              "crps": metrics.CRPS(**ens),
              "crps_spread": metrics.CRPSSpread(**ens),
              "crps_skill": metrics.CRPSSkill(**ens),
              "ensemble_mean_mse": metrics.EnsembleMeanMSE(**ens),
              "debiased_ensemble_mean_mse": (
                  metrics.DebiasedEnsembleMeanMSE(**ens)
              ),
              "ensemble_variance": metrics.EnsembleVariance(**ens),
          },
          regions=regions,
          derived_variables=derived,
          **prob_clim,
      ),
      "ensemble_binary": config.Eval(
          metrics={
              "brier_score": metrics.EnsembleBrierScore(
                  thresholds=threshold_list, **ens
              ),
              "debiased_brier_score": metrics.DebiasedEnsembleBrierScore(
                  thresholds=threshold_list, **ens
              ),
              "ignorance_score": metrics.EnsembleIgnoranceScore(
                  thresholds=threshold_list, **ens
              ),
          },
          regions=regions,
          derived_variables=derived,
          **prob_clim,
      ),
      "ensemble_forecast_vs_era_experimental_metrics": config.Eval(
          metrics={
              "energy_score": metrics.EnergyScore(**ens),
              "energy_score_spread": metrics.EnergyScoreSpread(**ens),
              "energy_score_skill": metrics.EnergyScoreSkill(**ens),
              "ensemble_mean_rmse_sqrt_before_time_avg": (
                  metrics.EnsembleMeanRMSESqrtBeforeTimeAvg(**ens)
              ),
              "ensemble_stddev_sqrt_before_time_avg": (
                  metrics.EnsembleStddevSqrtBeforeTimeAvg(**ens)
              ),
          },
          derived_variables=derived,
      ),
      "probabilistic_spatial": config.Eval(
          metrics={
              "crps": metrics.SpatialCRPS(**ens),
              "crps_spread": metrics.SpatialCRPSSpread(**ens),
              "crps_skill": metrics.SpatialCRPSSkill(**ens),
              "ensemble_mean_mse": metrics.SpatialEnsembleMeanMSE(**ens),
              "debiased_ensemble_mean_mse": (
                  metrics.DebiasedSpatialEnsembleMeanMSE(**ens)
              ),
              "ensemble_variance": metrics.SpatialEnsembleVariance(**ens),
          },
          derived_variables=derived,
          output_format="zarr",
          **prob_clim,
      ),
      "ensemble_binary_spatial": config.Eval(
          metrics={
              "brier_score": metrics.SpatialEnsembleBrierScore(
                  thresholds=threshold_list, **ens
              ),
              "debiased_brier_score": (
                  metrics.SpatialDebiasedEnsembleBrierScore(
                      thresholds=threshold_list, **ens
                  )
              ),
              "ignorance_score": metrics.SpatialEnsembleIgnoranceScore(
                  thresholds=threshold_list, **ens
              ),
          },
          derived_variables=derived,
          output_format="zarr",
          **prob_clim,
      ),
      "probabilistic_spatial_histograms": config.Eval(
          metrics={"rank_histogram": metrics.RankHistogram(**ens)},
          derived_variables=derived,
          output_format="zarr",
          **prob_clim,
      ),
      "gaussian_probabilistic": config.Eval(
          metrics={
              "crps": metrics.GaussianCRPS(),
              "ensemble_variance": metrics.GaussianVariance(),
          },
          regions=regions,
          derived_variables=derived,
      ),
      "gaussian_binary": config.Eval(
          metrics={
              "brier_score": metrics.GaussianBrierScore(
                  thresholds=threshold_list
              ),
              "ignorance_score": metrics.GaussianIgnoranceScore(
                  thresholds=threshold_list
              ),
          },
          regions=regions,
          derived_variables=derived,
      ),
  }


def main(argv) -> None:
  selection = config.Selection(
      variables=VARIABLES.value,
      aux_variables=AUX_VARIABLES.value,
      levels=[int(level) for level in LEVELS.value],
      time_slice=slice(TIME_START.value, TIME_STOP.value),
  )
  paths = config.Paths(
      forecast=FORECAST_PATH.value,
      obs=OBS_PATH.value,
      climatology=CLIMATOLOGY_PATH.value,
      output_dir=OUTPUT_DIR.value,
      output_file_prefix=OUTPUT_FILE_PREFIX.value,
  )
  rename_variables = (
      ast.literal_eval(RENAME_VARIABLES.value)
      if RENAME_VARIABLES.value
      else None
  )
  data_config = config.Data(
      selection=selection,
      paths=paths,
      by_init=BY_INIT.value,
      rename_variables=rename_variables,
      pressure_level_suffixes=PRESSURE_LEVEL_SUFFIXES.value,
  )

  land_sea_mask = None
  lsm_path = LSM_DATASET.value or OBS_PATH.value
  try:
    # lazy: probing a (possibly TB-scale) store for one variable must
    # not read the whole store into host memory
    lsm_ds = xds.open_zarr(lsm_path, lazy=True)
    if "land_sea_mask" in lsm_ds:
      mask_da = lsm_ds["land_sea_mask"]
      land_sea_mask = mask_da.copy(data=np.asarray(mask_da.data))
  except Exception as e:  # pylint: disable=broad-except
    if LSM_DATASET.value:
      # an explicitly requested mask store must not be silently skipped
      raise
    print(f"Could not probe {lsm_path!r} for land_sea_mask: {e}")
  if land_sea_mask is None:
    print("No land_sea_mask found.")

  predefined = predefined_regions_dict(land_sea_mask)
  if REGIONS.value == ["all"]:
    regions = predefined
  elif REGIONS.value is None:
    regions = None
  else:
    regions = {k: v for k, v in predefined.items() if k in REGIONS.value}

  climatology = None
  if CLIMATOLOGY_PATH.value:
    # lazy: an official hourly 0.25-degree climatology is 100s of GB;
    # ACC/SEEPS/threshold consumers gather bounded per-chunk slices
    # (the reference's xr.open_zarr is dask-lazy for the same reason,
    # reference evaluation.py:92-136 via evaluate.py:408)
    climatology = evaluation.make_latitude_increasing(
        xds.open_zarr(CLIMATOLOGY_PATH.value, lazy=True)
    )

  threshold_list = []
  if QUANTILE_THRESHOLDS.value:
    threshold_cls = thresholds.get_threshold_cls(THRESHOLD_METHOD.value)
    threshold_list = [
        threshold_cls(climatology=climatology, quantile=float(q))
        for q in QUANTILE_THRESHOLDS.value
    ]

  eval_configs = build_eval_configs(climatology, regions, threshold_list)
  requested = EVAL_CONFIGS.value.split(",")
  if not set(requested).issubset(eval_configs):
    raise flags.UnrecognizedFlagError(
        f"{EVAL_CONFIGS.value=} is not a subset of {sorted(eval_configs)}"
    )
  eval_configs = {k: v for k, v in eval_configs.items() if k in requested}

  if climatology is None:
    # fail fast with a clear message instead of a NoneType error deep in
    # the first chunk (metrics holding climatology=None can't evaluate)
    for cfg_name, cfg in eval_configs.items():
      needy = [
          m_name for m_name, m in cfg.metrics.items()
          if getattr(m, "climatology", "absent") is None
      ]
      if needy:
        raise ValueError(
            f"--eval_configs={cfg_name} includes metrics {needy} that "
            "require a climatology; pass --climatology_path"
        )

  if USE_MESH.value or USE_BEAM.value:
    from weatherbench2_tpu.parallel import make_mesh

    mesh = make_mesh(n_devices=N_DEVICES.value) if N_DEVICES.value else None
    evaluation.evaluate_with_mesh(
        data_config,
        eval_configs,
        input_chunks=INPUT_CHUNKS.value,
        skipna=SKIPNA.value,
        mesh=mesh,
        checkpoint_path=CHECKPOINT_PATH.value,
        checkpoint_every=CHECKPOINT_EVERY.value,
    )
  else:
    evaluation.evaluate_in_memory(
        data_config, eval_configs, skipna=SKIPNA.value
    )


if __name__ == "__main__":
  app.run(main)
