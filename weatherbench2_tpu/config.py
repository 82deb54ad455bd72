"""Configuration dataclasses (Selection/Paths/Data/Eval/Viz/Panel).

Field-for-field parity with /root/reference/weatherbench2/config.py:28-169
so reference configs translate directly.
"""
import dataclasses
import typing as t

from weatherbench2_tpu.derived_variables import DerivedVariable
from weatherbench2_tpu.metrics import Metric
from weatherbench2_tpu.regions import Region


@dataclasses.dataclass
class Selection:
  """Select a sub-set of forecast and truth data.

  Attributes:
    variables: List of variables to evaluate.
    time_slice: Range of time/init_time to use from forecast.
    levels: List of pressure levels.
    lat_slice: Latitude range in degrees.
    lon_slice: Longitude range in degrees.
    aux_variables: Auxiliary forecast variables required for some metrics.
  """

  variables: t.Sequence[str]
  time_slice: slice
  levels: t.Optional[t.Sequence[int]] = None
  lat_slice: t.Optional[slice] = dataclasses.field(
      default_factory=lambda: slice(None, None)
  )
  lon_slice: t.Optional[slice] = dataclasses.field(
      default_factory=lambda: slice(None, None)
  )
  aux_variables: t.Optional[t.Sequence[str]] = None


@dataclasses.dataclass
class Paths:
  """Input and output paths."""

  forecast: str
  obs: str
  output_dir: str
  output_file_prefix: t.Optional[str] = ""
  climatology: t.Optional[str] = None


@dataclasses.dataclass
class Data:
  """Data configuration combining Selection and Paths."""

  selection: Selection
  paths: Paths
  by_init: t.Optional[bool] = True
  rename_variables: t.Optional[t.Dict[str, str]] = None
  pressure_level_suffixes: t.Optional[bool] = False


@dataclasses.dataclass
class Eval:
  """Evaluation configuration.

  Attributes mirror the reference (config.py:96-137); `use_mesh` is the
  TPU-native addition selecting the sharded streaming engine.
  """

  metrics: t.Dict[str, Metric]
  regions: t.Optional[t.Dict[str, Region]] = None
  evaluate_persistence: t.Optional[bool] = False
  evaluate_climatology: t.Optional[bool] = False
  evaluate_probabilistic_climatology: t.Optional[bool] = False
  probabilistic_climatology_start_year: t.Optional[int] = None
  probabilistic_climatology_end_year: t.Optional[int] = None
  probabilistic_climatology_hour_interval: t.Optional[int] = None
  against_analysis: t.Optional[bool] = False
  derived_variables: t.Dict[str, DerivedVariable] = dataclasses.field(
      default_factory=dict
  )
  temporal_mean: t.Optional[bool] = True
  output_format: str = "netcdf"


@dataclasses.dataclass
class Viz:
  """Visualization configuration."""

  results: t.Dict[str, str]
  save_kwargs: t.Dict[str, t.Any] = dataclasses.field(default_factory=dict)
  colors: t.Optional[t.Dict[str, str]] = None
  layout: t.Optional[t.Tuple[int, int]] = None
  figsize: t.Optional[t.Tuple[int, int]] = None
  tight_layout: t.Optional[bool] = True
  labels: t.Optional[t.Dict[str, str]] = None
  linestyles: t.Optional[t.Dict[str, str]] = None
  marker: t.Optional[str] = None
  markersize: t.Optional[int] = None


@dataclasses.dataclass
class Panel:
  """Config for each visualization panel."""

  metric: str
  variable: str
  level: t.Optional[int] = None
  region: t.Optional[str] = None
  relative: t.Optional[str] = None
  title: t.Optional[str] = None
  xlabel: t.Optional[str] = None
  ylabel: t.Optional[str] = None
  ylim: t.Optional[tuple] = None
  xlim: t.Optional[tuple] = None
