"""Configuration dataclasses for the TPU verification engine.

The public fields intentionally match the reference WeatherBench 2 config
API (reference config.py:28-169) so existing configs translate directly;
the semantics notes below describe how each knob maps onto this engine's
streaming/jit execution model.
"""
import dataclasses
import typing as t

from weatherbench2_tpu.derived_variables import DerivedVariable
from weatherbench2_tpu.metrics import Metric
from weatherbench2_tpu.regions import Region


@dataclasses.dataclass
class Selection:
  """Subset of forecast/truth data to evaluate.

  ``variables`` and ``levels`` select data variables and pressure levels;
  ``time_slice`` bounds init_time (by-init) or time (by-valid);
  ``lat_slice``/``lon_slice`` crop the grid; ``aux_variables`` are extra
  forecast-only inputs some metrics need (e.g. ``<var>_std`` for Gaussian
  scores).  Selection happens host-side before streaming; on device all
  shapes are static.
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
  """Zarr input locations and the results output directory."""

  forecast: str
  obs: str
  output_dir: str
  output_file_prefix: t.Optional[str] = ""
  climatology: t.Optional[str] = None


@dataclasses.dataclass
class Data:
  """Bundles a Selection with Paths plus forecast-format switches.

  ``by_init`` picks the time convention (see schema.apply_time_conventions);
  ``rename_variables`` maps source names onto WB2 conventions;
  ``pressure_level_suffixes`` decodes ``geopotential_500``-style variables
  into a level dimension on open.
  """

  selection: Selection
  paths: Paths
  by_init: t.Optional[bool] = True
  rename_variables: t.Optional[t.Dict[str, str]] = None
  pressure_level_suffixes: t.Optional[bool] = False


@dataclasses.dataclass
class Eval:
  """One evaluation job: the metric set and how to run it.

  ``metrics`` maps result names to Metric instances (these become the
  ``metric`` coordinate of the results dataset); ``regions`` maps names to
  Region selectors (the ``region`` coordinate).  On the streaming engine
  every metric × region evaluates inside one jit-compiled program per
  chunk; deterministic suites additionally collapse into a single fused
  multi-region reduction.

  Baseline-forecast switches replace the forecast before scoring:
  ``evaluate_climatology`` (deterministic climatology),
  ``evaluate_probabilistic_climatology`` (years-as-ensemble over
  ``probabilistic_climatology_{start,end}_year`` at
  ``probabilistic_climatology_hour_interval``), ``evaluate_persistence``
  (truth at init time).  ``against_analysis`` scores against the
  forecast's own lead-0 field instead of obs.

  ``temporal_mean=False`` keeps per-(init_)time results instead of the
  running (sum, count) temporal mean.  ``output_format`` is ``netcdf`` or
  ``zarr``.
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

  def validate(self) -> None:
    """Raise on obviously inconsistent settings."""
    if self.evaluate_probabilistic_climatology:
      if (
          self.probabilistic_climatology_start_year is None
          or self.probabilistic_climatology_end_year is None
      ):
        raise ValueError(
            "probabilistic climatology requires start and end years"
        )
    if self.output_format not in ("netcdf", "zarr"):
      raise ValueError(f"unrecognized output_format {self.output_format!r}")


@dataclasses.dataclass
class Viz:
  """Visualization job configuration (see visualization.py)."""

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
  """One panel of a timeseries figure: what to plot and how to label it."""

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
