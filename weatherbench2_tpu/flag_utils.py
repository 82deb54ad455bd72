"""absl-flags extensions: dim=value pair flags.

Same flag grammar as the reference CLI (weatherbench2/flag_utils.py):
``--input_chunks=time=10,longitude=100`` parses to ``{'time': 10,
'longitude': 100}``; dim=value pairs coerce int → float → str.
"""
import re
from typing import Any, Union

from absl import flags

DimValueType = Union[int, float, str]

_CHUNKS_RE = re.compile(r"(\w+=-?\d+(,\w+=-?\d+)*)?")


def parse_chunks(chunks_string: str) -> dict:
  """Parse 'dim=size,dim=size' into {dim: int}."""
  if re.fullmatch(_CHUNKS_RE, chunks_string) is None:
    raise ValueError(f"invalid chunks string: {chunks_string}")
  chunks = {}
  if chunks_string:
    for entry in chunks_string.split(","):
      key, value = entry.split("=")
      chunks[key] = int(value)
  return chunks


def get_dim_value(value_string: str) -> DimValueType:
  """Coerce a string to int, then float, falling back to str."""
  value_string = str(value_string)
  try:
    return int(value_string)
  except ValueError:
    pass
  try:
    return float(value_string)
  except ValueError:
    pass
  return value_string


def parse_dim_value_pairs(dim_value_string: str) -> dict:
  """Parse 'dim=value,...' with int/float/str coercion."""
  pairs = {}
  if dim_value_string:
    for entry in dim_value_string.split(","):
      key, value = entry.split("=")
      pairs[key] = get_dim_value(value)
  return pairs


class _PairSerializer(flags.ArgumentSerializer):

  def serialize(self, value) -> str:
    return ",".join(f"{k}={v}" for k, v in value.items())


class _ChunksParser(flags.ArgumentParser):
  syntactic_help = (
      'comma separated list of dim=size pairs, e.g. "time=10,longitude=100"'
  )

  def parse(self, argument: str):
    return parse_chunks(argument)

  def flag_type(self) -> str:
    return "dict[str, int]"


class _DimValuePairParser(flags.ArgumentParser):
  syntactic_help = (
      'comma separated list of dim=value pairs, e.g. "level=500,name=z"'
  )

  def parse(self, argument: str):
    return parse_dim_value_pairs(argument)

  def flag_type(self) -> str:
    return "dict[str, int | float | str]"


class _SharedFlagHolder:
  """A per-module view of a flag shared across CLI script modules.

  Different scripts define the same flag name with different defaults
  (e.g. ``method``: "explicit" in compute_climatology, "resample" in
  resample_in_time).  When several scripts are imported into one process
  (the test suite), each module's holder must fall back to ITS OWN
  default while the flag is unset; an explicit setting (command line or
  flagsaver) wins for everyone.
  """

  def __init__(self, flag_values, name, default, parser=None):
    self._fv = flag_values
    self.name = name
    self._default = default
    self._parser = parser

  @property
  def value(self):
    flag = self._fv[self.name]
    raw = self._default if flag.using_default_value else flag.value
    # flagsaver/setattr assigns values UNPARSED; parse string values the
    # way the command line would so e.g. chunks flags always read as dicts
    if self._parser is not None and isinstance(raw, str):
      return self._parser.parse(raw)
    return raw

  @property
  def default(self):
    return self._default

  def present(self) -> bool:
    return bool(self._fv[self.name].present)


def _reuse_tolerant(define_fn):
  """Wrap an absl DEFINE so repeated definitions reuse the existing flag.

  CLI scripts legitimately share flag names (input_path, runner, ...); a
  single process importing several scripts (e.g. the test suite) must not
  crash with DuplicateFlagError.  The first definition registers the
  flag; later definitions get a _SharedFlagHolder carrying their own
  default.
  """

  def define(name, *args, **kwargs):
    fv = kwargs.get("flag_values", flags.FLAGS)
    default = args[0] if args else kwargs.get("default")
    if name not in fv:
      define_fn(name, *args, **kwargs)
      # read the canonical (parsed) default back so an unset flag reads
      # identically to the original holder
      default = fv[name].default
    parser = getattr(fv[name], "parser", None)
    return _SharedFlagHolder(fv, name, default, parser)

  return define


DEFINE_string = _reuse_tolerant(flags.DEFINE_string)
DEFINE_integer = _reuse_tolerant(flags.DEFINE_integer)
DEFINE_float = _reuse_tolerant(flags.DEFINE_float)
DEFINE_bool = _reuse_tolerant(flags.DEFINE_bool)
DEFINE_boolean = DEFINE_bool
DEFINE_list = _reuse_tolerant(flags.DEFINE_list)


@_reuse_tolerant
def DEFINE_chunks(name: str, default: str, help: str, **kwargs: Any):  # pylint: disable=invalid-name,redefined-builtin
  """Define a flag holding a chunks dict."""
  return flags.DEFINE(
      _ChunksParser(), name, default, help, serializer=_PairSerializer(),
      **kwargs,
  )


DEFINE_dim_integer_pairs = DEFINE_chunks


@_reuse_tolerant
def DEFINE_dim_value_pairs(name: str, default: str, help: str, **kwargs):  # pylint: disable=invalid-name,redefined-builtin
  """Define a flag holding a {dim: int|float|str} dict."""
  return flags.DEFINE(
      _DimValuePairParser(), name, default, help,
      serializer=_PairSerializer(), **kwargs,
  )
