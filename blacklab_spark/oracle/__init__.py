from .engine import OracleIndex, small_float_norm  # noqa: F401
