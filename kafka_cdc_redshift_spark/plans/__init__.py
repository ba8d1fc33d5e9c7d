from .catalog import SPECS, QuerySpec  # noqa: F401
