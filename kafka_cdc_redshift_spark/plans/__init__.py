from .catalog import SPECS, QuerySpec  # noqa: F401
from . import catalog_llm  # noqa: F401  (registers the LLM-pipeline specs)
from . import catalog_ext  # noqa: F401  (round-3 relational breadth specs)
