"""Query registry — the engine's executable operator inventory.

Every operator/capability row in SURVEY.md §2 lands here as a named
query: a DataFrame-producing callable plus (where SQL-expressible) a
DuckDB oracle string. The driver's correctness gate and the local
pytest harness both consume this registry.
"""

from .base import REGISTRY, QuerySpec, register  # noqa: F401

# Importing the modules populates REGISTRY via the @register decorator.
from . import tpch  # noqa: E402,F401
from . import micro  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import events  # noqa: E402,F401
from . import llm  # noqa: E402,F401
from . import olap  # noqa: E402,F401
from .. import streaming  # noqa: E402,F401
from ..sources import multimodal  # noqa: E402,F401
from ..operators import temporal  # noqa: E402,F401
from ..sources import federation  # noqa: E402,F401
from ..sources import pyds  # noqa: E402,F401


def queries():
    """Driver contract: name → callable(spark, sf_dir) → DataFrame."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql():
    """Driver contract: name → DuckDB SQL (only SQL-expressible ops)."""
    return {
        name: spec.oracle
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }
