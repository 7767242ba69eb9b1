"""Expression-level building blocks (SURVEY.md §2C parity)."""

from .compat import davg, dsum, sql_davg, sql_dsum  # noqa: F401
