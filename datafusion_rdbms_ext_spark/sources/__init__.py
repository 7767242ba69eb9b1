"""Source-side extensions: multimodal binary-column plumbing.

The reference's only source is Postgres (MySQL/MsSql are todo!(),
/root/reference/src/sqldb/mod.rs:12-16); our core tables come from
self-describing Parquet via the catalog (catalog.py). This package
adds the driver-brief extension sources: opaque multimodal binary
assets with typed metadata (multimodal.py).
"""

# NOTE: deliberately NO eager submodule imports. The Python
# DataSource workers (pyds.py) unpickle classes by module path, which
# imports this package __init__ in every spawned worker; an eager
# `from .multimodal import ...` would drag pandas+numpy+pyarrow into
# each worker's startup for nothing (observed as transient
# PYTHON_DATA_SOURCE_ERROR worker-spawn failures under host load).
# Import submodules explicitly: `from ..sources import multimodal`.
