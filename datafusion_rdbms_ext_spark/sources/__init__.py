"""Source-side extensions: multimodal binary-column plumbing.

The reference's only source is Postgres (MySQL/MsSql are todo!(),
/root/reference/src/sqldb/mod.rs:12-16); our core tables come from
self-describing Parquet via the catalog (catalog.py). This package
adds the driver-brief extension sources: opaque multimodal binary
assets with typed metadata (multimodal.py).
"""

from .multimodal import extract_features, load_assets, resize_pool  # noqa: F401
