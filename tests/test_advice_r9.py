"""Regression pins for the round-9 ADVICE items.

1 (medium, skipping.py CASE-nested atoms) is pinned in
test_skipping_rewrite.py::test_case_nested_comparison_is_not_a_conjunct_atom;
this file pins the wire-client bounds guards (#4) and the fixture
fingerprint (#2). #3 (schema-from-SELECT) is exercised end-to-end by
every fed_postgres_scan run; #5 (dead helper) is deleted.
"""

from __future__ import annotations

import struct

import pytest

from datafusion_rdbms_ext_spark.sources.pgwire import (
    OID_INT8,
    PgError,
    _parse_data_row,
    _parse_pgcopy_binary,
)


def _pgcopy_blob(values: list[int]) -> bytes:
    sig = b"PGCOPY\n\xff\r\n\x00"
    body = struct.pack("!II", 0, 0)
    for v in values:
        body += struct.pack("!hiq", 1, 8, v)
    return sig + body + struct.pack("!h", -1)


def test_pgcopy_roundtrip_and_truncations():
    blob = _pgcopy_blob([7, -3])
    assert _parse_pgcopy_binary(blob, [OID_INT8]) == [(7,), (-3,)]
    # every truncation point must raise PgError with context — never
    # a raw struct.error/IndexError (ADVICE r9 #4)
    for cut in range(len(_pgcopy_blob([7])) - 1, 10, -1):
        try:
            _parse_pgcopy_binary(_pgcopy_blob([7])[:cut], [OID_INT8])
        except PgError as e:
            assert "truncated" in str(e) or "signature" in str(e)
        except Exception as e:  # pragma: no cover
            pytest.fail(f"raw {type(e).__name__} at cut={cut}: {e}")


def test_data_row_truncations_raise_pgerror():
    payload = struct.pack("!Hiq", 1, 8, 42)
    assert _parse_data_row(payload, [OID_INT8], binary=True) == (42,)
    for cut in range(len(payload) - 1, 0, -1):
        with pytest.raises(PgError, match="truncated"):
            _parse_data_row(payload[:cut], [OID_INT8], binary=True)


def test_fixture_fingerprint_tracks_file_content(tmp_path):
    """ADVICE r9 #2: a regenerated fixture with EQUAL row counts must
    change the fingerprint (size or mtime_ns moves), forcing the live
    Postgres schema to reload instead of serving stale values."""
    import os

    from datafusion_rdbms_ext_spark.sources.pgserver import (
        _fixture_fingerprint,
    )

    for name in ("nation", "region", "supplier", "customer", "events"):
        (tmp_path / f"{name}.parquet").write_bytes(b"x" * 10)
    fp1 = _fixture_fingerprint(str(tmp_path))
    assert fp1 == _fixture_fingerprint(str(tmp_path))  # stable
    # same size, different mtime -> different fingerprint
    p = tmp_path / "nation.parquet"
    st = p.stat()
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    fp2 = _fixture_fingerprint(str(tmp_path))
    assert fp2 != fp1
    # different size -> different fingerprint
    p.write_bytes(b"x" * 11)
    assert _fixture_fingerprint(str(tmp_path)) not in (fp1, fp2)
