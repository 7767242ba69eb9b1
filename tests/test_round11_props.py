"""Round-11 property pins.

1. The pure-integer mean (``_INT_MEAN_SPARK``) equals exact
   half-away-from-zero rounding for adversarial sums/counts —
   including the representation-boundary cases where ROUND over
   double division drifted between engines (the round-11 sf0.001
   finding).
2. The SCRAM client detects a tampered server signature (mutual
   auth) and a non-extending server nonce.
3. IVF-sharded SemDeDup is CONSERVATIVE relative to single-level
   SemDeDup: the two-level shard key refines the level-1 partition,
   so every sharded-pruned vector is also pruned by the level-1
   plan, and per-cell counts obey n_pruned_sharded <= n_pruned.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal
from fractions import Fraction

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _exact_half_away(s: int, n: int) -> int:
    """Reference: round(s/n) half-away-from-zero in exact rationals."""
    q = Fraction(s, n)
    return int(
        Decimal(q.numerator) / Decimal(q.denominator)
        if q.denominator == 1
        else (Decimal(s) / Decimal(n)).quantize(0, rounding=ROUND_HALF_UP)
    )


@settings(max_examples=200, deadline=None)
@given(
    vals=st.lists(
        st.integers(min_value=-3_000_000, max_value=3_000_000),
        min_size=1,
        max_size=50,
    )
)
def test_int_mean_formula_is_exact_half_away_from_zero(vals):
    """Pure-Python check of the algebra both engines now run:
    sign(s) * ((2|s| + n) div (2n)) == round-half-away(s/n)."""
    s, n = sum(vals), len(vals)
    a = abs(s)
    got = (2 * a + n) // (2 * n)
    if s < 0:
        got = -got
    assert got == _exact_half_away(s, n), (s, n)


def test_int_mean_spark_expr_matches_duckdb_on_boundary_cases(spark):
    """The Spark DIV spelling and the DuckDB // spelling of the
    integer mean agree on exact .5 means and on sums whose double
    quotient sits a ULP off — the two cases that produced the
    llm_embedding_outliers drift."""
    import duckdb

    from datafusion_rdbms_ext_spark.queries.llm import (
        _INT_MEAN_SPARK,
        _INT_MEAN_SQL,
    )

    # (values) groups engineered around .5 boundaries, both signs
    groups = {
        1: [1, 2],            # mean 1.5 -> 2
        2: [-1, -2],          # mean -1.5 -> -2
        3: [5, 5, 6],         # mean 16/3 -> 5
        4: [2_000_001, 2_000_002],  # big .5 boundary -> 2000002
        5: [-2_000_001, -2_000_002],
        6: [977903, 977904],  # the sf0.001 offender's shape
        7: [0, 1],            # 0.5 -> 1
        8: [0, -1],           # -0.5 -> -1
    }
    from pyspark.sql import functions as F

    rows = [(g, v) for g, vs in groups.items() for v in vs]
    sdf = (
        spark.createDataFrame(rows, "cid int, val long")
        .groupBy("cid")
        .agg(F.expr(_INT_MEAN_SPARK).alias("c"))
        .orderBy("cid")
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (cid int, val bigint)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    drows = con.execute(
        f"SELECT cid, {_INT_MEAN_SQL} AS c FROM t GROUP BY cid ORDER BY cid"
    ).fetchall()
    con.close()
    assert [(r["cid"], r["c"]) for r in sdf] == drows
    # and both equal the exact reference
    for (cid, c) in drows:
        vs = groups[cid]
        assert c == _exact_half_away(sum(vs), len(vs)), (cid, vs)


def test_scram_rejects_tampered_server_signature(monkeypatch):
    """Mutual auth: a server-final message whose v= does not verify
    under ServerKey must raise — a MITM with a stolen StoredKey
    cannot forge it without SaltedPassword."""
    import base64
    import hashlib
    import hmac as _hmac
    import struct as _struct

    from datafusion_rdbms_ext_spark.sources import pgwire

    password, user = "pw-under-test", "u"
    salt, iters = b"0123456789ab", 4096

    class _FakeSock:
        """Scripted server side of the SASL exchange."""

        def __init__(self, tamper):
            self.tamper = tamper
            self.sent = []
            self.inbox = b""
            self.state = 0

        def sendall(self, data):
            self.sent.append(bytes(data))
            if self.state == 0:  # startup -> AuthenticationSASL
                mechs = b"SCRAM-SHA-256\x00\x00"
                self._queue(b"R", _struct.pack("!I", 10) + mechs)
                self.state = 1
            elif self.state == 1:  # client-first -> server-first
                body = data[5:]
                cf = body.split(b"\x00", 1)[1][4:].decode()
                self.c_first_bare = cf[3:]  # strip gs2 "n,,"
                c_nonce = dict(
                    kv.split("=", 1) for kv in self.c_first_bare.split(",")
                )["r"]
                self.s_nonce = c_nonce + "SRVNONCE"
                self.s_first = (
                    f"r={self.s_nonce},s="
                    f"{base64.b64encode(salt).decode()},i={iters}"
                )
                self._queue(
                    b"R", _struct.pack("!I", 11) + self.s_first.encode()
                )
                self.state = 2
            elif self.state == 2:  # client-final -> server-final
                c_final = data[5:].decode()
                c_final_bare = c_final.rsplit(",p=", 1)[0]
                auth = f"{self.c_first_bare},{self.s_first},{c_final_bare}"
                salted = hashlib.pbkdf2_hmac(
                    "sha256", password.encode(), salt, iters
                )
                skey = _hmac.new(
                    salted, b"Server Key", hashlib.sha256
                ).digest()
                sig = _hmac.new(skey, auth.encode(), hashlib.sha256).digest()
                if self.tamper:
                    sig = bytes([sig[0] ^ 1]) + sig[1:]
                v = b"v=" + base64.b64encode(sig)
                self._queue(b"R", _struct.pack("!I", 12) + v)
                self._queue(b"R", _struct.pack("!I", 0))
                self._queue(b"Z", b"I")
                self.state = 3

        def _queue(self, mtype, payload):
            self.inbox += (
                mtype + _struct.pack("!I", len(payload) + 4) + payload
            )

        def recv(self, n):
            out, self.inbox = self.inbox[:n], self.inbox[n:]
            return out

        def close(self):
            pass

    def make(tamper):
        sock = _FakeSock(tamper)
        monkeypatch.setattr(
            pgwire.socket,
            "create_connection",
            lambda *a, **k: sock,
        )
        return pgwire.PgWireClient(user=user, password=password)

    cli = make(tamper=False)  # honest server: handshake completes
    cli.sock.close()
    with pytest.raises(pgwire.PgError, match="server signature"):
        make(tamper=True)


def test_semdedup_sharded_is_conservative_per_cell(spark):
    """The (cell1, cell2) partition refines cell1, so sharded pruning
    can only prune a SUBSET of single-level pruning — per level-1
    cell: n_vecs identical, n_pruned_sharded <= n_pruned, and
    n_kept_sharded >= n_kept."""
    from datafusion_rdbms_ext_spark.queries import REGISTRY

    from .conftest import SF_DIR

    base = {
        r["cell"]: r
        for r in REGISTRY["llm_semdedup"].fn(spark, SF_DIR).collect()
    }
    shard = {
        r["cell"]: r
        for r in REGISTRY["llm_semdedup_sharded"].fn(spark, SF_DIR).collect()
    }
    assert set(base) == set(shard)
    pruned_any = False
    for cell, b in base.items():
        s = shard[cell]
        assert s["n_vecs"] == b["n_vecs"], cell
        assert s["n_pruned"] <= b["n_pruned"], cell
        assert s["n_kept"] >= b["n_kept"], cell
        pruned_any = pruned_any or s["n_pruned"] > 0
    assert pruned_any  # the sharded plan still finds real near-dups
