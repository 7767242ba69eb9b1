"""Regression pins for the round-11 ADVICE items.

#1 (medium): ``semdedup_prune_sharded``'s self-scaling k2 carried an
extra ``**0.5`` — occupancy grew as ~64^0.75 * N^0.25 instead of
holding at ~64, voiding the O(N*64) pair bound the docstring claims.
#2 (low): the parallel sink's claim ledger must let a retry of an
ALREADY-COMMITTED partition recover idempotently (pinned live in
test_pgwire.py::test_parallel_sink_claim_ledger_blocks_duplicate_attempts).
#3 (low): sslmode=verify-ca with sslrootcert=None must fail loudly
(libpq semantics), never silently weaken to the system CA store.
#4 (low): float/double casts are NOT order-preserving beyond 2^53 —
dropped from the skipping-atom widening targets (pinned in
test_skipping_rewrite.py::test_float_cast_comparison_is_not_an_atom).
#5 (low): the SSL-refusal path must close the connected socket and
distinguish a clean server close from an explicit 'N' refusal.
"""

from __future__ import annotations

import math
import socket

import pytest

from datafusion_rdbms_ext_spark.sources.pgwire import PgError, PgWireClient


# -- #1: sharded-semdedup shard counts --------------------------------------
def test_sharded_shard_counts_match_docstring_and_bound():
    from datafusion_rdbms_ext_spark.queries.llm import sharded_shard_counts

    for n in (10, 64, 600, 60_000, 10**6, 10**9, 10**12):
        k1, k2 = sharded_shard_counts(n)
        expect = max(2, math.ceil(math.sqrt(n / 64.0)))
        assert k1 == expect and k2 == expect, (n, k1, k2)
        # the pair bound the docstring claims: expected occupancy
        # n/(k1*k2) stays at <= target (=64)
        assert n / (k1 * k2) <= 64.0, (n, k1, k2)


def test_sharded_occupancy_no_longer_grows_with_n():
    """The buggy form's occupancy grew as ~N^0.25: at N=10^12 it was
    ~64^0.75 * 10^3 ≈ 22.6k vectors per shard. The fixed form holds
    <= 64 across six orders of magnitude."""
    from datafusion_rdbms_ext_spark.queries.llm import sharded_shard_counts

    occs = []
    for n in (10**6, 10**9, 10**12):
        k1, k2 = sharded_shard_counts(n)
        occs.append(n / (k1 * k2))
    assert max(occs) <= 64.0
    # and occupancy is flat, not growing: largest/smallest within 2x
    assert max(occs) / min(occs) < 2.0


# -- #3/#5: pgwire SSL negotiation edges ------------------------------------
def _raw_client(sock: socket.socket) -> PgWireClient:
    cli = PgWireClient.__new__(PgWireClient)
    cli.sock = sock
    return cli


def test_verify_ca_without_rootcert_fails_loudly():
    a, b = socket.socketpair()
    try:
        cli = _raw_client(a)
        with pytest.raises(PgError, match="requires sslrootcert"):
            cli._negotiate_ssl("localhost", "verify-ca", None)
        assert cli.sock.fileno() == -1, "socket must be closed"
        # and nothing was sent on the wire before the refusal
        b.settimeout(1.0)
        assert b.recv(16) == b""
    finally:
        for s in (a, b):
            try:
                s.close()
            except OSError:
                pass


def test_ssl_refusal_closes_socket_and_names_refusal():
    a, b = socket.socketpair()
    try:
        b.send(b"N")  # explicit refusal answer, pre-loaded
        cli = _raw_client(a)
        with pytest.raises(PgError, match="refused SSL"):
            cli._negotiate_ssl("localhost", "require", None)
        assert cli.sock.fileno() == -1, "refusal path must close the fd"
        # the SSLRequest did go out before the answer was read
        b.settimeout(1.0)
        assert len(b.recv(16)) == 8
    finally:
        for s in (a, b):
            try:
                s.close()
            except OSError:
                pass


def test_ssl_server_close_distinguished_from_refusal():
    a, b = socket.socketpair()
    try:
        b.shutdown(socket.SHUT_WR)  # clean close: client reads b""
        cli = _raw_client(a)
        with pytest.raises(PgError, match="closed connection"):
            cli._negotiate_ssl("localhost", "require", None)
        assert cli.sock.fileno() == -1
    finally:
        for s in (a, b):
            try:
                s.close()
            except OSError:
                pass
