"""Legacy line protocol over a raw socket (mirrors the reference's
tests/test_legacy.py strategy)."""

import socket

import pytest

from server_fixture import Server


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    s = Server(
        tmp_path_factory.mktemp("data"),
        extra_args=["--legacy-port", "0", "--checkpoint-age-ms", "0"],
    )
    # Port 0 for legacy isn't supported by the flag (0 = off); pick a free one.
    import socket as s_mod

    probe = s_mod.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()
    s.extra_args = ["--legacy-port", str(port), "--checkpoint-age-ms", "0"]
    s.legacy_port = port
    s.start()
    yield s
    s.stop()


class Conn:
    def __init__(self, port):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=20)
        self.buf = b""

    def cmd(self, line):
        self.sock.sendall(line.encode() + b"\r\n")
        while b"\r\n" not in self.buf:
            data = self.sock.recv(65536)
            if not data:
                raise ConnectionError("closed")
            self.buf += data
        line, self.buf = self.buf.split(b"\r\n", 1)
        return line.decode()

    def close(self):
        self.sock.close()


@pytest.fixture
def conn(server):
    c = Conn(server.legacy_port)
    yield c
    c.close()


def test_echo_and_unknown(conn):
    assert conn.cmd("echo hello world") == "OK hello world"
    assert conn.cmd("bogus") == "ERR unknown command"
    assert conn.cmd("") == "OK "


def test_transaction_insert_search(conn):
    assert conn.cmd("begin") == "OK "
    assert conn.cmd("insert 1 100,200,300") == "OK "
    # Signed decimals reinterpret as u32.
    assert conn.cmd("insert 2 -1,200") == "OK "
    assert conn.cmd("commit") == "OK "
    resp = conn.cmd("search 100,200,300")
    assert resp.startswith("OK ")
    assert "1:3" in resp
    resp = conn.cmd(f"search -1")
    assert "2:1" in resp


def test_transaction_guards(conn):
    assert conn.cmd("insert 5 1") == "ERR not in transaction"
    assert conn.cmd("commit") == "ERR not in transaction"
    assert conn.cmd("rollback") == "ERR not in transaction"
    assert conn.cmd("optimize") == "ERR not in transaction"
    assert conn.cmd("begin") == "OK "
    assert conn.cmd("begin") == "ERR already in transaction"
    assert conn.cmd("optimize") == "OK "
    assert conn.cmd("cleanup") == "OK "
    assert conn.cmd("rollback") == "OK "


def test_rollback_discards(conn):
    assert conn.cmd("begin") == "OK "
    assert conn.cmd("insert 77 4242") == "OK "
    assert conn.cmd("rollback") == "OK "
    assert conn.cmd("search 4242") == "OK "


def test_session_and_index_attributes(conn):
    assert conn.cmd("get max_results") == "OK 500"
    assert conn.cmd("set max_results 5") == "OK "
    assert conn.cmd("get max_results") == "OK 5"
    assert conn.cmd("get attribute top_score_percent") == "OK 10"
    # Index attributes require a transaction and persist via commit.
    assert conn.cmd("set myattr hello") == "ERR not in transaction"
    assert conn.cmd("begin") == "OK "
    assert conn.cmd("set myattr hello") == "OK "
    assert conn.cmd("commit") == "OK "
    assert conn.cmd("get myattr") == "OK hello"
    assert conn.cmd("get nosuchattr") == "OK "


def test_bad_inputs(conn):
    assert conn.cmd("search") == "ERR expected one argument"
    assert conn.cmd("search abc") == "ERR invalid fingerprint"
    assert conn.cmd("begin") == "OK "
    assert conn.cmd("insert x 1,2") == "ERR invalid document id"
    assert conn.cmd("insert 1 x,y") == "ERR invalid fingerprint"
    assert conn.cmd("rollback") == "OK "


def test_default_max_results_serves_past_128(conn):
    """Reference legacy sessions default max_results=500 (legacy.zig:44) and
    serve up to that many results; 200 matching docs must all come back."""
    assert conn.cmd("get max_results") == "OK 500"
    assert conn.cmd("begin") == "OK "
    for i in range(10001, 10201):
        assert conn.cmd(f"insert {i} 777777") == "OK "
    assert conn.cmd("commit") == "OK "
    resp = conn.cmd("search 777777")
    assert resp.startswith("OK ")
    pairs = resp[3:].split()
    assert len(pairs) == 200, len(pairs)
    assert set(pairs) == {f"{i}:1" for i in range(10001, 10201)}
