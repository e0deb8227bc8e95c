"""Persistent aria2 download daemon driven over its JSON-RPC interface.

The reference keeps one aria2c daemon alive for the whole dataset download
and enqueues every tar through RPC so retries/segmenting/integrity checks
happen server-side (reference omnidata_tools/dataset/download.py:129-140:
``ensure_aria2_server`` spawns ``aria2c --enable-rpc`` and wraps it in
aria2p; ``download_tar`` calls ``add_uri(uris, {'out','dir','checksum'})``
and polls). aria2p isn't available offline, so this module speaks the
aria2 JSON-RPC protocol (https://aria2.github.io/manual — ``aria2.addUri``
/ ``aria2.tellStatus``) directly with urllib. Behavior kept:

- one daemon per process, spawned lazily, SIGINT'd at exit;
- ``-c`` resume, ``--auto-file-renaming=false``, ``-s/-j/-x`` fan-out;
- server-side md5 verification via the ``checksum`` download option;
- callers fall back to plain urllib when aria2c isn't installed.
"""
from __future__ import annotations

import atexit
import json
import os
import shutil
import signal
import subprocess
import time
import urllib.request

__all__ = ["Aria2RPC", "ensure_daemon"]


class Aria2RPC:
    """Minimal JSON-RPC client for one aria2 daemon."""

    def __init__(self, host: str = "localhost", port: int = 6800,
                 secret: str = ""):
        self.url = f"http://{host}:{port}/jsonrpc"
        self.secret = secret
        self._id = 0

    def call(self, method: str, *params):
        """POST one aria2 JSON-RPC request; returns the ``result`` field."""
        if self.secret:  # token goes first, per the aria2 RPC auth scheme
            params = (f"token:{self.secret}",) + params
        self._id += 1
        body = json.dumps({"jsonrpc": "2.0", "id": str(self._id),
                           "method": method, "params": list(params)})
        req = urllib.request.Request(
            self.url, body.encode(), {"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            reply = json.loads(r.read())
        if "error" in reply:
            raise IOError(f"aria2 rpc {method}: {reply['error']}")
        return reply["result"]

    def alive(self) -> bool:
        try:
            self.call("aria2.getVersion")
            return True
        except Exception:  # noqa: BLE001 — any failure means "not usable"
            return False

    def download(self, url: str, dest: str, checksum: str | None = None,
                 poll_s: float = 0.25, timeout_s: float = 24 * 3600) -> None:
        """Enqueue ``url`` -> ``dest`` and block until the daemon finishes.

        ``checksum`` (md5 hex) is verified by the daemon itself
        (reference download.py:158: ``options['checksum'] = f"md5={...}"``).
        Raises IOError on daemon-reported error or timeout.
        """
        os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
        opts = {"out": os.path.basename(dest),
                "dir": os.path.abspath(os.path.dirname(dest) or "."),
                "auto-file-renaming": "false", "check-integrity": "true"}
        if checksum:
            opts["checksum"] = f"md5={checksum}"
        gid = self.call("aria2.addUri", [url], opts)
        deadline = time.monotonic() + timeout_s
        while True:
            st = self.call("aria2.tellStatus", gid,
                           ["status", "errorMessage", "totalLength",
                            "completedLength"])
            if st["status"] == "complete":
                return
            if st["status"] in ("error", "removed"):
                raise IOError(f"aria2 download failed for {url}: "
                              f"{st.get('errorMessage', st['status'])}")
            if time.monotonic() > deadline:
                raise IOError(f"aria2 download timed out for {url}")
            time.sleep(poll_s)


_DAEMON: Aria2RPC | None = None


def ensure_daemon(connections_total: int = 8,
                  connections_per_server: int | None = None,
                  port: int = 6800, secret: str = "") -> Aria2RPC | None:
    """Spawn (once per process) a background ``aria2c --enable-rpc`` daemon.

    Returns a connected client, or None when aria2c isn't installed /
    refuses to start — callers then fall back to urllib. The daemon gets
    SIGINT at interpreter exit (reference download.py:140 atexit.register).
    """
    global _DAEMON
    if _DAEMON is not None:
        return _DAEMON if _DAEMON.alive() else None
    if not shutil.which("aria2c"):
        return None
    n = connections_total
    x = min(connections_per_server if connections_per_server else n, 16)
    proc = subprocess.Popen(
        ["aria2c", "--enable-rpc", f"--rpc-listen-port={port}",
         "--disable-ipv6", "-c", "--auto-file-renaming=false",
         f"-s{n}", f"-j{n}", f"-x{x}", "-q"]
        + ([f"--rpc-secret={secret}"] if secret else []),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    atexit.register(lambda: proc.poll() is None
                    and os.kill(proc.pid, signal.SIGINT))
    client = Aria2RPC(port=port, secret=secret)
    for _ in range(40):  # ~4 s for the RPC socket to come up
        if client.alive():
            _DAEMON = client
            return client
        if proc.poll() is not None:
            return None
        time.sleep(0.1)
    return None
