"""Out-of-process point-query façade over ModelStore (SURVEY.md §2.6
X1/X2 — the reference's queryable-state CLIENT side).

The reference exposes Flink queryable ValueState over the network and
ships a client helper with a 5 s query timeout and miss ⇒
Optional.empty (QueryClientHelper.java:104-139). Spark has no state
server, so this module completes the parity story with a thin
localhost HTTP façade over ``ModelStore.lookup``:

- ``ModelStoreServer`` — a daemon-threaded stdlib HTTP server bound to
  127.0.0.1 on the DRIVER (where the store's dict mirror lives).
  GET /lookup?key=K → 200 {"key": K, ...payload...} or 404
  {"found": false} for a miss.
- ``query_model`` — the client helper: any process on the machine can
  point-query the serving view; ``timeout`` defaults to the
  reference's 5 s; a miss returns None (Optional.empty parity).

Scale note: this is a serving-layer façade for the MODEL (bounded,
driver-resident by design — see serving/store.py); it is not a data
path. A production deployment would front the same lookup contract
with a real KV tier; every caller-visible semantic (latest-per-key,
miss ⇒ empty, timeout) is pinned here.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Optional
from urllib.parse import parse_qs, urlparse
from urllib.request import urlopen

from flink_ms_spark.serving.store import ModelStore


class _Handler(BaseHTTPRequestHandler):
    store: ModelStore  # set by server factory

    def do_GET(self) -> None:  # noqa: N802 (stdlib contract)
        url = urlparse(self.path)
        if url.path != "/lookup":
            self._reply(404, {"error": "unknown path"})
            return
        keys = parse_qs(url.query).get("key")
        if not keys:
            self._reply(400, {"error": "missing key"})
            return
        row = self.store.lookup(keys[0])
        if row is None:  # miss => empty, QueryClientHelper.java:135-137
            self._reply(404, {"found": False, "key": keys[0]})
            return
        self._reply(200, {"found": True, "key": keys[0], **row.asDict()})

    def _reply(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args: Any) -> None:  # quiet
        pass


class ModelStoreServer:
    """Localhost HTTP façade over a ModelStore; ``port=0`` picks a free
    port (read it back from ``.port`` after ``start``)."""

    def __init__(self, store: ModelStore, host: str = "127.0.0.1", port: int = 0):
        handler = type("BoundHandler", (_Handler,), {"store": store})
        self._httpd = ThreadingHTTPServer((host, port), handler)
        self._thread: threading.Thread | None = None

    @property
    def host(self) -> str:
        return self._httpd.server_address[0]

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self) -> "ModelStoreServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="model-store-server", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)


def query_model(
    host: str, port: int, key: str, timeout: float = 5.0
) -> Optional[dict]:
    """Client helper: point-query a served model; miss ⇒ None. The 5 s
    default timeout mirrors QueryClientHelper.java's query timeout."""
    from urllib.error import HTTPError
    from urllib.parse import quote

    # keys are arbitrary parsed strings — encode, or '&'/'#'/'+'/' '
    # inside a key queries the wrong key (or malforms the request)
    url = f"http://{host}:{port}/lookup?key={quote(key, safe='')}"
    try:
        with urlopen(url, timeout=timeout) as resp:
            return json.loads(resp.read())
    except HTTPError as e:
        if e.code == 404:
            return None
        raise
