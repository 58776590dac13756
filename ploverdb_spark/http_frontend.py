"""Dependency-free HTTP frontend over :func:`ploverdb_spark.api.handle`.

The reference serves its endpoints through Flask + uwsgi (main.py routes,
uwsgi.ini worker/harakiri config).  This module is the stdlib equivalent:
a ``ThreadingHTTPServer`` whose handler parses the KP endpoint prefix and
path the way the reference's URL map does (``/<endpoint>/<path>`` with a
default-endpoint fallback) and delegates every route to ``api.handle`` —
the dispatcher stays the single source of endpoint semantics, so anything
tested against ``handle`` behaves identically over HTTP.

Threading matches the engine's serving stance: each request thread drives
its own Spark job group under the FAIR scheduler (api.py), so a burst of
requests shares the session without FIFO starvation.  Production
deployments that want uvicorn/gunicorn semantics can mount ``handle``
behind any framework in a few lines; nothing here is load-bearing beyond
routing.
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from ploverdb_spark.api import KpRegistry, handle

GET_PATHS = {
    "meta_knowledge_graph",
    "sri_test_triples",
    "healthcheck",
    "code_version",
    "get_logs",
    "logs",  # the reference registers /get_logs and /logs (main.py:626-627)
    "debug",
    "debug/last",
    "",  # instance home page (reference main.py:130)
    "home",  # per-KP home page (reference main.py:651)
}
# data routes are double-registered like the reference (main.py:222-241)
POST_PATHS = {
    "query",
    "edges",
    "get_edges",
    "neighbors",
    "get_neighbors",
    "rebuild",
}
KNOWN_PATHS = GET_PATHS | POST_PATHS


def _route(registry: KpRegistry, raw_path: str) -> tuple[str | None, str]:
    """'/endpoint/path' or '/path' -> (endpoint or None, path).

    Mirrors the reference's per-KP URL prefixes (main.py:50-65): a first
    segment naming a registered KP selects it; otherwise the default
    endpoint serves the bare path.  A bare ``/<kp>`` is that KP's home
    page (reference main.py:651-658); bare ``/`` is the instance home.
    """
    parts = [p for p in raw_path.split("?")[0].split("/") if p]
    if parts and parts[0] in registry._engines:
        return parts[0], "/".join(parts[1:]) or "home"
    return None, "/".join(parts)


class _Handler(BaseHTTPRequestHandler):
    registry: KpRegistry  # set by serve()

    def log_message(self, fmt: str, *args: Any) -> None:  # quiet by default
        pass

    def _respond(self, status: int, body: Any) -> None:
        is_html = isinstance(body, str) and body.lstrip().startswith("<")
        data = json.dumps(body).encode() if not isinstance(body, str) else body.encode()
        self.send_response(status)
        self.send_header(
            "Content-Type", "text/html" if is_html else "application/json"
        )
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _dispatch(self, payload: dict | None, allowed: set[str]) -> None:
        endpoint, path = _route(self.registry, self.path)
        if path not in KNOWN_PATHS:
            self._respond(404, {"error": f"Unknown path: {path!r}"})
            return
        if path not in allowed:
            # The reference registers every route single-method (@app.get /
            # @app.post, main.py:130-651); Flask answers the other verb
            # with 405, so we must too — not a 400 from the engine.
            self._respond(405, {"error": f"Method not allowed for {path!r}"})
            return
        status, body = handle(self.registry, path, payload, endpoint=endpoint)
        self._respond(status, body)

    def do_GET(self) -> None:  # noqa: N802 — http.server API
        self._dispatch(None, GET_PATHS)

    def do_POST(self) -> None:  # noqa: N802 — http.server API
        length = int(self.headers.get("Content-Length") or 0)
        raw = self.rfile.read(length) if length else b""
        try:
            payload = json.loads(raw) if raw else {}
        except json.JSONDecodeError:
            self._respond(400, {"error": "Request body is not valid JSON."})
            return
        self._dispatch(payload, POST_PATHS)


def serve(
    registry: KpRegistry, host: str = "0.0.0.0", port: int = 9990
) -> ThreadingHTTPServer:
    """Start serving ``registry`` on ``host:port``; returns the running
    server (call ``.shutdown()`` to stop).  The caller owns the blocking
    decision — ``serve_forever`` runs on a daemon thread so embedding in
    tests or a supervisor loop is trivial."""
    import threading

    handler = type("BoundHandler", (_Handler,), {"registry": registry})
    # TCPServer's default listen backlog is 5 — a 100-way simultaneous
    # burst overflows it and the tail sees connection resets before the
    # app ever runs.  Match the nginx/uwsgi listen backlog the reference
    # deploys with (uwsgi.ini:33; api.DEFAULT_BACKLOG).
    server_cls = type(
        "DeepBacklogServer", (ThreadingHTTPServer,), {"request_queue_size": 512}
    )
    server = server_cls((host, port), handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server
