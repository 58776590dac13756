"""Multi-KP endpoint dispatch — the engine-side API surface.

The reference serves each knowledge provider (KP) under its own URL prefix
from one process (main.py:50-65, one PloverDB instance per config*.json).
This module is the framework-agnostic equivalent: a registry of named
:class:`TrapiEngine` instances and a ``handle()`` dispatcher implementing
the reference's endpoint semantics and status codes.  An HTTP frontend
(FastAPI/Flask behind an async gateway, per SURVEY §4.2's backpressure
note) wires routes straight to ``handle`` — kept out of this repo's
dependencies on purpose; the engine surface is fully testable without it.

Endpoints (reference main.py routes):
- POST /query                 -> TRAPI one-hop / edgeless (R6 slim modes honored)
- POST /edges                 -> pairwise edge lookup (J10)
- POST /neighbors             -> batch adjacency (J11)
- GET  /meta_knowledge_graph  -> A1/A3 payload
- GET  /sri_test_triples      -> A2 payload
- GET  /healthcheck           -> '' (main.py:256-259)
- GET  /code_version          -> build metadata (main.py:262-276)
- GET  /get_logs              -> tail of the engine's query log (main.py:630-637)
"""

from __future__ import annotations

import itertools
import threading
from collections import deque
from typing import Any

from ploverdb_spark.build.meta_kg import build_meta_kg, test_triples
from ploverdb_spark.query.compiler import QueryError, TrapiEngine
from ploverdb_spark.query.response import get_edges, get_neighbors, run_query

DEFAULT_QUERY_TIMEOUT_SEC = 45  # parity with uwsgi.ini:10 (harakiri)

_query_seq = itertools.count()


def run_query_with_timeout(
    engine: TrapiEngine, query: dict, timeout_sec: float = DEFAULT_QUERY_TIMEOUT_SEC
) -> dict:
    """``run_query`` under the reference's per-request timeout semantics
    (45 s harakiri, uwsgi.ini:10) — Spark-native: the query runs in its
    own thread with a job group; on timeout every Spark job in the group
    is cancelled (interruptOnCancel) and a 504-equivalent QueryError
    raises.  Job groups are thread-local, so concurrent queries cancel
    independently."""
    sc = engine.spark.sparkContext
    group = f"trapi-query-{next(_query_seq)}"
    out: dict[str, Any] = {}

    def target() -> None:
        sc.setJobGroup(group, "TRAPI query", interruptOnCancel=True)
        try:
            out["body"] = run_query(engine, query)
        except BaseException as e:  # noqa: BLE001 — relayed to caller
            out["error"] = e
        finally:
            sc.clearJobGroup()

    t = threading.Thread(target=target, daemon=True)
    t.start()
    t.join(timeout_sec)
    if t.is_alive():
        sc.cancelJobGroup(group)
        raise QueryError(
            504, f"Query exceeded the {timeout_sec:.0f}s processing limit."
        )
    if "error" in out:
        raise out["error"]
    return out["body"]

LOG_TAIL_MAX = 2000  # parity with main.py:635 (num_lines clamp 1..2000)


class KpRegistry:
    """endpoint name -> engine, with the reference's default-endpoint rule
    (lexicographically smallest name, main.py:50-65)."""

    def __init__(self) -> None:
        self._engines: dict[str, TrapiEngine] = {}
        self._logs: dict[str, deque] = {}
        self._meta_cache: dict[str, dict] = {}

    def register(self, name: str, engine: TrapiEngine) -> None:
        self._engines[name] = engine
        self._logs[name] = deque(maxlen=LOG_TAIL_MAX)

    @property
    def default_endpoint(self) -> str | None:
        return min(self._engines) if self._engines else None

    def engine(self, name: str | None) -> TrapiEngine:
        key = name or self.default_endpoint
        if key is None or key not in self._engines:
            raise QueryError(404, f"Unknown KP endpoint: {name!r}")
        return self._engines[key]

    def meta_kg(self, name: str | None) -> dict:
        key = name or self.default_endpoint
        if key not in self._meta_cache:
            self._meta_cache[key] = build_meta_kg(self.engine(key).kg)
        return self._meta_cache[key]

    def log(self, name: str | None, entry: Any) -> None:
        key = name or self.default_endpoint
        if key in self._logs:
            self._logs[key].append(entry)

    def log_tail(self, name: str | None, num_lines: int = 100) -> list:
        key = name or self.default_endpoint
        num_lines = max(1, min(int(num_lines), LOG_TAIL_MAX))
        entries = list(self._logs.get(key, ()))
        return entries[-num_lines:]


def handle(
    registry: KpRegistry,
    path: str,
    payload: dict | None = None,
    endpoint: str | None = None,
    code_version: str = "ploverdb_spark-dev",
) -> tuple[int, Any]:
    """Dispatch one request; returns (http_status, body).

    Error semantics mirror the reference: 400 bad shape, 403 guard trips
    (qualifier whitelist, answer-size cutoff), 404 unknown endpoint/path.
    """
    payload = payload or {}
    try:
        if path == "query":
            eng = registry.engine(endpoint)
            body = run_query_with_timeout(eng, payload)
            registry.log(endpoint, {"path": "query", "ok": True})
            return 200, body
        if path == "edges":
            eng = registry.engine(endpoint)
            return 200, get_edges(eng, payload.get("pairs", []))
        if path == "neighbors":
            eng = registry.engine(endpoint)
            return 200, get_neighbors(
                eng,
                payload.get("node_ids", []),
                categories=payload.get("categories"),
                predicates=payload.get("predicates"),
            )
        if path == "meta_knowledge_graph":
            return 200, registry.meta_kg(endpoint)
        if path == "sri_test_triples":
            eng = registry.engine(endpoint)
            rows = test_triples(eng.kg).collect()
            return 200, {
                f"{r.subject_category}--{r.predicate}--{r.object_category}": {
                    "subject_id": r.subject_id,
                    "object_id": r.object_id,
                }
                for r in rows
            }
        if path == "healthcheck":
            return 200, ""
        if path == "code_version":
            return 200, {
                "code_info": code_version,
                "endpoints": sorted(registry._engines),
            }
        if path == "get_logs":
            return 200, registry.log_tail(
                endpoint, payload.get("num_lines", 100)
            )
        return 404, {"error": f"Unknown path: {path!r}"}
    except QueryError as e:
        registry.log(endpoint, {"path": path, "ok": False, "error": e.message})
        return e.status, {"error": e.message}
