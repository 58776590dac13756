"""Batch id-normalization seam (reference SRI NodeNormalizer calls,
plover.py:831, 883-905).

When a graph ships no equivalent-id arrays, the reference resolves
preferred identifiers by POSTing node ids to the SRI NodeNormalizer in
batches of 1,000 with retry.  Here the resolver is an injectable callable
(``list[str] -> dict[str, list[str]]`` mapping each queried id to its
equivalence group, preferred id FIRST), and resolution runs *inside the
cluster*: ``mapInPandas`` over the node-id column, each Arrow batch
re-chunked to the resolver's batch size — at 100 TB the ids never funnel
through the driver, and each executor core holds one in-flight request.

``sri_resolver`` builds the real HTTP client for the public service; tests
inject a deterministic fake.
"""

from __future__ import annotations

import json
import time
import urllib.request
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame

Resolver = Callable[[list[str]], dict[str, list[str]]]

BATCH_SIZE = 1000  # parity with reference plover.py:883 (1,000-id POSTs)
SRI_URL = "https://nodenormalization-sri.renci.org/get_normalized_nodes"


def with_retry(
    resolver: Resolver, max_retries: int = 5, backoff_sec: float = 2.0
) -> Resolver:
    """Exponential-backoff wrapper (reference retry loop semantics)."""

    def call(curies: list[str]) -> dict[str, list[str]]:
        last: Exception | None = None
        for attempt in range(max_retries):
            try:
                return resolver(curies)
            except Exception as e:  # noqa: BLE001 — every failure retries
                last = e
                if attempt < max_retries - 1:
                    time.sleep(backoff_sec * (2**attempt))
        raise RuntimeError(
            f"id resolution failed after {max_retries} attempts"
        ) from last

    return call


def sri_resolver(url: str = SRI_URL, timeout_sec: float = 60.0) -> Resolver:
    """HTTP client for the public SRI NodeNormalizer (POST JSON
    ``{"curies": [...]}``; response maps each curie to its preferred id +
    equivalent identifiers)."""

    def call(curies: list[str]) -> dict[str, list[str]]:
        req = urllib.request.Request(
            url,
            data=json.dumps({"curies": curies}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=timeout_sec) as resp:
            body = json.load(resp)
        out: dict[str, list[str]] = {}
        for curie, info in body.items():
            if not info:
                continue
            preferred = info.get("id", {}).get("identifier", curie)
            equivalents = [
                e.get("identifier")
                for e in info.get("equivalent_identifiers", [])
                if e.get("identifier")
            ]
            group = [preferred] + [e for e in equivalents if e != preferred]
            out[curie] = group
        return out

    return call


def resolve_synonyms(
    nodes: DataFrame,
    resolver: Resolver,
    id_col: str = "id",
    batch_size: int = BATCH_SIZE,
    max_retries: int = 5,
    backoff_sec: float = 2.0,
) -> DataFrame:
    """(alias_id, preferred_id) pairs from an injected resolver, computed
    distributed: each mapInPandas batch re-chunks its ids to
    ``batch_size`` and calls the resolver per chunk.  Ids the resolver
    does not know resolve to themselves (no remap), matching the
    reference's pass-through for unrecognized curies."""
    import pandas as pd

    retrying = with_retry(resolver, max_retries=max_retries, backoff_sec=backoff_sec)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = [str(v) for v in pdf[id_col].dropna().unique()]
            alias, preferred = [], []
            for i in range(0, len(ids), batch_size):
                chunk = ids[i : i + batch_size]
                mapping = retrying(chunk)
                for _, group in mapping.items():
                    if not group:
                        continue
                    pref = group[0]
                    for eq in group:
                        alias.append(eq)
                        preferred.append(pref)
            yield pd.DataFrame({"alias_id": alias, "preferred_id": preferred})

    return (
        nodes.select(id_col)
        .distinct()
        .mapInPandas(batches, "alias_id string, preferred_id string")
        .where("alias_id <> preferred_id")
        .dropDuplicates(["alias_id"])
    )
