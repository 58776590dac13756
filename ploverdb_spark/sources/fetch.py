"""Remote KGX file fetch (SURVEY §2.1 S1; reference plover.py:368-427).

Driver-side pre-step: stream the nodes/edges file to local disk with
retry/backoff and an atomic rename, keeping ``.gz`` bytes as-is (Spark
reads gzip natively).  On a cluster the same role is usually played by
reading s3a/https-backed paths directly; this utility covers deployments
that stage files locally first, like the reference does.
"""

from __future__ import annotations

import os
import time
import urllib.request

CHUNK_BYTES = 8 * 1024 * 1024


def fetch_file(
    url: str,
    dest_path: str,
    max_retries: int = 5,
    backoff_sec: float = 2.0,
    timeout_sec: float = 60.0,
) -> str:
    """Download ``url`` to ``dest_path`` (atomic: temp file + rename).

    Retries with exponential backoff (reference retries 5x with doubling
    waits, plover.py:388-427).  Returns ``dest_path``.
    """
    tmp_path = f"{dest_path}.part"
    last_err: Exception | None = None
    for attempt in range(max_retries):
        try:
            with urllib.request.urlopen(url, timeout=timeout_sec) as resp, open(
                tmp_path, "wb"
            ) as out:
                while True:
                    chunk = resp.read(CHUNK_BYTES)
                    if not chunk:
                        break
                    out.write(chunk)
            os.replace(tmp_path, dest_path)  # atomic on POSIX
            return dest_path
        except Exception as e:  # noqa: BLE001 — every urllib error retries
            last_err = e
            if os.path.exists(tmp_path):
                os.remove(tmp_path)
            if attempt < max_retries - 1:
                time.sleep(backoff_sec * (2**attempt))
    raise RuntimeError(
        f"failed to fetch {url} after {max_retries} attempts"
    ) from last_err
