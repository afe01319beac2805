"""Rate-limited REST upsert sink (reference S9 + O4).

The reference's lease sync: for each camera, PATCH the existing lease
else POST a new one, in bounded batches of 20 concurrent calls with
``Promise.allSettled`` error isolation (task.ts:200-277). Spark-first
mapping:

* the PATCH/POST routing decision is computed *relationally* upstream
  (broadcast left join -> ``action`` column, pipeline/features.py);
* the HTTP fan-out runs in ``foreachPartition`` — each partition drives
  its own bounded thread pool (``max_in_flight`` = the reference's 20)
  plus an optional token-bucket rate limit, so total cluster concurrency
  = partitions x max_in_flight and is sized by ``repartition`` before
  the sink (O4 at cluster scale: cap partitions, not just threads);
* allSettled semantics: per-row failures are counted, never raised —
  features still ship without video, exactly task.ts:276-277 — BUT the
  sink is idempotent per (key, payload) so Spark task retries are safe
  (the reference gets this from lease upsert semantics; we keep it by
  making PATCH/POST both last-wins on the server key).

Streaming form: pass :func:`rest_upsert_sink` to
``writeStream.foreachBatch`` — per micro-batch, identical code path.
"""

from __future__ import annotations

import json
import threading
import time
import urllib.request
from collections.abc import Iterator

from pyspark.sql import DataFrame

MAX_IN_FLIGHT = 20  # task.ts:201
LEASE_DURATION_S = 3600  # task.ts:237,258


class TokenBucket:
    """Simple thread-safe token bucket (requests/second cap)."""

    def __init__(self, rate_per_sec: float):
        self.rate = rate_per_sec
        self.tokens = rate_per_sec
        self.last = time.monotonic()
        self.lock = threading.Lock()

    def acquire(self) -> None:
        while True:
            with self.lock:
                now = time.monotonic()
                self.tokens = min(self.rate, self.tokens + (now - self.last) * self.rate)
                self.last = now
                if self.tokens >= 1:
                    self.tokens -= 1
                    return
            time.sleep(1.0 / self.rate)


def _send(method: str, url: str, payload: dict, timeout: float) -> None:
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        method=method,
        headers={"Content-Type": "application/json"},
    )
    urllib.request.urlopen(req, timeout=timeout).read()


def upsert_partition(
    rows: Iterator,
    base_url: str,
    max_in_flight: int = MAX_IN_FLIGHT,
    rate_per_sec: float | None = None,
    timeout: float = 30.0,
) -> tuple[int, int]:
    """Drain one partition: PATCH/POST per row, bounded concurrency.

    Each row needs: ``id`` (entity key), ``action`` ('patch'|'post'|
    'skip'), ``lease_id`` (PATCH target, may be None), ``payload_json``.
    Returns (ok, failed) — failures isolated, not raised (allSettled).
    """
    from concurrent.futures import ThreadPoolExecutor

    bucket = TokenBucket(rate_per_sec) if rate_per_sec else None
    ok = failed = 0

    def one(row) -> bool:
        if row["action"] == "skip":
            return True
        if bucket:
            bucket.acquire()
        payload = json.loads(row["payload_json"])
        payload.setdefault("duration", LEASE_DURATION_S)
        try:
            if row["action"] == "patch":
                _send("PATCH", f"{base_url}/{row['lease_id']}", payload, timeout)
            else:
                _send("POST", base_url, payload, timeout)
            return True
        except Exception:
            return False  # error isolation: task.ts:277

    # chunked submission caps in-flight work like features.slice(i, i+20)
    with ThreadPoolExecutor(max_workers=max_in_flight) as pool:
        for success in pool.map(one, rows):
            ok += success
            failed += not success
    return ok, failed


def upsert_to_rest(
    df: DataFrame,
    base_url: str,
    max_in_flight: int = MAX_IN_FLIGHT,
    rate_per_sec: float | None = None,
    max_partitions: int | None = None,
) -> None:
    """Batch sink entry point.

    ``max_partitions`` bounds TOTAL outbound concurrency at
    partitions x max_in_flight — the cluster-scale version of the
    reference's single-process 20-cap.
    """
    if max_partitions is not None:
        df = df.coalesce(max_partitions)

    def run(rows: Iterator) -> None:
        upsert_partition(rows, base_url, max_in_flight, rate_per_sec)

    df.foreachPartition(run)


def rest_upsert_sink(base_url: str, **kwargs):
    """foreachBatch adapter: ``writeStream.foreachBatch(rest_upsert_sink(url))``."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        upsert_to_rest(batch_df, base_url, **kwargs)

    return _sink
