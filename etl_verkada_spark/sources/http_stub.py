"""In-process HTTP stub server for connector tests.

Serves the reference's API shapes (offset pages, cursor pages, lease
upsert endpoints) from a fixed in-memory dataset, and records request
statistics (counts, max observed concurrency) so tests can assert the
O4/O5/O6 behaviors.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


class StubStats:
    def __init__(self):
        self.lock = threading.Lock()
        self.requests: list[tuple[str, str]] = []
        self.in_flight = 0
        self.max_in_flight = 0

    def enter(self, method: str, path: str) -> None:
        with self.lock:
            self.requests.append((method, path))
            self.in_flight += 1
            self.max_in_flight = max(self.max_in_flight, self.in_flight)

    def leave(self) -> None:
        with self.lock:
            self.in_flight -= 1


def make_server(items: list[dict], cursor_page_size: int = 7,
                repeat_last_token: bool = False):
    """Start a stub server; returns (server, port, stats).

    * ``GET /items?limit=&page=``   -> offset pages ``{items, total}``
    * ``GET /cursor``               -> token pages ``{items, next_page_token}``;
      with ``repeat_last_token`` the final page repeats its own token —
      the infinite-loop bug the reference's O6 guard defends against.
    * ``PATCH/POST /lease...``      -> 204, recorded in stats
    """
    stats = StubStats()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # silence
            pass

        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            stats.enter("GET", self.path)
            try:
                u = urlparse(self.path)
                q = parse_qs(u.query)
                if u.path == "/items":
                    limit = int(q.get("limit", ["50"])[0])
                    page = int(q.get("page", ["1"])[0])
                    start = (page - 1) * limit
                    self._json(
                        {
                            "items": items[start : start + limit],
                            "total": len(items),
                        }
                    )
                elif u.path == "/cursor":
                    tok = q.get("page_token", [None])[0]
                    start = int(tok) if tok else 0
                    end = start + cursor_page_size
                    page_items = items[start:end]
                    if end >= len(items):
                        nxt = tok if repeat_last_token else None
                    else:
                        nxt = str(end)
                    self._json(
                        {"items": page_items, "next_page_token": nxt}
                    )
                else:
                    self._json({"error": "not found"}, 404)
            finally:
                stats.leave()

        def do_POST(self):
            self._upsert("POST")

        def do_PATCH(self):
            self._upsert("PATCH")

        def _upsert(self, method):
            stats.enter(method, self.path)
            try:
                length = int(self.headers.get("Content-Length", 0))
                self.rfile.read(length)
                import time

                time.sleep(0.01)  # hold the slot so concurrency is observable
                self._json({"ok": True})
            finally:
                stats.leave()

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server, server.server_address[1], stats
