"""In-process stand-in for the game site (reference endpoints,
deterministic bodies) — the single fake-server implementation shared
by the real-HTTP driver rows (`queries.s_http_*`) and the socket
tests (`tests/test_http_source.py`), so the route table lives in ONE
place next to the client's `ENDPOINTS` map.

Bodies are deterministic in (source, key) — ``'chat|help'``,
``'message:42'`` — so oracles can recompute every digest. The handler
optionally records requests (headers + parsed query) and can serve a
budget of 503s for retry tests; requests lacking the expected auth
cookie get the site's soft-auth failure body ``b"no access"``
(reference scrapers/chat.py:151-154).
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

__all__ = ["serve_game_site", "GameSiteHandler"]


class GameSiteHandler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # silence request logging
        pass

    def do_GET(self):
        u = urlparse(self.path)
        q = {k: v[0] for k, v in parse_qs(u.query).items()}
        with self.server.lock:
            if self.server.record:
                self.server.seen.append(
                    {"path": u.path, "query": q, "headers": dict(self.headers)}
                )
            fail_budget = self.server.fail_budget
            if fail_budget > 0:
                self.server.fail_budget -= 1
        if fail_budget > 0:
            self.send_response(503)
            self.end_headers()
            self.wfile.write(b"upstream sad")
            return
        cookie = f"HighwindFRPG={self.server.cookie}"
        if u.path == "/robots.txt":
            # PUBLIC route (no auth, like the real file): deterministic
            # per-host robots body for the crawl-loop e2e row — the
            # ?host= param stands in for virtual-hosting many domains
            # off one in-process server. Hosts whose number is ≡0 mod 3
            # publish only a * group (the farmbot scope must fall back
            # to it); the rest deny everything to strangers but give
            # farmbot a Disallow with a longer Allow carve-out.
            import re as _re

            m = _re.search(r"(\d+)", q.get("host", ""))
            n = int(m.group(1)) if m else 0
            if n % 3 == 0:
                body = b"# crawl policy\nUser-agent: *\nDisallow: /Docs\n"
            else:
                body = (
                    "User-agent: *\nDisallow: /\n"
                    f"User-agent: farmbot\nDisallow: /Docs/{n}\n"
                    f"Allow: /Docs/{n}/pub\n"
                ).encode()
            status = 200
        elif self.headers.get("Cookie", "") != cookie:
            body, status = b"no access", 200
        elif u.path == "/worker.php":
            body, status = f"chat|{q.get('room', '')}".encode(), 200
        elif u.path == "/log.php":
            body, status = f"flags|{q.get('room', '')}".encode(), 200
        elif u.path == "/messages.php":
            body, status = b"mailbox|", 200
        elif u.path == "/online.php":
            body, status = b"online|", 200
        elif u.path == "/members.php":
            body, status = b"staff|", 200
        elif u.path == "/message.php":
            body, status = f"message:{q.get('id', '')}".encode(), 200
        elif u.path == "/profile.php":
            body, status = f"profile:{q.get('user_name', '')}".encode(), 200
        else:
            body, status = b"not found", 404
        self.send_response(status)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


    def do_POST(self):
        u = urlparse(self.path)
        q = {k: v[0] for k, v in parse_qs(u.query).items()}
        n = int(self.headers.get("Content-Length", "0") or 0)
        raw = self.rfile.read(n) if n else b""
        ctype = self.headers.get("Content-Type", "")
        if ctype.startswith("application/json"):
            import json as _json

            form = _json.loads(raw.decode() or "{}")
        else:
            form = {k: v[0] for k, v in parse_qs(raw.decode()).items()}
        with self.server.lock:
            if self.server.record:
                self.server.seen.append(
                    {
                        "path": u.path,
                        "query": q,
                        "form": form,
                        "headers": dict(self.headers),
                    }
                )
        if u.path == "/worker.php" and q.get("go") == "sendmessage":
            # reference bots/base.py:23-33 — form POST with auth cookie
            if self.headers.get("Cookie", "") != (
                f"HighwindFRPG={self.server.cookie}"
            ):
                body, status = b"no access", 200
            else:
                body, status = (
                    f"sent:{form.get('in_reply_to', '')}".encode(),
                    200,
                )
        elif u.path == "/v1/accounts:update":
            # reference firebase.py:27-36 — JSON POST, Bearer auth
            auth = self.headers.get("Authorization", "")
            if not auth.startswith("Bearer "):
                body, status = b'{"error": "unauthenticated"}', 401
            else:
                body, status = (
                    ('{"localId": "%s"}' % form.get("localId", "")).encode(),
                    200,
                )
        else:
            body, status = b"not found", 404
        self.send_response(status)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


class _GameSiteServer(ThreadingHTTPServer):
    # stdlib default listen backlog is 5; the executor-side fan-outs
    # open 32+ concurrent connections and overflowed it (observed as
    # ECONNRESET on task 16 of the distributed claims push)
    request_queue_size = 128


def serve_game_site(
    cookie: str = "s3cret", record: bool = False
) -> ThreadingHTTPServer:
    """Start a threaded fake site on an ephemeral 127.0.0.1 port.
    Caller owns shutdown: ``srv.shutdown(); srv.server_close()``."""
    srv = _GameSiteServer(("127.0.0.1", 0), GameSiteHandler)
    srv.lock = threading.Lock()
    srv.seen = []
    srv.record = record
    srv.fail_budget = 0
    srv.cookie = cookie
    # poll_interval bounds shutdown() latency: the stdlib default 0.5 s
    # poll made every srv.shutdown() block ~0.5 s — a constant sleep
    # paid by EVERY live-crawl row (6+ bench rows start/stop a site
    # per run; measured 0.48 s/teardown, r17). 20 polls/s when idle is
    # negligible CPU.
    threading.Thread(
        target=lambda: srv.serve_forever(poll_interval=0.05), daemon=True
    ).start()
    return srv
