"""Real HTTP fetch layer (SURVEY §2.1) — the deployment half of the
landing-zone contract.

The reference builds two shared authenticated httpx clients — base
URL, an auth cookie, fixed ``Referer``/``User-Agent`` headers
(``src/farmrpg_etl/http.py:6-18``) — and every scraper issues GETs
through them: ``worker.php?go=getchat&room=X&cachebuster=<unix ts>``
for chat (``scrapers/chat.py:127-142``), ``log.php?type=chat&room=X&
flag=1`` for flags, ``messages.php`` / ``message.php?id=N`` for the
mailbox (``scrapers/mailbox.py:68,104``), ``profile.php?user_name=U``,
``online.php``, ``members.php?type=staff`` (``scrapers/user.py:79,94,
113``). Error handling is land-and-skip: a non-200 status or a literal
``b"no access"`` body is logged and the poll yields nothing
(``scrapers/chat.py:144-154``) — in this engine those payloads land in
the zone verbatim and the F1 guard (`operators/filters.http_guard`)
drops them, which preserves the reference's behavior while keeping an
auditable record of every poll.

This module is stdlib-``urllib`` (httpx/aiohttp are absent here) and
is fully exercised in tests against a real in-process
``http.server`` — headers, cookies, query strings, cache-buster,
retry, and executor-side fan-out all go over real sockets. Only the
hostname differs in deployment.

Scale note (100 TB): fetchers hold no Spark state and are picklable —
``HttpFetcher`` ships to executors for the S4/S7 demand fan-out, where
per-partition pacing bounds the cluster-wide request rate
(N partitions x 1/pacing req/s). The landing zone, not the fetcher, is
the durability boundary; a fetcher crash loses at most one in-flight
poll, which the next interval re-issues (same at-least-once contract
as the reference's fire-and-forget tasks, tasks.py:28-36).
"""

from __future__ import annotations

import time
import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Callable
from dataclasses import dataclass, field

from farmrpg_etl_spark.sources.landing import PollSpec

__all__ = ["HttpClientConfig", "HttpFetcher", "ENDPOINTS"]


@dataclass(frozen=True)
class HttpClientConfig:
    """One authenticated client, reference ``http.py:6-14``. The
    reference instantiates this twice (``client`` with AUTH_COOKIE,
    ``bot_client`` with BOT_AUTH_COOKIE); mailbox/message polls go
    through the bot client, everything else through the regular one."""

    base_url: str
    cookie: str = ""
    cookie_name: str = "HighwindFRPG"
    user_agent: str = "farmrpg-etl (contact coderanger)"
    referer: str | None = None
    timeout_sec: float = 10.0
    # The reference never retries (log-and-return); retries are a
    # deployment knob for transient 5xx, off by default for parity.
    retries: int = 0
    backoff_sec: float = 0.25


def _chat_params(key: str | None, now: float) -> dict[str, str]:
    return {"go": "getchat", "room": key or "", "cachebuster": repr(now)}


def _flags_params(key: str | None, now: float) -> dict[str, str]:
    return {"type": "chat", "room": key or "", "flag": "1"}


# source -> (path, params builder). Mirrors the reference's endpoint
# map; cachebuster only on the chat poll (chat.py:136-142).
ENDPOINTS: dict[str, tuple[str, Callable[[str | None, float], dict[str, str]]]] = {
    "chat": ("worker.php", _chat_params),
    "flags": ("log.php", _flags_params),
    "mailbox": ("messages.php", lambda key, now: {}),
    "online": ("online.php", lambda key, now: {}),
    "staff": ("members.php", lambda key, now: {"type": "staff"}),
    # demand fan-out sources (S4/S7)
    "message": ("message.php", lambda key, now: {"id": key or ""}),
    "profile": ("profile.php", lambda key, now: {"user_name": key or ""}),
    # crawl-politeness fetch (operators/crawl.py): one robots.txt per
    # host; key = hostname (the fake site virtual-hosts via ?host=)
    "robots": ("robots.txt", lambda key, now: {"host": key or ""}),
}


@dataclass
class HttpFetcher:
    """Picklable ``Fetcher`` over real HTTP.

    Holds only the config plus an optional clock override (for
    deterministic cachebusters in tests); the urllib machinery is
    stateless per call, so instances ship to executors unchanged.
    Usable both as the poll-sweep fetcher (``__call__(PollSpec)``) and
    as the demand-fan-out fetcher (same signature — ``demand_fanout``
    wraps keys in single-use PollSpecs).
    """

    config: HttpClientConfig
    clock: Callable[[], float] = field(default=time.time)

    def request(
        self,
        path: str,
        params: dict[str, str] | None = None,
        *,
        method: str = "GET",
        data: dict[str, str] | None = None,
        json_body: dict | None = None,
        bearer: str | None = None,
    ) -> tuple[int, bytes]:
        """One authenticated request. Returns (status, body); HTTP
        error statuses are returned, not raised (the landing zone
        records them; F1 drops them downstream). Network-level
        failures after the retry budget surface as status 0 with the
        error text as the body, so a dead endpoint is visible in the
        zone rather than poisoning the poll loop.

        ``data`` sends a form-urlencoded body (the reference's bot
        reply POST, bots/base.py:23-33); ``json_body`` a JSON body
        with an optional ``bearer`` Authorization header (the
        reference's Google identitytoolkit POST, firebase.py:27-36).
        """
        cfg = self.config
        url = urllib.parse.urljoin(cfg.base_url, path)
        if params:
            url = f"{url}?{urllib.parse.urlencode(params)}"
        headers = {
            "Referer": cfg.referer if cfg.referer is not None else cfg.base_url,
            "User-Agent": cfg.user_agent,
        }
        if cfg.cookie:
            headers["Cookie"] = f"{cfg.cookie_name}={cfg.cookie}"
        if bearer:
            headers["Authorization"] = f"Bearer {bearer}"
        body: bytes | None = None
        if data is not None:
            body = urllib.parse.urlencode(data).encode()
            headers["Content-Type"] = "application/x-www-form-urlencoded"
        elif json_body is not None:
            import json as _json

            body = _json.dumps(json_body, sort_keys=True).encode()
            headers["Content-Type"] = "application/json"
        last: tuple[int, bytes] = (0, b"")
        for attempt in range(cfg.retries + 1):
            req = urllib.request.Request(
                url, data=body, headers=headers, method=method
            )
            try:
                with urllib.request.urlopen(req, timeout=cfg.timeout_sec) as resp:
                    return resp.status, resp.read()
            except urllib.error.HTTPError as e:  # non-2xx: real status + body
                last = (e.code, e.read())
                if e.code < 500:  # 4xx will not heal; land it
                    return last
            except (urllib.error.URLError, OSError, TimeoutError) as e:
                last = (0, str(e).encode())
            if attempt < cfg.retries:
                time.sleep(cfg.backoff_sec * (2**attempt))
        return last

    def get(self, path: str, params: dict[str, str]) -> tuple[int, bytes]:
        return self.request(path, params, method="GET")

    def post(
        self,
        path: str,
        params: dict[str, str] | None = None,
        *,
        data: dict[str, str] | None = None,
        json_body: dict | None = None,
        bearer: str | None = None,
    ) -> tuple[int, bytes]:
        return self.request(
            path,
            params,
            method="POST",
            data=data,
            json_body=json_body,
            bearer=bearer,
        )

    def __call__(self, spec: PollSpec) -> tuple[int, bytes]:
        try:
            path, build = ENDPOINTS[spec.source]
        except KeyError:
            raise ValueError(f"no endpoint mapped for source {spec.source!r}")
        return self.get(path, build(spec.key, self.clock()))
