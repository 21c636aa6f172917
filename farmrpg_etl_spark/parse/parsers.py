"""Pure-Python HTML → record parsers (SURVEY.md §2.2, P1–P8).

Each function takes the raw payload bytes plus the poll's ``fetch_ts``
(the executor-safe replacement for the reference's ``datetime.now()``
calls — see SURVEY §7 "clock discipline") and returns plain dicts.
They are engine-agnostic: the Spark stage wraps them in Arrow
``mapInPandas`` batches (``farmrpg_etl_spark.parse.stage``), and the
unit tests run them directly against the reference's golden fixtures.

Semantics parity (reference file:line, /root/reference):
* P1 chat parser         — src/farmrpg_etl/scrapers/chat.py:31-83
* P2 day-rollover repair — scrapers/chat.py:36-51 (pinned by
  test/scrapers/test_chat.py:132-162)
* P3 content rewriting   — scrapers/chat.py:21-25,72-74
* P4 flags parser        — scrapers/chat.py:86-115
* P5 profile parser      — scrapers/user.py:22-62
* P6 online/staff parser — scrapers/user.py:65-70
* P7 mailbox parser      — scrapers/mailbox.py:81-96
* P8 mail parser         — scrapers/mailbox.py:25-60
* P9 strict-parse errors — scrapers/errors.py:1-2 (fail-loud ParseError)

Documented divergences from the reference:
* flags synthetic id uses md5 of the parsed parts instead of Python's
  process-seeded ``hash(tuple(parts))`` (chat.py:109) — deterministic
  across executors; only uniqueness matters.
* the reference's flags year-rollover line (chat.py:104-105) calls
  ``ts.replace(...)`` without assigning the result, so it is a no-op;
  we reproduce the *effective* behavior (no rollover) and note it here.
"""

from __future__ import annotations

import hashlib
import re
import urllib.parse
from datetime import datetime, timedelta
from zoneinfo import ZoneInfo

from farmrpg_etl_spark.parse.minidom import (
    Node,
    find_next,
    find_next_sibling,
    inner_html,
    parse_html,
    select,
    select_one,
)

UTC = ZoneInfo("UTC")
SERVER_TIME = ZoneInfo("America/Chicago")  # game HTML is Chicago wall time

MESSAGE_ID_RE = re.compile(r"^javascript:(?:un)?delChat\((\d+)\)$")
FLAGS_RE = re.compile(r"^(\d+) flags?$")
FORCEPATH_RE = re.compile(r"<strong>\w+path</strong>")
AT_LINK_RE = re.compile(
    r'<a class="close-panel" href="profile.php\?user_name=[^">]+"'
    r' style="color:teal">(@[^">]+)</a>'
)
FRIENDS_LINK_RE = re.compile(r"^members.php\?type=friended&id=(\d+)$")
PROFILE_LINK_RE = re.compile(r"^profile.php\?")
MAIL_TIMESTAMP_RE = re.compile(r"on (.+? [AP]M)(\s|$)")


class ParseError(Exception):
    """Fail-loud parse failure (P9); the stage routes it to quarantine."""


def _require(value, what: str):
    if value is None:
        raise ParseError(f"Unable to find {what}")
    return value


# --------------------------------------------------------------------------
# P1–P3: chat
# --------------------------------------------------------------------------


def parse_chat(room: str, content: bytes, fetch_ts: datetime) -> list[dict]:
    """Chat HTML → message dicts (newest-first, ``pos`` = payload order).

    Timestamps carry only %I:%M:%S %p; the date is reconstructed by the
    running top-to-bottom scan: start at ``fetch_ts`` (Chicago), and
    whenever a parsed time exceeds the running ``last_ts`` the message
    was actually the previous day (payloads are newest-first).
    """
    root = parse_html(content)
    last_ts = fetch_ts.astimezone(SERVER_TIME)
    out: list[dict] = []
    for pos, elm in enumerate(select(root, "div.chat-txt")):
        ts_elm = _require(select_one(elm, "span"), "timestamp")
        t = datetime.strptime(ts_elm.text.strip(), "%I:%M:%S %p")
        ts = last_ts.replace(
            hour=t.hour, minute=t.minute, second=t.second, microsecond=0
        )
        if ts > last_ts:
            ts = ts - timedelta(days=1)  # day rollover: actually yesterday
        last_ts = ts
        chip_elm = _require(select_one(elm, "div.chip"), "chip")
        id_a = _require(find_next_sibling(chip_elm, "a"), "message ID link")
        id_match = MESSAGE_ID_RE.match(id_a.get("href") or "")
        if id_match is None:
            raise ParseError(f"Unable to parse message ID: {id_a.get('href')}")
        emblem_elm = _require(select_one(elm, "div.chip-media img"), "emblem")
        icons_elm = _require(select_one(elm, "i.f7-icons"), "icons")
        content_elm = _require(find_next(icons_elm, "span"), "content span")
        msg_content = inner_html(content_elm)
        msg_content = FORCEPATH_RE.sub("<strong>Forcepath</strong>", msg_content)
        msg_content = AT_LINK_RE.sub(r"\1:", msg_content)
        out.append(
            {
                "room": room,
                "id": id_match.group(1),
                "ts": ts.astimezone(UTC),
                "emblem": (emblem_elm.get("src") or "").rsplit("/", 1)[-1],
                "username": emblem_elm.get("data-username") or "",
                "content": msg_content,
                "flags": 0,
                "deleted": "redstripes" in elm.classes,
                "deleted_ts": None,
                "pos": pos,
            }
        )
    return out


# --------------------------------------------------------------------------
# P4: flags log
# --------------------------------------------------------------------------


def parse_flags(room: str, content: bytes, fetch_ts: datetime) -> list[dict]:
    """Staff flag-log HTML → message dicts carrying ``flags`` counts."""
    root = parse_html(content)
    now = fetch_ts.astimezone(SERVER_TIME)
    out: list[dict] = []
    for pos, elm in enumerate(select(root, "li")):
        title_elm = _require(select_one(elm, ".item-title"), "item title")
        after_elm = _require(select_one(elm, ".item-after"), "item after")
        parts = title_elm.stripped_strings
        ts = datetime.strptime(parts[0], "%b %d, %I:%M:%S %p").replace(
            year=now.year, tzinfo=SERVER_TIME
        )
        # reference year-rollover here is an unassigned replace() → no-op
        # (chat.py:104-105); behavior reproduced faithfully, see module doc
        kids = after_elm.children
        single = after_elm.text if len(kids) == 1 and isinstance(kids[0], str) else ""
        flags_match = FLAGS_RE.match(single)
        synthetic = hashlib.md5("\x1f".join(parts).encode()).hexdigest()
        out.append(
            {
                "room": room,
                "id": synthetic,
                "ts": ts.astimezone(UTC),
                "emblem": "",
                "username": parts[1],
                "content": parts[2][2:],
                "flags": int(flags_match.group(1)) if flags_match else 0,
                "deleted": False,
                "deleted_ts": None,
                "pos": pos,
            }
        )
    return out


# --------------------------------------------------------------------------
# P5: profile
# --------------------------------------------------------------------------


def _parse_role(root: Node) -> str | None:
    card = select_one(root, ".card")
    if card is None:
        return None
    admin_img = select_one(card, "img[src='/img/items/admin.png']")
    if admin_img is None:
        return None
    role_elm = _require(find_next_sibling(admin_img, "strong"), "role strong")
    role = role_elm.text.strip()
    if role == "Farm Hand":
        return "farmhand"
    if role in ("Ranger", "Admin"):
        return "ranger"
    raise ParseError(f"Unknown role string: {role!r}")


def parse_profile(username: str, content: bytes, fetch_ts: datetime) -> list[dict]:
    """Profile HTML → one user-snapshot dict."""
    root = parse_html(content)
    friends_a = None
    for a in select(root, "a"):
        if FRIENDS_LINK_RE.match(a.get("href") or ""):
            friends_a = a
            break
    friends_a = _require(friends_a, "friends link")
    m = FRIENDS_LINK_RE.match(friends_a["href"])
    assert m is not None
    role = _parse_role(root)
    return [
        {
            "user_id": int(m.group(1)),
            "ts": fetch_ts.astimezone(UTC),
            "username": username,
            "is_farmhand": role == "farmhand",
            "is_ranger": role == "ranger",
        }
    ]


# --------------------------------------------------------------------------
# P6: online / staff lists
# --------------------------------------------------------------------------


def parse_online(content: bytes) -> list[dict]:
    """Members HTML → usernames from profile.php query strings."""
    root = parse_html(content)
    out = []
    for a in select(root, "a"):
        href = a.get("href") or ""
        if PROFILE_LINK_RE.match(href):
            qs = urllib.parse.parse_qs(href.split("?", 1)[1])
            out.append({"username": qs["user_name"][0]})
    return out


# --------------------------------------------------------------------------
# P7: mailbox listing
# --------------------------------------------------------------------------


def parse_mailbox(content: bytes) -> list[dict]:
    root = parse_html(content)
    inbox = _require(select_one(root, "#inbox"), "inbox")
    out = []
    for row in select(inbox, "a.item-link"):
        title_elm = _require(select_one(row, ".item-title"), "title element")
        style = title_elm.get("style")
        out.append(
            {
                "id": int(
                    urllib.parse.parse_qs(row["href"].split("?", 1)[-1])["id"][0]
                ),
                "unread": style is not None and "bold" in style,
            }
        )
    return out


# --------------------------------------------------------------------------
# P8: single mail message
# --------------------------------------------------------------------------


def parse_message(id: int, content: bytes, fetch_ts: datetime) -> list[dict]:
    root = parse_html(content)
    title_elm = _require(select_one(root, "div.card-header"), "title element")
    card_inners = select(root, "div.card-content-inner")
    if len(card_inners) != 2:
        raise ParseError(f"Wrong number of card inners: {len(card_inners)}")
    content_elm, meta_elm = card_inners
    profile_a = None
    for a in select(meta_elm, "a"):
        if PROFILE_LINK_RE.match(a.get("href") or ""):
            profile_a = a
            break
    profile_a = _require(profile_a, "profile link")
    # timestamp is the text node right after the profile link
    sibs = profile_a.parent.children if profile_a.parent else []
    idx = next((i for i, s in enumerate(sibs) if s is profile_a), None)
    ts_text = ""
    if idx is not None and idx + 1 < len(sibs) and isinstance(sibs[idx + 1], str):
        ts_text = sibs[idx + 1]
    ts_match = MAIL_TIMESTAMP_RE.search(ts_text)
    if ts_match is None:
        raise ParseError(f"Unable to parse timestamp: {ts_text!r}")
    now = fetch_ts.astimezone(SERVER_TIME)
    ts = datetime.strptime(ts_match.group(1), "%b %d, %I:%M:%S %p").replace(
        tzinfo=SERVER_TIME, year=now.year
    )
    if ts > now:
        ts = ts.replace(year=ts.year - 1)  # year rollover
    return [
        {
            "id": id,
            "username": urllib.parse.parse_qs(
                profile_a["href"].split("?", 1)[-1]
            )["user_name"][0],
            "ts": ts.astimezone(UTC),
            "subject": title_elm.text.strip(),
            "content": inner_html(content_elm),
        }
    ]
