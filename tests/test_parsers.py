"""Golden-fixture parser tests — the reference's pinned expectations
(/root/reference/test/scrapers/test_chat.py, test_user.py,
test_mailbox.py) re-asserted against our stdlib-parser implementations.

``fetch_ts`` replaces the reference's freezegun-frozen clock: the same
frozen instants are passed explicitly (clock discipline, SURVEY §7).
"""

from __future__ import annotations

import os
from datetime import datetime
from zoneinfo import ZoneInfo

import pytest

from farmrpg_etl_spark.parse.parsers import (
    parse_chat,
    parse_flags,
    parse_mailbox,
    parse_message,
    parse_online,
    parse_profile,
)

UTC = ZoneInfo("UTC")
FIXTURES = os.environ.get(
    "REFERENCE_FIXTURES", "/root/reference/test/scrapers/fixtures"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference fixtures not available"
)


def load(name: str) -> bytes:
    with open(os.path.join(FIXTURES, f"{name}.html"), "rb") as f:
        return f.read()


T_CHAT = datetime(2022, 4, 17, 23, 59, 59, tzinfo=UTC)


def test_parse_chat_help():
    chats = parse_chat("help", load("chat_help"), T_CHAT)
    assert len(chats) == 100
    c = chats[0]
    assert c["room"] == "help"
    assert c["id"] == "5364278"
    assert c["ts"] == datetime(2022, 4, 17, 1, 44, 56, tzinfo=UTC)
    assert c["username"] == "Nubishi"
    assert c["emblem"] == "def.png"
    assert c["content"] == "How many corn does it take usually to get the Runestone?"
    assert c["deleted"] is False
    assert [m["pos"] for m in chats] == list(range(100))


def test_parse_chat_complex():
    chats = parse_chat("", load("chat_complex"), T_CHAT)
    assert len(chats) == 2
    assert chats[0]["id"] == "5363775"
    assert chats[0]["ts"] == datetime(2022, 4, 17, 1, 28, 15, tzinfo=UTC)
    assert chats[0]["username"] == "coderanger"
    assert chats[0]["emblem"] == "Octopus96.png"
    assert chats[0]["content"] == '<i style="color:teal">coderanger also testing this</i>'
    assert chats[1]["id"] == "5363757"
    assert chats[1]["ts"] == datetime(2022, 4, 17, 1, 27, 32, tzinfo=UTC)
    assert chats[1]["content"] == (
        'Testing some chat things, <a class="close-panel" href="item.php?id=48">'
        '<img class="itemimgsm" src="/img/items/potato.png"></a>, '
        '<a class="external chatlink" href="https://google.com," rel="noopener noreferrer"'
        ' target="_blank">[LINK]</a> ✨'
    )


def test_parse_chat_deleted():
    chats = parse_chat("", load("chat_deleted"), T_CHAT)
    assert len(chats) == 1
    assert chats[0]["id"] == "5365014"
    assert chats[0]["ts"] == datetime(2022, 4, 17, 2, 8, 22, tzinfo=UTC)
    assert chats[0]["content"] == "A message so I can delete it."
    assert chats[0]["deleted"] is True


def test_parse_chat_long():
    chats = parse_chat("", load("chat_long"), T_CHAT)
    assert len(chats) == 3
    assert chats[0]["id"] == "5365274"
    assert chats[0]["content"].startswith(
        "I also need a long message to test so: Lorem ipsum"
    )
    assert chats[2]["id"] == "5365182"
    assert chats[2]["username"] == "Ffff"
    assert chats[2]["emblem"] == "StrangeEgg96.png"
    assert chats[2]["content"] == (
        '@coderanger: Parse this! <a class="no-animation close-panel" '
        'href="wiki.php?page=((inferno sphere" style="color:crimson; font-weight:bold; '
        'text-decoration:underline">((inferno sphere</a><a class="no-animation close-panel" '
        'href="wiki.php?page=))" style="color:crimson; font-weight:bold; '
        'text-decoration:underline">))</a> <a class="no-animation close-panel" '
        'href="wiki.php?page= [Ffff] " style="color:crimson; font-weight:bold; '
        'text-decoration:underline"> [Ffff] </a> ((puff<a class="no-animation close-panel" '
        'href="wiki.php?page=" style="color:crimson; font-weight:bold; text-decoration:'
        'underline"></a>er)) pea&scy;ock -blam!-'
    )


def test_parse_chat_day_rollover():
    chats = parse_chat("", load("chat_day_rollover"), datetime(2022, 6, 20, 5, 20, 0, tzinfo=UTC))
    expected = [
        (datetime(2022, 6, 20, 4, 53, 17, tzinfo=UTC), "one"),
        (datetime(2022, 6, 20, 4, 52, 18, tzinfo=UTC), "two"),
        (datetime(2022, 6, 20, 4, 0, 30, tzinfo=UTC), "three"),
        (datetime(2022, 6, 20, 3, 57, 41, tzinfo=UTC), "four"),
        (datetime(2022, 6, 19, 5, 11, 1, tzinfo=UTC), "five"),
        (datetime(2022, 6, 19, 5, 5, 47, tzinfo=UTC), "six"),
        (datetime(2022, 6, 19, 3, 30, 23, tzinfo=UTC), "seven"),
        (datetime(2022, 6, 18, 16, 29, 50, tzinfo=UTC), "eight"),
        (datetime(2022, 6, 18, 15, 33, 55, tzinfo=UTC), "nine"),
    ]
    assert [(c["ts"], c["content"]) for c in chats] == expected


def test_parse_flags():
    rows = parse_flags("", load("flags"), T_CHAT)
    assert len(rows) == 59
    assert rows[0]["ts"] == datetime(2022, 4, 17, 1, 25, 32, tzinfo=UTC)
    assert rows[0]["username"] == "k-swag"
    assert rows[0]["content"].startswith("Looking for (((Egg 06))?")
    assert rows[0]["flags"] == 2
    assert rows[1]["ts"] == datetime(2022, 4, 16, 22, 37, 4, tzinfo=UTC)
    assert rows[1]["username"] == "Katiepie"
    assert rows[1]["content"] == "Plz have straw"
    assert rows[1]["flags"] == 1
    # synthetic ids deterministic + unique
    ids = [r["id"] for r in rows]
    assert len(set(ids)) == 59
    assert ids == [r["id"] for r in parse_flags("", load("flags"), T_CHAT)]


def test_parse_profile():
    snaps = parse_profile("RybeR", load("profile_ryber"), T_CHAT)
    assert len(snaps) == 1
    s = snaps[0]
    assert s["user_id"] == 4153
    assert s["ts"] == T_CHAT
    assert s["username"] == "RybeR"
    assert s["is_farmhand"] is False
    assert s["is_ranger"] is True


def test_parse_online():
    names = [r["username"] for r in parse_online(load("online"))]
    assert len(names) == 1626
    assert names[0] == "-sam-"
    assert names[-1] == "Zzck"


def test_parse_staff():
    names = [r["username"] for r in parse_online(load("members_staff"))]
    assert len(names) == 25
    assert names[0] == "Atomiccow"
    assert names[-1] == "wsey54"


def test_parse_mailbox():
    rows = parse_mailbox(load("mailbox"))
    assert [(r["id"], r["unread"]) for r in rows] == [
        (782186, True),
        (781884, True),
        (781847, False),
        (781837, False),
        (781831, False),
    ]


def test_parse_message():
    msgs = parse_message(100, load("message"), datetime(2022, 6, 16, 23, 59, 59, tzinfo=UTC))
    m = msgs[0]
    assert m["id"] == 100
    assert m["username"] == "Lazyforlife"
    assert m["ts"] == datetime(2022, 5, 25, 18, 29, 59, tzinfo=UTC)
    assert m["subject"] == "trade ratio bot"
    assert m["content"].startswith("hey there, ffff pointed me to you")
    assert m["content"].endswith("thanks in advance")


def test_parse_message_year_rollover():
    msgs = parse_message(100, load("message_year"), datetime(2023, 1, 2, 0, 0, 0, tzinfo=UTC))
    assert msgs[0]["ts"] == datetime(2022, 12, 31, 18, 59, 59, tzinfo=UTC)
