"""Prefix-dispatch semantics of the topic router, pinned against the
reference event hub (events.py:17-25): a ``chat.help`` emission fires
``chat.help`` listeners AND ``chat`` listeners, most specific first;
unhandled topics report False."""

from __future__ import annotations

from farmrpg_etl_spark.plans.router import TopicRouter


def test_prefix_dispatch_most_specific_first():
    r = TopicRouter()
    calls: list[str] = []
    r.on("chat", lambda *a: calls.append("chat-1"))
    r.on("chat", lambda *a: calls.append("chat-2"))
    r.on("chat.help", lambda *a: calls.append("chat.help"))
    r.on("flags", lambda *a: calls.append("flags"))

    assert r.emit("chat.help") is True
    # exact topic first, then the prefix listeners in registration order
    assert calls == ["chat.help", "chat-1", "chat-2"]

    calls.clear()
    assert r.emit("chat.trade") is True   # only the prefix matches
    assert calls == ["chat-1", "chat-2"]

    calls.clear()
    assert r.emit("chat") is True         # bare prefix fires directly
    assert calls == ["chat-1", "chat-2"]

    assert r.emit("mailbox.inbox") is False  # nothing registered
    assert r.emit("chat2.help") is False     # prefix is dotted, not textual


def test_decorator_registration_and_args():
    r = TopicRouter()
    seen = []

    @r.on("users")
    def handler(df, batch_id):
        seen.append((df, batch_id))

    assert r.emit("users.profile", "BATCH", batch_id=7) is True
    assert seen == [("BATCH", 7)]
