"""PySpark 4 Python streaming data source for direct endpoint polling
(SURVEY §4's optional refinement — the reference polls HTTP inside one
asyncio process, __main__.py:55-69; this is the same poll loop as a
first-class Spark streaming source instead of a landing-zone relay).

Offset model — the part that makes the source exactly-once:

* one OFFSET TICK == one second of schedule time since ``start_epoch``.
* ``latestOffset`` advances the tick watermark (by wall clock in a real
  deployment; by the deterministic ``advance_per_batch`` here, capped
  at ``max_ticks`` so bounded back-tests terminate).
* ``partitions(start, end)`` expands the poll schedule: every spec with
  ``interval_sec`` has its due ticks in ``(start, end]``; each spec
  becomes ONE input partition carrying its due-tick list, so a sweep
  over S specs fans out S-way across executors — the reference's
  asyncio task-per-scraper concurrency, mapped onto Spark tasks.
* ``read(partition)`` re-fetches deterministically from (spec, tick):
  on replay after failure Spark re-issues the same (start, end] range
  and gets byte-identical rows (the stub fetcher is a pure function;
  a real HTTP fetcher would instead land into the idempotent
  MERGE-shaped sinks, which tolerate replayed duplicates — same
  guarantee the reference gets from its unique-index insert).

Rows match the landing-zone schema ``(source, key, fetch_ts, status,
body)`` with ``fetch_ts = start_epoch + tick`` — executors never read
their own clock (clock discipline, SURVEY §7 hard parts).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from farmrpg_etl_spark.sources.landing import (
    PAYLOAD_SCHEMA,
    REFERENCE_POLLS,
    PollSpec,
)

_CHAT_TEMPLATE = (
    '<div class="chat-txt"><span>%02d:%02d:%02d AM</span>'
    '<div class="chip"><div class="chip-media">'
    '<img data-username="%s" src="/img/emblems/e.png"></div></div>'
    '<a href="javascript:delChat(%d)">x</a>'
    '<i class="f7-icons">flag</i><span>%s</span></div>'
)


def synth_poll_body(spec: PollSpec, tick: int) -> tuple[int, bytes]:
    """Deterministic stand-in fetch: a minimal valid chat payload for
    chat polls (parseable by the real P1 parser), empty bodies
    elsewhere. A deployment replaces this with the two shared
    authenticated HTTP clients (reference http.py:6-18)."""
    if spec.source == "chat":
        import hashlib

        # md5, never str hash(): Python string hashing is process-
        # seeded, so replayed partitions on another worker would emit
        # different ids (the same trap as the reference's hash() flag
        # ids, SURVEY §7)
        kh = (
            int(hashlib.md5(spec.key.encode()).hexdigest()[:8], 16) % 997
            if spec.key
            else 0
        )
        mid = tick * 1000 + kh
        html = _CHAT_TEMPLATE % (
            1 + tick % 11,
            tick % 60,
            (tick * 7) % 60,
            f"u{tick % 50}",
            mid,
            f"msg {tick} in {spec.key}",
        )
        return 200, html.encode()
    return 200, b""


@dataclass
class PollPartition(InputPartition):
    source: str
    key: str | None
    interval_sec: int
    ticks: list[int]
    start_epoch: int


class PollStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.start_epoch = int(options.get("start_epoch", 1_700_000_000))
        # no advance_per_batch option -> the whole horizon is "available
        # now" (one batch to max_ticks); set it to pace a processingTime
        # stream in schedule-tick increments
        self.advance = int(
            options.get("advance_per_batch", options.get("max_ticks", 120))
        )
        self.max_ticks = int(options.get("max_ticks", 120))
        only = options.get("sources")
        self.specs = [
            s
            for s in REFERENCE_POLLS
            if only is None or s.source in only.split(",")
        ]
        self._latest = 0

    def initialOffset(self) -> dict:
        return {"tick": 0}

    def latestOffset(self) -> dict:
        # deterministic advancement (wall-clock in deployment):
        # min(cur + advance, max_ticks) — the cap makes
        # processAllAvailable()/availableNow back-tests terminate
        self._latest = min(self._latest + self.advance, self.max_ticks)
        return {"tick": self._latest}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["tick"], end["tick"]
        parts = []
        for s in self.specs:
            due = [
                t
                for t in range(lo + 1, hi + 1)
                if t % s.interval_sec == 0
            ]
            if due:
                parts.append(
                    PollPartition(
                        s.source, s.key, s.interval_sec, due, self.start_epoch
                    )
                )
        # Spark requires >= 1 partition per batch; an empty range
        # yields one no-op partition
        return parts or [
            PollPartition("__none__", None, 1, [], self.start_epoch)
        ]

    def read(self, partition: PollPartition):
        if partition.source == "__none__":
            return
        spec = PollSpec(
            partition.source, partition.key, partition.interval_sec
        )
        for t in partition.ticks:
            status, body = synth_poll_body(spec, t)
            fetch_ts = datetime.fromtimestamp(
                partition.start_epoch, tz=timezone.utc
            ).replace(tzinfo=None) + timedelta(seconds=t)
            yield (spec.source, spec.key, fetch_ts, status, body)

    def commit(self, end: dict) -> None:
        pass


class PollDataSource(DataSource):
    """``spark.readStream.format("farmrpg_poll")`` — register with
    ``spark.dataSource.register(PollDataSource)`` first.

    Options: ``start_epoch`` (schedule origin, default pinned),
    ``advance_per_batch`` (ticks per micro-batch; defaults to
    ``max_ticks`` — the whole horizon in ONE micro-batch; set it
    lower to exercise multi-batch replay),
    ``max_ticks`` (schedule horizon, default 120), ``sources``
    (comma-filter, e.g. ``"chat,flags"``)."""

    @classmethod
    def name(cls) -> str:
        return "farmrpg_poll"

    def schema(self) -> str:
        return PAYLOAD_SCHEMA

    def streamReader(self, schema) -> PollStreamReader:
        return PollStreamReader(self.options)
