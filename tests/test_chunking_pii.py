"""Chunking window arithmetic and PII redaction semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from farmrpg_etl_spark.functions.text import pii_count, redact_pii
from farmrpg_etl_spark.operators.chunking import chunk_by_tokens


def _chunks(spark, text, size, stride):
    df = spark.createDataFrame([(1, text)], "id int, text string")
    out = chunk_by_tokens(df, "text", "id", size=size, stride=stride)
    return [(r.chunk_id, r.n_chunk_tokens, r.chunk) for r in
            out.orderBy("chunk_id").collect()]


def test_short_doc_single_chunk(spark):
    assert _chunks(spark, "a b c", 32, 24) == [(0, 3, "a b c")]


def test_exact_size_single_chunk(spark):
    toks = " ".join(f"t{i}" for i in range(32))
    got = _chunks(spark, toks, 32, 24)
    assert len(got) == 1 and got[0][1] == 32


def test_overlap_and_tail(spark):
    toks = [f"t{i}" for i in range(40)]
    got = _chunks(spark, " ".join(toks), 32, 24)
    # starts at 0 and 24; second window is the 16-token tail
    assert [(g[0], g[1]) for g in got] == [(0, 32), (1, 16)]
    assert got[0][2].split(" ") == toks[0:32]
    assert got[1][2].split(" ") == toks[24:40]
    # consecutive windows share size - stride = 8 tokens
    assert got[0][2].split(" ")[24:] == got[1][2].split(" ")[:8]


def test_chunk_ids_dense(spark):
    toks = " ".join(f"t{i}" for i in range(100))
    got = _chunks(spark, toks, 32, 24)
    assert [g[0] for g in got] == [0, 1, 2, 3]


def test_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "x")], "id int, text string")
    with pytest.raises(ValueError):
        chunk_by_tokens(df, "text", "id", size=0, stride=8)
    with pytest.raises(ValueError):
        chunk_by_tokens(df, "text", "id", size=8, stride=0)


@pytest.mark.parametrize(
    "raw,expect,n",
    [
        ("mail bob.smith+x@foo-bar.example.org now",
         "mail <EMAIL> now", 1),
        ("call 555-123-4567 or +1 555 000 1111",
         "call <PHONE> or +1 <PHONE>", 2),
        ("id deadbeefcafebabe1234 ok", "id <ID> ok", 1),
        ("short beef1234 stays", "short beef1234 stays", 0),
        ("a@b.co 555-123-4567 deadbeefdeadbeef",
         "<EMAIL> <PHONE> <ID>", 3),
        ("nothing here", "nothing here", 0),
    ],
)
def test_redact_pii_pinned(spark, raw, expect, n):
    row = (
        spark.createDataFrame([(raw,)], "t string")
        .select(redact_pii(F.col("t")).alias("r"), pii_count(F.col("t")).alias("n"))
        .first()
    )
    assert row.r == expect
    assert row.n == n


def test_null_and_empty_text_yield_one_empty_chunk(spark):
    df = spark.createDataFrame([(1, None), (2, "")], "id int, text string")
    out = chunk_by_tokens(df, "text", "id", size=8, stride=4)
    rows = sorted((r.id, r.chunk_id, r.n_chunk_tokens, r.chunk) for r in out.collect())
    assert rows == [(1, 0, 0, ""), (2, 0, 0, "")]


def test_global_prefix_sum_matches_single_window(spark):
    from pyspark.sql import Window

    from farmrpg_etl_spark.operators.chunking import global_prefix_sum

    # nonconsecutive, unordered ids; values prime-ish to catch offset bugs
    rows = [(i * 37 % 101, (i * 7) % 13 + 1) for i in range(101)]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {
        r.k: r.cum
        for r in global_prefix_sum(df, "k", "v", "cum", num_buckets=7).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {r.k: r.cum for r in df.withColumn("cum", F.sum("v").over(w)).collect()}
    assert got == want


def test_global_prefix_sum_single_key(spark):
    from farmrpg_etl_spark.operators.chunking import global_prefix_sum

    df = spark.createDataFrame([(5, 42)], ["k", "v"])
    assert global_prefix_sum(df, "k", "v").collect()[0].cum == 42


def test_pack_documents_spans_and_offsets(spark):
    from farmrpg_etl_spark.operators.chunking import pack_documents

    df = spark.createDataFrame(
        [
            (1, "a b c d"),          # tokens 0..3   -> pack 0
            (2, "e f g"),            # tokens 4..6   -> packs 0-1 (spans the cut at 5)
            (3, None),               # empty: start 7, occupies nothing
            (4, "h i j k l m"),      # tokens 7..12  -> packs 1-2
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.n_tokens, r.start_offset, r.first_pack, r.last_pack)
        for r in pack_documents(df, "text", "doc_id", seq_len=5).collect()
    }
    assert got == {
        1: (4, 0, 0, 0),
        2: (3, 4, 0, 1),
        3: (0, 7, 1, 1),
        4: (6, 7, 1, 2),
    }


# -------------------------------------- content-defined chunking
def test_cdc_chunks_cover_text_exactly(spark):
    from pyspark.sql import functions as F

    from farmrpg_etl_spark.operators.chunking import content_defined_chunks

    import hashlib
    text = " ".join(hashlib.md5(str(i).encode()).hexdigest()[:6] for i in range(80))
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    rows = sorted(
        content_defined_chunks(df, "text", "doc_id").collect(),
        key=lambda r: r["chunk_idx"],
    )
    # chunks tile the text: contiguous, gap-free, full coverage
    pos = 0
    for r in rows:
        assert r["start"] == pos and r["length"] > 0
        pos += r["length"]
    assert pos == len(text)
    # digests are the md5 of the exact substrings
    for r in rows[:3]:
        sub = text[r["start"] : r["start"] + r["length"]]
        assert r["digest"] == hashlib.md5(sub.encode()).hexdigest()


def test_cdc_chunks_survive_head_insertion(spark):
    import hashlib

    from farmrpg_etl_spark.operators.chunking import content_defined_chunks

    base = " ".join(hashlib.md5(str(i).encode()).hexdigest()[:6] for i in range(120))
    a = {
        r["digest"]
        for r in content_defined_chunks(
            spark.createDataFrame([(1, base)], "doc_id int, text string"),
            "text", "doc_id",
        ).collect()
    }
    b = {
        r["digest"]
        for r in content_defined_chunks(
            spark.createDataFrame(
                [(1, "INSERTED BOILERPLATE HEADER " + base)],
                "doc_id int, text string",
            ),
            "text", "doc_id",
        ).collect()
    }
    # boundaries are content-local: all but the edited-head chunks realign
    # (fixed-size chunking would shift EVERY downstream chunk digest)
    assert len(a & b) >= len(a) - 2


def test_pack_schedule_partitions_the_token_stream(spark):
    """pack_schedule lays every (doc, copy) at a distinct contiguous
    offset: offsets+lengths tile [0, total) with no gaps or overlaps,
    copy counts match the schedule, pack spans are consistent with
    the offsets, and the layout is deterministic."""
    from farmrpg_etl_spark.operators.chunking import pack_schedule

    assembled = spark.createDataFrame(
        [
            (1, "a", 30, 2),
            (2, "a", 50, 1),
            (3, "b", 7, 3),
            (4, "b", 0, 2),   # zero-token doc: occupies nothing
            (5, "c", 11, 0),  # zero copies: absent from the layout
        ],
        "doc_id long, source string, n_tok long, n_copies long",
    )
    out = pack_schedule(assembled, "doc_id", "source", seq_len=16).collect()
    out2 = pack_schedule(assembled, "doc_id", "source", seq_len=16).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    from collections import Counter

    copies = Counter(r["doc_id"] for r in out)
    assert copies == {1: 2, 2: 1, 3: 3, 4: 2}
    assert 5 not in copies
    # offsets tile the stream: sorted (start, start+n_tok) are contiguous
    spans = sorted((r["start_offset"], r["start_offset"] + r["n_tok"])
                   for r in out)
    assert spans[0][0] == 0
    for (s0, e0), (s1, e1) in zip(spans, spans[1:]):
        assert s1 == max(e0, s0), (s0, e0, s1)
    total = sum(r["n_tok"] for r in out)
    assert max(e for _, e in spans) == total == 30 * 2 + 50 + 7 * 3
    for r in out:
        assert r["first_pack"] == r["start_offset"] // 16
        last_tok = max(r["start_offset"] + r["n_tok"] - 1, r["start_offset"])
        assert r["last_pack"] == last_tok // 16


def test_pack_schedule_no_leakage_composition(spark):
    """The v9 composition contract: a doc assigned to valid/test by
    leakage_safe_splits NEVER appears in the packed training layout,
    and near-dup family members share the train/non-train decision."""
    from farmrpg_etl_spark.operators.chunking import pack_schedule
    from farmrpg_etl_spark.operators.dedup import leakage_safe_splits
    from farmrpg_etl_spark.operators.quality import unimax_assemble

    docs = spark.createDataFrame(
        [(i, "s%d" % (i % 3), "tok " * (i % 7 + 1)) for i in range(60)],
        "doc_id long, source string, text string",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (10, 10), (11, 10), (12, 10)],
        "id long, cluster_id long",
    )
    sp = leakage_safe_splits(docs, "doc_id", clusters)
    rows = {r["doc_id"]: r["split"] for r in sp.collect()}
    # family members share their split
    assert rows[1] == rows[2]
    assert rows[10] == rows[11] == rows[12]
    train_ids = {i for i, s in rows.items() if s == "train"}
    held_out = set(rows) - train_ids
    assert held_out, "need a non-empty valid/test set for the pin"
    train = docs.join(
        sp.filter("split = 'train'").select("doc_id"), "doc_id"
    )
    assembled = unimax_assemble(
        train, "text", "doc_id", "source", budget_ratio=2, max_epochs=2
    )
    packed = pack_schedule(assembled, "doc_id", "source", seq_len=8)
    packed_ids = {r["doc_id"] for r in packed.select("doc_id").collect()}
    assert packed_ids <= train_ids
    assert packed_ids.isdisjoint(held_out)
