"""Registry invariants the driver contract depends on."""

import re

import farmrpg_etl_spark.oracles as O
import farmrpg_etl_spark.queries as Q


def test_prefix_is_exactly_50():
    """The driver verifies exactly the FIRST 50 registry entries; a
    registry edit that silently displaces rows past the marker (the
    r5 incident: 52 rows above the cut, two rows never checked) must
    fail loudly here instead."""
    src = open(Q.__file__).read()
    head = src.split("QUERIES:")[1].partition("# --- end of 50-entry prefix")[0]
    names = re.findall(r'^    "([a-z0-9_]+)":', head, re.M)
    assert len(names) == 50, f"prefix has {len(names)} rows, driver checks 50"
    # the prefix names must be real, distinct registry entries
    assert len(set(names)) == 50
    for n in names:
        assert n in Q.QUERIES, n


def test_readme_registry_count_matches():
    """README's "(N entries" claim is derived from the registry, not
    hand-maintained (r13 verdict #7: README said 242 while the
    registry held 246 — counts must match artifacts)."""
    import os

    readme = os.path.join(os.path.dirname(Q.__file__), "..", "README.md")
    m = re.search(r"\((\d+) entries", open(readme).read())
    assert m, "README no longer states the registry entry count"
    assert int(m.group(1)) == len(Q.QUERIES), (
        f"README says {m.group(1)} entries, registry has {len(Q.QUERIES)}"
    )


def test_every_query_has_an_oracle():
    missing = [k for k in Q.QUERIES if k not in O.ORACLES]
    assert missing == [], missing


def test_no_orphan_oracles():
    orphans = [k for k in O.ORACLES if k not in Q.QUERIES]
    assert orphans == [], orphans


def test_tws_rows_lead_any_prefix():
    """TWS rows must run EARLY in the driver prefix (fresh session):
    the r10 red row was a TWS driver-worker crash 50 rows deep. Policy
    net: any prefix row using transformWithStateInPandas sits in the
    first 10 positions."""
    src = open(Q.__file__).read()
    head = src.split("QUERIES:")[1].partition("# --- end of 50-entry prefix")[0]
    names = re.findall(r'^    "([a-z0-9_]+)":', head, re.M)
    tws_markers = ("_tws_", "session_timeout")
    late = [
        n for i, n in enumerate(names)
        if any(m in n for m in tws_markers) and i >= 10
    ]
    assert late == [], f"TWS rows too deep in the prefix: {late}"
