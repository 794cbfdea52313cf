"""Validate the committed frozen-golden parquet files.

The goldens under tests/goldens/ are the oracle tables for the queries
whose semantics SQL cannot recompute (seeded-rng LSH pruning,
minhash/simhash word hashing, deterministic fake media features). Each
golden is produced by the INDEPENDENT straight-line reimplementation in
tools/make_goldens.py; here we recompute every golden from the current
/root/testdata inputs and fail loudly if a committed file has drifted —
a stale golden would make the driver's oracle comparison vacuous.

No Ray needed: both sides are plain-Python/pyarrow.
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = os.path.join(REPO, "tools")
if TOOLS not in sys.path:
    sys.path.insert(0, TOOLS)

import make_goldens  # noqa: E402

GOLDEN_DIR = os.path.join(REPO, "tests", "goldens")


@pytest.mark.parametrize("name", sorted(make_goldens.GOLDENS))
def test_golden_matches_recomputation(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
    assert os.path.exists(path), f"golden missing: run tools/make_goldens.py ({path})"
    committed = pq.read_table(path)
    recomputed = make_goldens.GOLDENS[name]()
    assert committed.schema.names == recomputed.schema.names
    assert committed.num_rows == recomputed.num_rows, (
        f"{name}: committed {committed.num_rows} rows vs "
        f"recomputed {recomputed.num_rows} — regenerate with tools/make_goldens.py"
    )
    assert committed.equals(recomputed), (
        f"{name}: committed golden differs from recomputation over the "
        "current testdata — regenerate with tools/make_goldens.py"
    )


def test_goldens_nonempty():
    # a 0-row golden proves nothing; every frozen oracle must have rows
    for name in make_goldens.GOLDENS:
        tbl = pq.read_table(os.path.join(GOLDEN_DIR, f"{name}.parquet"))
        assert tbl.num_rows > 0, f"{name} golden is empty"
