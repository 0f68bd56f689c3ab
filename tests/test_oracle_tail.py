"""Local oracle gate for queries OUTSIDE the driver's ~50-row window.

The external correctness driver hashes only the first ~50 registered
queries per round (registration order, queries/__init__.py); the rest
would otherwise ride on stale evidence. This test enforces the same
rows+schema+hash comparison — through the driver-style typed pandas
fetch (``--driver-fetch``, see CLAUDE.md invariants) — for every
registered query past the window, at sf0.001 so the whole gate stays
test-suite-cheap. ADVICE r4: "gate the tail queries in CI with
tools/check_oracle.py --driver-fetch so the unchecked window is
enforced by a test rather than a comment."
"""

from __future__ import annotations

import importlib.util
import os
import sys

DRIVER_WINDOW = 50
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _load_check_oracle():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools", "check_oracle.py",
    )
    spec = importlib.util.spec_from_file_location("check_oracle", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_driver_window_tail_hash_matches(spark):
    check_oracle = _load_check_oracle()
    import __spark_entry__ as entry_mod

    names = list(entry_mod.queries())
    tail = set(names[DRIVER_WINDOW:])
    assert tail, "registry no longer exceeds the driver window"
    failures = check_oracle.check_sf(
        spark, entry_mod, SF_DIR, only=tail, driver_fetch=True
    )
    assert failures == []
