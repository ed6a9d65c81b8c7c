"""REGISTRY.json must match a live regeneration — the machine-readable
index (name -> file:line, tags, oracle, headline/invariant membership,
targeted plan gates) cannot drift from the actual registry (VERDICT r3
item 4). Pure-Python: no Spark session needed.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_registry_index_up_to_date():
    proc = subprocess.run(
        [sys.executable, "scripts/gen_registry_index.py", "--check"],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_registry_index_shape():
    with open(os.path.join(REPO, "REGISTRY.json")) as f:
        idx = json.load(f)
    qs = idx["queries"]
    assert idx["n_queries"] == len(qs) >= 262
    assert idx["n_oracles"] == sum(1 for e in qs.values() if e["has_oracle"])
    # the one documented rows-only query
    no_oracle = sorted(n for n, e in qs.items() if not e["has_oracle"])
    assert no_oracle == ["q_approx_sketches"]
    for name, e in qs.items():
        assert os.path.exists(os.path.join(REPO, e["file"])), name
        assert e["line"] > 0 and isinstance(e["tags"], list), name
    # frozen headline set is fully registered
    with open(os.path.join(REPO, "BENCH_MANIFEST.json")) as f:
        headline = json.load(f)["headline"]
    assert all(n in qs for n in headline)
    assert sum(1 for e in qs.values() if e["headline"]) == len(headline)
