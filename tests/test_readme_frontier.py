"""One source of truth for README serving numbers: the tables between
the frontier markers are generated from a committed full bench record
(tools/readme_frontier.py) — a hand-edit or a stale regeneration
fails here.  Spark-free."""

import glob
import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, "/root/repo")

from tools.readme_frontier import BEGIN, END, render  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_render_shapes():
    record = {
        "vector_serving_sf1": {
            "sq8": {"serve_s": 1.5, "recall10": 1000, "rerank": 4},
            "ivf_sq8": {"serve_s": 1.8, "recall10": 993,
                        "nprobe": 16, "rerank": 4},
        },
        "vector_serving_sf10": {
            "bq": {"serve_s": 2.0, "recall10": 1000, "rerank": 256},
        },
        "vecserve_details": {
            "sf1": {"sq8": {"build_s": 2.4},
                    "ivf_sq8": {"build_s": 19.6, "n_clusters": 141,
                                "tuned": True}},
            "sf10": {"bq": {"build_s": None}},
        },
    }
    block = render(record, "BENCH_LOCAL_rX.json")
    assert block.startswith(BEGIN) and block.endswith(END)
    assert "| sq8 | 64 | 2.4 | (—, 4) | 1000 | 1.5 |" in block
    assert ("| ivf_sq8 | 64 × 16/141 | 19.6 | (16 of 141, 4) "
            "| 993 | 1.8 |") in block
    assert "| bq | 8 | cached | (—, 256) | 1000 | 2 |" in block
    assert "BENCH_LOCAL_rX.json" in block


def test_readme_markers_exist():
    with open(f"{REPO}/README.md", encoding="utf-8") as fh:
        readme = fh.read()
    assert BEGIN in readme and END in readme


def test_readme_block_matches_committed_record():
    records = sorted(glob.glob(f"{REPO}/BENCH_LOCAL_r*.json"))
    if not records:
        pytest.skip("no committed full bench record yet")
    record = records[-1]
    # sanity: the committed record parses and carries a vector section
    with open(record, encoding="utf-8") as fh:
        parsed = json.load(fh)
    assert any(k.startswith("vector_serving") for k in parsed)
    r = subprocess.run(
        [sys.executable, "tools/readme_frontier.py",
         "--record", os.path.basename(record), "--check"],
        cwd=REPO, capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, r.stderr
