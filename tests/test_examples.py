"""Smoke-run every example pipeline as a user would: a fresh process,
the real script, the sf0.001 fixture — asserting a clean exit and the
output lines that prove the pipeline did its work (not just imported).

Each example owns its SparkSession (get_spark + spark.stop), so they
must run as subprocesses, not against the shared test fixture.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

CASES = [
    ("medallion_pipeline.py", ["single-year scan partition-pruned: True", "grand total:"]),
    ("streaming_sessionization.py", ["PARITY OK"]),
    ("training_corpus_pipeline.py", ["after exact dedup:", "after near-dedup:"]),
    ("embedding_quality_report.py", ["truncation: mean top-k overlap"]),
    ("ann_retrieval_pipeline.py", ["exact     :", "recall@"]),
    ("lakehouse_table_log.py", ["TABLE LOG OK", "time travel to v2"]),
    (
        "distributed_rank_recipes.py",
        ["assignments identical: True", "exact/scale identical: True", "DISTRIBUTED RANK OK"],
    ),
]


@pytest.mark.parametrize("script,markers", CASES, ids=[c[0] for c in CASES])
def test_example_runs_clean(script, markers):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), SF],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    for m in markers:
        assert m in proc.stdout, f"missing {m!r} in:\n{proc.stdout[-3000:]}"
