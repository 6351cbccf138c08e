"""spark-submit job entries run in-process end-to-end: synth input,
SnapshotWriter output, manifest-read row counts, idempotent re-commit,
and cross-strategy equality for the K-feature assembly job."""

from __future__ import annotations

import json

import pytest


def test_build_features_job_runs(spark, tmp_path, capsys):
    from jobs.build_features import main

    rc = main([
        "--synth", "30", "--output", str(tmp_path / "bf"),
        "--strategy", "fused", "--snapshot-id", "s1",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] > 0 and out["turns_per_sec"] > 0


@pytest.mark.parametrize("strategy", ["single_pass", "intervals"])
def test_assemble_features_job_strategies_agree(spark, tmp_path, capsys, strategy):
    from jobs.assemble_features import main

    rc = main([
        "--synth", "30", "--strategy", strategy,
        "--output", str(tmp_path / f"af_{strategy}"), "--snapshot-id", "s1",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["strategy"] == strategy
    assert out["sources"] == ["f0", "f1", "f2", "f3"]
    assert out["rows"] > 0
    # strategies must agree on the row count for the same synth seed
    if not hasattr(test_assemble_features_job_strategies_agree, "_rows"):
        test_assemble_features_job_strategies_agree._rows = out["rows"]
    else:
        assert out["rows"] == test_assemble_features_job_strategies_agree._rows


def test_assemble_features_job_idempotent_recommit(spark, tmp_path, capsys):
    from jobs.assemble_features import main

    root = str(tmp_path / "af_idem")
    for _ in range(2):  # second commit with the same snapshot id is a no-op
        rc = main([
            "--synth", "25", "--strategy", "intervals",
            "--output", root, "--snapshot-id", "fixed-snap",
        ])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["rows"] > 0
    import duckdb

    n = duckdb.sql(
        f"SELECT count(DISTINCT snapshot_id) FROM "
        f"read_parquet('{root}/_manifest/part-*.parquet')"
    ).fetchone()[0]
    assert n == 1


def test_assemble_features_routed_strategy(spark, tmp_path, capsys):
    from jobs.assemble_features import main

    rc = main([
        "--synth", "30", "--strategy", "routed", "--hot-threshold", "5",
        "--output", str(tmp_path / "af_routed"), "--snapshot-id", "s1",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["strategy"] == "routed" and out["rows"] > 0
