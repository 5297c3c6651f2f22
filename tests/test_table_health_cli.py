"""Table-health CLI (scripts/run_table_health.py) — in-process main()."""

import json
import os
import sys


def test_cli_report_and_exit_codes(spark, tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import run_table_health

    table = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(i, float(i % 7), "x" if i % 9 else None) for i in range(200)],
        "id long, v double, s string",
    ).write.parquet(table)

    spec_ok = {
        "schema": {"id": "bigint", "v": "double", "s": "string"},
        "metrics": ["s"],
        "null_patterns": {"cols": ["s"], "max_frac": 0.5},
    }
    spec_path = str(tmp_path / "spec.json")
    with open(spec_path, "w") as f:
        json.dump(spec_ok, f)
    out = str(tmp_path / "out")

    rc = run_table_health.main(
        ["--table", table, "--spec", spec_path, "--out", out]
    )
    assert rc == 0
    rep = json.load(open(os.path.join(out, "report.json")))
    assert rep["n_failed"] == 0 and rep["n_skipped"] == 0
    assert set(rep["families"]) == {"schema", "metrics", "null_patterns"}
    got = spark.read.parquet(os.path.join(out, "findings"))
    assert got.count() == rep["n_findings"] > 0

    # a failing expectation -> exit 1; a broken contract -> exit 2
    with open(spec_path, "w") as f:
        json.dump({**spec_ok, "null_patterns": {"cols": ["s"], "max_frac": 0.01}}, f)
    assert run_table_health.main(
        ["--table", table, "--spec", spec_path, "--out", str(tmp_path / "o2")]
    ) == 1
    with open(spec_path, "w") as f:  # break "s": both s-checks get gated
        json.dump({**spec_ok, "schema": {"s": "bigint"}}, f)
    assert run_table_health.main(
        ["--table", table, "--spec", spec_path, "--out", str(tmp_path / "o3")]
    ) == 2
