"""Tree histogram equivalence + deterministic violation sampling."""

from pyspark.sql import functions as F


def test_histogram_tree_equals_plain(spark):
    from open_data_linter_spark.audio.synth import synthesize_clips
    from open_data_linter_spark.rules.drift import histogram, histogram_tree

    clips = synthesize_clips(spark, 2000, 16)
    edges = [0, 250, 400, 630, 1000, 1600, 2500, 4000, 6300, 10000, 16000]
    for col, e in (("sr_hz", None), ("dur_ms", edges)):
        plain = {r.bin: r["count"] for r in histogram(clips, col, e).collect()}
        tree = {
            r.bin: r["count"]
            for r in histogram_tree(clips, col, e, fanout=8).collect()
        }
        assert tree == plain, col


def test_histogram_tree_has_two_exchanges(spark):
    """The explicit intermediate level really adds a second shuffle stage
    (treeAggregate depth=2 shape), unlike plain histogram's single one."""
    import io
    import contextlib

    from open_data_linter_spark.audio.synth import synthesize_clips
    from open_data_linter_spark.rules.drift import histogram, histogram_tree

    clips = synthesize_clips(spark, 200, 8)

    def n_exchanges(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="simple")  # formatted splits name from args
        return buf.getvalue().count("Exchange hashpartitioning")

    assert n_exchanges(histogram(clips, "sr_hz")) == 1
    assert n_exchanges(histogram_tree(clips, "sr_hz", fanout=8)) == 2


def test_sample_violations_deterministic_and_counted(spark):
    from open_data_linter_spark.plans.run import sample_violations

    rows = [
        ("1-5", f"clip{i:05d}", "transcript", "msg", 0) for i in range(2000)
    ] + [("uniq", f"clip{i:05d}", "clip_id", "msg", 1) for i in range(50)]
    v = spark.createDataFrame(
        rows, "rule_id string, clip_id string, column string, message string, partition_id int"
    )
    s1 = sample_violations(v, 8)
    s2 = sample_violations(v, 8)
    a = sorted((r.rule_id, r.clip_id) for r in s1.collect())
    b = sorted((r.rule_id, r.clip_id) for r in s2.collect())
    # deterministic: replays/resumes re-select the SAME evidence rows
    assert a == b
    # ~1/8 of the big rule survives (hash-uniform, generous bounds)
    n_15 = sum(1 for rid, _ in a if rid == "1-5")
    assert 2000 / 8 * 0.5 < n_15 < 2000 / 8 * 1.6
    # mod<=1 is the identity
    assert sample_violations(v, 1) is v


def test_stream_violation_sampling(spark, tmp_path):
    """Streaming sink honors violation_sample_mod; counts in audit stay exact."""
    import glob
    import shutil

    import numpy as np

    from open_data_linter_spark.audio.synth import gen_clips_pdf
    from open_data_linter_spark.rules.audio_rules import build_audio_ruleset
    from open_data_linter_spark.streaming.validate import (
        read_clip_stream,
        validate_stream,
        wait_for,
    )

    # every clip violates 1-5 => 64 evidence rows unsampled
    dirty = gen_clips_pdf(np.arange(0, 64), corrupt={i: "1-5" for i in range(64)})
    inbox = tmp_path / "in"
    inbox.mkdir()
    spark.createDataFrame(dirty).coalesce(1).write.parquet(str(inbox / "f1"))
    flat = tmp_path / "flat"
    flat.mkdir()
    for i, f in enumerate(glob.glob(str(inbox / "*" / "*.parquet"))):
        shutil.copy(f, str(flat / f"b{i}.parquet"))

    stream = read_clip_stream(spark, str(flat))
    q = validate_stream(
        stream,
        build_audio_ruleset(with_payload=False, with_shuffle=False),
        audit_path=str(tmp_path / "audit"),
        checkpoint_path=str(tmp_path / "ckpt"),
        violations_path=str(tmp_path / "viol"),
        available_now=True,
        violation_sample_mod=8,
    )
    wait_for(q)
    viols = spark.read.parquet(str(tmp_path / "viol"))
    n = viols.where(F.col("rule_id") == "1-5").count()
    assert 0 < n < 64  # sampled, not empty and not full
    audit = spark.read.parquet(str(tmp_path / "audit"))
    total = (
        audit.where(F.col("rule_id") == "1-5")
        .agg(F.sum("violation_count"))
        .collect()[0][0]
    )
    assert total == 64  # counts stay exact regardless of evidence sampling


def test_lint_files_fleet(spark, tmp_path):
    from open_data_linter_spark.plans.fleet import lint_files

    good = tmp_path / "good.csv"
    good.write_bytes("id,名前,年度\n1,名a,2020\n2,名b,2021\n".encode("utf-8"))
    ws = tmp_path / "ws.csv"
    ws.write_bytes("id,名前,年度\n1, 名a ,2020\n2,名b,2021\n".encode("utf-8"))
    broken = tmp_path / "broken.txt"
    broken.write_bytes(b"not a csv")

    df = lint_files(spark, [str(good), str(ws), str(broken)], parallelism=3)
    rows = {(r.path, r.check): r for r in df.collect()}
    assert len(rows) == 3 * 12
    assert rows[(str(good), "1-5")].is_valid is True
    v = rows[(str(ws), "1-5")]
    assert v.is_valid is False and v.n_violation_cells == 1
    # wrong extension blocks through the 1-1 channel
    assert rows[(str(broken), "1-1")].is_valid is False
    assert rows[(str(broken), "1-2")].is_valid is None


def test_lint_files_unreadable_path(spark, tmp_path):
    """An unreadable PATH (missing file / directory) must produce blocked
    rows for that file, not abort the whole batch (VERDICT r2 defect #1)."""
    from open_data_linter_spark.plans.fleet import lint_files

    good = tmp_path / "good.csv"
    good.write_bytes("id,名前,年度\n1,名a,2020\n2,名b,2021\n".encode("utf-8"))
    missing = tmp_path / "nope.csv"  # never created
    adir = tmp_path / "subdir.csv"
    adir.mkdir()  # open(rb) -> IsADirectoryError (OSError)

    df = lint_files(spark, [str(good), str(missing), str(adir)], parallelism=3)
    rows = {(r.path, r.check): r for r in df.collect()}
    assert len(rows) == 3 * 12  # batch completed for all three
    assert rows[(str(good), "1-5")].is_valid is True
    # OS-level failures use the SAME blocked shape as undecodable bytes
    # (ADVICE r3): the 1-1 readable gate FAILS, the other checks are None —
    # so `is_valid == False on 1-1` catches every kind of unreadable file
    for bad in (missing, adir):
        gate = rows[(str(bad), "1-1")]
        assert gate.is_valid is False and gate.n_violation_cells == 0
        assert gate.message  # the OS error string
        for check in ("1-2", "2-x"):
            r = rows[(str(bad), check)]
            assert r.is_valid is None and r.n_violation_cells == 0
            assert r.message


def test_fleet_blocked_rows_shapes():
    """Blocked-row channel shapes (r4 review): with 1-1 in the check list
    the OS error rides on the failing gate row and the rest carry the
    shared BLOCKED message; without 1-1 there is no gate row, so the error
    must ride on every blocked row instead of vanishing."""
    from open_data_linter_spark.plans.fleet import _blocked_rows
    from open_data_linter_spark.rules.tabular import BLOCKED

    rows = _blocked_rows("/x.csv", ["1_1", "1_2", "2_x"], "ENOENT boom")
    assert rows[0] == ("/x.csv", "1-1", False, 0, "ENOENT boom")
    assert rows[1] == ("/x.csv", "1-2", None, 0, BLOCKED)
    assert rows[2] == ("/x.csv", "2-x", None, 0, BLOCKED)

    rows = _blocked_rows("/x.csv", ["1_5", "2_x"], "EACCES boom")
    assert all(r[2] is None and r[4] == "EACCES boom" for r in rows)
