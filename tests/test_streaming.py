"""Structured Streaming validation: micro-batches through the full ruleset."""

import glob

import pytest
from pyspark.sql import functions as F


def test_stream_validation(spark, tmp_path):
    from open_data_linter_spark.audio.synth import gen_clips_pdf, clip_id_for
    from open_data_linter_spark.rules.audio_rules import build_audio_ruleset
    from open_data_linter_spark.streaming.validate import (
        read_clip_stream,
        validate_stream,
        wait_for,
    )
    import numpy as np

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    # two "arriving" files: one clean, one with a seeded whitespace violation
    clean = gen_clips_pdf(np.arange(0, 30))
    dirty = gen_clips_pdf(np.arange(30, 60), corrupt={32: "1-5"})
    spark.createDataFrame(clean).coalesce(1).write.parquet(str(inbox / "f1"))
    spark.createDataFrame(dirty).coalesce(1).write.parquet(str(inbox / "f2"))
    # file source reads a flat dir of parquet part-files
    flat = tmp_path / "flat"
    flat.mkdir()
    for i, f in enumerate(glob.glob(str(inbox / "*" / "*.parquet"))):
        import shutil

        shutil.copy(f, str(flat / f"batch{i}.parquet"))

    stream = read_clip_stream(spark, str(flat), max_files_per_trigger=1)
    rules = build_audio_ruleset(with_payload=False, with_shuffle=False)
    q = validate_stream(
        stream,
        rules,
        audit_path=str(tmp_path / "audit"),
        checkpoint_path=str(tmp_path / "ckpt"),
        violations_path=str(tmp_path / "viol"),
        available_now=True,
    )
    wait_for(q)

    audit = spark.read.parquet(str(tmp_path / "audit"))
    assert audit.select("batch_id").distinct().count() == 2  # one per file
    assert audit.where(F.col("rule_id") == "1-5").count() > 0

    viols = spark.read.parquet(str(tmp_path / "viol"))
    rows = viols.where(F.col("rule_id") == "1-5").collect()
    assert {r.clip_id for r in rows} == {clip_id_for(32)}

    # resume semantics: restarting over the same checkpoint reprocesses nothing
    stream2 = read_clip_stream(spark, str(flat), max_files_per_trigger=1)
    q2 = validate_stream(
        stream2, rules,
        audit_path=str(tmp_path / "audit"),
        checkpoint_path=str(tmp_path / "ckpt"),
        available_now=True,
    )
    wait_for(q2)
    audit2 = spark.read.parquet(str(tmp_path / "audit"))
    assert audit2.count() == audit.count()

    # at-least-once replay semantics: a REPROCESSED batch (fresh checkpoint,
    # same inputs => same batch ids) overwrites its own batch_id partition
    # instead of appending duplicates — effectively exactly-once output
    orig = {
        r.batch_id: r.cnt
        for r in audit2.groupBy("batch_id").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    orig_total = audit2.count()
    stream3 = read_clip_stream(spark, str(flat), max_files_per_trigger=1)
    q3 = validate_stream(
        stream3, rules,
        audit_path=str(tmp_path / "audit"),
        checkpoint_path=str(tmp_path / "ckpt_replay"),
        available_now=True,
    )
    wait_for(q3)
    audit3 = spark.read.parquet(str(tmp_path / "audit"))
    assert audit3.count() == orig_total
    per_batch = {
        r.batch_id: r.cnt
        for r in audit3.groupBy("batch_id").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert per_batch == orig


def test_constraint_stream(spark, tmp_path):
    """Per-micro-batch declarative constraint reports, partitioned by
    batch_id; the seeded duplicate trips uniqueness only in its batch."""
    import numpy as np
    import shutil

    from open_data_linter_spark.audio.synth import gen_clips_pdf
    from open_data_linter_spark.streaming.validate import (
        constraint_stream,
        read_clip_stream,
        wait_for,
    )

    flat = tmp_path / "flat"
    flat.mkdir()
    clean = gen_clips_pdf(np.arange(0, 30))
    dup = gen_clips_pdf(np.arange(30, 60), corrupt={32: "uniq", 40: "uniq"})
    for i, pdf in enumerate([clean, dup]):
        d = tmp_path / f"w{i}"
        spark.createDataFrame(pdf).coalesce(1).write.parquet(str(d))
        import glob as g

        shutil.copy(g.glob(str(d / "*.parquet"))[0],
                    str(flat / f"batch{i}.parquet"))

    suite = [
        {"kind": "unique", "column": "clip_id", "id": "uq"},
        {"kind": "in_set", "column": "codec",
         "values": ["pcm_s16le", "ulaw", "alaw"], "id": "codec"},
    ]
    q = constraint_stream(
        read_clip_stream(spark, str(flat), max_files_per_trigger=1),
        suite,
        report_path=str(tmp_path / "report"),
        checkpoint_path=str(tmp_path / "ckpt"),
        available_now=True,
    )
    wait_for(q)
    rep = spark.read.parquet(str(tmp_path / "report"))
    got = {
        (r["batch_id"], r["constraint_id"]): (r["n_violations"], r["passed"])
        for r in rep.collect()
    }
    assert len(got) == 4  # 2 batches x 2 constraints
    by_uq = {b: got[(b, "uq")] for b, c in got if c == "uq"}
    # exactly one batch carries the two seeded duplicates
    assert sorted(v for v, _ in by_uq.values()) == [0, 2]
    assert all(got[(b, "codec")] == (0, True) for b, c in got if c == "codec")
