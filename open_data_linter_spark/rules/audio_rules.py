"""The built-in ruleset for the audio clip + transcript table.

Every reference lint rule (csv_linter.py check_1_1..check_2_x; SURVEY.md
§2.5) instantiated over ``(clip_id, bytes, sr_hz, dur_ms, codec,
transcript)``, plus the north-rule additions (uniqueness, RI, drift,
payload fidelity). Row rules are pure Catalyst predicates — they fuse into
one scan and NEVER reference the ``bytes`` column (except 1-1's cheap
magic-prefix check), so Parquet column pruning keeps payload I/O out of the
cheap path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from open_data_linter_spark.audio.codecs import CODEC_MAGIC
from open_data_linter_spark.core.model import Rule, RuleOutcome, RuleScope
from open_data_linter_spark.functions import predicates as P
from open_data_linter_spark.functions import regexes as rx
from open_data_linter_spark.rules.drift import make_drift_rule
from open_data_linter_spark.rules.payload import (
    make_decodable_rule,
    make_metadata_consistency_rule,
    make_reference_fidelity_rule,
)
from open_data_linter_spark.rules.referential import make_ri_rule
from open_data_linter_spark.rules.uniqueness import make_uniqueness_rule

REQUIRED_SCHEMA = {
    "clip_id": "string",
    "bytes": "binary",
    "sr_hz": "int",
    "dur_ms": "int",
    "codec": "string",
    "transcript": "string",
}
ALLOWED_SR = (8000, 16000, 22050, 44100)
MAX_DUR_MS = 12 * 3600 * 1000
SENTINEL_TRANSCRIPTS = ("[inaudible]", "[music]")

# --------------------------------------------------------------- row rules


def _multi_value_transcript(df: DataFrame) -> Column:
    """1-2 analog (csv_linter.py:95-131): one datum per cell.

    The reference splits on [、,] and flags parts matching the
    number(bracket) pattern, else flags whole-cell bracket/multi-number
    matches. Same logic, native: split + exists() higher-order function.
    """
    t = F.col("transcript")
    parts = F.split(t, r"[、,]")
    comma_branch = (F.size(parts) > 1) & F.exists(
        parts, lambda p: p.rlike(rx.NUM_WITH_BRACKETS)
    )
    whole_branch = t.rlike(rx.NUM_WITH_BRACKETS) | t.rlike(rx.NUM_WITH_NUM)
    return t.isNotNull() & (comma_branch | whole_branch)


def _sql_readable_violation(df: DataFrame) -> Column:
    """1-1 analog, SQL half: codec must be in the allowed set.

    Deliberately does NOT look at ``bytes``: the fused row scan stays
    payload-free so Parquet column pruning skips the heavy column; all
    byte-level readability checks (null/short/magic/decode) live in the
    payload pass, which reads ``bytes`` exactly once.
    """
    return F.col("codec").isNull() | ~F.col("codec").isin(*CODEC_MAGIC)


def build_row_rules() -> list[Rule]:
    t = F.col("transcript")
    rules = [
        Rule(
            "1-1-sql",
            "readable payload gate, SQL half: codec allowed + magic agreement "
            "(csv_linter.py:50-86 analog)",
            RuleScope.ROW,
            message="codec not in the allowed set",
            predicates=[("codec", _sql_readable_violation)],
        ),
        Rule(
            "1-2",
            "one datum per cell: transcript must not pack multiple values "
            "(csv_linter.py:95-131)",
            RuleScope.ROW,
            message="複数のデータが一つのセルに入っています (multiple data in one cell)",
            predicates=[("transcript", _multi_value_transcript)],
        ),
        Rule(
            "1-3",
            "numeric domain: sr_hz/dur_ms must be valid numbers in range "
            "(csv_linter.py:133-185 cell half)",
            RuleScope.ROW,
            message="数値データが適切ではありません (numeric value out of domain)",
            predicates=[
                ("sr_hz", lambda df: F.col("sr_hz").isNotNull() & ~F.col("sr_hz").isin(*ALLOWED_SR)),
                ("dur_ms", lambda df: F.col("dur_ms").isNotNull()
                 & ~F.col("dur_ms").between(1, MAX_DUR_MS)),
            ],
        ),
        Rule(
            "1-5",
            "no whitespace formatting (csv_linter.py:193-213): transcript "
            "leading/trailing/double whitespace or line breaks; clip_id any whitespace",
            RuleScope.ROW,
            message="スペースや改行が含まれています (whitespace/line-break formatting)",
            predicates=[
                ("transcript", lambda df: F.col("transcript").isNotNull()
                 & F.col("transcript").rlike(r"^\s|\s$|\s{2,}|[\n\t\r]")),
                ("clip_id", lambda df: P.has_whitespace(F.col("clip_id"))),
            ],
        ),
        Rule(
            "1-7",
            "no formulas (excel_linter.py:70-83): transcript must not start with '='",
            RuleScope.ROW,
            message="数式が含まれています (formula-like content)",
            predicates=[("transcript", lambda df: F.col("transcript").startswith("="))],
        ),
        Rule(
            "1-10",
            "encoding sanity (csv_linter.py:234-265 analog): no control chars "
            "or U+FFFD replacement chars in transcript",
            RuleScope.ROW,
            message="機種依存文字等が含まれています (platform-dependent/broken chars)",
            predicates=[
                ("transcript", lambda df: F.col("transcript").isNotNull()
                 & F.col("transcript").rlike("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f�]")),
            ],
        ),
        Rule(
            "1-13",
            "masked-value domain (csv_linter.py:450-471): blank transcript only "
            "via whitelisted sentinels",
            RuleScope.ROW,
            message="空欄はマスク値のみ許可されています (blank not in sentinel whitelist)",
            predicates=[
                ("transcript", lambda df: F.col("transcript").isNotNull()
                 & (F.trim(F.col("transcript")) == "")
                 & ~F.col("transcript").isin(*SENTINEL_TRANSCRIPTS)),
            ],
        ),
        Rule(
            "2-x-rows",
            "no empty rows (csv_linter.py:473-487): all payload fields null",
            RuleScope.ROW,
            message="空行が含まれています (fully-null row)",
            # bytes intentionally excluded: keeps the fused scan payload-free
            predicates=[
                (None, lambda df: F.col("sr_hz").isNull()
                 & F.col("dur_ms").isNull() & F.col("codec").isNull()
                 & F.col("transcript").isNull()),
            ],
        ),
        Rule(
            "1-6-nulls",
            "no omitted values in required columns (csv_linter.py:215-226 analog)",
            RuleScope.ROW,
            message="必須項目が空欄です (required field is null)",
            # bytes excluded here too: the payload pass reports null bytes
            predicates=[
                (c, (lambda col: lambda df: F.col(col).isNull())(c))
                for c in ("clip_id", "sr_hz", "dur_ms", "codec", "transcript")
            ],
        ),
    ]
    return rules


# ------------------------------------------------------------- table rules


def make_schema_gate_rule(rule_id: str = "1-6-schema") -> Rule:
    """Driver-side schema assertion — the engine's header check (rule 1-6):
    column names ARE the header (SURVEY.md §1.2), so omitted headers =
    missing/mistyped columns. Zero Spark jobs. Doubles as the readability
    gate: a failure blocks downstream rules (before_check_1_1 semantics)."""

    def runner(spark: SparkSession, df: DataFrame, ctx: dict) -> RuleOutcome:
        actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        findings = []
        for name, expected in REQUIRED_SCHEMA.items():
            if name not in actual:
                findings.append((name, f"required column {name!r} missing"))
            elif actual[name] != expected:
                findings.append(
                    (name, f"column {name!r} has type {actual[name]}, expected {expected}")
                )
        return RuleOutcome(
            rule_id,
            is_valid=not findings,
            column_findings=findings,
            metrics={"schema_findings": float(len(findings))},
        )

    return Rule(rule_id, "required columns present with expected types "
                         "(header check csv_linter.py:215-226; gate funcs.py:98-106)",
                RuleScope.TABLE, runner=runner)


# ------------------------------------------------------------ column rules


def make_empty_columns_rule(rule_id: str = "2-x-cols") -> Rule:
    """2-x column half (csv_linter.py:473-487): an entirely-null column in a
    non-empty table is a batch-level error. One agg pass, fused with the
    other column rules. ``bytes`` excluded (payload stays out of this scan);
    an all-null bytes column surfaces via the payload pass per-row."""
    cols = tuple(c for c in REQUIRED_SCHEMA if c != "bytes")

    def agg_exprs(df: DataFrame) -> dict[str, Column]:
        out = {"total": F.count(F.lit(1))}
        for c in cols:
            if c in df.columns:
                out[f"nn_{c}"] = F.count(F.col(c))
        return out

    def agg_eval(values: dict) -> RuleOutcome:
        total = int(values.get("total") or 0)
        findings = []
        if total > 0:
            for c in cols:
                nn = values.get(f"nn_{c}")
                if nn is not None and int(nn) == 0:
                    findings.append((c, f"column {c!r} is entirely null"))
        return RuleOutcome(rule_id, is_valid=not findings, column_findings=findings,
                           metrics={"empty_columns": float(len(findings))})

    return Rule(rule_id, "no entirely-null columns (csv_linter.py:473-487)",
                RuleScope.COLUMN, agg_exprs=agg_exprs, agg_eval=agg_eval)


def make_unit_suffix_rule(rule_id: str = "1-3-units") -> Rule:
    """1-3 column half (csv_linter.py:155-183): if every non-empty transcript
    in the batch is a number+unit string ('1000円'), the unit belongs in the
    column metadata, not the data — a column-level finding."""

    def agg_exprs(df: DataFrame) -> dict[str, Column]:
        t = F.col("transcript")
        non_empty = t.isNotNull() & (F.trim(t) != "")
        return {
            "non_empty": F.sum(non_empty.cast("long")),
            "unit_like": F.sum((non_empty & t.rlike(rx.NUMBER_STRING)).cast("long")),
        }

    def agg_eval(values: dict) -> RuleOutcome:
        non_empty = int(values.get("non_empty") or 0)
        unit_like = int(values.get("unit_like") or 0)
        bad = non_empty > 0 and unit_like == non_empty
        return RuleOutcome(
            rule_id, is_valid=not bad,
            column_findings=[("transcript", "単位等が数値に含まれています "
                              "(every value carries an embedded unit)")] if bad else [],
            metrics={"non_empty": float(non_empty), "unit_like": float(unit_like)},
        )

    return Rule(rule_id, "no embedded units across the whole column "
                         "(csv_linter.py:155-183)", RuleScope.COLUMN,
                agg_exprs=agg_exprs, agg_eval=agg_eval)


# ---------------------------------------------------------------- ruleset


def build_audio_ruleset(
    with_payload: bool = True,
    with_shuffle: bool = True,
    drift_alpha: float = 0.01,
) -> list[Rule]:
    rules: list[Rule] = [make_schema_gate_rule()]
    rules += build_row_rules()
    rules += [make_empty_columns_rule(), make_unit_suffix_rule()]
    if with_shuffle:
        dur_edges = [0, 250, 400, 630, 1000, 1600, 2500, 4000, 6300, 10000, 16000]
        drift_specs = [("sr_hz", None), ("dur_ms", dur_edges)]
        rules += [
            make_uniqueness_rule("clip_id", rule_id="uniq"),
            make_ri_rule("1-12-codec", "codec", "codec_registry", "codec", broadcast=True),
            make_ri_rule("1-12-manifest", "clip_id", "clip_manifest", "clip_id",
                         broadcast=False),
            # both drift rules share ONE joint-histogram job (shared_specs)
            make_drift_rule("drift-sr", "sr_hz", bin_edges=None, alpha=drift_alpha,
                            shared_specs=drift_specs),
            make_drift_rule("drift-dur", "dur_ms", bin_edges=dur_edges,
                            alpha=drift_alpha, shared_specs=drift_specs),
        ]
    if with_payload:
        rules += [
            make_decodable_rule("1-1"),
            make_metadata_consistency_rule("1-11"),
            make_reference_fidelity_rule("payload-ref"),
        ]
    return rules


GATE_RULES = {"1-6-schema"}
