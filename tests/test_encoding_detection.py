"""Encoding-detection tiebreaks + check 1-10 trigger behavior.

The reference uses chardet (csv_linter.py:489-492); this engine uses a
deterministic try-decode ladder (rules/tabular.py detect_and_decode). These
tests pin the agreement cases (the reference's own sjis/cp932 goldens and
typical JP text) and the documented divergence case (SS2 halfwidth-kana
EUC runs). No Spark needed except for the 1-10 lint itself.
"""

import os

import pytest

from open_data_linter_spark.rules.tabular import detect_and_decode

SAMPLES = "/root/reference/tests/samples"


def test_utf8_and_bom():
    assert detect_and_decode("a,b\n1,2\n".encode())[1] == "utf-8"
    text, label = detect_and_decode(b"\xef\xbb\xbf" + "a,b\n".encode())
    assert label == "UTF-8-SIG" and text.startswith("a,b")


def test_strict_codecs_disambiguate_ordinary_jp_text():
    # ordinary kanji/hiragana text is NOT cross-decodable between
    # shift_jis and euc_jp under Python's strict codecs, so the ladder
    # cannot mislabel it (chardet agreement by construction)
    jp = "都道府県,人口\n東京都,14000000\nこんにちは,1\n"
    assert detect_and_decode(jp.encode("shift_jis"))[1] == "SHIFT_JIS"
    assert detect_and_decode(jp.encode("euc_jp"))[1] == "EUC-JP"


def test_cp932_superset_tiebreak():
    # both-decodable bytes label SHIFT_JIS (so 1-10 stays silent)…
    both = "数値,１２３\n".encode("shift_jis")
    assert detect_and_decode(both)[1] == "SHIFT_JIS"
    # …CP932-only extension chars (NEC ①, IBM 髙) force the CP932 label
    cp932_only = "記号,①\n名前,髙橋\n".encode("cp932")
    assert detect_and_decode(cp932_only)[1] == "CP932"


def test_documented_divergence_ss2_halfwidth_kana():
    # EUC-JP SS2 halfwidth-kana runs are valid shift_jis byte streams too;
    # the deterministic ladder answers SHIFT_JIS where chardet's
    # statistical model may answer EUC-JP (divergence documented in
    # detect_and_decode's docstring) — pinned so a future change is loud
    euc_hw = b"\x8e\xb1\x8e\xb2\x8e\xb3"  # ｱｲｳ in EUC-JP SS2
    try:
        euc_hw.decode("shift_jis")
        both_decodable = True
    except UnicodeDecodeError:
        both_decodable = False
    if both_decodable:
        assert detect_and_decode(euc_hw)[1] == "SHIFT_JIS"


@pytest.mark.skipif(not os.path.isdir(SAMPLES), reason="reference samples absent")
def test_reference_golden_labels():
    with open(os.path.join(SAMPLES, "nb01h0013_sjis.csv"), "rb") as f:
        assert detect_and_decode(f.read())[1] == "SHIFT_JIS"
    with open(os.path.join(SAMPLES, "nb01h0013_cp932.csv"), "rb") as f:
        assert detect_and_decode(f.read())[1] == "CP932"


@pytest.mark.skipif(not os.path.isdir(SAMPLES), reason="reference samples absent")
def test_check_1_10_trigger_matrix(spark):
    """1-10 fires IFF the label is CP932, on exactly the roundtrip-failing
    cells (reference golden: (4,0) in nb01h0013_cp932; silent for the
    both-decodable sjis twin)."""
    from open_data_linter_spark.rules.tabular import TabularLinter

    with open(os.path.join(SAMPLES, "nb01h0013_sjis.csv"), "rb") as f:
        lin_s = TabularLinter(spark, f.read(), "nb01h0013_sjis.csv")
    assert lin_s.check_1_10().is_valid

    with open(os.path.join(SAMPLES, "nb01h0013_cp932.csv"), "rb") as f:
        lin_c = TabularLinter(spark, f.read(), "nb01h0013_cp932.csv")
    res = lin_c.check_1_10()
    assert not res.is_valid
    assert res.invalid_contents[0].invalid_cells == [(4, 0)]


def test_check_1_10_crafted_cp932_fixture(spark):
    """Adversarial fixture: a CP932 file whose platform-dependent chars sit
    in known cells — 1-10 must flag those cells and no others."""
    from open_data_linter_spark.rules.tabular import TabularLinter

    csv_text = "タイトル行\n名前,記号,数\nふつう,まる,1\n髙橋,①,2\nふつう2,かく,3\n"
    data = csv_text.encode("cp932")
    lin = TabularLinter(spark, data, "crafted_cp932.csv")
    assert lin.encoding == "CP932"
    res = lin.check_1_10()
    assert not res.is_valid
    assert set(res.invalid_contents[0].invalid_cells) == {(3, 0), (3, 1)}
