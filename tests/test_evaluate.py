"""Macro-average F-measure evaluator tests."""

from pathlib import Path

import pytest

from segma_tpu.annotation import AudioAnnotation
from segma_tpu.evaluate import (
    MacroAverageFMeasure,
    _intersection_duration,
    eval_model_output,
    load_rttm_dir,
)


def test_intersection_duration():
    a = [(0.0, 2.0), (5.0, 6.0)]
    b = [(1.0, 5.5)]
    assert _intersection_duration(a, b) == pytest.approx(1.5)
    assert _intersection_duration(a, []) == 0.0


def test_perfect_prediction_scores_one():
    ref = [AudioAnnotation("u", 0.0, 1.0, "a"), AudioAnnotation("u", 2.0, 1.0, "b")]
    m = MacroAverageFMeasure(["a", "b"])
    m(ref, list(ref), uri="u")
    assert abs(m) == pytest.approx(1.0)
    assert m.class_scores() == {"a": pytest.approx(1.0), "b": pytest.approx(1.0)}


def test_half_overlap_fscore():
    ref = [AudioAnnotation("u", 0.0, 2.0, "a")]
    hyp = [AudioAnnotation("u", 1.0, 2.0, "a")]  # 1 s overlap of 2 s each
    m = MacroAverageFMeasure(["a"])
    m(ref, hyp, uri="u")
    # P = R = 0.5 -> F = 0.5
    assert m.class_scores()["a"] == pytest.approx(0.5)


def test_missing_class_in_hyp():
    ref = [AudioAnnotation("u", 0.0, 1.0, "a")]
    m = MacroAverageFMeasure(["a", "b"])
    m(ref, [], uri="u")
    scores = m.class_scores()
    assert scores["a"] == pytest.approx(0.0)  # recall 0
    assert scores["b"] == pytest.approx(1.0)  # nothing to find, nothing found


def test_accumulates_across_uris():
    m = MacroAverageFMeasure(["a"])
    m([AudioAnnotation("u1", 0.0, 1.0, "a")], [AudioAnnotation("u1", 0.0, 1.0, "a")], "u1")
    m([AudioAnnotation("u2", 0.0, 1.0, "a")], [], "u2")
    # accumulated: ref 2 s, hyp 1 s, inter 1 s -> P=1, R=0.5, F=2/3
    assert m.class_scores()["a"] == pytest.approx(2 / 3)


def test_eval_model_output_csv(tmp_path):
    gt, pred = tmp_path / "gt", tmp_path / "pred"
    gt.mkdir()
    pred.mkdir()
    a = AudioAnnotation("u", 0.0, 1.0, "a")
    (gt / "u.rttm").write_text(a.to_rttm() + "\n")
    (pred / "u.rttm").write_text(a.to_rttm() + "\n")
    (pred / "only_pred.rttm").write_text("")  # no matching gt -> skipped
    out_csv = tmp_path / "fscore.csv"
    final = eval_model_output(gt, pred, ["a", "b"], scores_output=out_csv)
    assert final["Total"] == pytest.approx(1.0)
    assert out_csv.exists()
    lines = out_csv.read_text().strip().split("\n")
    assert lines[0] == "item,a,b,macro"
    assert lines[-1].startswith("TOTAL,1.000000,1.000000")


def test_load_rttm_dir_empty_file(tmp_path):
    (tmp_path / "empty.rttm").write_text("")
    out = load_rttm_dir(tmp_path)
    assert out == {"empty": []}


def test_missing_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        eval_model_output(tmp_path / "nope", tmp_path, ["a"])


def test_frame_f1(tmp_path):
    from segma_tpu.evaluate import frame_f1

    gt, pred = tmp_path / "gt", tmp_path / "pred"
    gt.mkdir()
    pred.mkdir()
    # gt: label a active 0-1 s; prediction covers 0-0.5 s -> recall 0.5
    (gt / "u.rttm").write_text(AudioAnnotation("u", 0.0, 1.0, "a").to_rttm() + "\n")
    (pred / "u.rttm").write_text(AudioAnnotation("u", 0.0, 0.5, "a").to_rttm() + "\n")
    scores = frame_f1(gt, pred, ["a", "b"])
    # tp=25 frames, fn=25, fp=0 -> F1 = 2*25/(50+25) = 2/3
    assert scores["a"] == pytest.approx(2 / 3)
    assert scores["b"] == pytest.approx(1.0)  # nothing to find, nothing found


def test_uem_cropping(tmp_path):
    """UEM regions restrict scoring: mismatches outside UEM are ignored."""
    from segma_tpu.evaluate import MacroAverageFMeasure, load_uem_dir

    ref = [AudioAnnotation("u", 0.0, 2.0, "a")]
    # hyp matches in [0, 2] but hallucinates in [5, 10]
    hyp = [
        AudioAnnotation("u", 0.0, 2.0, "a"),
        AudioAnnotation("u", 5.0, 5.0, "a"),
    ]
    # without UEM the false alarm hurts precision
    m = MacroAverageFMeasure(["a"])
    m(ref, hyp, uri="u")
    assert m.class_scores()["a"] < 1.0
    # with UEM restricted to [0, 2] the score is perfect
    (tmp_path / "u.uem").write_text("u NA 0.0 2.0\n")
    uems = load_uem_dir(tmp_path)
    m2 = MacroAverageFMeasure(["a"])
    m2(ref, hyp, uri="u", uem=uems["u"])
    assert m2.class_scores()["a"] == pytest.approx(1.0)


def test_error_rates_and_der():
    """Per-class detection error rate and pooled DER, hand-computed."""
    # class a: ref [0,2], hyp [1,3] -> 1 s miss + 1 s fa over 2 s ref = 1.0
    # class b: ref [0,4], hyp [0,4] -> 0.0
    ref = [AudioAnnotation("u", 0.0, 2.0, "a"), AudioAnnotation("u", 0.0, 4.0, "b")]
    hyp = [AudioAnnotation("u", 1.0, 2.0, "a"), AudioAnnotation("u", 0.0, 4.0, "b")]
    m = MacroAverageFMeasure(["a", "b"])
    m(ref, hyp, uri="u")
    ers = m.error_rates()
    assert ers["a"] == pytest.approx(1.0)
    assert ers["b"] == pytest.approx(0.0)
    # pooled: (1 miss + 1 fa) / 6 s total ref
    assert m.der() == pytest.approx(2.0 / 6.0)
    # perfect prediction -> DER 0
    m2 = MacroAverageFMeasure(["a", "b"])
    m2(ref, list(ref), uri="u")
    assert m2.der() == pytest.approx(0.0)
    # empty reference but spurious hyp -> inf
    m3 = MacroAverageFMeasure(["a"])
    m3([], [AudioAnnotation("u", 0.0, 1.0, "a")], uri="u")
    assert m3.error_rates()["a"] == float("inf")
    assert m3.der() == float("inf")


def test_eval_model_output_reports_der(tmp_path):
    gt, pred = tmp_path / "gt", tmp_path / "pred"
    gt.mkdir(), pred.mkdir()
    (gt / "u.rttm").write_text(AudioAnnotation("u", 0.0, 2.0, "a").to_rttm() + "\n")
    (pred / "u.rttm").write_text(AudioAnnotation("u", 0.0, 1.0, "a").to_rttm() + "\n")
    final = eval_model_output(gt, pred, ["a"], scores_output=tmp_path / "f.csv")
    assert final["DER"] == pytest.approx(0.5)  # 1 s miss / 2 s ref


def test_detection_rates():
    from segma_tpu.evaluate import MacroAverageFMeasure

    ref = [AudioAnnotation("u", 0.0, 2.0, "a")]
    hyp = [AudioAnnotation("u", 1.0, 2.0, "a")]  # 1s hit, 1s miss, 1s fa
    m = MacroAverageFMeasure(["a", "b"])
    m(ref, hyp, uri="u")
    rates = m.detection_rates()
    assert rates["a"]["miss"] == pytest.approx(0.5)
    assert rates["a"]["false_alarm"] == pytest.approx(0.5)
    assert rates["b"]["miss"] == 0.0 and rates["b"]["false_alarm"] == 0.0


def test_golden_analytic_cases():
    """Hand-computed golden fixtures lock MacroAverageFMeasure numerics
    (reference semantics: pyannote detection F per class + macro average,
    scripts/evaluate.py:59-75; round-3 VERDICT item 8). Covers overlap
    merging, UEM cropping, and empty-hypothesis/empty-reference classes."""
    import math

    import yaml

    cases = yaml.safe_load(
        (Path(__file__).parent / "golden" / "eval_cases.yml").read_text()
    )
    assert len(cases) == 4
    for case in cases:
        metric = MacroAverageFMeasure(case["classes"])

        def annots(rows):
            return [
                AudioAnnotation(
                    uid="u", start_time_s=s, duration_s=e - s, label=label
                )
                for label, s, e in rows
            ]

        uem = [tuple(r) for r in case["uem"]] if case["uem"] else None
        macro = metric(
            annots(case["reference"]), annots(case["hypothesis"]), uem=uem
        )
        exp = case["expected"]
        name = case["name"]
        assert macro == pytest.approx(exp["macro"], abs=1e-9), name
        for c, f in exp["class_scores"].items():
            assert metric.class_scores()[c] == pytest.approx(f, abs=1e-9), (
                name, c,
            )
        rates = metric.detection_rates()
        for c, d in exp["detection_rates"].items():
            for k, v in d.items():
                assert rates[c][k] == pytest.approx(v, abs=1e-9), (name, c, k)
        for c, v in exp["error_rates"].items():
            got = metric.error_rates()[c]
            if math.isinf(v):
                assert math.isinf(got), (name, c)
            else:
                assert got == pytest.approx(v, abs=1e-9), (name, c)
        assert metric.der() == pytest.approx(exp["der"], abs=1e-9), name


def test_missing_prediction_uris_warned(tmp_path, capsys):
    """Scoring runs over the uri intersection (reference parity), but a
    truth uri with no prediction must be called out loudly — a predict
    run that dropped files would otherwise inflate its score silently."""
    gt, pred = tmp_path / "gt", tmp_path / "pred"
    gt.mkdir(), pred.mkdir()
    line = "SPEAKER {u} <NA> 1.0 2.0 <NA> <NA> male <NA> <NA>\n"
    for u in ("a", "b", "c"):
        (gt / f"{u}.rttm").write_text(line.format(u=u))
    (pred / "a.rttm").write_text(line.format(u="a"))

    from segma_tpu.evaluate import eval_model_output

    scores = eval_model_output(gt, pred, ["male"], tmp_path / "f.csv")
    out = capsys.readouterr().out
    assert "2 ground-truth uri(s) have no prediction" in out
    assert "b, c" in out and "scoring 1 shared" in out
    assert scores["male"] == 1.0  # the scored file matches exactly


def test_many_files_smoke(tmp_path):
    """10k-uri evaluation must stream per-uri: bounded wall time, correct
    accumulated scores (round-4 scalability pass)."""
    import time

    from segma_tpu.evaluate import eval_model_output

    gt, pred = tmp_path / "gt", tmp_path / "pred"
    gt.mkdir()
    pred.mkdir()
    line = (
        "SPEAKER {u} 1 {s:.2f} {d:.2f} <NA> <NA> {label} <NA> <NA>"
    )
    for i in range(10_000):
        u = f"u{i:05d}"
        (gt / f"{u}.rttm").write_text(
            line.format(u=u, s=0.0, d=1.0, label="male") + "\n"
        )
        # predictions overlap ground truth by exactly half
        (pred / f"{u}.rttm").write_text(
            line.format(u=u, s=0.5, d=1.0, label="male") + "\n"
        )
    t0 = time.perf_counter()
    scores = eval_model_output(
        gt, pred, classes=["male", "female"], scores_output=tmp_path / "f.csv"
    )
    elapsed = time.perf_counter() - t0
    assert elapsed < 60.0, f"10k-file evaluation took {elapsed:.1f}s"
    # P = R = 0.5 per file and in aggregate -> F = 0.5; "female" is absent
    # from both ref and hyp everywhere -> perfect 1.0 by convention
    assert abs(scores["male"] - 0.5) < 1e-9
    assert scores["female"] == 1.0
    assert (tmp_path / "f.csv").exists()
