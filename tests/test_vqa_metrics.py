"""Golden tests for VQA answer normalization + soft score (SURVEY.md §4)."""

from mafed_tpu.evaluation.vqa_metrics import (
    VQAGenerativeAccuracy,
    normalize_answer,
    vqa_v2_score,
)


def test_vqa_v2_score_table():
    assert vqa_v2_score(0) == 0.0
    assert vqa_v2_score(1) == 0.3
    assert vqa_v2_score(2) == 0.6
    assert vqa_v2_score(3) == 0.9  # round(0.3*3, 1), not 0.8999...
    assert vqa_v2_score(4) == 1.0
    assert vqa_v2_score(10) == 1.0


def test_normalize_basic():
    assert normalize_answer("  Yes\n") == "yes"
    assert normalize_answer("A dog") == "dog"
    assert normalize_answer("the cat") == "cat"
    assert normalize_answer("TWO") == "2"
    assert normalize_answer("none") == "0"


def test_normalize_contractions_and_punct():
    assert normalize_answer("dont") == "don't"
    assert normalize_answer("isnt it") == "isn't it"
    # punctuation surrounded by spaces is removed
    assert normalize_answer("red , blue") == "red blue"
    # periods stripped except inside numbers
    assert normalize_answer("1.5") == "1.5"
    assert normalize_answer("dog.") == "dog"
    # number comma form
    assert normalize_answer("1,000") == "1000"


def test_generative_accuracy_stream():
    metric = VQAGenerativeAccuracy()
    gts = [["yes"] * 10, ["2"] * 3 + ["3"] * 7]
    metric(["Yes", "two"], gts)
    # yes matches 10 -> 1.0; "two"->"2" matches 3 -> 0.9
    assert abs(metric.compute() - (1.0 + 0.9) / 2) < 1e-9
    metric.update(["no"], [["yes"] * 10])
    assert abs(metric.compute() - (1.0 + 0.9 + 0.0) / 3) < 1e-9
