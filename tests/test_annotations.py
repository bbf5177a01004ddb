"""Annotation store + task split semantics (base_data.py parity)."""

import json

import pytest

from mafed_tpu.data.annotations import AnnotationStore, load_task_ids


@pytest.fixture
def split_env(tmp_path):
    split = {"taskA": ["q1", "q2"], "taskB": ["q3"]}
    split_file = tmp_path / "train_question_ids.json"
    split_file.write_text(json.dumps(split))
    anns = {
        q: {"question_id": q, "question": f"what {q}", "img_fname": f"img_{q}",
            "multiple_choice_answer": "yes", "answers": []}
        for q in ["q1", "q2", "q3"]
    }
    (tmp_path / "train_annotations.json").write_text(json.dumps(anns))
    return tmp_path, str(split_file)


def test_load_task_ids(split_env):
    _, split_file = split_env
    assert load_task_ids(split_file, "taskA") == ["q1", "q2"]
    # "joint" = all tasks concatenated (multitask training)
    assert load_task_ids(split_file, "joint") == ["q1", "q2", "q3"]
    with pytest.raises(ValueError):
        load_task_ids(split_file, "nope")
    with pytest.raises(ValueError):
        load_task_ids("/does/not/exist.json", "taskA")


def test_annotation_store(split_env):
    root, split_file = split_env
    store = AnnotationStore(str(root), "train", split_file, "taskA")
    assert len(store) == 2
    assert store[0]["question_id"] == "q1"
    joint = AnnotationStore(str(root), "train", split_file, "joint")
    assert len(joint) == 3
