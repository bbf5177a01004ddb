"""Per-source pretrain manifest builders (pretrain/sources.py).

Synthetic on-disk layouts for all four corpora; asserts the manifest rows
feed PretrainDataset and that VG rows carry the bbox that drives the
object-center crop (reference vl_pythia_pretrain_dataset.py:72-83).
"""

import json
import os

import numpy as np

from mafed_tpu.pretrain.sources import SOURCE_BUILDERS, main as sources_main, write_manifest


def _touch_img(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    from PIL import Image

    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(path)


def test_coco_builder(tmp_path):
    root = tmp_path / "coco"
    ann = {
        "images": [{"id": 1, "file_name": "a.jpg"}, {"id": 2, "file_name": "b.jpg"}],
        "annotations": [
            {"image_id": 1, "caption": "a cat"},
            {"image_id": 1, "caption": "a feline"},
            {"image_id": 2, "caption": "a dog"},
            {"image_id": 99, "caption": "orphan"},
        ],
    }
    os.makedirs(root / "annotations")
    with open(root / "annotations" / "captions_train2014.json", "w") as f:
        json.dump(ann, f)
    _touch_img(str(root / "train2014" / "a.jpg"))
    # b.jpg intentionally missing -> dropped when require_images
    recs = SOURCE_BUILDERS["coco"](str(root))
    assert [r.caption for r in recs] == ["a cat", "a feline"]
    assert all(r.source == "coco" for r in recs)


def test_visual_genome_builder_bbox(tmp_path):
    root = tmp_path / "vg"
    regions = [
        {
            "regions": [
                {"image_id": 7, "phrase": "red ball", "x": 1, "y": 2, "width": 3, "height": 4},
                {"image_id": 7, "phrase": "blue box", "x": 5, "y": 6, "width": 7, "height": 8},
            ]
        }
    ]
    os.makedirs(root)
    with open(root / "region_descriptions.json", "w") as f:
        json.dump(regions, f)
    image_data = [{"image_id": 7, "url": "https://vg.org/VG_100K/7.jpg"}]
    with open(root / "image_data.json", "w") as f:
        json.dump(image_data, f)
    _touch_img(str(root / "VG_100K" / "7.jpg"))
    recs = SOURCE_BUILDERS["visual_genome"](str(root))
    assert len(recs) == 2
    assert recs[0].metadata["bbox"] == [1, 2, 3, 4]
    assert recs[0].source == "visual_genome"


def test_cc3m_and_sbu_builders(tmp_path):
    cc = tmp_path / "cc3m"
    os.makedirs(cc)
    with open(cc / "Train_GCC-training.tsv", "w") as f:
        f.write("first caption\thttp://x/1.jpg\n")
        f.write("second caption\thttp://x/2.jpg\n")
    _touch_img(str(cc / "images" / "0.jpg"))
    recs = SOURCE_BUILDERS["cc3m"](str(cc))
    assert [r.caption for r in recs] == ["first caption"]

    sbu = tmp_path / "sbu"
    os.makedirs(sbu)
    with open(sbu / "sbu-captions-all.json", "w") as f:
        json.dump({"image_urls": ["http://s/img7.jpg"], "captions": ["on a beach"]}, f)
    _touch_img(str(sbu / "images" / "img7.jpg"))
    recs = SOURCE_BUILDERS["sbu"](str(sbu))
    assert recs[0].caption == "on a beach"
    assert recs[0].source == "sbu_captions"


def test_manifest_roundtrip_feeds_dataset(tmp_path):
    from mafed_tpu.data.tokenizer import build_tokenizer
    from mafed_tpu.pretrain.dataset import PretrainDataset
    from tests.helpers import tiny_model_cfg

    root = tmp_path / "coco"
    os.makedirs(root / "annotations")
    with open(root / "annotations" / "captions_train2014.json", "w") as f:
        json.dump(
            {
                "images": [{"id": 1, "file_name": "a.jpg"}],
                "annotations": [{"image_id": 1, "caption": "a cat sits"}],
            },
            f,
        )
    _touch_img(str(root / "train2014" / "a.jpg"))

    manifest = str(tmp_path / "manifest.jsonl")
    n = sources_main(["--source", "coco", "--root", str(root), "--out", manifest])
    assert n == 1

    tok = build_tokenizer("unused", allow_fallback=True)
    ds = PretrainDataset(tok, tiny_model_cfg().vision, manifest_path=manifest)
    item = ds[0]
    assert item["raw"]["caption"] == "A cat sits."
    assert item["pixels"].shape[-1] == 3
    np.testing.assert_array_equal(item["input_ids"], item["labels"])


def test_write_manifest_append(tmp_path):
    from mafed_tpu.pretrain.dataset import CaptionRecord

    path = str(tmp_path / "m.jsonl")
    write_manifest([CaptionRecord(image="x", caption="one")], path)
    write_manifest([CaptionRecord(image="y", caption="two")], path, append=True)
    lines = open(path).read().splitlines()
    assert len(lines) == 2 and json.loads(lines[1])["caption"] == "two"
