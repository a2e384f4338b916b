"""Hermetic execution of the offline dataset-build path (VERDICT r4 #2).

Fabricates a miniature PKU csv tree and a CGL COCO-json tree (tiny PNGs
included), runs `cli.build_dataset` end to end, and asserts the parity
semantics of `image2layout/hfds_builder/dump_dataset.py:67-126`,
`helpers/pku.py:15-26,39-80` and `helpers/cgl.py:20-27`:

  * NG-list posters dropped, >max_seq_length and zero-element samples
    dropped, invalid label ids skipped;
  * split re-assignment via the data_splits txt mapping (train/val/test
    from the annotated csv, `with_no_annotation` from the unannotated
    one) including the CGL `.jpg` -> `.png` identifier fixup;
  * 240x350 (WxH) early resize and pixel-max saliency combination;
  * vocabulary.json emission with ids = SORTED names (the ClassLabel
    order the reference casts to, `train/data.py:178-181`);
  * the parquet -> HFParquetDataset round trip, and a debug train epoch
    running off the dump through `cli.train`.

The unannotated pipeline legs (`cli.inference --unannotated` ->
`cli.evaluate --unannotated`, VERDICT r4 #3) run against the same dump's
`with_no_annotation` split.
"""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from conftest import cli_subprocess_env

pytestmark = pytest.mark.slow


def _box(l, t, r, b):
    return json.dumps([l, t, r, b])


def _write_png(path, hw, value=None, rgb=None):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    h, w = hw
    if rgb is not None:
        arr = np.full((h, w, 3), rgb, np.uint8)
    else:
        arr = np.full((h, w), value, np.uint8)
    Image.fromarray(arr).save(path)


def _fabricate_pku(root):
    """9 annotated posters + 2 unannotated, covering every drop rule."""
    ann = os.path.join(root, "annotation")
    os.makedirs(ann, exist_ok=True)
    rows = ["poster_path,cls_elem,box_elem"]

    def add(pid, elems):
        for cls, box in elems:
            rows.append(f'train/{pid}.png,{cls},"{box}"')

    # regular posters 1..10: re-split into train(8)/val/test later (8 train
    # records so a dp batch shards over the 8 virtual test devices)
    for pid in range(1, 11):
        add(pid, [(1, _box(10, 10, 200, 100)),          # text
                  (2, _box(20, 500, 120, 600)),          # logo
                  (3, _box(5, 5, 250, 120))])            # underlay
    # poster 183 is on the NG list -> must be dropped even though valid
    add(183, [(1, _box(10, 10, 200, 100))])
    # poster 11: 11 elements -> dropped (>max_seq_length=10)
    add(11, [(1, _box(10 + i, 10, 100 + i, 60)) for i in range(11)])
    # poster 12: only an invalid label id (9) -> zero valid elements -> drop
    add(12, [(9, _box(10, 10, 100, 60))])
    with open(os.path.join(ann, "train_csv_9973.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")
    # unannotated test csv: single column
    with open(os.path.join(ann, "test_csv_905.csv"), "w") as f:
        f.write("poster_path\n901.png\n902.png\n")

    # splits: 1..8 train, 9 val, 10 test; 901/902 with_no_annotation
    sp = os.path.join(root, "splits")
    os.makedirs(sp, exist_ok=True)
    for name, ids in (("train", list(range(1, 9))), ("val", [9]),
                      ("test", [10]),
                      ("with_no_annotation", [901, 902])):
        with open(os.path.join(sp, f"{name}.txt"), "w") as f:
            f.write("\n".join(str(i) for i in ids) + "\n")

    # images: input RGB + two saliency maps whose pixel-max is asserted:
    # saliency = 40 everywhere, saliency_sub = 200 everywhere -> max 200
    for split, ids in (("train", list(range(1, 13)) + [183]),
                       ("test", [901, 902])):
        for pid in ids:
            base = os.path.join(root, "image", split)
            _write_png(os.path.join(base, "input", f"{pid}.png"),
                       (75, 51), rgb=(int(pid) % 251, 60, 120))
            _write_png(os.path.join(base, "saliency", f"{pid}.png"),
                       (75, 51), value=40)
            _write_png(os.path.join(base, "saliency_sub", f"{pid}.png"),
                       (75, 51), value=200)
    return root


def _fabricate_cgl(root):
    ann = os.path.join(root, "annotation")
    os.makedirs(ann, exist_ok=True)

    def coco(entries):
        images, annotations = [], []
        for img_id, fname, elems in entries:
            images.append({"id": img_id, "file_name": fname,
                           "width": 513, "height": 750})
            annotations.append([
                {"image_id": img_id, "category_id": cat,
                 "bbox": [l, t, w, h]} for cat, (l, t, w, h) in elems
            ])
        return {"images": images, "annotations": annotations}

    # train json: ids 1..3 (.jpg file names exercise the .png fixup);
    # category 5 (highlighted text) must be ignored; sample 3 keeps one
    # valid element after the cat-5 skip
    train = coco([
        (1, "1.jpg", [(1, (10, 10, 100, 50)), (2, (20, 400, 200, 100))]),
        (2, "2.jpg", [(3, (5, 5, 400, 300)), (4, (30, 30, 40, 40))]),
        (3, "3.jpg", [(5, (0, 0, 50, 50)), (2, (10, 600, 300, 80))]),
    ])
    with open(os.path.join(ann, "layout_train_6w_fixed_v2.json"), "w") as f:
        json.dump(train, f)
    # validation json (reader split "validation")
    val = coco([(10, "10.jpg", [(2, (10, 10, 200, 100))])])
    with open(os.path.join(ann, "layout_test_6w_fixed_v2.json"), "w") as f:
        json.dump(val, f)
    # yinhe = unannotated: images only
    yinhe = {"images": [{"id": 90, "file_name": "90.jpg",
                         "width": 513, "height": 750}],
             "annotations": []}
    with open(os.path.join(ann, "yinhe.json"), "w") as f:
        json.dump(yinhe, f)

    sp = os.path.join(root, "splits")
    os.makedirs(sp, exist_ok=True)
    for name, ids in (("train", [1, 2]), ("val", [3]), ("test", [10]),
                      ("with_no_annotation", [90])):
        with open(os.path.join(sp, f"{name}.txt"), "w") as f:
            f.write("\n".join(str(i) for i in ids) + "\n")

    for split, ids in (("train", [1, 2, 3]), ("validation", [10]),
                       ("test", [90])):
        for pid in ids:
            base = os.path.join(root, "image", split)
            _write_png(os.path.join(base, "input", f"{pid}.png"),
                       (75, 51), rgb=(200, 30, int(pid) % 251))
            _write_png(os.path.join(base, "saliency", f"{pid}.png"),
                       (75, 51), value=10)
            _write_png(os.path.join(base, "saliency_sub", f"{pid}.png"),
                       (75, 51), value=99)
    return root


def _run(cmd, env, timeout=900):
    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       timeout=timeout)
    assert r.returncode == 0, f"{' '.join(cmd)}\n--- stderr ---\n{r.stderr[-3000:]}"
    return r


def _build(tmp_path, kind):
    env = cli_subprocess_env()
    root = _fabricate_pku(str(tmp_path / "raw")) if kind == "pku" \
        else _fabricate_cgl(str(tmp_path / "raw"))
    out = str(tmp_path / f"{kind}_dump")
    _run([sys.executable, "-m", "ralf_tpu.cli.build_dataset",
          "--dataset-type", kind, "--dataset-root", root,
          "--splits-dir", os.path.join(root, "splits"),
          "--output-dir", out, "--num-shards", "2"], env)
    return out, env


def test_pku_build_semantics(tmp_path):
    out, _ = _build(tmp_path, "pku")

    with open(os.path.join(out, "vocabulary.json")) as f:
        vocab = json.load(f)["label"]
    # 10 surviving posters x {text, logo, underlay}; NG/overlong/invalid
    # posters contribute nothing
    assert vocab == {"text": 10, "logo": 10, "underlay": 10}

    from ralf_tpu.data.dataset import IMAGE_H, IMAGE_W, DatasetConfig, HFParquetDataset

    cfg = DatasetConfig(name="pku10", data_dir=out)
    names = cfg.label_names
    assert list(names) == sorted(vocab), (
        "label id order must be the sorted-vocabulary ClassLabel order")

    ds = {s: HFParquetDataset(cfg, s)
          for s in ("train", "val", "test", "with_no_annotation")}
    assert (len(ds["train"]), len(ds["val"]), len(ds["test"])) == (8, 1, 1)
    assert len(ds["with_no_annotation"]) == 2
    train_ids = set(ds["train"].get_ids(np.arange(8)).tolist())
    assert train_ids == {str(i) for i in range(1, 9)}
    assert {"183", "11", "12"}.isdisjoint(train_ids)

    lay = ds["test"].get_layouts(np.asarray([0]))
    assert lay["mask"][0].sum() == 3
    # row order is csv order: text(1), logo(2), underlay(3); ids are the
    # SORTED vocabulary positions
    assert [names[i] for i in lay["label"][0][:3]] == ["text", "logo", "underlay"]
    # normalized cxcywh against the 513x750 canvas: text box (10,10,200,100)
    np.testing.assert_allclose(lay["center_x"][0][0], (10 + 200) / 2 / 513,
                               rtol=1e-6)
    np.testing.assert_allclose(lay["height"][0][0], (100 - 10) / 750,
                               rtol=1e-6)

    img = ds["test"].get_images(np.asarray([0]))
    assert img.shape == (1, IMAGE_H, IMAGE_W, 4) == (1, 350, 240, 4)
    # saliency = pixel max(40, 200) = 200
    np.testing.assert_allclose(img[0, ..., 3], 200 / 255.0, atol=1e-3)
    # rgb round-trips the flat fill (id 10 -> r=10)
    np.testing.assert_allclose(img[0, ..., 0], 10 / 255.0, atol=1e-3)

    # the unannotated split carries canvases and EMPTY layouts
    ulay = ds["with_no_annotation"].get_layouts(np.arange(2))
    assert ulay["mask"].sum() == 0


def test_cgl_build_semantics(tmp_path):
    out, _ = _build(tmp_path, "cgl")

    with open(os.path.join(out, "vocabulary.json")) as f:
        vocab = json.load(f)["label"]
    # cat-5 never enters; text on samples 1/3/10, embellishment only on 2
    assert vocab == {"text": 3, "logo": 1, "underlay": 1, "embellishment": 1}

    from ralf_tpu.data.dataset import DatasetConfig, HFParquetDataset

    cfg = DatasetConfig(name="cgl", data_dir=out)
    ds = {s: HFParquetDataset(cfg, s)
          for s in ("train", "val", "test", "with_no_annotation")}
    # .jpg identifiers resolved against .png split entries
    assert (len(ds["train"]), len(ds["val"]), len(ds["test"])) == (2, 1, 1)
    assert len(ds["with_no_annotation"]) == 1
    # sample 3 (val split): cat-5 skipped, one text element left
    lay = ds["val"].get_layouts(np.asarray([0]))
    assert lay["mask"][0].sum() == 1
    assert cfg.label_names[lay["label"][0][0]] == "text"
    # ltwh -> cxcywh normalization: (10, 600, 300, 80) on 513x750
    np.testing.assert_allclose(lay["center_x"][0][0], (10 + 150) / 513,
                               rtol=1e-6)
    np.testing.assert_allclose(lay["center_y"][0][0], (600 + 40) / 750,
                               rtol=1e-6)


def test_train_debug_epoch_off_dump_and_unannotated_legs(tmp_path):
    """The dump feeds the REAL data path end to end: `cli.train --data-dir`
    (no --synthetic) -> `cli.inference` on the test split AND
    `--unannotated` -> `cli.evaluate` both ways.  Closes VERDICT r4 #2's
    "train a debug epoch off the dump" and #3's untested unannotated legs
    in one pipeline."""
    out, env = _build(tmp_path, "pku")
    job_dir = str(tmp_path / "job")
    _run([sys.executable, "-m", "ralf_tpu.cli.train",
          "--experiment", "autoreg", "--job-dir", job_dir,
          "--data-dir", out, "--debug", "--batch-size", "8",
          "--cache-dir", str(tmp_path / "cache"),
          "model.d_model=32", "model.nhead=2", "model.num_encoder_layers=1",
          "model.num_decoder_layers=1", "model.dim_feedforward=64",
          "model.backbone=resnet18"], env)
    assert os.path.isdir(os.path.join(job_dir, "ckpt_final"))
    metrics = [json.loads(l) for l in
               open(os.path.join(job_dir, "metrics.jsonl"))]
    assert metrics and np.isfinite(metrics[0]["train_loss"])

    # annotated inference off the dump (1 test record)
    _run([sys.executable, "-m", "ralf_tpu.cli.inference",
          "--job-dir", job_dir, "--cond", "uncond", "--split", "test",
          "--num-seeds", "1", "--batch-size", "2"], env)
    with open(os.path.join(job_dir, "generated_samples_uncond",
                           "test_0.pkl"), "rb") as f:
        assert pickle.load(f)["results"]

    # unannotated inference: must pick up the dump's with_no_annotation
    # split (2 records), not fall back to test canvases
    udir = str(tmp_path / "unanno_out")
    r = _run([sys.executable, "-m", "ralf_tpu.cli.inference",
              "--job-dir", job_dir, "--cond", "uncond", "--split", "test",
              "--unannotated", "--num-seeds", "1", "--batch-size", "2",
              "--out-dir", udir], env)
    assert "no with_no_annotation split" not in r.stderr
    with open(os.path.join(udir, "test_0.pkl"), "rb") as f:
        data = pickle.load(f)
    assert len(data["results"]) == 2, "unannotated split has 2 canvases"

    # unannotated eval: heuristic metrics only, NO FID/prdc
    # (`eval_unanno.py:11-20` — no GT layouts to pair against)
    _run([sys.executable, "-m", "ralf_tpu.cli.evaluate",
          "--input-dir", udir, "--job-dir", job_dir, "--split", "test",
          "--unannotated", "--cache-dir", str(tmp_path / "eval_cache")], env)
    with open(os.path.join(udir, "scores_all.json")) as f:
        scores = json.load(f)
    for metric in ("validity", "alignment-LayoutGAN++", "overlap-LayoutGAN++",
                   "overlay", "underlay_effectiveness_loose", "utilization"):
        assert metric in scores, f"missing {metric}: {sorted(scores)}"
        assert np.isfinite(scores[metric]["mean"])
    assert "fid" not in scores and "precision" not in scores, (
        "unannotated eval must not emit paired FID/prdc")
