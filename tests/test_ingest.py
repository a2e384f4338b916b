"""The real-artifact ingestion rehearsal is a TESTED contract (VERDICT r4
#6): fabricate the reference's download layout — cache/dataset parquet,
PRECOMPUTED_WEIGHT_DIR tower weights, eval_gt_features, the relationship
dict, data_splits/retrieval yaml, and a training_logs job whose
`final_model.pt` is a LIVE reference `ConcateAuxilaryTaskAutoreg`
state_dict — then run `scripts/ingest_reference_artifacts.py --scan` and
prove the whole chain: every artifact ingests through the real machinery,
the trained job converts to a ralf_tpu job dir, and `cli.inference`
restores the converted checkpoint and decodes.
"""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

from conftest import cli_subprocess_env
from test_build_dataset import _fabricate_pku

import ref_shims

ref_shims.install()  # torchvision/timm shims before any image2layout import

pytestmark = pytest.mark.slow

D_MODEL = 64  # reference autoreg: nhead=8, 6+6 layers, resnet50, ff=4*d
NUM_BIN = 32


def _fabricate_cache(tmp_path):
    root = str(tmp_path / "cache")
    os.makedirs(root, exist_ok=True)
    env = cli_subprocess_env()

    # 1. dataset parquet via the real builder CLI
    raw = _fabricate_pku(str(tmp_path / "raw"))
    dump = os.path.join(root, "dataset", "pku10")
    r = subprocess.run(
        [sys.executable, "-m", "ralf_tpu.cli.build_dataset",
         "--dataset-type", "pku", "--dataset-root", raw,
         "--splits-dir", os.path.join(raw, "splits"),
         "--output-dir", dump, "--num-shards", "1"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]

    # 2. tower weights: live reference-shaped state_dicts
    wdir = os.path.join(root, "PRECOMPUTED_WEIGHT_DIR")
    os.makedirs(wdir, exist_ok=True)
    torch.manual_seed(0)
    torch.save(ref_shims.resnet50().state_dict(),
               os.path.join(wdir, "resnet50_a1_0-14fe96d1.pth"))

    import image2layout.train.fid.model as fid_mod

    fidnet = fid_mod.FIDNetV3(num_label=3, max_bbox=10)
    torch.save(fidnet.state_dict(), os.path.join(wdir, "fidnet_pku10.pt"))

    # 3. GT eval features
    gdir = os.path.join(root, "eval_gt_features")
    os.makedirs(gdir, exist_ok=True)
    torch.save(torch.randn(16, 256), os.path.join(gdir, "pku10_test.pt"))

    # 4. relationship dict
    torch.save({"1": [("text", "A", "smaller", "canvas", "pad")]},
               os.path.join(
                   root, "pku_cgl_relationships_dic_using_canvas_"
                         "sort_label_lexico.pt"))

    # 5. retrieval correspondence yaml
    rdir = os.path.join(root, "data_splits", "retrieval", "pku")
    os.makedirs(rdir, exist_ok=True)
    with open(os.path.join(rdir, "train.yaml"), "w") as f:
        f.write("'1':\n- '2'\n- '3'\n'2':\n- '1'\n- '3'\n")

    # 6. a trained job: LIVE reference autoreg, tiny d_model
    jdir = os.path.join(root, "training_logs", "autoreg_pku10_uncond")
    os.makedirs(jdir, exist_ok=True)
    cwd = os.getcwd()
    os.chdir(wdir)  # reference ctor loads ./resnet50_a1_0-14fe96d1.pth
    try:
        import datasets as ds_lib

        from image2layout.train.helpers.layout_tokenizer import (
            LayoutSequenceTokenizer,
        )
        from image2layout.train.models.autoreg import (
            ConcateAuxilaryTaskAutoreg,
        )

        label = ds_lib.ClassLabel(names=["logo", "text", "underlay"])
        tok = LayoutSequenceTokenizer(
            label_feature=label, max_seq_length=10, num_bin=NUM_BIN,
            var_order=["label", "width", "height", "center_x", "center_y"],
        )
        features = ds_lib.Features({"label": ds_lib.Sequence(label)})
        model = ConcateAuxilaryTaskAutoreg(
            features=features, tokenizer=tok, d_model=D_MODEL,
            decoder_d_model=D_MODEL, auxilary_task="uncond",
            use_flag_embedding=True,
        )
        torch.save(model.state_dict(),
                   os.path.join(jdir, "gen_final_model.pt"))
    finally:
        os.chdir(cwd)
    with open(os.path.join(jdir, "config.yaml"), "w") as f:
        f.write(f"""dataset:
  name: pku10
  data_dir: {dump}
  max_seq_length: 10
generator:
  _target_: image2layout.train.models.autoreg.ConcateAuxilaryTaskAutoreg
  d_model: {D_MODEL}
  auxilary_task: uncond
tokenizer:
  num_bin: {NUM_BIN}
""")
    return root


def test_scan_and_convert_then_infer(tmp_path):
    root = _fabricate_cache(tmp_path)
    env = cli_subprocess_env()
    manifest_path = str(tmp_path / "readiness.json")
    r = subprocess.run(
        [sys.executable, "scripts/ingest_reference_artifacts.py",
         "--scan", root, "--out", manifest_path],
        capture_output=True, text=True, env=env, timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, f"--- stdout ---\n{r.stdout[-2000:]}\n--- stderr ---\n{r.stderr[-3000:]}"
    with open(manifest_path) as f:
        manifest = json.load(f)
    assert manifest["_summary"]["ready"], manifest
    assert manifest["dataset_parquet"]["datasets"]["pku10"]["train_rows"] == 8
    weights = manifest["tower_weights"]["weights"]
    kinds = {v["kind"] for v in weights.values()}
    assert "resnet50_trunk" in kinds and "fidnet(num_labels=3)" in kinds
    assert manifest["relationships_pt"]["entries"] == 1
    assert manifest["retrieval_tables"]["rows_first"] == 2
    job = manifest["training_logs"]["jobs"]["autoreg_pku10_uncond"]
    assert job["experiment"] == "autoreg"

    # the converted job dir IS a ralf_tpu job: cli.inference restores the
    # orbax checkpoint written from the reference state_dict and decodes
    out_job = os.path.join(root, "converted_jobs", "autoreg_pku10_uncond")
    assert os.path.isdir(os.path.join(out_job, "ckpt_final"))
    r = subprocess.run(
        [sys.executable, "-m", "ralf_tpu.cli.inference",
         "--job-dir", out_job, "--cond", "uncond", "--split", "test",
         "--num-seeds", "1", "--batch-size", "2"],
        capture_output=True, text=True, env=env, timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]
    with open(os.path.join(out_job, "generated_samples_uncond",
                           "test_0.pkl"), "rb") as f:
        data = pickle.load(f)
    assert data["results"], "converted reference checkpoint produced no layouts"
