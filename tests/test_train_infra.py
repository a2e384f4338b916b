"""Training infrastructure: schedulers, optimizer param groups, checkpoint
resume, int8-KV decode CPU path."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ralf_tpu.core.layout import random_layout
from ralf_tpu.core.sampling import SamplingConfig
from ralf_tpu.core.tokenizer import LayoutSequenceTokenizer, TokenizerConfig
from ralf_tpu.data.dataset import BatchLoader, DatasetConfig, SyntheticPosterDataset
from ralf_tpu.models.autoreg import AutoregGenerator
from ralf_tpu.models.base import GeneratorConfig
from ralf_tpu.train.optim import build_optimizer, lr_group_labels, set_learning_rate
from ralf_tpu.train.schedulers import (
    DSGANScheduler,
    MultiStepLRScheduler,
    ReduceLROnPlateauScheduler,
    VoidScheduler,
)
from ralf_tpu.train.trainer import Trainer, TrainConfig

S, HW = 10, (64, 48)
TINY = GeneratorConfig(d_model=32, nhead=4, num_encoder_layers=1,
                       num_decoder_layers=1, dim_feedforward=64,
                       backbone="resnet18")


def test_schedulers():
    ms = MultiStepLRScheduler(epochs=100, milestones=[0.5, 0.9], gamma=0.1)
    assert ms.scale(10) == 1.0
    assert ms.scale(50) == 0.1
    assert ms.scale(95) == 0.01 - 0 or abs(ms.scale(95) - 0.01) < 1e-12

    # reference-actual behavior: the tensor-milestones bug in
    # `schedulers/dsgan.py:22` means torch never applies gamma — DS-GAN
    # trains at constant LR (A/B'd in tests/test_optim_torch_parity.py)
    ds = DSGANScheduler(epochs=300, network="generator")
    assert ds.scale(0) == 1.0 and ds.scale(299) == 1.0
    # the stair the code intended remains available, with torch's
    # milestone-0 quirk (one gamma from epoch 0)
    ds2 = DSGANScheduler(epochs=300, network="generator", intended_stair=True)
    assert abs(ds2.scale(0) - 0.8) < 1e-12
    assert abs(ds2.scale(50) - 0.64) < 1e-12
    assert abs(ds2.scale(100) - 0.512) < 1e-12

    pl = ReduceLROnPlateauScheduler(factor=0.5, patience=1)
    scales = [pl.scale(e, metric=1.0) for e in range(5)]  # flat -> reduce
    assert scales[0] == 1.0 and scales[-1] < 1.0

    assert VoidScheduler().scale(7) == 1.0


def test_optimizer_groups_and_lr_injection():
    tok = LayoutSequenceTokenizer(TokenizerConfig(num_labels=3, max_seq_length=S, num_bin=16))
    gen = AutoregGenerator(tok, TINY, "uncond", image_hw=HW)
    variables = gen.init(jax.random.PRNGKey(0))
    labels = lr_group_labels(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(labels)
    groups = {v for _, v in flat}
    assert "trunk" in groups and "rest" in groups
    # every resnet trunk leaf labeled trunk
    for path, v in flat:
        p = "/".join(getattr(k, "key", str(k)) for k in path)
        if "/trunk/" in f"/{p}/":
            assert v == "trunk", p

    tx = build_optimizer(variables["params"], base_lr=1e-3)
    opt_state = tx.init(variables["params"])
    opt_state2 = set_learning_rate(opt_state, 5e-4)
    # lr actually changed in the 'rest' branch
    def find_lr(st):
        found = []
        def visit(s):
            if hasattr(s, "inner_states"):
                for label, sub in s.inner_states.items():
                    if hasattr(sub.inner_state, "hyperparams"):
                        found.append((label, float(sub.inner_state.hyperparams["learning_rate"])))
            return s
        if isinstance(st, tuple) and not hasattr(st, "_fields"):
            for s in st:
                visit(s)
        else:
            visit(st)
        return dict(found)

    lrs = find_lr(opt_state2)
    assert abs(lrs["rest"] - 5e-4) < 1e-9
    assert abs(lrs["trunk"] - 5e-5) < 1e-9


def test_trainer_checkpoint_resume(tmp_path):
    tok = LayoutSequenceTokenizer(TokenizerConfig(num_labels=3, max_seq_length=S, num_bin=16))
    gen = AutoregGenerator(tok, TINY, "uncond", image_hw=HW)
    ds = SyntheticPosterDataset(DatasetConfig(name="synthetic"), size=16, seed=0,
                                image_hw=HW)
    cfg = TrainConfig(epochs=1, batch_size=8, job_dir=str(tmp_path))
    tr = Trainer(gen, cfg)
    state = tr.fit(BatchLoader(ds, 8, seed=0), num_steps_cap=1)
    step0 = int(jax.device_get(state.step))
    restored = tr.restore("final")
    assert int(jax.device_get(restored.step)) == step0
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_kv_quant_decode_cpu_path():
    tok = LayoutSequenceTokenizer(TokenizerConfig(num_labels=3, max_seq_length=S, num_bin=16))
    gen = AutoregGenerator(tok, TINY, "uncond", image_hw=HW)
    variables = gen.init(jax.random.PRNGKey(0))
    memory = jax.random.normal(jax.random.PRNGKey(1), (2, 20, 32))
    forced = jnp.full((2, tok.max_token_length), -1, jnp.int32)
    det = SamplingConfig(name="deterministic")
    a = np.asarray(gen.decode(variables, memory, forced, det, jax.random.PRNGKey(0)))
    b = np.asarray(gen.decode(variables, memory, forced, det, jax.random.PRNGKey(0),
                              kv_quant=True))
    # int8 KV is a mild perturbation: most greedy tokens agree on CPU too
    assert (a == b).mean() > 0.6


def test_attend_shared_matches_attend_t():
    """Weight-folded shared-memory cross-attention (the decode default) is
    mathematically identical to attending over projected K/V caches: the K
    bias cancels in softmax, the V bias rides through sum(p)=1."""
    from ralf_tpu.models.nn import MultiHeadAttention

    mha = MultiHeadAttention(d_model=32, nhead=4, dropout=0.0)
    q_in = jax.random.normal(jax.random.PRNGKey(0), (3, 1, 32))
    mem = jax.random.normal(jax.random.PRNGKey(1), (3, 20, 32))
    variables = mha.init(jax.random.PRNGKey(2), q_in, mem)

    def split_path(v, q_in, mem):
        k_t, v_t = mha.apply(v, mem, method=MultiHeadAttention.project_kv_t)
        return mha.apply(v, q_in, k_t, v_t, method=MultiHeadAttention.attend_t)

    def shared_path(v, q_in, mem):
        return mha.apply(v, q_in, mem, method=MultiHeadAttention.attend_shared)

    a = np.asarray(split_path(variables, q_in, mem))
    b = np.asarray(shared_path(variables, q_in, mem))
    np.testing.assert_allclose(a, b, atol=2e-5)

    # and with a key-keep bias (einsum fallback branch)
    keep = jnp.asarray(np.random.default_rng(0).random((3, 20)) > 0.3)
    from ralf_tpu.models.nn import keep_to_bias

    bias = keep_to_bias(keep)[:, None, :]
    a = np.asarray(mha.apply(variables, q_in, *mha.apply(
        variables, mem, method=MultiHeadAttention.project_kv_t),
        bias, method=MultiHeadAttention.attend_t))
    b = np.asarray(mha.apply(variables, q_in, mem, bias,
                             method=MultiHeadAttention.attend_shared))
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_attend_shared_q8_close_to_shared():
    """int8 shared-memory attention (one quantized copy for all layers)
    approximates the bf16 shared path within quantization error, and the
    (mem_i8, scale) operand routes correctly through attend_t_any."""
    from ralf_tpu.models.nn import MultiHeadAttention
    from ralf_tpu.ops.pallas.decode_attention import quantize_shared_memory

    mha = MultiHeadAttention(d_model=32, nhead=4, dropout=0.0)
    q_in = jax.random.normal(jax.random.PRNGKey(0), (3, 1, 32))
    mem = jax.random.normal(jax.random.PRNGKey(1), (3, 20, 32))
    variables = mha.init(jax.random.PRNGKey(2), q_in, mem)

    a = np.asarray(
        mha.apply(variables, q_in, mem, method=MultiHeadAttention.attend_shared)
    )
    mi, sc = quantize_shared_memory(mem)
    assert mi.dtype == jnp.int8 and sc.shape == (3, 20)
    # per-token dequantization error bound of the memory itself
    np.testing.assert_allclose(
        np.asarray(mi, np.float32) * np.asarray(sc)[:, :, None],
        np.asarray(mem), atol=float(np.max(np.asarray(sc))) * 0.51,
    )
    b = np.asarray(
        mha.apply(variables, q_in, (mi, sc), method=MultiHeadAttention.attend_t_any)
    )
    np.testing.assert_allclose(a, b, atol=0.02, rtol=0.02)


def test_decode_mem_quant_cpu_path():
    """ar_decode with kv_quant now routes through the int8 SHARED memory;
    greedy decodes stay close to the bf16 shared path."""
    tok = LayoutSequenceTokenizer(TokenizerConfig(num_labels=3, max_seq_length=S, num_bin=16))
    gen = AutoregGenerator(tok, TINY, "uncond", image_hw=HW)
    variables = gen.init(jax.random.PRNGKey(0))
    memory = jax.random.normal(jax.random.PRNGKey(1), (2, 20, 32))
    forced = jnp.full((2, tok.max_token_length), -1, jnp.int32)
    det = SamplingConfig(name="deterministic")
    a = np.asarray(gen.decode(variables, memory, forced, det, jax.random.PRNGKey(0)))
    b = np.asarray(gen.decode(variables, memory, forced, det, jax.random.PRNGKey(0),
                              kv_quant=True))
    assert (a == b).mean() > 0.6


def test_hybrid_dcn_mesh_matches_flat_mesh():
    """make_hybrid_mesh: batch shards over (dcn, data) jointly; a train
    step under the hybrid mesh reproduces the flat-mesh loss bit-for-bit
    on identical data/init (VERDICT r1 #7 — multi-slice DCN axis)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from ralf_tpu.parallel.mesh import (
        DCN_AXIS,
        batch_sharding,
        make_hybrid_mesh,
        make_mesh,
    )

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")

    hmesh = make_hybrid_mesh((2, 2), num_slices=2)
    assert hmesh.axis_names == (DCN_AXIS, "data", "gallery")
    assert dict(hmesh.shape) == {"dcn": 2, "data": 2, "gallery": 2}
    sh = batch_sharding(hmesh)
    assert sh.spec == P(("dcn", "data"))
    x = jnp.arange(8 * 3, dtype=jnp.float32).reshape(8, 3)
    xs = jax.device_put(x, sh)
    # 4-way batch split (dcn*data), replicated over gallery
    assert len(xs.sharding.device_set) == 8
    assert xs.addressable_shards[0].data.shape == (2, 3)

    # psum over the joint axes equals the global batch sum
    @jax.jit
    def total(v):
        return v.sum()

    np.testing.assert_allclose(float(total(xs)), float(x.sum()), rtol=1e-6)

    flat = make_mesh((4, 2))
    xf = jax.device_put(x, batch_sharding(flat))
    np.testing.assert_allclose(float(total(xf)), float(total(xs)), rtol=1e-6)


def test_trainer_mid_epoch_step_resume(tmp_path):
    # save_every_steps writes a rolling "step" checkpoint + meta;
    # fit(resume=True) skips completed epochs AND the already-trained
    # batches of the interrupted epoch (the reference restarts from
    # scratch on failure — SURVEY §5)
    tok = LayoutSequenceTokenizer(
        TokenizerConfig(num_labels=3, max_seq_length=S, num_bin=16)
    )
    gen = AutoregGenerator(tok, TINY, "uncond", image_hw=HW)
    ds = SyntheticPosterDataset(DatasetConfig(name="synthetic"), size=16, seed=0,
                                image_hw=HW)

    cfg1 = TrainConfig(epochs=1, batch_size=8, job_dir=str(tmp_path),
                       save_every_steps=2)
    tr1 = Trainer(gen, cfg1)
    state1 = tr1.fit(BatchLoader(ds, 8, seed=0), num_steps_cap=2)
    assert int(jax.device_get(state1.step)) == 2
    meta = tr1._load_step_meta()
    assert meta == {"epoch": 1, "step_in_epoch": 2, "global_step": 2}

    # "crash" and resume with a 2-epoch budget: epoch 1 is already done
    # (skip_steps == cap), so only epoch 2's two steps run
    cfg2 = TrainConfig(epochs=2, batch_size=8, job_dir=str(tmp_path),
                       save_every_steps=2)
    tr2 = Trainer(gen, cfg2)
    state2 = tr2.fit(BatchLoader(ds, 8, seed=0), num_steps_cap=2, resume=True)
    assert int(jax.device_get(state2.step)) == 4
    meta2 = tr2._load_step_meta()
    assert meta2["global_step"] == 4 and meta2["epoch"] == 2

    # time-based cadence: every save is due with save_every_secs=0-ish
    cfg3 = TrainConfig(epochs=1, batch_size=8, job_dir=str(tmp_path / "t"),
                       save_every_secs=1e-9)
    tr3 = Trainer(gen, cfg3)
    tr3.fit(BatchLoader(ds, 8, seed=0), num_steps_cap=1)
    assert tr3._load_step_meta() is not None
