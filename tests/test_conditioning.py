"""Task-conditioning invariants: masked cond sequences, constraint
serialization, and the collapsed forced-token restriction."""

import numpy as np
import pytest

from ralf_tpu.core.conditioning import (
    MASK_ID,
    Condition,
    ConstraintVocabulary,
    build_constraint_sequence,
    build_forced_tokens,
    get_condition,
)
from ralf_tpu.core.layout import random_layout
from ralf_tpu.core.tokenizer import LayoutSequenceTokenizer, TokenizerConfig

S = 10


@pytest.fixture
def tok():
    return LayoutSequenceTokenizer(
        TokenizerConfig(num_labels=3, max_seq_length=S, num_bin=16)
    )


def make_batch(tok, B=6, seed=0):
    rng = np.random.default_rng(seed)
    layout = random_layout(rng, B, S, tok.N_label)
    image = np.zeros((B, 8, 8, 4), np.float32)
    return layout, image, rng


def test_uncond_condition(tok):
    layout, image, rng = make_batch(tok)
    cond, target = get_condition(layout, image, "uncond", tok, rng)
    assert cond.seq is None
    forced = build_forced_tokens(cond, tok)
    assert (forced == MASK_ID).all()


def test_c_condition_keeps_labels_only(tok):
    layout, image, rng = make_batch(tok)
    cond, _ = get_condition(layout, image, "c", tok, rng)
    enc = np.asarray(tok.encode(layout)["seq"])
    n = np.asarray(layout.num_elements())
    B = enc.shape[0]
    for b in range(B):
        for e in range(n[b]):
            p = 1 + 5 * e
            assert cond.seq[b, p] == enc[b, p]  # label kept
            assert (cond.seq[b, p + 1 : p + 5] == MASK_ID).all()  # geo masked
        if n[b] < S:
            assert cond.seq[b, 1 + 5 * n[b]] == tok.eos_id  # EOS kept (label slot)
            assert (cond.seq[b, 2 + 5 * n[b] :] == tok.pad_id).all()


def test_forced_tokens_c_task(tok):
    layout, image, rng = make_batch(tok)
    cond, _ = get_condition(layout, image, "c", tok, rng)
    forced = build_forced_tokens(cond, tok)
    n = np.asarray(layout.num_elements())
    lab = np.asarray(layout.label)
    B = forced.shape[0]
    for b in range(B):
        for e in range(n[b]):
            assert forced[b, 5 * e] == lab[b, e]  # label forced
            assert (forced[b, 5 * e + 1 : 5 * e + 5] == MASK_ID).all()
        # everything at/after the EOS slot forces EOS
        if n[b] < S:
            assert (forced[b, 5 * n[b] :] == tok.eos_id).all()


def test_forced_tokens_refinement_only_label_slots(tok):
    layout, image, rng = make_batch(tok)
    cond, target = get_condition(layout, image, "refinement", tok, rng)
    # geometry got perturbed but stays in range and masked-out stays 0
    assert float(np.abs(np.asarray(target.center_x) - np.asarray(layout.center_x)).max()) < 0.1
    forced = build_forced_tokens(cond, tok)
    free_slots = np.arange(tok.max_token_length) % 5 != 0
    assert (forced[:, free_slots] == MASK_ID).all()


def test_forced_tokens_partial_seeds_first_element(tok):
    layout, image, rng = make_batch(tok)
    cond, _ = get_condition(layout, image, "partial", tok, rng)
    forced = build_forced_tokens(cond, tok)
    enc = np.asarray(tok.encode(layout)["seq"])
    assert (forced[:, :5] == enc[:, 1:6]).all()
    assert (forced[:, 5:] == MASK_ID).all()


@pytest.mark.parametrize("task", ["uncond", "c", "cwh", "partial", "refinement", "relation"])
def test_constraint_sequence_structure(tok, task):
    layout, image, rng = make_batch(tok)
    cond, _ = get_condition(layout, image, task, tok, rng)
    vocab = ConstraintVocabulary(tok)
    seq, mask = build_constraint_sequence(cond, vocab, rng)
    assert seq.shape == (6, vocab.const_len(task))
    assert seq.shape == mask.shape
    # head: bos, task token, end_of_task
    from ralf_tpu.core.conditioning import TASK_OF
    assert (seq[:, 0] == tok.bos_id).all()
    assert (seq[:, 1] == vocab.id(TASK_OF[task])).all()
    assert (seq[:, 2] == vocab.id("end_of_task")).all()
    # exactly one EOS per row; everything after it is pad
    for b in range(6):
        eos_pos = np.nonzero(seq[b] == tok.eos_id)[0]
        assert len(eos_pos) == 1
        assert (seq[b, eos_pos[0] + 1 :] == tok.pad_id).all()
        assert mask[b, eos_pos[0]] and not mask[b, eos_pos[0] + 1 :].any()


def test_constraint_sequence_c_contains_all_labels(tok):
    layout, image, rng = make_batch(tok)
    cond, _ = get_condition(layout, image, "c", tok, rng)
    vocab = ConstraintVocabulary(tok)
    seq, _ = build_constraint_sequence(cond, vocab, rng)
    n = np.asarray(layout.num_elements())
    lab = np.asarray(layout.label)
    sep = vocab.id("sep")
    for b in range(6):
        body = seq[b, 3:]
        body = body[(body != tok.pad_id) & (body != tok.eos_id) & (body != sep)]
        assert sorted(body.tolist()) == sorted(lab[b, : n[b]].tolist())


def test_relation_clauses_present(tok):
    layout, image, rng = make_batch(tok, B=4, seed=3)
    cond, _ = get_condition(layout, image, "relation", tok, rng)
    assert cond.edges is not None and cond.relations is not None
    vocab = ConstraintVocabulary(tok)
    seq, _ = build_constraint_sequence(cond, vocab, rng)
    rel_sep = vocab.id("relation_sep")
    assert (np.sum(seq == rel_sep, axis=1) == 1).all()


def test_gt_task_is_copy_through_for_ar():
    """'gt' (reference task.py:24 'just copy') has no PREPROCESSOR entry in
    the reference registry; the AR mapping here is: uncondition constraint
    head + every body token forced, so greedy decode reproduces the GT."""
    import numpy as np

    from ralf_tpu.core.conditioning import (
        build_forced_tokens,
        get_condition,
    )
    from ralf_tpu.core.layout import random_layout
    from ralf_tpu.core.tokenizer import LayoutSequenceTokenizer, TokenizerConfig

    tok = LayoutSequenceTokenizer(
        TokenizerConfig(num_labels=3, max_seq_length=10, num_bin=16)
    )
    rng = np.random.default_rng(0)
    lay = random_layout(rng, 2, 10, 3)
    img = np.zeros((2, 8, 8, 4), np.float32)
    cond, _ = get_condition(lay, img, "gt", tok, rng)
    forced = build_forced_tokens(cond, tok)
    enc = tok.encode(lay)
    body = np.asarray(enc["seq"])[:, 1:]
    want = np.where(body == tok.pad_id, tok.eos_id, body)
    np.testing.assert_array_equal(forced, want)
