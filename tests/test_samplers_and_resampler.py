"""SplitModalitySampler, LM collator, and the loss-second-moment resampler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mla_tpu.diffusion import timestep_sampler as ts
from mla_tpu.vla.sampler import PaddedCollatorForLanguageModeling, SplitModalitySampler


def test_split_modality_sampler_batches_single_modality():
    # 32 multimodal (even idx) + 32 language-only (odd idx)
    lens = [(i % 2 == 0, 10 + i % 7) for i in range(64)]
    s = SplitModalitySampler(lens, global_batch_size=8, num_replicas=2, rank=0, seed=0)
    idxs = list(iter(s))
    # every global batch must be modality-pure
    all_idx = list(SplitModalitySampler(lens, 8, 1, 0, seed=0))
    for b in range(0, len(all_idx), 8):
        batch = all_idx[b : b + 8]
        mods = {lens[i][0] for i in batch}
        assert len(mods) == 1, batch
    # replica sharding: rank0 + rank1 partition each batch
    s1 = SplitModalitySampler(lens, 8, 2, 1, seed=0)
    assert set(idxs).isdisjoint(set(iter(s1)))
    assert len(idxs) == len(list(iter(s1)))


def test_split_modality_sampler_no_drop_keeps_batches_pure_and_aligned():
    """drop_last=False pads short remainder batches to the full stride by
    cycling their rows — a short batch in the flat list would misalign every
    later fixed-stride window (mixed-modality 'global batches', replicas
    straddling logical batches)."""
    # 33 multimodal + 13 language-only: both groups leave remainders
    lens = [(i < 33, 10 + i % 7) for i in range(46)]
    s = SplitModalitySampler(lens, global_batch_size=8, num_replicas=1, rank=0,
                             seed=0, drop_last=False)
    flat = list(iter(s))
    assert len(flat) % 8 == 0
    assert set(flat) == set(range(46))  # no example dropped
    for b in range(0, len(flat), 8):
        batch = flat[b : b + 8]
        assert len({lens[i][0] for i in batch}) == 1, batch
    # replica partition still holds with padding
    r0 = list(iter(SplitModalitySampler(lens, 8, 2, 0, seed=0, drop_last=False)))
    r1 = list(iter(SplitModalitySampler(lens, 8, 2, 1, seed=0, drop_last=False)))
    assert len(r0) == len(r1)
    for b in range(0, len(r0), 4):
        assert len({lens[i][0] for i in r0[b : b + 4] + r1[b : b + 4]}) == 1


def test_split_modality_sampler_epoch_determinism():
    lens = [(True, i) for i in range(32)]
    a = SplitModalitySampler(lens, 8, 1, 0, seed=3)
    b = SplitModalitySampler(lens, 8, 1, 0, seed=3)
    assert list(iter(a)) == list(iter(b))
    a.set_epoch(1)
    assert list(iter(a)) != list(iter(b))


def test_lm_collator():
    coll = PaddedCollatorForLanguageModeling(max_length=16)
    inst = [
        {"input_ids": [1, 5, 6], "labels": [-100, 5, 6], "pixel_values": np.zeros((3, 4, 4))},
        {"input_ids": [1, 7], "labels": [-100, 7], "pixel_values": None},
    ]
    batch = coll(inst)
    assert batch["input_ids"].shape == (2, 16)
    assert list(batch["multimodal_indices"]) == [0]
    assert batch["pixel_values"].shape == (1, 3, 4, 4)


def test_uniform_sampler():
    t, w = ts.uniform_sample(jax.random.PRNGKey(0), 64, 100)
    assert t.shape == (64,) and (np.asarray(t) >= 0).all() and (np.asarray(t) < 100).all()
    np.testing.assert_allclose(np.asarray(w), 1.0)


def test_loss_second_moment_resampler_warmup_and_bias():
    T, H = 10, 3
    state = ts.init_loss_second_moment_state(T, H)
    key = jax.random.PRNGKey(0)
    # before warm-up: uniform
    t, w = ts.loss_second_moment_sample(state, key, 1000)
    counts = np.bincount(np.asarray(t), minlength=T)
    assert counts.min() > 50  # roughly uniform

    # feed history: timestep 0 has huge loss, others tiny
    for i in range(H):
        tt = jnp.arange(T)
        losses = jnp.where(tt == 0, 10.0, 0.01)
        state = ts.update_loss_second_moment(state, tt, losses)
    assert bool(jnp.all(state["loss_counts"] == H))
    t2, w2 = ts.loss_second_moment_sample(state, key, 2000)
    counts2 = np.bincount(np.asarray(t2), minlength=T)
    assert counts2[0] > 1500  # heavily biased toward the high-loss bin
    # importance weights compensate: weight of common bin is small
    assert float(w2[np.asarray(t2) == 0].mean()) < 0.5
