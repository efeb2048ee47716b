"""Beam search over the cached multimodal prefix (reference generate
surface: HF GenerationMixin beam search via models/vlm/base_vlm.py:32-108,
generate/generate_batch prismatic.py:1195-1295).

The core parity test cross-checks the scan/KV-gather implementation against
an independent cache-FREE numpy beam search: every candidate's next-token
distribution is recomputed by a full teacher-forced forward (prefill over
[prefix ; tokens]), so a bug in the in-scan cache parent-regather or
cache_len bookkeeping cannot cancel out.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mla_tpu.models import mla as mla_mod
from mla_tpu.models import prismatic

from tiny import tiny_config, tiny_model


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params, state = tiny_model(cfg)
    rng = np.random.default_rng(0)
    img = {"front_image": jnp.asarray(np.concatenate(
        [rng.normal(size=(1, 3, cfg.vision.image_size, cfg.vision.image_size)),
         np.ones((1, 1, cfg.vision.image_size, cfg.vision.image_size))], axis=1
    ).astype(np.float32))}
    pc = jnp.asarray(rng.uniform(-0.3, 0.7, size=(1, cfg.point.input_points, 3)).astype(np.float32))
    ids = jnp.asarray(np.array([[1, 500, 600, 700, 29871]], np.int32))
    prefix = mla_mod.build_prefix_embeds(params, state, cfg, ids, img, pc)
    return cfg, params, state, prefix, img, pc, ids


def _forced_logits(cfg, params, prefix, toks):
    """Cache-free next-token logits after teacher-forcing `toks`."""
    decoder = prismatic.get_decoder(cfg)
    emb = prefix
    if toks:
        temb = decoder.embed_tokens(
            params["llm_backbone"], jnp.asarray([toks], jnp.int32)
        )
        emb = jnp.concatenate([emb, temb.astype(emb.dtype)], axis=1)
    _, last = mla_mod.prefill(params, cfg, emb, emb.shape[1] + 1)
    return np.asarray(last[0], np.float32)


def _np_log_softmax(x):
    x = x - x.max()
    return x - np.log(np.exp(x).sum())


def _np_beam_search(cfg, params, prefix, num_tokens, K, eos, penalty=1.0):
    """Independent reference: list-of-hypotheses beam search, cache-free
    forwards, same finished-beam semantics (extend with EOS at log-prob 0)."""
    logp = _np_log_softmax(_forced_logits(cfg, params, prefix, []))
    first = np.argsort(-logp)[:K]
    beams = [([int(t)], float(logp[int(t)]), int(t) == eos, 1) for t in first]
    for _ in range(1, num_tokens):
        cand = []
        for toks, sc, fin, ln in beams:
            if fin:
                cand.append((toks + [eos], sc, True, ln))
                continue
            lp = _np_log_softmax(_forced_logits(cfg, params, prefix, toks))
            for v in np.argsort(-lp)[: K + 1]:  # top K+1 suffice for top-K overall
                cand.append((toks + [int(v)], sc + float(lp[int(v)]), int(v) == eos, ln + 1))
        cand.sort(key=lambda c: -c[1])
        beams = cand[:K]
    return max(beams, key=lambda c: c[1] / c[3] ** penalty)


def _run_beam(cfg, params, prefix, num_tokens, K, eos, penalty=1.0):
    kv, last = mla_mod.prefill(params, cfg, prefix, prefix.shape[1] + num_tokens + 1)
    toks, scores = mla_mod.beam_search_decode(
        params, cfg, kv, prefix.shape[1], last, num_tokens,
        num_beams=K, eos_id=eos, length_penalty=penalty,
    )
    return np.asarray(toks[0]), float(scores[0])


def test_beam_k1_equals_greedy(setup):
    cfg, params, state, prefix, *_ = setup
    kv, last = mla_mod.prefill(params, cfg, prefix, prefix.shape[1] + 5)
    greedy, _ = mla_mod.greedy_decode_actions(params, cfg, kv, prefix.shape[1], last, 4)
    kv2, last2 = mla_mod.prefill(params, cfg, prefix, prefix.shape[1] + 5)
    beam, score = mla_mod.beam_search_decode(
        params, cfg, kv2, prefix.shape[1], last2, 4, num_beams=1, eos_id=-1
    )
    np.testing.assert_array_equal(np.asarray(greedy[0]), np.asarray(beam[0]))
    assert np.isfinite(score)


def test_beam_matches_cache_free_reference(setup):
    """K=3, T=4 beam against the independent numpy implementation — ids
    must match exactly, penalized score to fp tolerance."""
    cfg, params, state, prefix, *_ = setup
    toks, score = _run_beam(cfg, params, prefix, num_tokens=4, K=3, eos=-1)
    ref_toks, ref_sc, _, ref_len = _np_beam_search(cfg, params, prefix, 4, 3, eos=-1)
    np.testing.assert_array_equal(toks, np.asarray(ref_toks))
    assert abs(score - ref_sc / ref_len) < 2e-4, (score, ref_sc / ref_len)


def test_beam_eos_freezes_score_and_pads(setup):
    """Pick the greedy 2nd token as EOS so a beam finishes mid-decode: the
    finished beam must pad with EOS, keep its score frozen, and count length
    up to (and including) the first EOS. Cross-checked against the numpy
    reference under the same eos id."""
    cfg, params, state, prefix, *_ = setup
    kv, last = mla_mod.prefill(params, cfg, prefix, prefix.shape[1] + 6)
    greedy, _ = mla_mod.greedy_decode_actions(params, cfg, kv, prefix.shape[1], last, 2)
    eos = int(np.asarray(greedy[0])[1])
    toks, score = _run_beam(cfg, params, prefix, num_tokens=5, K=3, eos=eos)
    ref_toks, ref_sc, ref_fin, ref_len = _np_beam_search(
        cfg, params, prefix, 5, 3, eos=eos
    )
    np.testing.assert_array_equal(toks, np.asarray(ref_toks))
    assert abs(score - ref_sc / ref_len) < 2e-4
    if ref_fin:
        first_eos = list(ref_toks).index(eos)
        assert all(t == eos for t in ref_toks[first_eos:])


def test_beam_length_penalty_changes_selection_consistently(setup):
    """length_penalty re-ranks identically in both implementations."""
    cfg, params, state, prefix, *_ = setup
    kv, last = mla_mod.prefill(params, cfg, prefix, prefix.shape[1] + 6)
    greedy, _ = mla_mod.greedy_decode_actions(params, cfg, kv, prefix.shape[1], last, 2)
    eos = int(np.asarray(greedy[0])[1])
    for penalty in (0.5, 2.0):
        toks, score = _run_beam(cfg, params, prefix, 5, 3, eos=eos, penalty=penalty)
        ref_toks, ref_sc, _, ref_len = _np_beam_search(
            cfg, params, prefix, 5, 3, eos=eos, penalty=penalty
        )
        np.testing.assert_array_equal(toks, np.asarray(ref_toks))
        assert abs(score - ref_sc / ref_len**penalty) < 2e-4


def test_beam_batched_rows_independent(setup):
    """[B=2] beam search must equal two independent B=1 runs (the flattened
    [B*K] batch axis and the per-row parent gather must not cross rows)."""
    cfg, params, state, prefix, img, pc, ids = setup
    rng = np.random.default_rng(7)
    img2 = {"front_image": jnp.asarray(np.concatenate(
        [rng.normal(size=(1, 3, cfg.vision.image_size, cfg.vision.image_size)),
         np.ones((1, 1, cfg.vision.image_size, cfg.vision.image_size))], axis=1
    ).astype(np.float32))}
    pc2 = jnp.asarray(rng.uniform(-0.3, 0.7, size=(1, cfg.point.input_points, 3)).astype(np.float32))
    prefix2 = mla_mod.build_prefix_embeds(params, state, cfg, ids, img2, pc2)

    both = jnp.concatenate([prefix, prefix2], axis=0)
    kv, last = mla_mod.prefill(params, cfg, both, both.shape[1] + 5)
    toks_b, scores_b = mla_mod.beam_search_decode(
        params, cfg, kv, both.shape[1], last, 4, num_beams=3, eos_id=-1
    )
    for row, pfx in ((0, prefix), (1, prefix2)):
        t_solo, s_solo = _run_beam(cfg, params, pfx, 4, 3, eos=-1)
        np.testing.assert_array_equal(np.asarray(toks_b[row]), t_solo)
        assert abs(float(scores_b[row]) - s_solo) < 2e-4


def test_generate_text_beam_and_batch(setup):
    """Policy surface: generate_text(num_beams>1) and generate_text_batch
    run end-to-end; batch grouping by prompt length returns per-row results
    identical to solo calls."""
    from mla_tpu.vla.tokenizer import SimpleTokenizer

    cfg, params, state, prefix, img, pc, ids = setup
    stats = {"rlbench": {"action": {"q01": [-1.0] * 7, "q99": [1.0] * 7},
                         "proprio": {"q01": [-1.0] * 7, "q99": [1.0] * 7}}}
    pol = mla_mod.MLAPolicy(params, state, cfg, tokenizer=SimpleTokenizer(),
                            norm_stats=stats, num_ddim_steps=2)
    rng = np.random.default_rng(0)
    imgs = [np.concatenate(
        [rng.normal(size=(3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32),
         np.ones((1, cfg.vision.image_size, cfg.vision.image_size), np.float32)]
    ) for _ in range(3)]
    pcs = [rng.uniform(-0.3, 0.7, size=(cfg.point.input_points, 3)).astype(np.float32)
           for _ in range(3)]
    prompts = ["close the box", "open drawer", "close the box now"]

    solo_beam = pol.generate_text(imgs[0], pcs[0], prompts[0], max_new_tokens=4,
                                  num_beams=3)
    assert isinstance(solo_beam, str)
    # greedy (K=1) and beam (K=3) both produce well-formed output
    solo_greedy = pol.generate_text(imgs[0], pcs[0], prompts[0], max_new_tokens=4)
    assert isinstance(solo_greedy, str)

    batched = pol.generate_text_batch(imgs, pcs, prompts, max_new_tokens=4,
                                      num_beams=3)
    assert len(batched) == 3
    for i in range(3):
        assert batched[i] == pol.generate_text(
            imgs[i], pcs[i], prompts[i], max_new_tokens=4, num_beams=3
        ), i
    # sampling path still works through the same entry point
    s = pol.generate_text(imgs[0], pcs[0], prompts[0], max_new_tokens=4,
                          temperature=0.8, top_k=5, seed=3)
    assert isinstance(s, str)
    with pytest.raises(ValueError):
        pol.generate_text(imgs[0], pcs[0], prompts[0], num_beams=2, temperature=0.5)
