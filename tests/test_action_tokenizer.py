import numpy as np
import pytest

from mla_tpu.vla.action_tokenizer import ActionTokenizer


@pytest.fixture
def tok():
    return ActionTokenizer(vocab_size=32000)


def test_encode_range(tok):
    a = np.array([-1.0, -0.5, 0.0, 0.5, 1.0])
    ids = tok.encode_to_ids(a)
    # last 256 ids of the vocab: digitize on 256 bin edges gives [1, 256]
    assert ids.min() >= 32000 - 256
    assert ids.max() <= 32000 - 1
    # monotone: larger action -> larger digitized index -> smaller token id
    assert (np.diff(ids) < 0).all()


def test_roundtrip_within_bin_width(tok):
    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, size=(64, 7))
    ids = tok.encode_to_ids(a)
    back = tok.decode_token_ids_to_actions(ids)
    bin_width = 2.0 / 255
    assert np.abs(back - a).max() <= bin_width


def test_clipping(tok):
    ids = tok.encode_to_ids(np.array([-5.0, 5.0]))
    back = tok.decode_token_ids_to_actions(ids)
    assert back[0] == pytest.approx(tok.bin_centers[0])
    assert back[1] == pytest.approx(tok.bin_centers[-1])


def test_matches_reference_formula(tok):
    """Golden numerics vs the reference formulas (vla/action_tokenizer.py)."""
    a = np.linspace(-1, 1, 13)
    bins = np.linspace(-1, 1, 256)
    centers = (bins[:-1] + bins[1:]) / 2
    expect_ids = 32000 - np.digitize(np.clip(a, -1, 1), bins)
    np.testing.assert_array_equal(tok.encode_to_ids(a), expect_ids)
    disc = np.clip(32000 - expect_ids - 1, 0, 254)
    np.testing.assert_allclose(tok.decode_token_ids_to_actions(expect_ids), centers[disc])


def test_begin_idx(tok):
    assert tok.action_token_begin_idx == 32000 - 257
    assert tok.vocab_size == 256
