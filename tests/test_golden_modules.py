"""Golden parity tests: run the REFERENCE torch modules (imported from
/root/reference with unavailable deps stubbed) and compare our JAX rebuilds
through the checkpoint converter. This pins both the math and the
state-dict key mapping."""

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _load_ref_module(name: str, path: str, stubs=()):
    import importlib.machinery

    def _stub_getattr(attr):
        if attr.startswith("__"):
            raise AttributeError(attr)
        return types.SimpleNamespace()

    for s in stubs:
        if s not in sys.modules:
            stub = types.ModuleType(s)
            stub.__spec__ = importlib.machinery.ModuleSpec(s, loader=None)
            stub.__getattr__ = _stub_getattr
            sys.modules[s] = stub
    # wire "from torchvision import transforms"-style attribute access
    for s in stubs:
        if "." in s:
            parent, child = s.rsplit(".", 1)
            if parent in sys.modules:
                setattr(sys.modules[parent], child, sys.modules[s])
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


# --------------------------------------------------------------------------- #
# VisionTokenizer
# --------------------------------------------------------------------------- #


@pytest.fixture(scope="module")
def ref_vision():
    return _load_ref_module(
        "ref_vision_tokenizer",
        "/root/reference/models/mla/image/vision_tokenizer.py",
        stubs=("torchvision", "torchvision.transforms"),
    )


def test_vision_tokenizer_parity(ref_vision):
    from mla_tpu.models import vision_tokenizer as vt
    from mla_tpu.models.convert import convert_vision_tokenizer

    C = 64  # reduced width, same structure (heads=8 divides 64)
    ref = ref_vision.VisionTokenizer(input_size=C)
    ref.eval()

    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 3, 672, 672)).astype(np.float32)
    mask = np.ones((2, 1, 672, 672), np.float32)
    px = torch.tensor(np.concatenate([img, mask], axis=1))

    with torch.no_grad():
        tokens_list, hw_list = ref(px, torch.nn.Identity())
    want = torch.stack(tokens_list).numpy()  # [2, 256, C]

    params = convert_vision_tokenizer(ref.state_dict())
    params = jax.tree_util.tree_map(jnp.asarray, params)
    cfg = vt.VisionTokenizerConfig(hidden_dim=C)
    got = np.asarray(vt.vision_tokenizer(params, jnp.asarray(np.concatenate([img, mask], 1)), cfg))

    assert got.shape == want.shape == (2, 256, C)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


# --------------------------------------------------------------------------- #
# Point tokenizer (Point_PN_scan)
# --------------------------------------------------------------------------- #


@pytest.fixture(scope="module")
def ref_point():
    mod = _load_ref_module(
        "ref_point_pn", "/root/reference/models/mla/pointcloud/backbone/Point_PN.py"
    )

    # replace the stochastic FPS start (torch.randint, Point_PN.py:10) with a
    # deterministic start-at-0 so both sides follow the same trajectory
    def det_fps(xyz, npoint):
        B, N, _ = xyz.shape
        fps_idx = torch.zeros(B, npoint, dtype=torch.long)
        farthest = torch.zeros(B, dtype=torch.long)
        distance = torch.ones(B, N) * 1e10
        for i in range(npoint):
            fps_idx[:, i] = farthest
            centroid = xyz[torch.arange(B), farthest, :].view(B, 1, 3)
            dist = torch.sum((xyz - centroid) ** 2, -1)
            m = dist < distance
            distance[m] = dist[m]
            farthest = torch.max(distance, -1)[1]
        return fps_idx

    mod.furthest_point_sample = det_fps
    return mod


def test_point_tokenizer_parity(ref_point):
    from mla_tpu.models import point_tokenizer as pt
    from mla_tpu.models.convert import convert_point_tokenizer

    # reduced config: 64 points, embed 12 -> stages (24, 48); k=8
    ref = ref_point.Point_PN_scan(
        input_points=64, num_stages=2, embed_dim=12, k_neighbors=8,
        LGA_block=[2, 1], dim_expansion=[2, 2], type="scan",
    )
    ref.eval()

    rng = np.random.default_rng(1)
    pc = rng.uniform(-0.5, 0.5, size=(2, 64, 3)).astype(np.float32)
    x = torch.tensor(pc).transpose(1, 2).contiguous()  # [B,3,N] features=coords
    with torch.no_grad():
        xyz_ref, feats_ref, *_ = ref(x, torch.tensor(pc))
    # feats_ref: [B, 48, G]

    sd = {f"patch_embed.{k}": v for k, v in ref.state_dict().items()}
    # add the wrapper-level modules (proj/cls/pos/norm) with known values
    proj = torch.nn.Linear(48, 24)
    sd["proj.weight"], sd["proj.bias"] = proj.weight.data, proj.bias.data
    sd["cls_token"] = torch.zeros(1, 1, 24)
    sd["pos_embed"] = torch.zeros(1, 17, 24)
    norm = torch.nn.LayerNorm(24)
    sd["norm.weight"], sd["norm.bias"] = norm.weight.data, norm.bias.data

    params, state = convert_point_tokenizer(sd, num_stages=2, lga_blocks=(2, 1))
    params = jax.tree_util.tree_map(jnp.asarray, params)
    state = jax.tree_util.tree_map(jnp.asarray, state)
    cfg = pt.PointTokenizerConfig(
        input_points=64, num_stages=2, embed_dim=12, k_neighbors=8,
        lga_blocks=(2, 1), dim_expansion=(2, 2), out_dim=24,
    )
    tokens, centers, _ = pt.point_tokenizer(params, state, jnp.asarray(pc), cfg, training=False)

    np.testing.assert_allclose(np.asarray(centers), xyz_ref.numpy(), atol=1e-5)
    want_tokens = proj(feats_ref.transpose(1, 2)).detach().numpy()
    np.testing.assert_allclose(np.asarray(tokens), want_tokens, atol=5e-4, rtol=1e-3)


# --------------------------------------------------------------------------- #
# Transformer decoder layer vs torch nn.TransformerDecoderLayer
# --------------------------------------------------------------------------- #


def test_decoder_layer_parity():
    from mla_tpu.models.convert import _decoder_layer
    from mla_tpu.models.generation import decoder_layer

    D, H = 32, 4
    torch.manual_seed(0)  # pin global-RNG-dependent init
    ref = torch.nn.TransformerDecoderLayer(
        d_model=D, nhead=H, dim_feedforward=64, dropout=0.1,
        activation="gelu", batch_first=True,
    )
    ref.eval()
    rng = np.random.default_rng(2)
    tgt = rng.normal(size=(2, 5, D)).astype(np.float32)
    mem = rng.normal(size=(2, 7, D)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(tgt), torch.tensor(mem)).numpy()

    sd = {f"layer.{k}": v for k, v in ref.state_dict().items()}
    p = _decoder_layer(sd, "layer")
    p = jax.tree_util.tree_map(jnp.asarray, p)
    got = np.asarray(decoder_layer(p, jnp.asarray(tgt), jnp.asarray(mem), H, dropout=0.0, key=None))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


# --------------------------------------------------------------------------- #
# Timestep embedder formula (DiT cos|sin order)
# --------------------------------------------------------------------------- #


def test_timestep_embedding_formula():
    import math

    from mla_tpu.models.embedders import timestep_embedding

    t = jnp.array([0.0, 5.0, 99.0])
    got = np.asarray(timestep_embedding(t, 8))
    half = 4
    freqs = np.exp(-math.log(10000) * np.arange(half) / half)
    args = np.asarray(t)[:, None] * freqs[None]
    want = np.concatenate([np.cos(args), np.sin(args)], -1)
    np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-5)


# --------------------------------------------------------------------------- #
# Llama conversion with vocab padding
# --------------------------------------------------------------------------- #


def test_convert_llama_roundtrip_with_padding():
    from mla_tpu.models import llama as llama_mod
    from mla_tpu.models.convert import convert_llama

    hf = pytest.importorskip("transformers")
    config = hf.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, max_position_embeddings=64,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)  # HF init reads the global RNG; pin for order-independence
    model = hf.LlamaForCausalLM(config)
    model.eval()
    sd = {f"llm.{k}": v for k, v in model.state_dict().items()}
    params = convert_llama(sd, num_layers=2, target_vocab=160)
    assert params["embed"]["table"].shape == (160, 32)
    assert params["lm_head"]["w"].shape == (32, 160)
    # padded rows are the mean embedding
    np.testing.assert_allclose(
        params["embed"]["table"][130], params["embed"]["table"][:128].mean(0), atol=1e-6
    )

    cfg = llama_mod.LlamaConfig(
        vocab_size=160, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=4, max_position_embeddings=64,
        contrastive_layer=1, compute_dtype=jnp.float32,
    )
    jparams = jax.tree_util.tree_map(jnp.asarray, params)
    ids = np.array([[3, 17, 42, 9]])
    with torch.no_grad():
        want = model(torch.tensor(ids)).logits.numpy()
    emb = llama_mod.embed_tokens(jparams, jnp.asarray(ids))
    got = np.asarray(llama_mod.llama_forward(jparams, cfg, emb)["logits"])[:, :, :128]
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)


# --------------------------------------------------------------------------- #
# Full-width front-end goldens (production shapes)
# --------------------------------------------------------------------------- #
#
# The reduced-width tests above pin the structure cheaply; these run the
# PRODUCTION dimensions the flagship serves with — vision tokenizer at
# C=1024 on a 672x672 image (reference vision_tokenizer.py:92-152), point
# tokenizer at Point_PN_scan() defaults: 1024 points, k=81 neighbors,
# embed 96 -> out 384 (Point_PN.py:301-315) — including the k=81 kNN
# selection behavior at full neighborhood size.


def test_vision_tokenizer_parity_full_width(ref_vision):
    from mla_tpu.models import vision_tokenizer as vt
    from mla_tpu.models.convert import convert_vision_tokenizer

    C = 1024
    torch.manual_seed(0)
    ref = ref_vision.VisionTokenizer(input_size=C)
    ref.eval()

    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, 3, 672, 672)).astype(np.float32)
    mask = np.ones((1, 1, 672, 672), np.float32)
    px = torch.tensor(np.concatenate([img, mask], axis=1))
    with torch.no_grad():
        tokens_list, _ = ref(px, torch.nn.Identity())
    want = torch.stack(tokens_list).numpy()

    params = convert_vision_tokenizer(ref.state_dict())
    params = jax.tree_util.tree_map(jnp.asarray, params)
    cfg = vt.VisionTokenizerConfig(hidden_dim=C)
    got = np.asarray(
        vt.vision_tokenizer(params, jnp.asarray(np.concatenate([img, mask], 1)), cfg)
    )
    assert got.shape == want.shape == (1, 256, C)
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-3)


def test_point_tokenizer_parity_full_size(ref_point):
    from mla_tpu.models import point_tokenizer as pt
    from mla_tpu.models.convert import convert_point_tokenizer

    torch.manual_seed(0)
    ref = ref_point.Point_PN_scan()  # 1024 pts, 2 stages, embed 96, k=81
    ref.eval()

    rng = np.random.default_rng(1)
    pc = rng.uniform(-0.5, 0.5, size=(1, 1024, 3)).astype(np.float32)
    x = torch.tensor(pc).transpose(1, 2).contiguous()
    with torch.no_grad():
        xyz_ref, feats_ref, *_ = ref(x, torch.tensor(pc))

    sd = {f"patch_embed.{k}": v for k, v in ref.state_dict().items()}
    proj = torch.nn.Linear(384, 768)
    sd["proj.weight"], sd["proj.bias"] = proj.weight.data, proj.bias.data
    sd["cls_token"] = torch.zeros(1, 1, 768)
    sd["pos_embed"] = torch.zeros(1, 257, 768)
    norm = torch.nn.LayerNorm(768)
    sd["norm.weight"], sd["norm.bias"] = norm.weight.data, norm.bias.data

    params, state = convert_point_tokenizer(sd, num_stages=2, lga_blocks=(2, 1))
    params = jax.tree_util.tree_map(jnp.asarray, params)
    state = jax.tree_util.tree_map(jnp.asarray, state)
    cfg = pt.PointTokenizerConfig()  # production defaults
    tokens, centers, _ = pt.point_tokenizer(
        params, state, jnp.asarray(pc), cfg, training=False
    )

    np.testing.assert_allclose(np.asarray(centers), xyz_ref.numpy(), atol=1e-5)
    want_tokens = proj(feats_ref.transpose(1, 2)).detach().numpy()
    np.testing.assert_allclose(np.asarray(tokens), want_tokens, atol=2e-3, rtol=1e-3)
