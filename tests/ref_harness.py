"""Import machinery for the REFERENCE composed model (/root/reference).

Unlike tests/test_golden_modules.py — which loads single reference files with
importlib — this harness imports the reference's full package tree (models/,
vla/, conf/, util/ and its vendored transformers 4.40.1 with the MODIFIED
LlamaForCausalLM) so end-to-end tests can run the real `MLA.predict_action_*`
code paths on CPU.

Reference deps not present in this environment (timm, draccus, dlimp, ...)
are auto-stubbed by a meta-path finder; a few need *functional* stand-ins
(draccus.ChoiceRegistry is subclassed by conf/, rich.logging.RichHandler is
instantiated by overwatch's dictConfig, easydict.EasyDict by the pointcloud
layer lib).

Everything here is process-global (sys.path + sys.modules surgery), so tests
that use it must tolerate the reference root staying on sys.path.
"""

from __future__ import annotations

import importlib.abc
import importlib.machinery
import logging
import sys
import types

REFERENCE_ROOT = "/root/reference"

STUB_ROOTS = (
    "timm", "draccus", "rich", "wandb", "torchvision", "flash_attn",
    "ipdb", "torch_geometric", "torch_scatter", "easydict", "dlimp",
    "tensorflow_graphics", "tensorflow_datasets",
)

_installed = False


def _make_stub(name: str) -> types.ModuleType:
    stub = types.ModuleType(name)
    stub.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    stub.__path__ = []

    def _getattr(attr):
        if attr.startswith("__"):
            raise AttributeError(attr)
        return types.SimpleNamespace()

    stub.__getattr__ = _getattr
    return stub


class _StubLoader(importlib.abc.Loader):
    def create_module(self, spec):
        return _make_stub(spec.name)

    def exec_module(self, module):
        if "." in module.__name__:
            parent, child = module.__name__.rsplit(".", 1)
            if parent in sys.modules:
                setattr(sys.modules[parent], child, module)


class _StubFinder(importlib.abc.MetaPathFinder):
    def find_spec(self, fullname, path=None, target=None):
        if fullname.split(".")[0] in STUB_ROOTS:
            return importlib.machinery.ModuleSpec(fullname, _StubLoader(), is_package=True)
        return None


class _RichHandler(logging.StreamHandler):
    def __init__(self, *a, markup=False, rich_tracebacks=False, show_path=False, **k):
        super().__init__()


class _EasyDict(dict):
    def __init__(self, d=None, **kwargs):
        d = dict(d or {}, **kwargs)
        super().__init__(d)
        for k, v in d.items():
            setattr(self, k, v)

    def __setattr__(self, name, value):
        if isinstance(value, dict) and not isinstance(value, _EasyDict):
            value = _EasyDict(value)
        super().__setattr__(name, value)
        self[name] = value


class _ChoiceRegistry:
    @classmethod
    def register_subclass(cls, name, subclass=None):
        if "_choices" not in cls.__dict__:
            cls._choices = {}
        if subclass is not None:
            cls._choices[name] = subclass
            return subclass

        def deco(s):
            cls._choices[name] = s
            return s

        return deco

    @classmethod
    def get_choice_class(cls, name):
        return cls.__dict__.get("_choices", {})[name]


def install() -> None:
    """Idempotently wire sys.path/sys.modules so `import models.vlm.prismatic`
    etc. resolve against /root/reference with its vendored transformers."""
    global _installed
    if _installed:
        return

    # sklearn optionally imports `rich`; bind its real (absent-rich) fallback
    # before the rich stub exists
    try:
        import sklearn.callback  # noqa: F401
    except Exception:
        pass

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    sys.meta_path.insert(0, _StubFinder())

    ed = _make_stub("easydict")
    ed.EasyDict = _EasyDict
    sys.modules["easydict"] = ed

    rich = _make_stub("rich")
    rl = _make_stub("rich.logging")
    rl.RichHandler = _RichHandler
    rich.logging = rl
    sys.modules["rich"] = rich
    sys.modules["rich.logging"] = rl

    dr = _make_stub("draccus")
    dr.ChoiceRegistry = _ChoiceRegistry
    sys.modules["draccus"] = dr

    _install_timm_functional()

    # vendored transformers 4.40.1: its pinned dep-version check rejects the
    # environment's newer tokenizers; neutralize it (we use the vendored code
    # precisely because it carries the reference's modified LlamaForCausalLM)
    dep = types.ModuleType("transformers.dependency_versions_check")
    dep.__spec__ = importlib.machinery.ModuleSpec(
        "transformers.dependency_versions_check", loader=None
    )
    dep.dep_version_check = lambda *a, **k: None
    sys.modules["transformers.dependency_versions_check"] = dep

    _installed = True


def _install_timm_functional() -> None:
    """timm classes the reference's diffusion embedders/DiT/generation heads
    actually instantiate — faithful torch re-implementations (matching timm's
    module/key layout so state dicts round-trip through models/convert.py)."""
    import torch
    import torch.nn as nn

    class Mlp(nn.Module):
        def __init__(self, in_features, hidden_features=None, out_features=None,
                     act_layer=nn.GELU, norm_layer=None, bias=True, drop=0.0,
                     use_conv=False):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features, bias=bias)
            self.act = act_layer()
            self.drop1 = nn.Dropout(drop)
            self.norm = norm_layer(hidden_features) if norm_layer else nn.Identity()
            self.fc2 = nn.Linear(hidden_features, out_features, bias=bias)
            self.drop2 = nn.Dropout(drop)

        def forward(self, x):
            return self.drop2(self.fc2(self.norm(self.drop1(self.act(self.fc1(x))))))

    class RmsNorm(nn.Module):
        def __init__(self, dim, eps=1e-6):
            super().__init__()
            self.eps = eps
            self.weight = nn.Parameter(torch.ones(dim))

        def forward(self, x):
            var = x.float().pow(2).mean(-1, keepdim=True)
            return (x.float() * torch.rsqrt(var + self.eps)).to(x.dtype) * self.weight

    class Attention(nn.Module):
        def __init__(self, dim, num_heads=8, qkv_bias=False, attn_drop=0.0,
                     proj_drop=0.0, **kw):
            super().__init__()
            self.num_heads = num_heads
            self.head_dim = dim // num_heads
            self.scale = self.head_dim ** -0.5
            self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.attn_drop = nn.Dropout(attn_drop)
            self.proj = nn.Linear(dim, dim)
            self.proj_drop = nn.Dropout(proj_drop)

        def forward(self, x):
            B, N, C = x.shape
            qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, self.head_dim)
            q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
            attn = (q @ k.transpose(-2, -1)) * self.scale
            attn = self.attn_drop(attn.softmax(dim=-1))
            out = (attn @ v).transpose(1, 2).reshape(B, N, C)
            return self.proj_drop(self.proj(out))

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0, scale_by_keep=True):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            mask = x.new_empty((x.shape[0],) + (1,) * (x.ndim - 1)).bernoulli_(keep)
            return x * mask / keep

    for name in ("timm", "timm.models", "timm.models.vision_transformer",
                 "timm.models.layers", "timm.layers"):
        if name not in sys.modules:
            mod = _make_stub(name)
            sys.modules[name] = mod
            if "." in name:
                parent, child = name.rsplit(".", 1)
                setattr(sys.modules[parent], child, mod)
    vt = sys.modules["timm.models.vision_transformer"]
    vt.Mlp, vt.Attention, vt.RmsNorm = Mlp, Attention, RmsNorm
    for lname in ("timm.models.layers", "timm.layers"):
        lm = sys.modules[lname]
        lm.DropPath = DropPath
        lm.trunc_normal_ = torch.nn.init.trunc_normal_
        lm.Mlp = Mlp


def make_llama_tokenizer_fast(vocab_size: int = 32000):
    """A REAL LlamaTokenizerFast built from an in-memory WordLevel tokenizer
    (no downloads): BOS id 1 prepended when add_special_tokens, unk id 0,
    every whitespace word one token — enough for the reference's tokenizer
    contracts (BOS assert, single-token trigger strings, 29871 conventions)
    while staying deterministic on both frameworks."""
    install()
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from tokenizers.processors import TemplateProcessing

    specials = {"<unk>": 0, "<s>": 1, "</s>": 2}
    words = (
        "In: What action should the robot take to close the box? Out:".split()
        + ["Test", "123", "True", "False", "Yes", "No"]
        + [chr(ord("A") + i) for i in range(26)]
    )
    vocab = {f"<unused{i}>": i for i in range(vocab_size)}
    for tok, tid in specials.items():
        del vocab[f"<unused{tid}>"]
        vocab[tok] = tid
    for j, w in enumerate(dict.fromkeys(words)):  # real words at stable ids from 1000
        tid = 1000 + j
        del vocab[f"<unused{tid}>"]
        vocab[w] = tid

    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    tok.post_processor = TemplateProcessing(
        single="<s> $A", pair="<s> $A $B", special_tokens=[("<s>", 1)]
    )

    from transformers import LlamaTokenizerFast

    return LlamaTokenizerFast(
        tokenizer_object=tok, bos_token="<s>", eos_token="</s>", unk_token="<unk>",
        model_max_length=2048, padding_side="right",
    )


def build_reference_mla(
    hidden: int = 512,
    layers: int = 4,
    heads: int = 8,
    intermediate: int = 1376,
    seed: int = 0,
    norm_stats=None,
    use_pointcloud: bool = False,
    use_contrastive: bool = False,
):
    """Construct the reference MLA at reduced LLM size on CPU, fp32, no
    downloads: the vendored modified LlamaForCausalLM is built from a local
    LlamaConfig via monkeypatched AutoConfig/AutoTokenizer, then composed
    through the reference's own LLaMa2LLMBackbone -> PrismaticVLM -> MLA
    stack (use_diff on; generation off). With use_pointcloud the FULL
    Point_PN tokenizer (1024 pts, k=81, out 384 -> proj 768) joins the
    composition; its stochastic FPS start (Point_PN.py:10 torch.randint) is
    pinned to start-at-0 to match our deterministic serving FPS.

    Returns (mla, tokenizer)."""
    install()
    import types as _types

    import torch
    from transformers import LlamaConfig

    tokenizer = make_llama_tokenizer_fast()

    import models.backbones.llm.base_llm as base_llm_mod

    llama_config = LlamaConfig(
        vocab_size=32000, hidden_size=hidden, intermediate_size=intermediate,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=heads, max_position_embeddings=2048,
        tie_word_embeddings=False,
    )
    base_llm_mod.AutoConfig = _types.SimpleNamespace(
        from_pretrained=lambda *a, **k: llama_config
    )
    base_llm_mod.AutoTokenizer = _types.SimpleNamespace(
        from_pretrained=lambda *a, **k: tokenizer
    )

    from models.backbones.llm.llama2 import LLaMa2LLMBackbone

    torch.manual_seed(seed)
    backbone = LLaMa2LLMBackbone(
        "llama2-7b-pure", inference_mode=True, use_flash_attention_2=False
    )
    backbone.llm = backbone.llm.float().eval()

    if use_pointcloud:
        import models.mla.pointcloud.backbone.Point_PN as ref_point_pn

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

        ref_point_pn.furthest_point_sample = det_fps

    from models.vlm.prismatic import PrismaticVLM

    stats = norm_stats or default_norm_stats()
    vlm = PrismaticVLM(
        "golden", backbone, enable_mixed_precision_training=False,
        action_dim=7, token_size=hidden, future_action_window_size=15,
        norm_stats=stats, use_diff=True, use_pointcloud=use_pointcloud,
        use_tactile=False, use_contrastive=use_contrastive,
        use_generation=False,
    ).float().eval()

    # the reference ZERO-initializes the eps head (DiT convention,
    # prismatic.py:320-321), which makes a fresh model predict eps == 0 —
    # the diffusion output would then be a model-independent transform of
    # the input noise and the golden would test nothing. Randomize it so the
    # recorded chunk actually depends on every upstream module.
    with torch.no_grad():
        torch.nn.init.normal_(vlm.final_layer.mlp.fc2.weight, std=1e-2)
        torch.nn.init.normal_(vlm.final_layer.mlp.fc2.bias, std=1e-2)

    from models.mla.model_mla import MLA
    from vla import ActionTokenizer

    mla = MLA(
        vlm, ActionTokenizer(tokenizer), token_size=hidden, action_dim=7,
        future_action_window_size=15, norm_stats=stats, use_diff=True,
        use_pointcloud=use_pointcloud, use_tactile=False,
        use_contrastive=use_contrastive, use_generation=False,
    ).float().eval()
    return mla, tokenizer


def default_norm_stats():
    return {
        "rlbench": {
            "action": {
                "q01": [-0.11, -0.12, -0.13, -0.5, -0.6, -0.7, 0.0],
                "q99": [0.11, 0.14, 0.15, 0.5, 0.65, 0.75, 1.0],
            },
            "proprio": {
                "q01": [-0.3, -0.45, 0.75, -3.2, -3.2, -3.2, 0.0],
                "q99": [0.7, 0.45, 1.6, 3.2, 3.2, 3.2, 1.0],
            },
        }
    }


def export_reference_run_dir(mla, run_dir, norm_stats=None):
    """Write the reference checkpoint layout our load_vla reads: config.json
    + dataset_statistics.json + checkpoints/step-*.pt with
    {"model": {module_key: state_dict}} (fsdp.py:100-155 format)."""
    import json
    from pathlib import Path

    import torch

    run_dir = Path(run_dir)
    (run_dir / "checkpoints").mkdir(parents=True, exist_ok=True)
    flags = {
        "use_diff": bool(mla.use_diff), "use_pointcloud": bool(mla.use_pointcloud),
        "use_tactile": bool(mla.use_tactile),
        "use_contrastive": bool(mla.use_contrastive),
        "use_generation": bool(mla.use_generation), "use_roi": False,
        "action_dim": 7, "future_action_window_size": 15,
    }
    (run_dir / "config.json").write_text(json.dumps({"train": flags}))
    (run_dir / "dataset_statistics.json").write_text(
        json.dumps(norm_stats or default_norm_stats())
    )
    model = {}
    for key in mla.all_module_keys:  # "vlm.<module>"
        mod = mla
        for part in key.split("."):
            mod = getattr(mod, part)
        model[key] = mod.state_dict()
    path = run_dir / "checkpoints" / "step-000001-epoch-00-loss=0.0.pt"
    torch.save({"model": model}, path)
    return path
