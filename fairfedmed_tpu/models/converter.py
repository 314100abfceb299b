"""OpenAI CLIP checkpoint → parameter-pytree converter.

Mirrors the architecture inference of clip/model.py:633-670 (detect ViT vs RN
from state_dict keys, read sizes from shapes) but emits our stacked-blocks
pytree instead of building an nn.Module.  Torch is used only to deserialize
the checkpoint on host (CPU).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .clip_model import CLIPConfig

# SHA256-named download URLs of the public OpenAI checkpoints
# (clip/clip.py:29-36).  The sha256 is the first path segment under the
# bucket and is verified after download, like the reference's _download
# (clip/clip.py:39-68).
MODEL_URLS = {
    "RN50": "https://openaipublic.azureedge.net/clip/models/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt",
    "RN101": "https://openaipublic.azureedge.net/clip/models/8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599/RN101.pt",
    "RN50x4": "https://openaipublic.azureedge.net/clip/models/7e526bd135e493cef0776de27d5f42653e6b4c8bf9e0f653bb11773263205fdd/RN50x4.pt",
    "RN50x16": "https://openaipublic.azureedge.net/clip/models/52378b407f34354e150460fe41077663dd5b39c54cd0bfd2b27167a4a06ec9aa/RN50x16.pt",
    "ViT-B/32": "https://openaipublic.azureedge.net/clip/models/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",
    "ViT-B/16": "https://openaipublic.azureedge.net/clip/models/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",
}
MODEL_FILES = {name: url.rsplit("/", 1)[1] for name, url in MODEL_URLS.items()}


def download_checkpoint(backbone_name: str, root: Optional[str] = None) -> str:
    """SHA256-verified download of a public OpenAI CLIP checkpoint into
    ``~/.cache/clip`` (clip/clip.py:39-68 semantics).  Returns the local path;
    raises RuntimeError when the backbone is unknown, the network is
    unavailable, or the digest mismatches."""
    import hashlib
    import urllib.request

    if backbone_name not in MODEL_URLS:
        raise RuntimeError(f"unknown CLIP backbone {backbone_name!r}; "
                           f"choices: {sorted(MODEL_URLS)}")
    url = MODEL_URLS[backbone_name]
    expected_sha = url.split("/")[-2]
    target_dir = os.path.expanduser(root or "~/.cache/clip")
    os.makedirs(target_dir, exist_ok=True)
    target = os.path.join(target_dir, url.rsplit("/", 1)[1])

    def sha256_of(path):
        h = hashlib.sha256()
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        return h.hexdigest()

    if os.path.isfile(target):
        if sha256_of(target) == expected_sha:
            return target
        # partial/corrupt file (e.g. an interrupted urlretrieve leaves its
        # target behind): warn and re-download like the reference
        # (clip/clip.py:47-49) instead of wedging until a manual delete
        import warnings

        warnings.warn(f"{target} exists but SHA256 does not match; "
                      "re-downloading")
        os.remove(target)
    try:
        urllib.request.urlretrieve(url, target)
    except Exception as e:
        # urlretrieve does not clean up its target on error
        if os.path.isfile(target):
            os.remove(target)
        raise RuntimeError(f"cannot download {url}: {e}") from e
    if sha256_of(target) != expected_sha:
        os.remove(target)  # never leave a corrupt file to wedge the next call
        raise RuntimeError("Model has been downloaded but the SHA256 checksum does not match")
    return target


def find_checkpoint(backbone_name: str, root: Optional[str] = None) -> Optional[str]:
    fname = MODEL_FILES.get(backbone_name, backbone_name.replace("/", "-") + ".pt")
    candidates = [
        os.path.expanduser(os.path.join("~/.cache/clip", fname)),
    ]
    if root:
        candidates.append(os.path.join(root, fname))
        candidates.append(os.path.join(root, "clip", fname))
    for c in candidates:
        if os.path.exists(c):
            return c
    return None


def load_torch_state_dict(path: str) -> dict:
    """Checkpoint → ``{dotted_name: np.ndarray}``, torch-free on the main
    path (reference: trainers/GLP_OT_SVLoRA.py:23-43 — ``torch.jit.load``
    with a ``torch.load`` fallback).

    Every public OpenAI checkpoint and every zip-format ``torch.save`` file
    goes through the pure-numpy reader; torch is imported only for pre-zip
    legacy pickles (pre-1.6 ``torch.save``), which the OpenAI releases never
    used."""
    import zipfile

    if zipfile.is_zipfile(path):
        from .torchscript_reader import load_state_dict

        try:
            return load_state_dict(path)
        except Exception as e:
            # the restricted numpy unpickler covers every OpenAI release and
            # ordinary torch.save shapes; anything it rejects (exotic custom
            # classes in a wrapper dict) falls back to torch WHEN AVAILABLE,
            # mirroring the reference's own two-stage loader
            # (trainers/GLP_OT_SVLoRA.py:23-43: torch.jit.load → torch.load)
            try:
                import torch
            except ImportError:
                raise e from None
            print(f"torch-free checkpoint reader failed ({e}); "
                  f"falling back to torch")
            try:
                model = torch.jit.load(path, map_location="cpu").eval()
                sd = model.state_dict()
            except Exception:
                sd = torch.load(path, map_location="cpu", weights_only=False)
            if isinstance(sd, dict) and isinstance(sd.get("state_dict"), dict):
                sd = sd["state_dict"]
            return {k: v.cpu().numpy() for k, v in sd.items()
                    if hasattr(v, "cpu")}
    import torch  # legacy non-zip torch.save only

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return {k: v.cpu().numpy() for k, v in sd.items() if hasattr(v, "cpu")}


def infer_rn_config(sd: dict):
    """ModifiedResNet architecture inference from checkpoint shapes
    (clip/model.py:643-656): any RN variant — RN50/101/50x4/50x16 — derives
    ``layers/width/embed_dim/heads/input_resolution`` from the state_dict, no
    preset table needed.  Returns ``(ResNetConfig, CLIPConfig)``."""
    from .resnet_clip import ResNetConfig

    counts = tuple(
        len(set(k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}")))
        for b in (1, 2, 3, 4))
    vision_width = sd["visual.layer1.0.conv1.weight"].shape[0]
    pos = sd["visual.attnpool.positional_embedding"].shape[0]
    output_width = int(round((pos - 1) ** 0.5))
    assert output_width ** 2 + 1 == pos
    image_resolution = output_width * 32
    embed_dim = sd["text_projection"].shape[1]
    transformer_width = sd["ln_final.weight"].shape[0]
    rn_cfg = ResNetConfig(
        layers=counts,
        output_dim=embed_dim,
        heads=vision_width * 32 // 64,
        input_resolution=image_resolution,
        width=vision_width,
    )
    clip_cfg = CLIPConfig(
        embed_dim=embed_dim,
        image_resolution=image_resolution,
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        transformer_width=transformer_width,
        transformer_heads=transformer_width // 64,
        transformer_layers=len(set(
            k.split(".")[2] for k in sd if k.startswith("transformer.resblocks"))),
    )
    return rn_cfg, clip_cfg


def infer_config(sd: dict) -> CLIPConfig:
    """Architecture inference from checkpoint keys (clip/model.py:633-656).
    ViT checkpoints only — ResNet checkpoints go through infer_rn_config."""
    vit = "visual.proj" in sd
    if not vit:
        raise NotImplementedError("ResNet CLIP conversion handled by infer_rn_config")
    vision_width = sd["visual.conv1.weight"].shape[0]
    vision_layers = len([k for k in sd if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")])
    patch = sd["visual.conv1.weight"].shape[-1]
    grid = int(round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5))
    image_resolution = patch * grid
    embed_dim = sd["text_projection"].shape[1]
    context_length = sd["positional_embedding"].shape[0]
    vocab_size = sd["token_embedding.weight"].shape[0]
    transformer_width = sd["ln_final.weight"].shape[0]
    transformer_layers = len(set(
        k.split(".")[2] for k in sd if k.startswith("transformer.resblocks")
    ))
    return CLIPConfig(
        embed_dim=embed_dim,
        image_resolution=image_resolution,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=patch,
        context_length=context_length,
        vocab_size=vocab_size,
        transformer_width=transformer_width,
        transformer_heads=transformer_width // 64,
        transformer_layers=transformer_layers,
    )


def convert_text_tower(sd: dict, dtype=np.float32) -> dict:
    """Extract the text transformer (shared by ViT and RN checkpoints)."""
    a = lambda k: np.asarray(sd[k], dtype)
    layers = len(set(k.split(".")[2] for k in sd if k.startswith("transformer.resblocks")))
    return {
        "text": {
            "token_embedding": a("token_embedding.weight"),
            "positional_embedding": a("positional_embedding"),
            "blocks": _stack_blocks(sd, "transformer", layers, dtype),
            "ln_final": {"weight": a("ln_final.weight"), "bias": a("ln_final.bias")},
            "text_projection": a("text_projection"),
        },
        "logit_scale": np.asarray(sd["logit_scale"], np.float32),
    }


def _stack_blocks(sd: dict, prefix: str, layers: int, dtype=None) -> dict:
    # dtype=None keeps the checkpoint's storage dtype (fp16 for real OpenAI
    # weights) — pass the caller's dtype or the tree comes back mixed
    def g(i, suffix):
        return np.asarray(sd[f"{prefix}.resblocks.{i}.{suffix}"], dtype)

    def stack(suffix):
        return np.stack([g(i, suffix) for i in range(layers)])

    return {
        "ln_1": {"weight": stack("ln_1.weight"), "bias": stack("ln_1.bias")},
        "ln_2": {"weight": stack("ln_2.weight"), "bias": stack("ln_2.bias")},
        "attn": {
            "in_proj_weight": stack("attn.in_proj_weight"),
            "in_proj_bias": stack("attn.in_proj_bias"),
            "out_proj": {
                "weight": stack("attn.out_proj.weight"),
                "bias": stack("attn.out_proj.bias"),
            },
        },
        "mlp": {
            "c_fc": {"weight": stack("mlp.c_fc.weight"), "bias": stack("mlp.c_fc.bias")},
            "c_proj": {"weight": stack("mlp.c_proj.weight"), "bias": stack("mlp.c_proj.bias")},
        },
    }


def convert_vit_clip(sd: dict, cfg: Optional[CLIPConfig] = None, dtype=np.float32):
    """torch state_dict → (params pytree, CLIPConfig)."""
    cfg = cfg or infer_config(sd)
    a = lambda k: np.asarray(sd[k], dtype)

    params = {
        "visual": {
            "class_embedding": a("visual.class_embedding"),
            "positional_embedding": a("visual.positional_embedding"),
            "conv1": {"weight": a("visual.conv1.weight")},
            "ln_pre": {"weight": a("visual.ln_pre.weight"), "bias": a("visual.ln_pre.bias")},
            "blocks": _stack_blocks(sd, "visual.transformer", cfg.vision_layers, dtype),
            "ln_post": {"weight": a("visual.ln_post.weight"), "bias": a("visual.ln_post.bias")},
            "proj": a("visual.proj"),
        },
        # text tower + logit_scale shared with the RN path — ONE layout
        **convert_text_tower(sd, dtype),
    }
    return params, cfg
