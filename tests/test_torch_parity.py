"""Golden numerical parity: our functional CLIP vs a torch oracle.

SURVEY §4 calls for golden-value tests of the CLIP forward against OpenAI
weights; offline, the equivalent guarantee is equality against an
independently-written torch forward implementing the same architecture
(pre-LN blocks, QuickGELU, packed-qkv attention, causal text mask, EOT
pooling) on the SAME random weights, shared via the checkpoint converter's
torch-style state_dict format.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_converter import make_torch_style_sd  # noqa: E402
from fairfedmed_tpu.models.clip_model import CLIPConfig  # noqa: E402


def torch_mha(x, in_w, in_b, out_w, out_b, heads, mask=None):
    """Packed-qkv multi-head attention in torch (nn.MultiheadAttention math)."""
    L, B, D = x.shape  # torch convention: [L, B, D]
    qkv = x @ in_w.t() + in_b
    q, k, v = qkv.chunk(3, dim=-1)
    dh = D // heads

    def split(t):
        return t.reshape(L, B * heads, dh).transpose(0, 1)  # [B*H, L, dh]

    q, k, v = split(q), split(k), split(v)
    scores = q @ k.transpose(1, 2) / math.sqrt(dh)
    if mask is not None:
        scores = scores + mask
    attn = torch.softmax(scores, dim=-1)
    out = (attn @ v).transpose(0, 1).reshape(L, B, D)
    return out @ out_w.t() + out_b


def torch_block(x, sd, prefix, heads, mask=None):
    def g(name):
        return torch.from_numpy(np.asarray(sd[f"{prefix}.{name}"]))

    def ln(x, name):
        return torch.nn.functional.layer_norm(
            x, (x.shape[-1],), g(f"{name}.weight"), g(f"{name}.bias"))

    h = x + torch_mha(ln(x, "ln_1"), g("attn.in_proj_weight"), g("attn.in_proj_bias"),
                      g("attn.out_proj.weight"), g("attn.out_proj.bias"), heads, mask)
    y = ln(h, "ln_2") @ g("mlp.c_fc.weight").t() + g("mlp.c_fc.bias")
    y = y * torch.sigmoid(1.702 * y)  # QuickGELU
    y = y @ g("mlp.c_proj.weight").t() + g("mlp.c_proj.bias")
    return h + y


def torch_vit_forward(sd, cfg, image):
    """Reference-architecture ViT forward in torch (clip/model.py:377-411)."""
    x = torch.from_numpy(image)
    conv_w = torch.from_numpy(np.asarray(sd["visual.conv1.weight"]))
    x = torch.nn.functional.conv2d(x, conv_w, stride=cfg.vision_patch_size)
    B, D, gh, gw = x.shape
    x = x.reshape(B, D, gh * gw).permute(0, 2, 1)  # [B, L, D]
    cls = torch.from_numpy(np.asarray(sd["visual.class_embedding"]))
    x = torch.cat([cls.expand(B, 1, D), x], dim=1)
    x = x + torch.from_numpy(np.asarray(sd["visual.positional_embedding"]))

    def ln(x, name):
        return torch.nn.functional.layer_norm(
            x, (x.shape[-1],),
            torch.from_numpy(np.asarray(sd[f"{name}.weight"])),
            torch.from_numpy(np.asarray(sd[f"{name}.bias"])))

    x = ln(x, "visual.ln_pre")
    x = x.permute(1, 0, 2)  # LND like the reference
    for i in range(cfg.vision_layers):
        x = torch_block(x, sd, f"visual.transformer.resblocks.{i}", cfg.vision_heads)
    x = x.permute(1, 0, 2)
    x = ln(x[:, 0, :], "visual.ln_post")
    return (x @ torch.from_numpy(np.asarray(sd["visual.proj"]))).numpy()


def torch_text_forward(sd, cfg, tokens_embedded, eot):
    x = torch.from_numpy(tokens_embedded)
    x = x + torch.from_numpy(np.asarray(sd["positional_embedding"]))
    L = x.shape[1]
    mask = torch.full((L, L), float("-inf")).triu(1)
    x = x.permute(1, 0, 2)
    for i in range(cfg.transformer_layers):
        x = torch_block(x, sd, f"transformer.resblocks.{i}",
                        cfg.transformer_heads, mask)
    x = x.permute(1, 0, 2)
    x = torch.nn.functional.layer_norm(
        x, (x.shape[-1],),
        torch.from_numpy(np.asarray(sd["ln_final.weight"])),
        torch.from_numpy(np.asarray(sd["ln_final.bias"])))
    pooled = x[torch.arange(x.shape[0]), torch.from_numpy(eot)]
    return (pooled @ torch.from_numpy(np.asarray(sd["text_projection"]))).numpy()


@pytest.fixture(scope="module")
def cfg():
    return CLIPConfig(embed_dim=32, image_resolution=32, vision_layers=2,
                      vision_width=64, vision_patch_size=16, context_length=16,
                      vocab_size=100, transformer_width=64,
                      transformer_heads=1, transformer_layers=2)


@pytest.fixture(scope="module")
def sd(cfg):
    return make_torch_style_sd(cfg, np.random.default_rng(7))


def test_vit_forward_matches_torch(cfg, sd):
    import jax, jax.numpy as jnp
    from fairfedmed_tpu.core.precision import policy_from_prec
    from fairfedmed_tpu.models.clip_model import vit_encode
    from fairfedmed_tpu.models.converter import convert_vit_clip

    params, _ = convert_vit_clip(sd, cfg)
    image = np.random.default_rng(1).standard_normal((3, 3, 32, 32)).astype(np.float32)
    ref = torch_vit_forward(sd, cfg, image)
    ours = np.asarray(vit_encode(
        jax.tree.map(jnp.asarray, params["visual"]), jnp.asarray(image), cfg,
        policy_from_prec("fp32")))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_text_forward_matches_torch(cfg, sd):
    import jax, jax.numpy as jnp
    from fairfedmed_tpu.core.precision import policy_from_prec
    from fairfedmed_tpu.models.clip_model import text_encode
    from fairfedmed_tpu.models.converter import convert_vit_clip

    params, _ = convert_vit_clip(sd, cfg)
    rng = np.random.default_rng(2)
    emb = rng.standard_normal((4, cfg.context_length, cfg.transformer_width)).astype(np.float32)
    eot = rng.integers(1, cfg.context_length, 4).astype(np.int64)
    ref = torch_text_forward(sd, cfg, emb, eot)
    ours = np.asarray(text_encode(
        jax.tree.map(jnp.asarray, params), jnp.asarray(emb),
        jnp.asarray(eot.astype(np.int32)), cfg, policy_from_prec("fp32")))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_fairlora_delta_matches_torch_diag_formulation():
    """FairLoRA per-sample grouped delta vs the reference's torch diag-stack
    einsum (GLP_OT_SVLoRA.py:461-482): soft one-hot blend over group S rows,
    diag(S_b) matmul per sample."""
    import jax.numpy as jnp
    from fairfedmed_tpu.adapters.lora import LAMBDA_GROUP, group_mix, lora_delta

    rng = np.random.default_rng(3)
    B, L, din, dout, r, G = 5, 7, 16, 12, 4, 3
    x = rng.standard_normal((B, L, din)).astype(np.float32)
    A = rng.standard_normal((din, r)).astype(np.float32)
    Bm = rng.standard_normal((r, dout)).astype(np.float32)
    S = rng.standard_normal((G, r)).astype(np.float32)
    attr = rng.integers(0, G, B)
    scaling = 0.5

    # torch oracle, straight from the reference formulation
    tx = torch.from_numpy(x)
    tA, tB, tS = map(torch.from_numpy, (A, Bm, S))
    one_hot = torch.nn.functional.one_hot(torch.from_numpy(attr), G).float()
    mix = one_hot * LAMBDA_GROUP + (1 - one_hot) * (1 - LAMBDA_GROUP) / (G - 1)
    s_b = mix @ tS  # [B, r]
    diag = torch.stack([torch.diag(s_b[i]) for i in range(B)])  # [B, r, r]
    h = tx @ tA  # [B, L, r]
    ref = torch.einsum("blr,brk->blk", h, diag) @ tB * scaling

    lora = {"lora_A": jnp.asarray(A), "lora_B": jnp.asarray(Bm), "lora_S": jnp.asarray(S)}
    mix_j = group_mix(jnp.asarray(attr.astype(np.int32)), G, B, jnp.float32)
    ours = np.asarray(lora_delta(lora, jnp.asarray(x), mix_j, scaling))
    np.testing.assert_allclose(ours, ref.numpy(), atol=1e-5, rtol=1e-5)


def _make_rn_sd(cfg_rn, rng):
    """Synthetic ModifiedResNet state_dict with the reference key names."""
    sd = {}
    r = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.1

    def add_bn(prefix, c):
        sd[f"{prefix}.weight"] = np.abs(r(c)) + 0.5
        sd[f"{prefix}.bias"] = r(c)
        sd[f"{prefix}.running_mean"] = r(c)
        sd[f"{prefix}.running_var"] = np.abs(r(c)) + 0.5

    w = cfg_rn.width
    sd["visual.conv1.weight"] = r(w // 2, 3, 3, 3)
    add_bn("visual.bn1", w // 2)
    sd["visual.conv2.weight"] = r(w // 2, w // 2, 3, 3)
    add_bn("visual.bn2", w // 2)
    sd["visual.conv3.weight"] = r(w, w // 2, 3, 3)
    add_bn("visual.bn3", w)
    inplanes = w
    for li, nblocks in enumerate(cfg_rn.layers):
        planes = w * (2 ** li)
        for bi in range(nblocks):
            pre = f"visual.layer{li + 1}.{bi}"
            sd[f"{pre}.conv1.weight"] = r(planes, inplanes, 1, 1)
            add_bn(f"{pre}.bn1", planes)
            sd[f"{pre}.conv2.weight"] = r(planes, planes, 3, 3)
            add_bn(f"{pre}.bn2", planes)
            sd[f"{pre}.conv3.weight"] = r(planes * 4, planes, 1, 1)
            add_bn(f"{pre}.bn3", planes * 4)
            stride = 2 if (li > 0 and bi == 0) else 1
            if stride > 1 or inplanes != planes * 4:
                sd[f"{pre}.downsample.0.weight"] = r(planes * 4, inplanes, 1, 1)
                add_bn(f"{pre}.downsample.1", planes * 4)
            inplanes = planes * 4
    ed = cfg_rn.embed_dim
    spacial = cfg_rn.input_resolution // 32
    sd["visual.attnpool.positional_embedding"] = r(spacial ** 2 + 1, ed)
    for name, dout in (("q_proj", ed), ("k_proj", ed), ("v_proj", ed),
                       ("c_proj", cfg_rn.output_dim)):
        sd[f"visual.attnpool.{name}.weight"] = r(dout, ed)
        sd[f"visual.attnpool.{name}.bias"] = r(dout)
    return sd


def _torch_rn_forward(sd, cfg_rn, image):
    """Reference ModifiedResNet in torch functional form
    (clip/model.py:11-60,63-118,168-225)."""
    F = torch.nn.functional
    g = lambda k: torch.from_numpy(np.asarray(sd[f"visual.{k}"]))

    def bn(x, prefix):
        return F.batch_norm(x, g(f"{prefix}.running_mean"), g(f"{prefix}.running_var"),
                            g(f"{prefix}.weight"), g(f"{prefix}.bias"), False)

    x = torch.from_numpy(image)
    x = F.relu(bn(F.conv2d(x, g("conv1.weight"), stride=2, padding=1), "bn1"))
    x = F.relu(bn(F.conv2d(x, g("conv2.weight"), padding=1), "bn2"))
    x = F.relu(bn(F.conv2d(x, g("conv3.weight"), padding=1), "bn3"))
    x = F.avg_pool2d(x, 2)
    inplanes = cfg_rn.width
    for li, nblocks in enumerate(cfg_rn.layers):
        planes = cfg_rn.width * (2 ** li)
        for bi in range(nblocks):
            pre = f"layer{li + 1}.{bi}"
            stride = 2 if (li > 0 and bi == 0) else 1
            out = F.relu(bn(F.conv2d(x, g(f"{pre}.conv1.weight")), f"{pre}.bn1"))
            out = F.relu(bn(F.conv2d(out, g(f"{pre}.conv2.weight"), padding=1), f"{pre}.bn2"))
            if stride > 1:
                out = F.avg_pool2d(out, stride)
            out = bn(F.conv2d(out, g(f"{pre}.conv3.weight")), f"{pre}.bn3")
            if f"visual.{pre}.downsample.0.weight" in sd:
                identity = x if stride == 1 else F.avg_pool2d(x, stride)
                identity = bn(F.conv2d(identity, g(f"{pre}.downsample.0.weight")),
                              f"{pre}.downsample.1")
            else:
                identity = x
            x = F.relu(out + identity)
            inplanes = planes * 4
    # attention pool
    B, C, H, W = x.shape
    t = x.reshape(B, C, H * W).permute(2, 0, 1)
    t = torch.cat([t.mean(dim=0, keepdim=True), t], dim=0)
    t = t + g("attnpool.positional_embedding")[:, None, :]
    out, _ = F.multi_head_attention_forward(
        query=t, key=t, value=t, embed_dim_to_check=t.shape[-1],
        num_heads=cfg_rn.heads,
        q_proj_weight=g("attnpool.q_proj.weight"),
        k_proj_weight=g("attnpool.k_proj.weight"),
        v_proj_weight=g("attnpool.v_proj.weight"),
        in_proj_weight=None,
        in_proj_bias=torch.cat([g("attnpool.q_proj.bias"),
                                g("attnpool.k_proj.bias"),
                                g("attnpool.v_proj.bias")]),
        bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0,
        out_proj_weight=g("attnpool.c_proj.weight"),
        out_proj_bias=g("attnpool.c_proj.bias"),
        use_separate_proj_weight=True, training=False, need_weights=False)
    return out[0].numpy()  # pooled CLS token [B, out]


def test_modified_resnet_matches_torch():
    import jax.numpy as jnp
    from fairfedmed_tpu.core.precision import policy_from_prec
    from fairfedmed_tpu.models.resnet_clip import (
        RN_PRESETS, convert_resnet_visual, resnet_encode,
    )

    cfg_rn = RN_PRESETS["test-rn"]
    rng = np.random.default_rng(11)
    sd = _make_rn_sd(cfg_rn, rng)
    image = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    ref = _torch_rn_forward(sd, cfg_rn, image)
    params, bn, stats = convert_resnet_visual(sd, cfg_rn)
    ours, _ = resnet_encode(params, bn, stats, jnp.asarray(image), cfg_rn,
                            policy_from_prec("fp32"), train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4, rtol=1e-3)
