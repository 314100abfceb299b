"""Multi-prompt CoOp-style prompt learner.

Mirrors PromptLearner (trainers/GLP_OT_SVLoRA.py:68-200 / promptfl.py:76-198):
a learnable context bank ``ctx`` of shape [N_prompts, n_ctx, ctx_dim] (init
N(0, 0.02²)), expanded to N·n_cls prompt embeddings by splicing between the
frozen SOS prefix and class-name+EOS suffix token embeddings.  Class-token
position end/middle/front supported.

Everything static (tokenized prompts, prefix/suffix embeddings, name lengths)
is precomputed on host into a ``PromptState``; ``assemble_prompts`` is pure and
jit-friendly (static python loops over classes only).
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import tokenizer as tk
from .clip_model import CLIPConfig


@dataclasses.dataclass
class PromptState:
    token_prefix: jnp.ndarray   # [N*n_cls, 1, dim]  (SOS embedding)
    token_suffix: jnp.ndarray   # [N*n_cls, 77-1-n_ctx, dim]  (class, EOS, pad)
    tokenized_prompts: jnp.ndarray  # [N*n_cls, 77] int32
    eot_indices: jnp.ndarray    # [N*n_cls] argmax of token ids (EOT position)
    name_lens: List[int]
    n_cls: int
    n_ctx: int
    n_prompts: int
    class_token_position: str
    csc: bool = False  # class-specific contexts (ctx is [n_cls, n_ctx, dim])


def init_prompt_learner(
    rng: jax.Array,
    classnames: Sequence[str],
    token_embedding: jnp.ndarray,  # [vocab, width] from CLIP text tower
    cfg_clip: CLIPConfig,
    n_ctx: int = 4,
    n_prompts: int = 2,
    ctx_init: str | bool = False,
    csc: bool = False,
    class_token_position: str = "end",
    dtype=jnp.float32,
):
    """Returns (params {'ctx': ...}, PromptState)."""
    from ..utils.profiling import stamp

    classnames = [name.replace("_", " ") for name in classnames]
    n_cls = len(classnames)
    ctx_dim = token_embedding.shape[1]
    tok = tk.get_tokenizer()
    stamp("prompt_learner:tokenizer_ready")

    def _gather_rows(ids: np.ndarray) -> np.ndarray:
        """token_embedding[ids] -> host float32, gathering ON DEVICE when the
        table is device-resident.  Pulling the full [vocab, width] table first
        (~101 MB fp32 for CLIP) rides a remote-TPU tunnel through ~3000 small
        websocket chunks and intermittently stalls for minutes — the gathered
        rows are ~600 KB, three orders of magnitude less exposure."""
        if isinstance(token_embedding, jax.Array):
            rows = jnp.take(token_embedding.astype(jnp.float32),
                            jnp.asarray(ids), axis=0)
            stamp("prompt_learner:gather_dispatched")
            out = np.asarray(rows, dtype=np.float32)
            stamp("prompt_learner:rows_fetched")
            return out
        return np.asarray(token_embedding, dtype=np.float32)[ids]

    if ctx_init:
        words = str(ctx_init).replace("_", " ")
        ids = tk.tokenize(words)[0]
        emb = _gather_rows(np.asarray(ids))
        n_ctx = len(tok.encode(words))
        ctx_vectors = jnp.asarray(emb[1 : 1 + n_ctx], dtype)[None].repeat(n_prompts, axis=0)
        prompt_prefix = words
    else:
        shape = (n_cls, n_ctx, ctx_dim) if csc else (n_prompts, n_ctx, ctx_dim)
        ctx_vectors = (jax.random.normal(rng, shape) * 0.02).astype(dtype)
        prompt_prefix = " ".join(["X"] * n_ctx)

    name_lens = [len(tok.encode(name)) for name in classnames]
    is_csc = bool(csc) and not ctx_init
    prompts = [f"{prompt_prefix} {name}." for name in classnames]
    tokenized = tk.tokenize(prompts)  # [n_cls, 77]

    # gather the n_cls unique rows ONCE, then tile on host: the n_prompts
    # copies are identical, and this fetch is exactly the remote-TPU
    # transfer the docstring flags — tiling first would pull n_prompts
    # redundant copies over the tunnel
    embedding = np.tile(_gather_rows(tokenized), (n_prompts, 1, 1))
    tokenized = np.tile(tokenized, (n_prompts, 1))  # [N*n_cls, 77]

    # state buffers stay HOST numpy: inside jit they embed as cheap literal
    # constants — device-array closures would force a host materialization
    # per trace (minutes over a remote-TPU tunnel)
    state = PromptState(
        token_prefix=np.asarray(embedding[:, :1], dtype),
        token_suffix=np.asarray(embedding[:, 1 + n_ctx :], dtype),
        tokenized_prompts=tokenized,
        eot_indices=tokenized.argmax(-1),
        name_lens=name_lens,
        csc=is_csc,
        n_cls=n_cls,
        n_ctx=n_ctx,
        n_prompts=n_prompts,
        class_token_position=class_token_position,
    )
    return {"ctx": ctx_vectors}, state


def assemble_prompts(ctx: jnp.ndarray, state: PromptState) -> jnp.ndarray:
    """ctx [N, n_ctx, dim] (or [n_cls, n_ctx, dim] CSC) → [N*n_cls, 77, dim]."""
    n_cls, n_ctx, n = state.n_cls, state.n_ctx, state.n_prompts
    # dispatch on the stored csc flag — a shape test (ctx.shape[0]==n) breaks
    # whenever n_cls happens to equal n_prompts
    if ctx.ndim == 3 and not getattr(state, "csc", False):
        # [N, n_ctx, d] → [n_cls, N, n_ctx, d] → [N, n_cls, n_ctx, d] → [N*n_cls, ...]
        ctx = jnp.broadcast_to(ctx[None], (n_cls, *ctx.shape))
        ctx = ctx.transpose(1, 0, 2, 3).reshape(n * n_cls, n_ctx, ctx.shape[-1])
    elif ctx.ndim == 3:  # CSC: [n_cls, n_ctx, d] — tile across prompt bank
        ctx = jnp.tile(ctx, (n, 1, 1))

    prefix = state.token_prefix.astype(ctx.dtype)
    suffix = state.token_suffix.astype(ctx.dtype)

    if state.class_token_position == "end":
        return jnp.concatenate([prefix, ctx, suffix], axis=1)

    # middle / front need per-class splits (static name_lens → static slices)
    rows = []
    half = n_ctx // 2
    for row in range(n * n_cls):
        i = row % n_cls
        name_len = state.name_lens[i]
        pre = prefix[row : row + 1]
        cls_toks = suffix[row : row + 1, :name_len]
        rest = suffix[row : row + 1, name_len:]
        c = ctx[row : row + 1]
        if state.class_token_position == "middle":
            parts = [pre, c[:, :half], cls_toks, c[:, half:], rest]
        elif state.class_token_position == "front":
            parts = [pre, cls_toks, c, rest]
        else:
            raise ValueError(state.class_token_position)
        rows.append(jnp.concatenate(parts, axis=1))
    return jnp.concatenate(rows, axis=0)
