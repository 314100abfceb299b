"""CLIP byte-level BPE tokenizer.

Functionally equivalent to the reference tokenizer (clip/simple_tokenizer.py:62-132,
clip/clip.py:185-220): same public vocabulary (OpenAI's 16e6 merge table, a public
data asset bundled under ``assets/``), same 77-token context with SOT/EOT markers.

Implementation note: the reference pipes text through ``ftfy.fix_text``; ftfy is not
available here, so we apply the same html-unescape + whitespace normalisation.  For
the ASCII class names used by every dataset in this framework the outputs are
identical.
"""

from __future__ import annotations

import functools
import gzip
import html
import os
from typing import List, Union

import numpy as np
import regex as re

_ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets")
DEFAULT_BPE_PATH = os.path.join(_ASSET_DIR, "bpe_simple_vocab_16e6.txt.gz")

SOT_TOKEN = "<|startoftext|>"
EOT_TOKEN = "<|endoftext|>"
CONTEXT_LENGTH = 77


@functools.lru_cache()
def _byte_unicode_table() -> dict:
    """Reversible byte → printable-unicode map (GPT-2 convention).

    Printable latin bytes map to themselves; the rest are remapped into the
    256+ private range so every byte has a visible, non-whitespace symbol.
    """
    keep = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    mapped = keep[:]
    offset = 0
    for b in range(256):
        if b not in keep:
            keep.append(b)
            mapped.append(256 + offset)
            offset += 1
    return dict(zip(keep, (chr(c) for c in mapped)))


def _symbol_pairs(word: tuple) -> set:
    return {(a, b) for a, b in zip(word[:-1], word[1:])}


def _clean_text(text: str) -> str:
    text = html.unescape(html.unescape(text))
    text = re.sub(r"\s+", " ", text)
    return text.strip()


class SimpleTokenizer:
    """Byte-level BPE with the OpenAI CLIP merge table (49,408 entries)."""

    def __init__(self, bpe_path: str = DEFAULT_BPE_PATH):
        self.byte_encoder = _byte_unicode_table()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}

        with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
            merge_lines = f.read().split("\n")
        # same slice as the reference: skip the header line, keep
        # 49152 - 256 - 2 + 1 merge rules
        merge_lines = merge_lines[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(line.split()) for line in merge_lines]

        vocab = list(self.byte_encoder.values())
        vocab += [tok + "</w>" for tok in vocab]
        vocab += ["".join(m) for m in merges]
        vocab += [SOT_TOKEN, EOT_TOKEN]

        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {SOT_TOKEN: SOT_TOKEN, EOT_TOKEN: EOT_TOKEN}
        self.pat = re.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            re.IGNORECASE,
        )

    @property
    def vocab_size(self) -> int:
        return len(self.encoder)

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _symbol_pairs(word)
        if not pairs:
            return token + "</w>"

        while True:
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            first, second = best
            merged = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    merged.extend(word[i:])
                    break
                merged.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i + 1] == second:
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = tuple(merged)
            if len(word) == 1:
                break
            pairs = _symbol_pairs(word)

        result = " ".join(word)
        self.cache[token] = result
        return result

    def encode(self, text: str) -> List[int]:
        bpe_tokens: List[int] = []
        text = _clean_text(text).lower()
        for token in re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            bpe_tokens.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return bpe_tokens

    def decode(self, tokens) -> str:
        text = "".join(self.decoder[int(t)] for t in tokens)
        raw = bytearray(self.byte_decoder[ch] for ch in text)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")


@functools.lru_cache()
def get_tokenizer(bpe_path: str = DEFAULT_BPE_PATH) -> SimpleTokenizer:
    return SimpleTokenizer(bpe_path)


def tokenize(
    texts: Union[str, List[str]],
    context_length: int = CONTEXT_LENGTH,
    truncate: bool = False,
) -> np.ndarray:
    """Tokenize into a ``[len(texts), context_length]`` int32 array.

    Mirrors clip/clip.py:185-220 (SOT + tokens + EOT, zero padded).
    """
    if isinstance(texts, str):
        texts = [texts]
    tok = get_tokenizer()
    sot, eot = tok.encoder[SOT_TOKEN], tok.encoder[EOT_TOKEN]
    out = np.zeros((len(texts), context_length), dtype=np.int32)
    for i, text in enumerate(texts):
        ids = [sot] + tok.encode(text) + [eot]
        if len(ids) > context_length:
            if truncate:
                ids = ids[:context_length]
                ids[-1] = eot
            else:
                raise RuntimeError(f"Input {texts[i]!r} is too long for context length {context_length}")
        out[i, : len(ids)] = ids
    return out
