"""CLIP byte-level BPE tokenizer.

Functionally equivalent to the reference tokenizer (clip/simple_tokenizer.py:62-132,
clip/clip.py:185-220): same public vocabulary (OpenAI's 16e6 merge table, a public
data asset bundled under ``assets/``), same 77-token context with SOT/EOT markers.

Implementation note: the reference pipes text through ``ftfy.fix_text``
(clip/simple_tokenizer.py:6,51); ftfy is not available in this environment, so
``fix_text_lite`` vendors the deterministic subset of its default pipeline
(html auto-unescape, terminal escapes, cp1252/latin-1 mojibake repair, latin
ligatures, full/half-width forms, curly quotes, unicode line breaks, lone
surrogates, control chars, NFC).  For the ASCII class names used by every
dataset in this framework the outputs are byte-identical to the reference;
the remaining divergence surface (ftfy's heuristic badness-scored encoding
repairs on ambiguous non-ASCII text) is pinned by tests/test_tokenizer.py.
"""

from __future__ import annotations

import codecs
import functools
import gzip
import html
import os
import unicodedata
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


# --- ftfy.fix_text subset (reference: clip/simple_tokenizer.py:50-53) -----
# ANSI/VT100 escapes (ftfy remove_terminal_escapes)
_TERMINAL_ESCAPES = re.compile(r"\x1b\[((?:\d|;)*)([a-zA-Z])")
# curly quotes (ftfy uncurl_quotes)
_SINGLE_QUOTES = re.compile("[\u2018-\u201b]")
_DOUBLE_QUOTES = re.compile("[\u201c-\u201f]")
# unicode line/paragraph separators, NEL, VT, FF, CRLF/CR (ftfy fix_line_breaks)
_LINE_BREAKS = re.compile("\r\n|[\r\x0b\x0c\x85\u2028\u2029]")
# C0 controls except \t\n, plus DEL (ftfy remove_control_chars core set;
# \v \f \r are gone by the time this runs — fix_line_breaks maps them to \n)
_CONTROL_CHARS = re.compile(r"[\x00-\x08\x0e-\x1f\x7f]")
_SURROGATES = re.compile("[\ud800-\udbff][\udc00-\udfff]|[\ud800-\udfff]")
# latin ligatures (ftfy fix_latin_ligatures table)
_LIGATURES = {ord("Ĳ"): "IJ", ord("ĳ"): "ij", ord("ﬀ"): "ff", ord("ﬁ"): "fi",
              ord("ﬂ"): "fl", ord("ﬃ"): "ffi", ord("ﬄ"): "ffl",
              ord("ﬅ"): "ſt", ord("ﬆ"): "st"}


@functools.lru_cache()
def _width_map() -> dict:
    """Full/half-width → canonical forms (ftfy fix_character_width): every
    code point whose East-Asian-Width is Fullwidth or Halfwidth, mapped to
    its NFKC normalization (e.g. ＴＥＳＴ → TEST, ｶﾀｶﾅ → カタカナ)."""
    table = {}
    for cp in range(0xFF01, 0xFFEF):
        ch = chr(cp)
        if unicodedata.east_asian_width(ch) in ("F", "H"):
            norm = unicodedata.normalize("NFKC", ch)
            if norm != ch:
                table[cp] = norm
    return table


def _non_ascii_count(text: str) -> int:
    return sum(1 for ch in text if ord(ch) > 0x7F)


def _sloppy_cp1252_errors(exc):
    """ftfy's "sloppy-windows-1252": the five bytes cp1252 leaves undefined
    (0x81 0x8D 0x8F 0x90 0x9D) round-trip through the C1 controls with the
    same code points — real-world decoders (and mojibake) treat them so."""
    obj = exc.object[exc.start:exc.end]
    if isinstance(obj, str) and all(ch in "\x81\x8d\x8f\x90\x9d" for ch in obj):
        return bytes(ord(c) for c in obj), exc.end
    raise exc


codecs.register_error("ffm_sloppy_cp1252", _sloppy_cp1252_errors)


def _fix_mojibake(text: str, max_passes: int = 3) -> str:
    """UTF-8-read-as-cp1252/latin-1 repair — the overwhelmingly common
    mojibake class ftfy's ``fix_encoding`` targets (e.g. "Ã©" → "é",
    "â€™" → "’").  Conservative acceptance: the byte roundtrip must be
    exact AND strictly reduce the non-ASCII char count (UTF-8 mojibake
    always spends ≥2 high chars per real char, so a true repair shrinks;
    ordinary accented text fails the roundtrip because its cp1252 bytes
    are not valid UTF-8)."""
    for _ in range(max_passes):
        repaired = None
        for enc in ("windows-1252", "latin-1"):
            try:
                candidate = text.encode(enc, "ffm_sloppy_cp1252").decode("utf-8")
            except (UnicodeEncodeError, UnicodeDecodeError):
                continue
            if (candidate != text
                    and _non_ascii_count(candidate) < _non_ascii_count(text)):
                repaired = candidate
                break
        if repaired is None:
            return text
        text = repaired
    return text


def fix_text_lite(text: str) -> str:
    """Deterministic subset of ``ftfy.fix_text`` (default config), in ftfy's
    pipeline order.  Identity on printable-ASCII text without HTML entities —
    i.e. every class name shipped with this framework.  The heuristic
    encoding fixes ftfy layers on top (badness-scored multi-codec search)
    are out of scope; ``_fix_mojibake`` covers the dominant cp1252/latin-1
    case with a stricter acceptance rule."""
    if "<" not in text:  # ftfy unescape_html="auto": skip markup-ish text
        text = html.unescape(text)
    text = _TERMINAL_ESCAPES.sub("", text)
    if not text.isascii():
        text = _fix_mojibake(text)
        text = text.translate(_LIGATURES)
        text = text.translate(_width_map())
        text = _SINGLE_QUOTES.sub("'", text)
        text = _DOUBLE_QUOTES.sub('"', text)
        text = _SURROGATES.sub(
            lambda m: (chr(0x10000 + (ord(m.group(0)[0]) - 0xD800) * 0x400
                           + (ord(m.group(0)[1]) - 0xDC00))
                       if len(m.group(0)) == 2 else "�"), text)
    text = _LINE_BREAKS.sub("\n", text)
    text = _CONTROL_CHARS.sub("", text)
    if not text.isascii():
        text = unicodedata.normalize("NFC", text)
    return text


def _clean_text(text: str) -> str:
    # reference basic_clean + whitespace_clean (clip/simple_tokenizer.py:50-58)
    text = fix_text_lite(text)
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
