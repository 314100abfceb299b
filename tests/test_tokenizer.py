import numpy as np

from fairfedmed_tpu.models import tokenizer as tk


def test_known_clip_token_ids():
    # canonical CLIP ids for this sentence (stable public vocabulary)
    ids = tk.tokenize("a photo of a cat.")[0]
    nonzero = ids[ids != 0]
    assert nonzero[0] == 49406  # <|startoftext|>
    assert nonzero[-1] == 49407  # <|endoftext|>
    assert list(nonzero) == [49406, 320, 1125, 539, 320, 2368, 269, 49407]


def test_tokenize_shape_and_padding():
    out = tk.tokenize(["a photo of a dog.", "glaucoma"])
    assert out.shape == (2, 77)
    assert out.dtype == np.int32
    assert (out.argmax(-1) > 0).all()  # EOT position is argmax of ids


def test_roundtrip_decode():
    tok = tk.get_tokenizer()
    ids = tok.encode("not glaucoma")
    assert tok.decode(ids).strip() == "not glaucoma"


def test_truncate():
    long = " ".join(["word"] * 200)
    out = tk.tokenize(long, truncate=True)[0]
    assert out[-1] == 49407
    import pytest

    with pytest.raises(RuntimeError):
        tk.tokenize(long, truncate=False)


# --- ftfy.fix_text equivalence surface (reference clip/simple_tokenizer.py:51) ---
# ftfy is absent from this environment; fix_text_lite vendors the
# deterministic subset of its default pipeline.  This golden table pins the
# behavior per transform (expected values hand-derived from ftfy 6.x
# semantics and its documented fixes tables).

def test_fix_text_lite_goldens():
    cases = [
        # (input, expected, which ftfy fix)
        ("plain ascii text", "plain ascii text", "identity"),
        ("Ãš", "Ú", "fix_encoding: utf-8 read as latin-1"),
        ("Ã©tude", "étude", "fix_encoding: utf-8 read as latin-1"),
        ("â€œquotedâ€\x9d", '"quoted"', "fix_encoding cp1252 + uncurl_quotes"),
        ("donâ€™t", "don't", "fix_encoding cp1252 + uncurl_quotes"),
        ("ﬁsh ﬂat oﬃce", "fish flat office", "fix_latin_ligatures"),
        ("ＴＥＳＴ ５０％", "TEST 50%", "fix_character_width"),
        ("“smart” ‘quotes’", "\"smart\" 'quotes'", "uncurl_quotes"),
        ("café", "café", "NFC normalization"),
        ("a\x1b[31mred\x1b[0m", "ared", "remove_terminal_escapes"),
        ("null\x00byte\x08", "nullbyte", "remove_control_chars"),
        ("line1 line2\r\nline3", "line1\nline2\nline3", "fix_line_breaks"),
        ("&amp;amp;x", "&amp;x", "unescape_html auto (one pass)"),
        ("<b>&amp;</b>", "<b>&amp;</b>", "unescape_html auto: skip markup"),
        ("Käse straße", "Käse straße",
         "real accents untouched (roundtrip not valid UTF-8)"),
    ]
    for inp, want, why in cases:
        got = tk.fix_text_lite(inp)
        assert got == want, (why, inp.encode("unicode_escape"), got, want)


def test_fix_text_lite_ascii_identity_property():
    """For printable-ASCII text without HTML entities (every class name any
    shipped dataset tokenizes), the full reference cleaning pipeline and ours
    agree byte-for-byte: ftfy.fix_text is identity there, so is fix_text_lite."""
    import itertools
    import string

    rng = np.random.default_rng(0)
    alphabet = string.ascii_letters + string.digits + " .,-_()/'" + '"'
    for _ in range(200):
        n = int(rng.integers(1, 60))
        s = "".join(rng.choice(list(alphabet), n))
        assert tk.fix_text_lite(s) == s
    # and the real class-name surface
    for name in itertools.chain(
            ["non-glaucoma", "glaucoma", "Pleural Effusion", "no finding",
             "a photo of a pneumonia lung."]):
        assert tk.fix_text_lite(name) == name


def test_mojibake_repair_is_conservative():
    # text whose cp1252/latin-1 bytes are NOT valid UTF-8 must pass through
    for s in ["naïve café", "übermäßig", "señor", "Ω resistor", "日本語"]:
        assert tk._fix_mojibake(s) == s
    # double-encoded mojibake repairs in ≤2 passes
    double = "Ã©".encode("utf-8").decode("latin-1")  # 'Ã\x83Â©'-style
    assert tk._fix_mojibake(double) == "é"


def test_tokenize_mojibake_matches_clean_text():
    # end-to-end: the garbled and clean spellings tokenize identically
    a = tk.tokenize("Ã©tude of glaucoma")[0]
    b = tk.tokenize("étude of glaucoma")[0]
    np.testing.assert_array_equal(a, b)
