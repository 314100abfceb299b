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
