"""Golden tests for the BPE tokenizer.

Golden ids were produced by running the reference tokenizer
(``/root/reference/jclip/simple_tokenizer.py``) on the same vocabulary.
"""

import numpy as np
import pytest

from jcf_tpu.tokenizer import (
    CONTEXT_LENGTH,
    EOT_TOKEN,
    SOT_TOKEN,
    get_tokenizer,
    tokenize,
)

GOLDEN = {
    "a photo of a cat": [320, 1125, 539, 320, 2368],
    "a photo of a Animal_Giant_panda.": [320, 1125, 539, 320, 4668, 318, 4687, 318, 12952, 269],
    "Hello, World!!   multiple   spaces": [3306, 267, 1002, 748, 6470, 9006],
    "café résumé — unicode & entities &amp;amp; test": [
        15304, 29106, 7054, 4166, 2005, 7648, 19639, 261, 38134, 261, 1628,
    ],
    "a sketch of the Stanford-Cars 2012 BMW M3 coupe.": [
        320, 5269, 539, 518, 15087, 268, 3346, 273, 271, 272, 273, 7869, 332, 274, 16773, 269,
    ],
    "it's don't we're I'll 42 3.14159": [
        585, 568, 847, 713, 649, 982, 328, 1342, 275, 273, 274, 269, 272, 275, 272, 276, 280,
    ],
    "": [],
    "xyzzyplugh frobnicate": [20023, 21275, 2052, 790, 626, 65, 2109, 671],
}


def test_vocab_structure():
    tok = get_tokenizer()
    assert tok.vocab_size == 49408
    assert tok.sot_token == SOT_TOKEN == 49406
    assert tok.eot_token == EOT_TOKEN == 49407


@pytest.mark.parametrize("text,expected", GOLDEN.items(), ids=list(map(repr, GOLDEN)))
def test_golden_encode(text, expected):
    assert get_tokenizer().encode(text) == expected


def test_decode_roundtrip():
    tok = get_tokenizer()
    assert tok.decode(tok.encode("a photo of a cat")) == "a photo of a cat "


def test_tokenize_padding_and_specials():
    arr = tokenize(["a photo of a cat", "a photo of a Animal_Giant_panda."])
    assert arr.shape == (2, CONTEXT_LENGTH)
    assert arr.dtype == np.int32
    assert arr[0, 0] == SOT_TOKEN
    assert arr[0, 6] == EOT_TOKEN
    assert (arr[0, 7:] == 0).all()
    # EOT is the max id, so argmax over the row locates it (reference relies
    # on this for the text-feature gather, jclip/model.py:213-214)
    assert arr.argmax(axis=-1)[0] == 6


def test_tokenize_single_string():
    arr = tokenize("a photo of a cat")
    assert arr.shape == (1, CONTEXT_LENGTH)


def test_tokenize_overflow_raises_and_truncates():
    long_text = "cat " * 100
    with pytest.raises(RuntimeError):
        tokenize(long_text)
    arr = tokenize(long_text, truncate=True)
    assert arr.shape == (1, CONTEXT_LENGTH)
    assert arr[0, -1] == EOT_TOKEN
