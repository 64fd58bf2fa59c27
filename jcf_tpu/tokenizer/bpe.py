"""Byte-level BPE tokenizer for CLIP (OpenAI vocabulary).

Capability parity with the reference tokenizer
(``/root/reference/jclip/simple_tokenizer.py:67-149``): identical text
cleaning (ftfy + double html-unescape + whitespace collapse + lowercase),
identical byte->unicode mapping, identical merge table slice of the public
``bpe_simple_vocab_16e6`` vocabulary, and therefore identical token ids.

This is a host-side component (pure Python); token id arrays feed the jitted
text tower. The vocab data file ships gzip-compressed under the correct
``.txt.gz`` name (the reference misnames it — SURVEY.md §0).
"""

from __future__ import annotations

import gzip
import html
import os
from functools import lru_cache
from typing import Dict, List, Tuple

import regex as re

try:  # ftfy fixes mojibake; optional — ASCII class names are unaffected
    import ftfy

    _fix_text = ftfy.fix_text
except ImportError:  # pragma: no cover

    def _fix_text(text: str) -> str:
        return text

# Vocabulary structure constants: 256 byte symbols, each also with a "</w>"
# word-final variant, then the merge products, then the two special tokens.
N_BYTE_SYMBOLS = 256
N_SPECIALS = 2
VOCAB_SIZE = 49408
N_MERGES = VOCAB_SIZE - 2 * N_BYTE_SYMBOLS - N_SPECIALS  # 48894

_WORD_END = "</w>"
_SPECIALS = ("<|startoftext|>", "<|endoftext|>")

_TOKEN_PATTERN = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    re.IGNORECASE,
)


def default_vocab_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets",
        "bpe_simple_vocab_16e6.txt.gz",
    )


@lru_cache()
def byte_to_unicode() -> Dict[int, str]:
    """Invertible map from raw bytes to printable unicode codepoints.

    Printable latin ranges map to themselves; the remaining byte values are
    assigned codepoints starting at 256 so no byte maps to whitespace or a
    control character (which would confuse the regex splitter).
    """
    keep = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    mapping: Dict[int, str] = {b: chr(b) for b in keep}
    shift = 0
    for b in range(256):
        if b not in mapping:
            mapping[b] = chr(256 + shift)
            shift += 1
    return mapping


def clean_text(text: str) -> str:
    text = _fix_text(text)
    text = html.unescape(html.unescape(text))
    text = re.sub(r"\s+", " ", text)
    return text.strip()


def _adjacent_pairs(word: Tuple[str, ...]) -> set:
    return set(zip(word, word[1:]))


class SimpleTokenizer:
    """CLIP byte-level BPE codec: text <-> token id lists."""

    def __init__(self, vocab_path: str | None = None):
        vocab_path = vocab_path or default_vocab_path()
        self.byte_encoder = byte_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}

        with gzip.open(vocab_path) as f:
            lines = f.read().decode("utf-8").split("\n")
        # line 0 is a header; keep exactly N_MERGES merge rules
        merges = [tuple(line.split()) for line in lines[1 : N_MERGES + 1]]
        self.merge_rank: Dict[Tuple[str, str], int] = {
            pair: rank for rank, pair in enumerate(merges)
        }

        symbols: List[str] = list(self.byte_encoder.values())
        symbols += [s + _WORD_END for s in symbols]
        symbols += ["".join(pair) for pair in merges]
        symbols += list(_SPECIALS)
        assert len(symbols) == VOCAB_SIZE, len(symbols)
        self.encoder: Dict[str, int] = {s: i for i, s in enumerate(symbols)}
        self.decoder: Dict[int, str] = {i: s for s, i in self.encoder.items()}

        self._bpe_cache: Dict[str, str] = {s: s for s in _SPECIALS}

    @property
    def vocab_size(self) -> int:
        return VOCAB_SIZE

    @property
    def sot_token(self) -> int:
        return self.encoder["<|startoftext|>"]

    @property
    def eot_token(self) -> int:
        return self.encoder["<|endoftext|>"]

    def bpe(self, token: str) -> str:
        """Apply merge rules to one regex-token (already byte-mapped)."""
        cached = self._bpe_cache.get(token)
        if cached is not None:
            return cached

        word = tuple(token[:-1]) + (token[-1] + _WORD_END,)
        pairs = _adjacent_pairs(word)
        if not pairs:
            return token + _WORD_END

        while True:
            best = min(pairs, key=lambda p: self.merge_rank.get(p, float("inf")))
            if best not in self.merge_rank:
                break
            first, second = best
            merged: List[str] = []
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
            pairs = _adjacent_pairs(word)

        result = " ".join(word)
        self._bpe_cache[token] = result
        return result

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        text = clean_text(text).lower()
        for token in re.findall(_TOKEN_PATTERN, text):
            mapped = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[unit] for unit in self.bpe(mapped).split(" "))
        return ids

    def decode(self, ids) -> str:
        text = "".join(self.decoder[int(i)] for i in ids)
        raw = bytearray(self.byte_decoder[ch] for ch in text)
        return raw.decode("utf-8", errors="replace").replace(_WORD_END, " ")


@lru_cache()
def get_tokenizer(vocab_path: str | None = None) -> SimpleTokenizer:
    """Process-wide shared tokenizer instance."""
    return SimpleTokenizer(vocab_path)
