"""CLIP BPE tokenizer.

A from-scratch implementation of the byte-level BPE scheme used by CLIP's
``SimpleTokenizer`` (the reference consumes it via the ``clip`` package,
``dataset_loaders/dataset_loaders.py:12,224-248``). The exact vocabulary is
defined by the public ``bpe_simple_vocab_16e6.txt.gz`` merges file; when that
file is present (``VTC_BPE_VOCAB`` env var or a ``data/`` path) token ids are
identical to CLIP's. When absent (this container has no network egress), a
deterministic byte-level fallback vocabulary with the same size (49408) and
the same special-token ids (<|startoftext|>=49406, <|endoftext|>=49407) is
built, preserving every structural invariant the framework depends on —
including "empty string tokenizes to [sot, eot]" which drives the CAM
mask-embedding substitution (``model/model.py:207-212``).
"""

from __future__ import annotations

import gzip
import html
import os
from functools import lru_cache
from pathlib import Path
from typing import List, Sequence, Union

import numpy as np
import regex as re

CONTEXT_LENGTH = 77
VOCAB_SIZE = 49408
SOT_TEXT = "<|startoftext|>"
EOT_TEXT = "<|endoftext|>"

_SEARCH_PATHS = [
    os.environ.get("VTC_BPE_VOCAB", ""),
    str(Path(__file__).parent / "bpe_simple_vocab_16e6.txt.gz"),
    "/root/data/bpe_simple_vocab_16e6.txt.gz",
]


@lru_cache()
def bytes_to_unicode():
    """Reversible byte -> unicode-char mapping (avoids whitespace/control
    chars so BPE operates over printable symbols)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(2**8):
        if b not in bs:
            bs.append(b)
            cs.append(2**8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def _basic_clean(text: str) -> str:
    # The reference path applies ftfy.fix_text; ftfy is unavailable here so
    # only the html unescaping (applied twice, as CLIP does) is replicated.
    try:
        import ftfy

        text = ftfy.fix_text(text)
    except ImportError:
        pass
    text = html.unescape(html.unescape(text))
    return text.strip()


def _whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


def _find_vocab_file():
    for p in _SEARCH_PATHS:
        if p and os.path.exists(p):
            return p
    return None


class ClipTokenizer:
    """Byte-level BPE with CLIP's merge table when available.

    ``encoder`` maps token text -> id; ``self.encoder[EOT_TEXT] == 49407``
    always holds (both exact and fallback vocabularies).
    """

    def __init__(self, bpe_path: str | None = None):
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        # per-text memo (see encode); ~260k entries ≈ tens of MB, bounded
        self._encode_cache: dict = {}
        self._encode_cache_max = 1 << 18

        bpe_path = bpe_path or _find_vocab_file()
        base = list(bytes_to_unicode().values())
        vocab = base + [v + "</w>" for v in base]

        if bpe_path is not None:
            with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
                merge_lines = f.read().split("\n")
            # CLIP uses merge lines [1 : 49152-256-2+1]
            merge_lines = merge_lines[1 : 49152 - 256 - 2 + 1]
            merges = [tuple(m.split()) for m in merge_lines]
            vocab.extend("".join(m) for m in merges)
            self.is_exact = True
        else:
            merges = []
            # Deterministic filler so the vocab keeps CLIP's size and the
            # special tokens keep their canonical ids.
            vocab.extend(
                f"<|unused{i}|>" for i in range(VOCAB_SIZE - 2 - len(vocab))
            )
            self.is_exact = False

        vocab.extend([SOT_TEXT, EOT_TEXT])
        assert len(vocab) == VOCAB_SIZE, len(vocab)

        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {SOT_TEXT: SOT_TEXT, EOT_TEXT: EOT_TEXT}
        self.pat = re.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
            r"""[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            re.IGNORECASE,
        )

    @property
    def sot_token(self) -> int:
        return self.encoder[SOT_TEXT]

    @property
    def eot_token(self) -> int:
        return self.encoder[EOT_TEXT]

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"

        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        """Memoized: tokenization is a pure function of the string, and the
        training loop re-tokenizes the same titles/comments every epoch
        (reference behavior, ``dataset_loaders.py:224-248``, which pays the
        BPE cost per __getitem__). The bounded cache turns steady-state
        tokenization into a dict lookup (~150 µs -> ~1 µs per text) without
        changing a single output id."""
        cached = self._encode_cache.get(text)
        if cached is not None:
            return list(cached)
        bpe_tokens: List[int] = []
        cleaned = _whitespace_clean(_basic_clean(text)).lower()
        for token in re.findall(self.pat, cleaned):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            bpe_tokens.extend(
                self.encoder[t] for t in self.bpe(token).split(" ")
            )
        if len(self._encode_cache) < self._encode_cache_max:
            self._encode_cache[text] = tuple(bpe_tokens)
        return bpe_tokens

    def decode(self, tokens: Sequence[int]) -> str:
        text = "".join(self.decoder[int(t)] for t in tokens)
        return (
            bytearray(self.byte_decoder[c] for c in text)
            .decode("utf-8", errors="replace")
            .replace("</w>", " ")
        )


_DEFAULT_TOKENIZER = None


def get_tokenizer() -> ClipTokenizer:
    global _DEFAULT_TOKENIZER
    if _DEFAULT_TOKENIZER is None:
        _DEFAULT_TOKENIZER = ClipTokenizer()
    return _DEFAULT_TOKENIZER


def tokenize(
    texts: Union[str, Sequence[str]],
    context_length: int = CONTEXT_LENGTH,
    truncate: bool = False,
) -> np.ndarray:
    """``clip.tokenize`` equivalent: [n, 77] int32 with sot/eot framing.

    Raises on overlong input unless ``truncate`` (matching clip's behavior —
    the datasets catch this and fall back, ``dataset_loaders.py:671-674``).
    """
    if isinstance(texts, str):
        texts = [texts]
    tok = get_tokenizer()
    sot, eot = tok.sot_token, tok.eot_token
    all_tokens = [[sot] + tok.encode(t) + [eot] for t in texts]
    result = np.zeros((len(all_tokens), context_length), dtype=np.int32)
    for i, tokens in enumerate(all_tokens):
        if len(tokens) > context_length:
            if truncate:
                tokens = tokens[: context_length - 1] + [eot]
            else:
                raise RuntimeError(
                    f"Input {texts[i]!r} is too long for context length "
                    f"{context_length}"
                )
        result[i, : len(tokens)] = tokens
    return result


def tokenize_max_len(
    texts: Union[str, Sequence[str]], max_len: int = CONTEXT_LENGTH
) -> np.ndarray:
    """Truncating tokenizer mirroring ``_tokenize_max_len``
    (``dataset_loaders/video_retrieval_videodatasets.py:48-62``)."""
    if isinstance(texts, str):
        texts = [texts]
    tok = get_tokenizer()
    sot, eot = tok.sot_token, tok.eot_token
    all_tokens = [[sot] + tok.encode(t) + [eot] for t in texts]
    result = np.zeros((len(all_tokens), max_len), dtype=np.int32)
    for i, tokens in enumerate(all_tokens):
        if len(tokens) >= max_len:
            result[i, :max_len] = np.array(tokens[: max_len - 1] + [eot])
        else:
            result[i, : len(tokens)] = np.array(tokens)
    return result


def _token_array_indices(arrays):
    return [
        i for i, a in enumerate(arrays)
        if hasattr(a, "dtype") and np.issubdtype(np.asarray(a).dtype, np.integer)
        and a.ndim >= 1 and a.shape[-1] == CONTEXT_LENGTH
    ]


def batch_token_need(arrays):
    """Tokens needed to cover every EOT position across all CLIP token
    tensors in ``arrays`` (1 + max EOT index), or ``None`` when the batch
    carries no token arrays. This is the scalar a multihost trainer
    allgathers so every controller picks the SAME truncation bucket."""
    token_idx = _token_array_indices(arrays)
    if not token_idx:
        return None
    return 1 + max(
        int(np.asarray(arrays[i]).argmax(axis=-1).max()) for i in token_idx
    )


def truncate_batch_tokens(arrays, buckets=(16, 32, 48, 64, 77), need=None):
    """Apply EOT-bucket truncation jointly to every token array in a batch.

    ``arrays`` is a flat sequence; members that look like CLIP token tensors
    (integer dtype, trailing dim 77) are truncated to one COMMON bucket (the
    smallest covering every EOT position across all of them), so a training
    step compiles at most ``len(buckets)`` variants instead of one per
    array-bucket combination. Other members pass through untouched.
    Exactness-preserving for the causally-masked, EOT-pooled text tower.

    ``need`` overrides the locally computed coverage (the multihost trainer
    passes the allgathered GLOBAL max so bucket shapes stay lockstep across
    controllers).
    """
    token_idx = _token_array_indices(arrays)
    if not token_idx:
        return list(arrays)
    if need is None:
        need = batch_token_need(arrays)
    bucket = next((b for b in buckets if need <= b), CONTEXT_LENGTH)
    out = list(arrays)
    for i in token_idx:
        out[i] = arrays[i][..., :bucket]
    return out


def truncate_to_eot_bucket(tokens: np.ndarray, buckets=(16, 32, 48, 64, 77)):
    """Truncate a [..., 77] token batch to the smallest bucket covering every
    EOT position.

    Exactness-preserving: the text tower is causally masked and pools at the
    EOT token, so positions after EOT never influence the output — dropping
    them only removes wasted compute (~5x on typical titles/comments).
    """
    if tokens.ndim == 1:
        tokens = tokens[None]
    eot_pos = tokens.argmax(axis=-1)  # EOT has the highest id
    need = int(eot_pos.max()) + 1
    for b in buckets:
        if need <= b:
            return tokens[..., :b]
    return tokens


def synthetic_tokens(lead, ntoks: int = 16, n_real: int = 14, rng=None):
    """[SOT, n_real random ids, EOT, zero pad] int32 of shape lead+(ntoks,)
    — the shared benchmark/profiling token fixture (bench.py and every
    scripts/bench_*/profile_* harness build inputs from this ONE definition
    so they measure the same token distribution)."""
    rng = rng if rng is not None else np.random.default_rng(0)
    lead = tuple(lead)
    toks = np.zeros(lead + (ntoks,), np.int32)
    toks[..., 0] = 49406
    toks[..., 1 : 1 + n_real] = rng.integers(1, 49405, lead + (n_real,))
    toks[..., 1 + n_real] = 49407
    return toks
