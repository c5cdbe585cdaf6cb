"""C9: tokenizer-bounded truncation behind one swappable interface.

The reference truncates every text to ≤8191 tiktoken tokens before embedding
(src/utils.py:167-185: ``encoding.encode`` → slice → ``decode``). tiktoken
is not installed in this sandbox, so the default implementation is a
prefix-preserving regex tokenizer over the same BPE-ish pre-token stream
used by functions/text.py — but both implementations satisfy ONE contract
(``Tokenizer``), so swapping in real tiktoken at the API boundary changes no
call sites and no truncation *semantics* beyond the token vocabulary:

- ``count(text)`` — number of tokens;
- ``truncate(text, max_tokens)`` — a PREFIX of ``text`` containing at most
  ``max_tokens`` tokens (prefix property conformance-tested; tiktoken's
  decode-of-encoded-prefix is a string prefix for plain text because BPE
  tokens are contiguous byte spans).

``get_tokenizer()`` returns the tiktoken adapter when importable, else the
regex stand-in — mirroring how the reference degrades (src/utils.py:171-185
falls back to a character cut when tiktoken errors).
"""

from __future__ import annotations

import re
from typing import Protocol

from .text import BPE_TOKEN_RE

MAX_EMBED_TOKENS = 8191  # reference src/utils.py:167


class Tokenizer(Protocol):
    name: str

    def count(self, text: str) -> int: ...

    def truncate(self, text: str, max_tokens: int = MAX_EMBED_TOKENS) -> str: ...


class RegexTokenizer:
    """Prefix-preserving truncation on the BPE-ish pre-token stream
    (letters runs / digit runs / single punctuation; whitespace is glue).
    ``truncate`` cuts at the END OFFSET of the max_tokens-th token, so the
    result is a verbatim prefix of the input — no decode round-trip, no
    lost whitespace."""

    name = "regex-bpeish"
    _re = re.compile(BPE_TOKEN_RE)

    def count(self, text: str) -> int:
        return sum(1 for _ in self._re.finditer(text))

    def truncate(self, text: str, max_tokens: int = MAX_EMBED_TOKENS) -> str:
        if max_tokens <= 0:
            return ""
        n = 0
        cut = 0
        for m in self._re.finditer(text):
            n += 1
            if n > max_tokens:
                return text[:cut]  # cut at the end of token #max_tokens
            cut = m.end()
        return text  # ≤ max_tokens tokens: unchanged (reference behavior)


class TiktokenTokenizer:
    """The reference's exact policy (src/utils.py:167-185): encode with
    cl100k_base, slice to max_tokens ids, decode. Import-gated — raises
    ImportError at construction when tiktoken is unavailable."""

    name = "tiktoken-cl100k"

    def __init__(self, encoding: str = "cl100k_base"):
        import tiktoken  # noqa: F401 — hard dep of this adapter only

        self._enc = tiktoken.get_encoding(encoding)

    def count(self, text: str) -> int:
        return len(self._enc.encode(text))

    def truncate(self, text: str, max_tokens: int = MAX_EMBED_TOKENS) -> str:
        ids = self._enc.encode(text)
        if len(ids) <= max_tokens:
            return text
        return self._enc.decode(ids[:max_tokens])


# Pre-tokenizer for the vendored BPE: PARTITIONS the text (every char lands
# in exactly one pre-token, whitespace included) so decode(encode(x)) == x.
_PRETOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|\s+|[^A-Za-z0-9\s]+")
_MERGES_FILE = "bpe_merges.txt"


def _merges_text() -> str:
    """Read the vendored merges table zip-import-safe: under
    ``spark-submit --py-files pkg.zip`` executors import the package from
    the zip, where ``open(dirname(__file__)/...)`` raises — the resource
    reader works in both layouts (north rule: the job ships as a zip)."""
    try:
        from importlib import resources

        return (resources.files(__package__) / _MERGES_FILE).read_text("ascii")
    except Exception:  # pragma: no cover — non-package import layouts
        import os

        path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), _MERGES_FILE
        )
        with open(path, encoding="ascii") as fh:
            return fh.read()


def _load_merges() -> list[tuple[int, int]]:
    merges: list[tuple[int, int]] = []
    for line in _merges_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        a, b = line.split()
        merges.append((int(a), int(b)))
    return merges


class MiniBpeTokenizer:
    """Vendored byte-level BPE — a REAL tokenizer (256 byte base tokens +
    a checked-in merges table trained by tools/gen_bpe_merges.py), so the
    reference's encode→slice→decode truncation policy (src/utils.py:
    167-185) executes in-sandbox instead of being stood in for by the
    regex tokenizer. Same ``Tokenizer`` contract; same policy as the
    tiktoken adapter, different (smaller) vocabulary.

    Encoding is the standard BPE greedy-merge-by-rank loop applied within
    each pre-token (pre-tokens partition the text, so decode(encode(x))
    == x for any text); an unbounded-input-safe per-pre-token cache makes
    natural text O(distinct pre-tokens), which is what an Arrow batch
    sees."""

    name = "mini-bpe-512"

    def __init__(self) -> None:
        merges = _load_merges()
        self._ranks: dict[tuple[int, int], int] = {
            pair: i for i, pair in enumerate(merges)
        }
        # token id → bytes (base 256 + one entry per merge)
        vocab: list[bytes] = [bytes([i]) for i in range(256)]
        for a, b in merges:
            vocab.append(vocab[a] + vocab[b])
        self._vocab = vocab
        self._cache: dict[str, tuple[int, ...]] = {}

    def _encode_pretoken(self, piece: str) -> tuple[int, ...]:
        cached = self._cache.get(piece)
        if cached is not None:
            return cached
        ids = list(piece.encode("utf-8"))
        ranks = self._ranks
        while len(ids) > 1:
            best_rank = None
            best_i = -1
            for i in range(len(ids) - 1):
                r = ranks.get((ids[i], ids[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best_i = i
            if best_rank is None:
                break
            new_id = 256 + best_rank
            pair = (ids[best_i], ids[best_i + 1])
            out = []
            i = 0
            while i < len(ids):
                if i < len(ids) - 1 and (ids[i], ids[i + 1]) == pair:
                    out.append(new_id)
                    i += 2
                else:
                    out.append(ids[i])
                    i += 1
            ids = out
        result = tuple(ids)
        if len(self._cache) < 200_000 and len(piece) <= 64:
            self._cache[piece] = result
        return result

    def encode(self, text: str) -> list[int]:
        out: list[int] = []
        for m in _PRETOKEN_RE.finditer(text):
            out.extend(self._encode_pretoken(m.group(0)))
        return out

    def decode(self, ids: list[int]) -> str:
        vocab = self._vocab
        return b"".join(vocab[i] for i in ids).decode("utf-8", errors="replace")

    def count(self, text: str) -> int:
        n = 0
        for m in _PRETOKEN_RE.finditer(text):
            n += len(self._encode_pretoken(m.group(0)))
        return n

    def truncate(self, text: str, max_tokens: int = MAX_EMBED_TOKENS) -> str:
        if max_tokens <= 0:
            return ""
        # fast path: every token covers ≥1 UTF-8 byte, so byte length is an
        # upper bound on token count — short texts (the common chunk case)
        # skip BPE entirely
        if len(text.encode("utf-8")) <= max_tokens:
            return text
        ids = self.encode(text)
        if len(ids) <= max_tokens:
            return text
        return self.decode(ids[:max_tokens])


def mbpe_count_udf():
    """Arrow-batched ``string → long`` mini-BPE token count."""
    import pandas as pd
    from pyspark.sql import functions as F

    # explicit eval via plain function + returnType: immune to the
    # future-annotations/type-hint inference interplay
    def _cnt(texts):
        tok = mini_bpe()
        return texts.fillna("").map(tok.count)

    _cnt.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return F.pandas_udf(_cnt, "long")


def mbpe_truncate_udf(max_tokens: int):
    """Arrow-batched ``string → string`` encode→slice→decode truncation."""
    import pandas as pd
    from pyspark.sql import functions as F

    def _tr(texts):
        tok = mini_bpe()
        return texts.fillna("").map(lambda t: tok.truncate(t, max_tokens))

    _tr.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return F.pandas_udf(_tr, "string")


_MINI_BPE_SINGLETON: MiniBpeTokenizer | None = None


def mini_bpe() -> MiniBpeTokenizer:
    """Process-wide singleton (the merges table and pre-token cache are
    shared across Arrow batches on one executor core)."""
    global _MINI_BPE_SINGLETON
    if _MINI_BPE_SINGLETON is None:
        _MINI_BPE_SINGLETON = MiniBpeTokenizer()
    return _MINI_BPE_SINGLETON


def get_tokenizer() -> Tokenizer:
    """tiktoken when available (reference-faithful vocabulary), else the
    vendored mini-BPE (real encode→slice→decode policy), else the regex
    stand-in — three backends, one contract.

    Degrade on ANY construction failure, not just ImportError:
    ``tiktoken.get_encoding`` fetches the BPE vocab over the network on
    first use, so a locked-down executor with tiktoken installed but no
    egress raises a connection error — that must fall back to the regex
    tokenizer (the reference's degrade-on-error policy, src/utils.py:
    167-185), not crash the embed stage. The degrade is LOGGED (warning
    naming both vocabularies and the triggering error) so a silent
    vocabulary swap — which changes truncation lengths job-wide — is
    diagnosable from executor logs."""
    global _WARNED_FALLBACK
    try:
        return TiktokenTokenizer()
    except Exception as exc:  # noqa: BLE001 — degrade-on-error by contract
        if not _WARNED_FALLBACK:
            _WARNED_FALLBACK = True  # once per process, not per Arrow batch
            import logging

            logging.getLogger(__name__).warning(
                "tiktoken tokenizer unavailable (%s: %s); degrading to the "
                "vendored mini-BPE tokenizer — token counts/truncation "
                "lengths will differ from the cl100k vocabulary",
                type(exc).__name__,
                exc,
            )
        try:
            return mini_bpe()
        except Exception:  # noqa: BLE001 — merges file missing/corrupt
            return RegexTokenizer()


_WARNED_FALLBACK = False
