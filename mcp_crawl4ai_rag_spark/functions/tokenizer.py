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


def get_tokenizer() -> Tokenizer:
    """tiktoken when available (reference-faithful vocabulary), else the
    regex stand-in with identical interface + truncation contract.

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
                "regex stand-in tokenizer — token counts/truncation lengths "
                "will differ from the cl100k vocabulary",
                type(exc).__name__,
                exc,
            )
        return RegexTokenizer()


_WARNED_FALLBACK = False
