"""Text analysis kernels for training-data pipelines: token counting,
quality scoring, language-ID heuristic. Vectorized per batch; the
numeric columns they emit have exact DuckDB SQL twins where noted (see
``pdf_toolkit_ray.queries``)."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# BPE-ish token regex: words / numbers / single punctuation, like a GPT-2
# style pre-tokenizer simplified to RE2-compatible form.
BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
_BPE_RE = re.compile(BPE_ISH)

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "que", "por"},
}


def whitespace_token_count(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Number of whitespace-separated tokens — matches DuckDB
    ``len(string_split_regex(text, '\\s+'))`` on single-space text."""
    counts = pc.list_value_length(pc.split_pattern_regex(texts, pattern=r"\s+"))
    return pc.cast(counts, pa.int64())


def bpe_ish_token_count(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Count of BPE-ish pre-tokens (word/number/punct runs), Arrow-vectorized
    via ``count_substring_regex`` (non-overlapping match count)."""
    counts = pc.count_substring_regex(texts, pattern=BPE_ISH)
    return pc.cast(counts, pa.int64())


def quality_stats(tbl: pa.Table, text_col: str = "text") -> pa.Table:
    """Append n_tokens / n_distinct_tokens / mean_token_len / distinct_ratio.

    SQL twins (DuckDB): ``len(string_split(text,' '))``,
    ``len(list_distinct(string_split(text,' ')))``, and arithmetic on
    ``length(text)`` — kept exactly representable so the oracle matches.
    """
    texts = tbl.column(text_col)
    toks = pc.split_pattern(texts, pattern=" ")
    n_tokens = pc.cast(pc.list_value_length(toks), pa.int64())
    # distinct per row: no Arrow kernel -> one pass in Python over the lists
    tok_lists = toks.combine_chunks().to_pylist() if isinstance(toks, pa.ChunkedArray) else toks.to_pylist()
    n_distinct = pa.array([len(set(t)) for t in tok_lists], type=pa.int64())
    total_chars = pc.cast(pc.utf8_length(texts), pa.float64())
    nt = pc.cast(n_tokens, pa.float64())
    # mean token length = (chars - (n-1) separators) / n
    from .rounding import round_away_arrow

    mean_tok = round_away_arrow(
        pc.divide(pc.subtract(total_chars, pc.subtract(nt, 1.0)), nt)
    )
    ratio = round_away_arrow(pc.divide(pc.cast(n_distinct, pa.float64()), nt))
    out = tbl.append_column("n_tokens", n_tokens)
    out = out.append_column("n_distinct_tokens", n_distinct)
    out = out.append_column("mean_token_len", mean_tok)
    return out.append_column("distinct_ratio", ratio)


def lang_id(text: str) -> str:
    """Stopword-profile language guess; 'und' (undetermined) when nothing hits."""
    words = set(text.lower().split())
    best, best_hits = "und", 0
    for lang in sorted(_LANG_PROFILES):
        hits = len(words & _LANG_PROFILES[lang])
        if hits > best_hits:
            best, best_hits = lang, hits
    return best


def lang_id_batch(texts: list[str]) -> list[str]:
    return [lang_id(t or "") for t in texts]
