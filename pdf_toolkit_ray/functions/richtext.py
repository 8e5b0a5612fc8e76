"""PII redaction, fenced-code-block and URL mining kernels.

Generalizes the reference's per-page cleanup pass (pixel noise removal,
``/root/reference/src/pdf-toolkit/page_images.py``) to per-turn TEXT
sanitization: the "noise" is PII tokens, and the scrub must be
reproducible bit-for-bit on any cluster layout.

Parity strategy: the redaction path uses ONLY ``pyarrow.compute``
regex kernels (``count_substring_regex`` / ``replace_substring_regex``),
which are RE2 — the same engine DuckDB's ``regexp_*`` functions use —
so the SQL twins agree by construction (verified against adversarial
near-misses in tests/test_richtext.py). Patterns are lookaround- and
backreference-free (RE2 has neither).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: ordered (kind, RE2 pattern, placeholder). Order matters: each pattern
#: scans the PREVIOUS pattern's output (email first so user@host never
#: half-matches as an IP-ish token; CC before phone so a 4-4-4-4 run is
#: never eaten 3-3-4; SSN before phone for the same reason).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("cc", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "<CC>"),
    ("id", r"\b\d{3}-\d{2}-\d{4}\b", "<ID>"),
    ("phone", r"\(\d{3}\) \d{3}-\d{4}|\+?\b\d{3}[- ]\d{3}[- ]\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]

PII_KINDS = [k for k, _, _ in PII_PATTERNS]

#: URL token: scheme to the first whitespace / closing bracket / quote.
#: A sentence-final '.' is INSIDE the char class and thus part of the
#: token — deliberate, and mirrored exactly by the SQL twin.
URL_PATTERN = r"https?://[^\s)>\]\"']+"
#: host part of a URL token (group 1)
DOMAIN_PATTERN = r"^https?://([^/:?#]+)"

_URL_RX = re.compile(URL_PATTERN)
_DOMAIN_RX = re.compile(DOMAIN_PATTERN)


def redact_pii(text: pa.ChunkedArray | pa.Array) -> tuple[pa.Array, dict[str, pa.Array]]:
    """Sequentially count-then-replace each PII pattern (vectorized RE2).

    Returns (redacted_text, {kind: int64 per-row match count}). Counts
    are measured against the running string state, exactly like the
    chained-CTE SQL twin.
    """
    cur = text
    counts: dict[str, pa.Array] = {}
    for kind, pat, repl in PII_PATTERNS:
        counts[kind] = pc.cast(pc.count_substring_regex(cur, pat), pa.int64())
        cur = pc.replace_substring_regex(cur, pat, repl)
    return cur, counts


def fenced_blocks(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Explode fenced code blocks: split each turn text on ``` — the
    segments at ODD split positions are inside fences. An unterminated
    opening fence therefore yields a final block running to EOF
    (CommonMark's unclosed-fence rule), matching the SQL twin's
    even-ordinal filter exactly. The split itself is one vectorized
    Arrow kernel; only the matched blocks (output-sized, not
    corpus-sized) see Python for lang/body accounting.

    Output: conv_id, turn_idx, block_idx, lang, n_lines, n_chars.
    """
    split = pc.split_pattern(batch.column(text_col), "```").combine_chunks()
    offsets = np.asarray(split.offsets)
    flat = split.flatten()
    n_flat = len(flat)
    parent = np.repeat(
        np.arange(batch.num_rows, dtype=np.int64), np.diff(offsets)
    )
    pos = np.arange(n_flat, dtype=np.int64) - offsets[parent]
    inside = (pos % 2) == 1
    idx = np.nonzero(inside)[0]

    conv = batch.column("conv_id").take(pa.array(parent[idx]))
    turn = batch.column("turn_idx").take(pa.array(parent[idx]))
    block_idx = (pos[idx] - 1) // 2

    langs: list[str] = []
    n_lines: list[int] = []
    n_chars: list[int] = []
    for j in idx:
        block = flat[int(j)].as_py()
        nl = block.find("\n")
        if nl < 0:
            lang_raw, body = block, ""
        else:
            lang_raw, body = block[:nl], block[nl + 1 :]
        langs.append(lang_raw.strip(" \t\r"))
        n_lines.append(0 if body == "" else body.count("\n") + 1)
        n_chars.append(len(body))

    return pa.table(
        {
            "conv_id": conv,
            "turn_idx": turn,
            "block_idx": pa.array(block_idx, pa.int64()),
            "lang": pa.array(langs, pa.string()),
            "n_lines": pa.array(n_lines, pa.int64()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )


def url_partials(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch (domain, conv_id) partial counts for URL mining.

    Rows without ``http`` are dropped by a vectorized prefilter; the
    compiled findall runs only on the survivors. Emits one partial row
    per (domain, conv_id) with the URL count and turn count — corpus
    text never enters the shuffle.
    """
    keep = pc.match_substring(batch.column(text_col), "http")
    hit = batch.filter(keep)
    doms: list[str] = []
    convs: list[str] = []
    n_urls: list[int] = []
    per_turn: dict[tuple[str, str], list[int]] = {}
    conv_col = hit.column("conv_id").to_pylist()
    for conv_id, text in zip(conv_col, hit.column(text_col).to_pylist()):
        found = _URL_RX.findall(text)
        if not found:
            continue
        turn_doms: dict[str, int] = {}
        for u in found:
            m = _DOMAIN_RX.match(u)
            if m is None:
                continue
            turn_doms[m.group(1)] = turn_doms.get(m.group(1), 0) + 1
        for d, n in turn_doms.items():
            per_turn.setdefault((d, conv_id), []).append(n)
    for (d, conv_id), ns in per_turn.items():
        doms.append(d)
        convs.append(conv_id)
        n_urls.append(sum(ns))
    n_turns = [len(per_turn[(d, c)]) for d, c in zip(doms, convs)]
    return pa.table(
        {
            "domain": pa.array(doms, pa.string()),
            "conv_id": pa.array(convs, pa.string()),
            "n_urls": pa.array(n_urls, pa.int64()),
            "n_turns": pa.array(n_turns, pa.int64()),
        }
    )
