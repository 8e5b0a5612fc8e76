"""Deterministic synthetic transcripts generator (FIXTURES.md §1).

Mirrors the reference's test-fixture style — synthetic inputs built
in-memory with exact expected outputs
(``/root/reference/tests/test_page_images.py:42-89``) — generalized to
the transcripts table of BASELINE.json's ``input_hint``.

Every value derives from per-``(seed, conv)`` / per-``(seed, conv, turn)``
PRNGs, so generation is order-independent and can run embarrassingly
parallel as a Ray pipeline (bench scale) while staying bit-identical to
the single-process path.

Payload grammar:
* ``plain`` — GOLD with whitespace mutations (leading/trailing junk,
  internal ``\\r\\n``/``\\n``/tab runs); extraction must recover the
  normalized GOLD exactly.
* ``html``  — boilerplate nav/ads/footer around ``<article><p>GOLD…``;
  ~10% are mostly-boilerplate → whole-doc fallback expected.
* ``pdf``   — mini-PDF serialization with scrambled block order, page
  rotation ∈ {0,90,180,270}, ~20% spreads (wide pages split at the
  gutter).
"""

from __future__ import annotations

import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .. import FIXTURE_VERSION

# 64-word fixed vocabulary (same style as the driver's documents.text).
WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu amber basil cedar dahlia elder fennel ginger hazel iris "
    "jasper kelp laurel maple nettle olive pepper quince rowan sage thyme "
    "umber violet willow yarrow zinnia anchor beacon copper dynamo ember "
    "fathom garnet harbor ingot jetty keel lantern meadow"
).split()

SIZES = {
    # name -> (n_convs, n_heavy)
    "smoke": (50, 0),
    "correctness": (500, 10),
    "bench": (50_000, 1_000),
    # for the two-parallelism scaling criterion: big enough that fixed
    # session/shuffle overhead and pool ramp-up amortize, approximating the
    # 10^12-turn regime where compute dominates
    "scaling": (400_000, 8_000),
    # 2x scaling: per-core work is ~2x so node-fixed costs (disk write,
    # driver loops, session machinery) amortize further — closer still to
    # the compute-dominated regime the 10^12-turn criterion imagines,
    # while the in-flight working set stays inside the object store
    "scaling2": (800_000, 16_000),
}

_TS_BASE_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds
_ROT_CHOICES = [0, 0, 0, 0, 0, 90, 180, 270]


def _rot_forward(x: int, y: int, w: int, h: int, rotate: int) -> tuple[int, int, int, int]:
    """Rotate a true-space point into emitted space; returns (x', y', w', h')."""
    if rotate == 0:
        return x, y, w, h
    if rotate == 90:
        return h - 1 - y, x, h, w
    if rotate == 180:
        return w - 1 - x, h - 1 - y, w, h
    if rotate == 270:
        return y, w - 1 - x, h, w
    raise ValueError(f"bad rotation {rotate}")


def gold_text(seed: int, conv_id: str, turn_idx: int) -> str:
    rng = random.Random(f"{seed}:gold:{conv_id}:{turn_idx}")
    n = rng.randint(5, 40)
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _gen_plain(rng: random.Random, gold: str) -> str:
    words = gold.split(" ")
    seps = []
    for _ in range(len(words) - 1):
        if rng.random() < 0.15:
            seps.append(rng.choice(["\n", "\r\n", " \t ", "  "]))
        else:
            seps.append(" ")
    body = words[0] + "".join(s + w for s, w in zip(seps, words[1:]))
    lead = rng.choice(["", " ", "\n", "\r\n", "\t ", "  \r\n "])
    trail = rng.choice(["", " ", "\n", "\r\n", " \t"])
    return lead + body + trail


def _salad(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _gen_html(rng: random.Random, gold: str) -> str:
    words = gold.split(" ")
    mostly_boilerplate = rng.random() < 0.10
    m = rng.randint(1, max(1, min(4, len(words) // 3)))
    bounds = sorted(rng.sample(range(1, len(words)), m - 1)) if m > 1 else []
    paras = []
    prev = 0
    for b in bounds + [len(words)]:
        paras.append(" ".join(words[prev:b]))
        prev = b
    article = "<article>" + "".join(f"<p>{p}</p>" for p in paras) + "</article>"
    gold_chars = len(gold)

    if mostly_boilerplate:
        # boilerplate must dominate: B > 3A triggers the min-area fallback
        target = 4 * gold_chars + 120
    else:
        # keep boilerplate well under 3A so the dense region passes min_area_frac
        target = max(40, min(2 * gold_chars - 20, 160))
    third = max(2, target // 18)  # ≈ words per boilerplate slot (6 chars/word)
    nav = (
        f"<nav>{_salad(rng, third)} "
        f'<a href="#">{rng.choice(WORDS)}</a> <a href="#">{rng.choice(WORDS)}</a></nav>'
    )
    ads = (
        f'<div class="ads">{_salad(rng, third)} '
        f"<a>{rng.choice(WORDS)}</a> <a>{rng.choice(WORDS)}</a></div>"
    )
    footer = f"<footer>copyright {_salad(rng, third)}</footer>"
    return (
        f"<html><head><title>{rng.choice(WORDS)}</title>"
        f"<style>.x{{color:#000}}</style></head><body>"
        f"{nav}{ads}{article}{footer}</body></html>"
    )


def _chunk_words(rng: random.Random, words: list[str], lo: int, hi: int) -> list[str]:
    m = rng.randint(lo, max(lo, min(hi, len(words))))
    bounds = sorted(rng.sample(range(1, len(words)), m - 1)) if m > 1 else []
    chunks, prev = [], 0
    for b in bounds + [len(words)]:
        chunks.append(" ".join(words[prev:b]))
        prev = b
    return chunks


def _gen_pdf(rng: random.Random, gold: str) -> str:
    words = gold.split(" ")
    spread = rng.random() < 0.20
    lines = ["%MINIPDF 1.0"]

    if spread:
        w, h = 1200, 800
        k_l = rng.randint(1, min(3, max(1, len(words) - 1)))
        chunks = _chunk_words(rng, words, 2, 5)
        k_l = min(k_l, len(chunks) - 1)
        left, right = chunks[:k_l], chunks[k_l:]
        blocks = []  # (x, y, text) in true space
        for i, chunk in enumerate(left):
            x = rng.randint(300, 440) if i == 0 else rng.randint(60, 440)
            y = 40 + 150 * i + rng.randint(0, 80)
            blocks.append((x, y, chunk))
        for i, chunk in enumerate(right):
            x = rng.randint(720, 900) if i == 0 else rng.randint(720, 1140)
            y = 40 + 150 * i + rng.randint(0, 80)
            blocks.append((x, y, chunk))
        rotate = rng.choice(_ROT_CHOICES)
        block_lines = []
        ew = eh = None
        for x, y, text in blocks:
            ex, ey, ew, eh = _rot_forward(x, y, w, h, rotate)
            block_lines.append(f"block x={ex} y={ey} | {text}")
        rng.shuffle(block_lines)
        lines.append(f"obj page 1 w={ew} h={eh} rotate={rotate}")
        lines.extend(block_lines)
        lines.append("endobj")
        return "\n".join(lines)

    n_pages = 2 if (rng.random() < 0.20 and len(words) >= 4) else 1
    chunks = _chunk_words(rng, words, min(2, len(words)), 5)
    per_page = [chunks] if n_pages == 1 else [chunks[: len(chunks) // 2] or chunks[:1], chunks[len(chunks) // 2 :] or chunks[-1:]]
    w, h = 600, 800
    for page_num, page_chunks in enumerate(per_page, start=1):
        rotate = rng.choice(_ROT_CHOICES)
        blocks = []
        row = 0
        for chunk in page_chunks:
            y = 40 + 120 * row + rng.randint(0, 60)
            cwords = chunk.split(" ")
            if len(cwords) >= 2 and rng.random() < 0.3:
                cut = rng.randint(1, len(cwords) - 1)
                blocks.append((50, y, " ".join(cwords[:cut])))
                blocks.append((320, y, " ".join(cwords[cut:])))
            else:
                blocks.append((rng.randint(40, 250), y, chunk))
            row += 1
        block_lines = []
        ew = eh = None
        for x, y, text in blocks:
            ex, ey, ew, eh = _rot_forward(x, y, w, h, rotate)
            block_lines.append(f"block x={ex} y={ey} | {text}")
        rng.shuffle(block_lines)
        lines.append(f"obj page {page_num} w={ew} h={eh} rotate={rotate}")
        lines.extend(block_lines)
        lines.append("endobj")
    return "\n".join(lines)


def conv_turn_count(seed: int, k: int, n_convs: int, n_heavy: int) -> int:
    rng = random.Random(f"{seed}:count:{k}")
    if k >= n_convs - n_heavy:
        return rng.randint(200, 1000)
    return rng.randint(2, 12)


def turn_prefix_counts(seed: int, n_convs: int, n_heavy: int) -> np.ndarray:
    """prefix[k] = total turns of convs 0..k-1 (drives the monotone ts column)."""
    counts = np.fromiter(
        (conv_turn_count(seed, k, n_convs, n_heavy) for k in range(n_convs)),
        dtype=np.int64,
        count=n_convs,
    )
    prefix = np.zeros(n_convs + 1, dtype=np.int64)
    np.cumsum(counts, out=prefix[1:])
    return prefix


def conv_rows(
    seed: int, k: int, n_convs: int, n_heavy: int, prefix: np.ndarray
) -> dict[str, list]:
    """All rows for conversation k, duplicates included, conv-locally shuffled."""
    conv_id = f"conv{k:06d}"
    n_turns = conv_turn_count(seed, k, n_convs, n_heavy)
    rng = random.Random(f"{seed}:conv:{k}")
    rows: list[tuple] = []
    for turn_idx in range(n_turns):
        trng = random.Random(f"{seed}:turn:{conv_id}:{turn_idx}")
        gold = gold_text(seed, conv_id, turn_idx)
        roll = trng.random()
        if roll < 0.5:
            text = _gen_plain(trng, gold)
        elif roll < 0.8:
            text = _gen_html(trng, gold)
        else:
            text = _gen_pdf(trng, gold)
        if trng.random() < 0.15:
            role, tool = "tool", trng.choice(["search", "browser", "python"])
        else:
            role, tool = ("user", "") if turn_idx % 2 == 0 else ("assistant", "")
        ts = _TS_BASE_US + 60_000_000 * int(prefix[k] + turn_idx)
        rows.append((conv_id, turn_idx, role, text, tool, ts))
    # 1% exact duplicates of an earlier row (FIXTURES.md §1.1)
    dups = [row for row in rows if rng.random() < 0.01]
    rows.extend(dups)
    rng.shuffle(rows)
    return {
        "conv_id": [r[0] for r in rows],
        "turn_idx": [r[1] for r in rows],
        "role": [r[2] for r in rows],
        "text": [r[3] for r in rows],
        "tool": [r[4] for r in rows],
        "ts": [r[5] for r in rows],
    }


def _rows_to_table(cols: dict[str, list]) -> pa.Table:
    return pa.table(
        {
            "conv_id": pa.array(cols["conv_id"], type=pa.string()),
            "turn_idx": pa.array(cols["turn_idx"], type=pa.int32()),
            "role": pa.array(cols["role"], type=pa.string()),
            "text": pa.array(cols["text"], type=pa.string()),
            "tool": pa.array(cols["tool"], type=pa.string()),
            "ts": pa.array(cols["ts"], type=pa.timestamp("us")),
        }
    )


def generate_transcripts_table(size: str = "correctness", seed: int = 42) -> pa.Table:
    """Single-process generation with a global PRNG permutation shuffle."""
    n_convs, n_heavy = SIZES[size]
    prefix = turn_prefix_counts(seed, n_convs, n_heavy)
    merged: dict[str, list] = {c: [] for c in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    for k in range(n_convs):
        cols = conv_rows(seed, k, n_convs, n_heavy, prefix)
        for c in merged:
            merged[c].extend(cols[c])
    tbl = _rows_to_table(merged)
    perm = np.random.RandomState(seed).permutation(tbl.num_rows)
    return tbl.take(pa.array(perm))


def generate_transcripts_parquet(
    out_path: str, size: str = "correctness", seed: int = 42, use_ray: bool = False
) -> str:
    """Write transcripts to Parquet; Ray-parallel at bench scale.

    The Ray path fans conversation ids out over ``map_batches`` (per-conv
    PRNGs make it deterministic regardless of scheduling) and applies a
    seeded ``random_shuffle`` so stable turn ordering is genuinely
    re-established by the engine, not inherited from file order.
    """
    if not use_ray:
        tbl = generate_transcripts_table(size, seed)
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        # small row groups: parquet reads can only split at row-group
        # boundaries, and a single giant group serializes the whole scan
        pq.write_table(tbl, out_path, row_group_size=65536)
        return out_path

    import ray.data

    n_convs, n_heavy = SIZES[size]
    prefix = turn_prefix_counts(seed, n_convs, n_heavy)

    def gen_batch(batch: pa.Table) -> pa.Table:
        merged: dict[str, list] = {
            c: [] for c in ("conv_id", "turn_idx", "role", "text", "tool", "ts")
        }
        for k in batch.column("id").to_pylist():
            cols = conv_rows(seed, int(k), n_convs, n_heavy, prefix)
            for c in merged:
                merged[c].extend(cols[c])
        return _rows_to_table(merged)

    os.makedirs(out_path, exist_ok=True)
    generated = ray.data.range(n_convs).map_batches(
        gen_batch, batch_format="pyarrow", batch_size=64
    )
    # materialize() before random_shuffle: ray 2.49's shuffle upstream-fusion
    # chokes on the ReadTask-producing input operator ("Not a block type:
    # ReadTask"). The bench fixture fits comfortably in the object store and
    # this runs once per cache fill.
    generated = generated.materialize()
    generated.random_shuffle(seed=seed).write_parquet(out_path)
    return out_path


def write_expected_parquet(transcripts_path: str, out_path: str, seed: int = 42) -> str:
    """Emit the golden table (FIXTURES.md §1.3):
    (conv_id, turn_idx, kind, extracted_text, used_fallback), computed by
    the same pure functions the oracle uses."""
    from ..config import ExtractConfig
    from ..oracle import extract_table

    if os.path.isdir(transcripts_path):
        import pyarrow.dataset as pads

        tbl = pads.dataset(transcripts_path, format="parquet").to_table()
    else:
        tbl = pq.read_table(transcripts_path)
    out = extract_table(tbl, ExtractConfig()).select(
        ["conv_id", "turn_idx", "kind", "extracted_text", "used_fallback"]
    )
    pq.write_table(out, out_path, row_group_size=65536)
    return out_path


def transcripts_path_for(
    size: str, base_dir: str = "/tmp/graft_fixtures", seed: int = 42, use_ray: bool | None = None
) -> str:
    """Cached fixture location; generates on first use."""
    if use_ray is None:
        use_ray = size in ("bench", "scaling", "scaling2")
    suffix = "" if use_ray else ".parquet"
    path = os.path.join(base_dir, f"transcripts-{size}-s{seed}-v{FIXTURE_VERSION}{suffix}")
    done_marker = path + ".done"
    if os.path.exists(done_marker):
        return path
    generate_transcripts_parquet(path, size=size, seed=seed, use_ray=use_ray)
    with open(done_marker, "w") as fh:
        fh.write("ok\n")
    return path


# ---------------------------------------------------------------------------
# Conversation-duplication fixture ("convdup"): transcripts whose duplication
# structure is KNOWN by construction — exact forks (a whole conversation
# re-ingested under a new id, timestamps shifted), near forks (a conversation
# that shares its first ~70% of turns then diverges), and shared boilerplate
# leading turns (the same system prompt opening ~30% of conversations).
# This is the shape real agent-transcript corpora dedup against: retried or
# re-logged sessions, branched conversations, and templated system turns.
# The conversation-level dedup/overlap queries run over THIS table so their
# driver-hashed answers contain non-trivial duplicate groups at every scale.

CONVDUP_SIZES = {
    # name -> n_base_convs (forks add ~10% + ~14% more conversations)
    "smoke": 40,
    "correctness": 400,
    "bench": 20_000,
}

#: bumped when the convdup GENERATOR changes (the cache key is the file
#: name; content is not hashed) — independent of the main FIXTURE_VERSION
CONVDUP_VERSION = 2

BOILERPLATE = (
    "system boilerplate alpha: follow the tool protocol and cite sources",
    "system boilerplate bravo: respond concisely and prefer structured output",
    "system boilerplate charlie: refuse unsafe requests and log tool calls",
)

_DAY_US = 86_400_000_000


def _convdup_base_turns(seed: int, k: int) -> list[tuple[int, str, str, str]]:
    """Deterministic turns (turn_idx, role, text, tool) for base conv k."""
    conv_id = f"conv{k:06d}"
    rng = random.Random(f"{seed}:cdconv:{k}")
    n = rng.randint(4, 12)
    turns: list[tuple[int, str, str, str]] = []
    for i in range(n):
        trng = random.Random(f"{seed}:cdturn:{conv_id}:{i}")
        text = _gen_plain(trng, gold_text(seed, "cd" + conv_id, i))
        if trng.random() < 0.12:
            role, tool = "tool", trng.choice(["search", "browser", "python"])
        else:
            role, tool = ("user", "") if i % 2 == 0 else ("assistant", "")
        turns.append((i, role, text, tool))
    if k % 10 < 3:  # shared boilerplate system turn opens ~30% of convs
        turns[0] = (0, "user", BOILERPLATE[k % len(BOILERPLATE)], "")
    # ~25% of assistant turns QUOTE the turn before them (context
    # re-statement — the within-conversation repetition signal the
    # context_repeat analytics measure); chained quotes allowed
    for i in range(1, n):
        idx, role, text, tool = turns[i]
        qrng = random.Random(f"{seed}:quote:{conv_id}:{i}")
        if role == "assistant" and qrng.random() < 0.25:
            turns[i] = (idx, role, "quoting: " + turns[i - 1][2], tool)
    return turns


def convdup_rows(seed: int, k: int) -> dict[str, list]:
    """All rows derived from base conv k: the base conversation, its exact
    fork (every 10th conv), its near fork (every 7th), plus ~1% exact
    duplicate ROWS (re-logged events) — conv-locally shuffled. Suffixed
    fork ids sort after the base id, so canonical = min(conv_id) keeps
    the original."""
    conv_id = f"conv{k:06d}"
    base = _convdup_base_turns(seed, k)
    rng = random.Random(f"{seed}:cdrows:{k}")
    ts0 = _TS_BASE_US + _DAY_US * 30 + 120_000_000 * k
    rows: list[tuple] = [
        (conv_id, i, role, text, tool, ts0 + 60_000_000 * i)
        for (i, role, text, tool) in base
    ]
    if k % 10 == 0:  # exact fork: same turns, re-ingested a day later
        f_ts = ts0 + _DAY_US
        rows.extend(
            (conv_id + "f", i, role, text, tool, f_ts + 60_000_000 * i)
            for (i, role, text, tool) in base
        )
    if k % 7 == 3:  # near fork: shares first ~70% of turns, then diverges
        n = len(base)
        keep = max(1, (7 * n + 9) // 10)
        n_ts = ts0 + 2 * _DAY_US
        fork: list[tuple[int, str, str, str]] = list(base[:keep])
        for i in range(keep, n):
            trng = random.Random(f"{seed}:cdnf:{conv_id}:{i}")
            text = _gen_plain(trng, gold_text(seed, "nf" + conv_id, i))
            role, tool = ("user", "") if i % 2 == 0 else ("assistant", "")
            fork.append((i, role, text, tool))
        rows.extend(
            (conv_id + "n", i, role, text, tool, n_ts + 60_000_000 * i)
            for (i, role, text, tool) in fork
        )
    dups = [row for row in rows if rng.random() < 0.01]
    rows.extend(dups)
    rng.shuffle(rows)
    return {
        "conv_id": [r[0] for r in rows],
        "turn_idx": [r[1] for r in rows],
        "role": [r[2] for r in rows],
        "text": [r[3] for r in rows],
        "tool": [r[4] for r in rows],
        "ts": [r[5] for r in rows],
    }


def generate_convdup_table(size: str = "correctness", seed: int = 42) -> pa.Table:
    n_convs = CONVDUP_SIZES[size]
    merged: dict[str, list] = {
        c: [] for c in ("conv_id", "turn_idx", "role", "text", "tool", "ts")
    }
    for k in range(n_convs):
        cols = convdup_rows(seed, k)
        for c in merged:
            merged[c].extend(cols[c])
    tbl = _rows_to_table(merged)
    perm = np.random.RandomState(seed + 7).permutation(tbl.num_rows)
    return tbl.take(pa.array(perm))


def convdup_path_for(
    size: str, base_dir: str = "/tmp/graft_fixtures", seed: int = 42
) -> str:
    """Cached convdup fixture location; generates on first use."""
    path = os.path.join(
        base_dir,
        f"convdup-{size}-s{seed}-cv{CONVDUP_VERSION}-v{FIXTURE_VERSION}.parquet",
    )
    done_marker = path + ".done"
    if os.path.exists(done_marker):
        return path
    os.makedirs(base_dir, exist_ok=True)
    pq.write_table(generate_convdup_table(size, seed), path, row_group_size=65536)
    with open(done_marker, "w") as fh:
        fh.write("ok\n")
    return path


# --------------------------------------------------------------------------
# RICH-TEXT fixture: transcripts whose turns carry planted PII tokens,
# fenced code blocks and URLs — the inputs the redaction / code-mining /
# link-mining analytics need. Same style as the reference's synthetic
# fixture pages with exact expected outputs
# (/root/reference/tests/test_page_images.py:42-89): every planted item
# is deterministic per (seed, conv, turn), near-misses included so the
# patterns are exercised on both hits and non-hits.

RICH_SIZES = {
    # name -> n_convs
    "smoke": 40,
    "correctness": 400,
    "bench": 20_000,
}

#: bumped when the rich GENERATOR changes (cache key is the file name)
RICH_VERSION = 2

_RICH_DOMAINS = (
    "example.com", "data.example.org", "docs.rayproject.dev",
    "arrow.apache.org", "wiki.internal.test", "cdn.assets.net",
)
_RICH_LANGS = ("python", "js", "sql", "bash", "")
_NEAR_MISSES = (
    "admin@local",              # email without TLD
    "version 1.2.3",            # three-octet, not an IP
    "case 12-34",               # too-short digit runs
    "agent 007-12-345",         # 3-2-3, not SSN's 3-2-4
    "4111111111111111",         # 16 digits w/o separators: not our CC shape
)


def _rich_pii_items(rng: random.Random) -> list[str]:
    """1-3 deterministic PII strings (kind chosen per item)."""
    items = []
    for _ in range(rng.randint(1, 3)):
        kind = rng.choice(["email", "cc", "ssn", "phone", "phone2", "ip"])
        if kind == "email":
            items.append(
                f"user{rng.randint(1, 9999)}@{rng.choice(_RICH_DOMAINS)}"
            )
        elif kind == "cc":
            sep = rng.choice(["-", " "])
            items.append(sep.join(f"{rng.randint(0, 9999):04d}" for _ in range(4)))
        elif kind == "ssn":
            items.append(
                f"{rng.randint(100, 999)}-{rng.randint(10, 99)}-{rng.randint(1000, 9999)}"
            )
        elif kind == "phone":
            items.append(
                f"({rng.randint(200, 989)}) {rng.randint(200, 989)}-{rng.randint(1000, 9999)}"
            )
        elif kind == "phone2":
            items.append(
                f"{rng.randint(200, 989)}-{rng.randint(200, 989)}-{rng.randint(1000, 9999)}"
            )
        else:
            items.append(".".join(str(rng.randint(1, 254)) for _ in range(4)))
    return items


def _rich_markdown_block(rng: random.Random) -> str:
    """Markdown structure: a heading plus bullet / numbered / quote lines
    (plus near-miss lines a naive parser over-counts: '#hash' without a
    space, '-dash' without a space, mid-line '- not a bullet')."""
    level = rng.randint(1, 3)
    lines = [f"{'#' * level} " + " ".join(rng.choice(WORDS) for _ in range(3))]
    for _ in range(rng.randint(1, 3)):
        lines.append("- " + " ".join(rng.choice(WORDS) for _ in range(rng.randint(2, 5))))
    if rng.random() < 0.5:
        for j in range(rng.randint(1, 2)):
            lines.append(f"{j + 1}. " + " ".join(rng.choice(WORDS) for _ in range(3)))
    if rng.random() < 0.4:
        lines.append("> " + " ".join(rng.choice(WORDS) for _ in range(4)))
    if rng.random() < 0.3:
        lines.append(rng.choice(["#hash without space", "-dash without space",
                                 "text with - not a bullet", "5.no space after dot"]))
    return "\n".join(lines)


def _rich_code_block(rng: random.Random) -> str:
    lang = rng.choice(_RICH_LANGS)
    n_lines = rng.randint(1, 4)
    body = "\n".join(
        " ".join(rng.choice(WORDS) for _ in range(rng.randint(2, 6)))
        for _ in range(n_lines)
    )
    return f"```{lang}\n{body}\n```"


def _rich_urls(rng: random.Random) -> list[str]:
    urls = []
    for _ in range(rng.randint(1, 3)):
        scheme = rng.choice(["https", "https", "http"])
        dom = rng.choice(_RICH_DOMAINS)
        path = "/".join(rng.choice(WORDS) for _ in range(rng.randint(1, 3)))
        u = f"{scheme}://{dom}/{path}"
        if rng.random() < 0.3:
            u += f"?q={rng.randint(1, 99)}"
        form = rng.random()
        if form < 0.2:
            u = f"({u})"          # paren-wrapped: bracket excluded from URL
        elif form < 0.35:
            u = u + "."           # sentence-final dot: INCLUDED by the char class
        urls.append(u)
    return urls


def _rich_turns(seed: int, k: int) -> list[tuple[int, str, str, str]]:
    """Deterministic (turn_idx, role, text, tool) rows for rich conv k."""
    conv_id = f"conv{k:06d}"
    rng = random.Random(f"{seed}:richconv:{k}")
    n = rng.randint(3, 10)
    turns: list[tuple[int, str, str, str]] = []
    for i in range(n):
        trng = random.Random(f"{seed}:richturn:{conv_id}:{i}")
        text = _gen_plain(trng, gold_text(seed, "rt" + conv_id, i))
        if trng.random() < 0.10:
            role, tool = "tool", trng.choice(["search", "browser", "python"])
        else:
            role, tool = ("user", "") if i % 2 == 0 else ("assistant", "")
        extras: list[str] = []
        if trng.random() < 0.30:
            extras.append("contact: " + " or ".join(_rich_pii_items(trng)))
        if trng.random() < 0.25:
            extras.append("see " + " and ".join(_rich_urls(trng)))
        if trng.random() < 0.25:
            extras.append(trng.choice(_NEAR_MISSES))
        if role == "assistant" and trng.random() < 0.18:
            extras.append(_rich_markdown_block(trng))
        if role == "assistant" and trng.random() < 0.20:
            for _ in range(trng.randint(1, 2)):
                extras.append(_rich_code_block(trng))
            if trng.random() < 0.08:
                extras.append("``` unterminated fence tail")
        if extras:
            text = text + "\n" + "\n".join(extras)
        turns.append((i, role, text, tool))
    return turns


def rich_rows(seed: int, k: int) -> dict[str, list]:
    conv_id = f"conv{k:06d}"
    ts0 = _TS_BASE_US + _DAY_US * 60 + 90_000_000 * k
    rows = [
        (conv_id, i, role, text, tool, ts0 + 45_000_000 * i)
        for (i, role, text, tool) in _rich_turns(seed, k)
    ]
    return {
        "conv_id": [r[0] for r in rows],
        "turn_idx": [r[1] for r in rows],
        "role": [r[2] for r in rows],
        "text": [r[3] for r in rows],
        "tool": [r[4] for r in rows],
        "ts": [r[5] for r in rows],
    }


def generate_rich_table(size: str = "correctness", seed: int = 42) -> pa.Table:
    n_convs = RICH_SIZES[size]
    merged: dict[str, list] = {
        c: [] for c in ("conv_id", "turn_idx", "role", "text", "tool", "ts")
    }
    for k in range(n_convs):
        cols = rich_rows(seed, k)
        for c in merged:
            merged[c].extend(cols[c])
    tbl = _rows_to_table(merged)
    perm = np.random.RandomState(seed + 11).permutation(tbl.num_rows)
    return tbl.take(pa.array(perm))


def rich_path_for(
    size: str, base_dir: str = "/tmp/graft_fixtures", seed: int = 42
) -> str:
    """Cached rich-text fixture location; generates on first use."""
    path = os.path.join(
        base_dir,
        f"rich-{size}-s{seed}-rv{RICH_VERSION}-v{FIXTURE_VERSION}.parquet",
    )
    done_marker = path + ".done"
    if os.path.exists(done_marker):
        return path
    os.makedirs(base_dir, exist_ok=True)
    pq.write_table(generate_rich_table(size, seed), path, row_group_size=65536)
    with open(done_marker, "w") as fh:
        fh.write("ok\n")
    return path


# --------------------------------------------------------------------------
# schema-drift fixture: one logical feed written by three generations of a
# producer whose schema evolved (column added, column reordered/dropped) —
# the union-by-name ingestion reality of long-lived 100-TB corpora.

def generate_schema_drift_files(out_dir: str, size: str = "correctness",
                                seed: int = 42) -> list[str]:
    """Split the transcripts fixture into 3 parquet files with drifted
    schemas: gen0 (conv_id, turn_idx, text), gen1 (+ tool), gen2
    (+ ts, text reordered). Deterministic row routing by conv hash."""
    tbl = pq.read_table(transcripts_path_for(size, seed=seed))
    conv = tbl.column("conv_id").to_pylist()
    import zlib as _z

    gen = np.array([_z.crc32(c.encode()) % 3 for c in conv], np.int64)
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for g in range(3):
        part = tbl.filter(pa.array(gen == g))
        if g == 0:
            part = part.select(["conv_id", "turn_idx", "text"])
        elif g == 1:
            part = part.select(["conv_id", "turn_idx", "text", "tool"])
        else:
            part = part.select(["conv_id", "ts", "turn_idx", "text"])
        p = os.path.join(out_dir, f"gen{g}.parquet")
        pq.write_table(part, p)
        paths.append(p)
    return paths


def schema_drift_paths_for(size: str, base_dir: str = "/tmp/graft_fixtures",
                           seed: int = 42) -> list[str]:
    out_dir = os.path.join(base_dir, f"drift-{size}-s{seed}-v{FIXTURE_VERSION}")
    done = os.path.join(out_dir, ".done")
    paths = [os.path.join(out_dir, f"gen{g}.parquet") for g in range(3)]
    if os.path.exists(done):
        return paths
    generate_schema_drift_files(out_dir, size=size, seed=seed)
    with open(done, "w") as fh:
        fh.write("ok\n")
    return paths


def documents_tsv_path_for(sf_dir: str, base_dir: str = "/tmp/graft_fixtures") -> str:
    """Plain-text TSV twin of ``{sf_dir}/documents.parquet`` (one
    ``doc_id<TAB>text`` line per doc) for the line-oriented
    source-parity op: the corpus texts contain no tab/newline/CR (the
    writer enforces it with a ValueError), so the byte stream is unambiguous for any line
    reader. Cached by source identity like the NDJSON twin."""
    import hashlib

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    key = hashlib.md5(
        f"{os.path.abspath(src)}:{st.st_size}:{int(st.st_mtime)}".encode()
    ).hexdigest()[:12]
    os.makedirs(base_dir, exist_ok=True)
    path = os.path.join(base_dir, f"documents-tsv-{key}-v{FIXTURE_VERSION}.tsv")
    if os.path.exists(path):
        return path
    tbl = pq.read_table(src, columns=["doc_id", "text"])
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        for did, tx in zip(
            tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
        ):
            if "\t" in tx or "\n" in tx or "\r" in tx:
                # data invariant, not a debug check: under `python -O` a
                # bare assert would silently emit a corrupt TSV whose
                # line count no longer matches the corpus
                raise ValueError(
                    f"doc {did}: text contains tab/newline/CR — not "
                    "representable as one TSV line"
                )
            fh.write(f"{did}\t{tx}\n")
    os.replace(tmp, path)
    return path


def events_jsonl_path_for(sf_dir: str, base_dir: str = "/tmp/graft_fixtures") -> str:
    """NDJSON twin of ``{sf_dir}/events.parquet`` for the multi-format
    source-parity op: one JSON object per line with ts as exact epoch-µs
    int (no timestamp-format parsing drift) and floats via Python repr
    (shortest round-trip — every correct JSON parser recovers the same
    double). Cached by source identity (path, size, mtime); conversion
    is driver-side pyarrow, fine for fixture scale — a production
    converter would be one Ray map_batches + write_json pass."""
    import hashlib
    import json

    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    key = hashlib.md5(
        f"{os.path.abspath(src)}:{st.st_size}:{int(st.st_mtime)}".encode()
    ).hexdigest()[:12]
    os.makedirs(base_dir, exist_ok=True)
    path = os.path.join(base_dir, f"events-jsonl-{key}-v{FIXTURE_VERSION}.jsonl")
    if os.path.exists(path):
        return path
    tbl = pq.read_table(src, columns=["event_id", "ts", "user_id", "event_type", "value"])
    ts_us = tbl.column("ts").cast(pa.int64()).to_pylist()
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        for eid, t, u, et, v in zip(
            tbl.column("event_id").to_pylist(), ts_us,
            tbl.column("user_id").to_pylist(),
            tbl.column("event_type").to_pylist(),
            tbl.column("value").to_pylist(),
        ):
            fh.write(json.dumps(
                {"event_id": eid, "ts_us": t, "user_id": u,
                 "event_type": et, "value": v}
            ) + "\n")
    os.replace(tmp, path)
    return path
