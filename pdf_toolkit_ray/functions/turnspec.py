"""Strict turn-selection grammar — the per-turn analog of the reference's
page-spec parsers (``src/pdf-toolkit/utils.py:93-161`` ``parse_page_spec``
and ``utils.py:164-233`` ``parse_page_ranges``), with the same validation
semantics: 1-based input, "all"/"*", explicit errors for empty tokens,
malformed ranges, non-digits, start > end, duplicates and overlaps.

Differences forced by scale: ``total_turns`` is optional — a 10^12-turn
table's per-conversation turn count is not known at plan time, so the
out-of-range check only applies when a total is given; selection is
applied as a parquet predicate pushdown (``turn_filter_expression``), not
by materializing an index list per conversation.
"""

from __future__ import annotations

from .. import UserError


def _parse_tokens(spec: str, what: str) -> list[str]:
    raw = spec.strip()
    if not raw:
        raise UserError(f"{what} selection is empty.")
    compact = raw.replace(" ", "")
    tokens = compact.split(",")
    if any(token == "" for token in tokens):
        raise UserError(f"{what} selection contains an empty token (check commas).")
    return tokens


def _parse_token(token: str) -> tuple[int, int]:
    if "-" in token:
        parts = token.split("-")
        if len(parts) != 2 or not parts[0] or not parts[1]:
            raise UserError(f"Invalid range '{token}'. Use formats like 1-3 or 5.")
        if not (parts[0].isdigit() and parts[1].isdigit()):
            raise UserError(f"Invalid range '{token}'. Turn numbers must be digits.")
        start, end = int(parts[0]), int(parts[1])
    else:
        if not token.isdigit():
            raise UserError(f"Invalid turn token '{token}'. Use formats like 1 or 2-4.")
        start = end = int(token)
    if start < 1 or end < 1:
        raise UserError("Turn numbers are 1-based and must be >= 1.")
    if start > end:
        raise UserError(f"Invalid range '{token}': start > end.")
    return start, end


def parse_turn_spec(spec: str, total_turns: int | None = None) -> list[int]:
    """"1-3,5,7-9" / "all" → 0-based turn indices, in spec order.

    Strict: duplicates, malformed tokens and (when ``total_turns`` is
    given) out-of-range turns raise ``UserError``.
    """
    compact = spec.strip().replace(" ", "")
    if compact.lower() in {"all", "*"}:
        if total_turns is None:
            raise UserError(
                "'all' needs a known total turn count; omit the spec instead."
            )
        if total_turns <= 0:
            raise UserError("Table has no turns.")
        return list(range(total_turns))
    tokens = _parse_tokens(spec, "Turn")

    turns: list[int] = []
    seen: set[int] = set()
    for token in tokens:
        start, end = _parse_token(token)
        for turn_number in range(start, end + 1):
            if total_turns is not None and turn_number > total_turns:
                raise UserError(
                    f"Turn {turn_number} is out of range. Table has {total_turns} turns."
                )
            if turn_number in seen:
                raise UserError(f"Duplicate turn {turn_number} in selection.")
            seen.add(turn_number)
            turns.append(turn_number - 1)  # zero-based

    if not turns:
        raise UserError("Turn selection produced no turns.")
    return turns


def parse_turn_ranges(spec: str, total_turns: int | None = None) -> list[tuple[int, int]]:
    """"1-120,121-240" → 0-based inclusive (start, end) tuples.

    Overlapping ranges are an error (``utils.py:222-226`` semantics);
    "all" is rejected — ranges must be explicit.
    """
    compact = spec.strip().replace(" ", "") if spec.strip() else ""
    if compact.lower() in {"all", "*"}:
        raise UserError("Use explicit ranges like 1-120,121-240.")
    tokens = _parse_tokens(spec, "Ranges")

    ranges: list[tuple[int, int]] = []
    covered: list[tuple[int, int]] = []
    for token in tokens:
        start, end = _parse_token(token)
        if total_turns is not None and end > total_turns:
            raise UserError(
                f"Turn {end} is out of range. Table has {total_turns} turns."
            )
        for c_start, c_end in covered:
            if start <= c_end and end >= c_start:
                overlap = max(start, c_start)
                raise UserError(
                    f"Ranges overlap on turn {overlap}. Overlaps are not allowed."
                )
        covered.append((start, end))
        ranges.append((start - 1, end - 1))

    if not ranges:
        raise UserError("Ranges selection produced no turns.")
    return ranges


def turn_filter_expression(spec: str):
    """Compile a turn spec into a pyarrow dataset filter expression on
    ``turn_idx`` (0-based column) for predicate pushdown at the read —
    row groups outside the selection never leave storage."""
    import pyarrow.compute as pc

    compact = spec.strip().replace(" ", "")
    if compact.lower() in {"all", "*"}:
        return None
    tokens = _parse_tokens(spec, "Turn")
    expr = None
    seen: set[tuple[int, int]] = set()
    for token in tokens:
        start, end = _parse_token(token)
        for c_start, c_end in seen:
            if start <= c_end and end >= c_start:
                raise UserError(
                    f"Duplicate turn {max(start, c_start)} in selection."
                )
        seen.add((start, end))
        # spec is 1-based; the column is 0-based
        clause = (pc.field("turn_idx") >= start - 1) & (pc.field("turn_idx") <= end - 1)
        expr = clause if expr is None else (expr | clause)
    return expr
