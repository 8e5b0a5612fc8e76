"""Arrow schema constants + validation.

Fixed, declared schemas in the spirit of the reference's strict config
key validation (``src/pdf-toolkit/config.py:100-111``): the input schema
is validated at pipeline build time and mismatches fail fast with a
clear ``UserError`` (analog of ``utils.py:14-15``).
"""

from __future__ import annotations

import pyarrow as pa

from . import UserError

# Input schema — from BASELINE.json `input_hint`.
TRANSCRIPTS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# Span struct — analog of the reference BBox 4-tuple (page_images.py:21):
# character offsets into `extracted_text` plus the producing stage + score.
SPAN_TYPE = pa.struct(
    [
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("kind", pa.string()),
        ("score", pa.float32()),
    ]
)

# Columns the extraction stage appends to the input.
EXTRACTED_COLUMNS = pa.schema(
    [
        ("kind", pa.string()),  # plain|html|pdf, sniffed
        ("extracted_text", pa.large_string()),
        ("spans", pa.list_(SPAN_TYPE)),
        ("notes", pa.list_(pa.string())),  # fallback notes, page_images.py:349-405 analog
        ("used_fallback", pa.bool_()),
    ]
)


EXTRACTED_WITH_KEYS_SCHEMA = pa.schema(
    list(TRANSCRIPTS_SCHEMA)
    + list(EXTRACTED_COLUMNS)
    + [("part_id", pa.int32()), ("salt", pa.int32())]
)

FINALIZED_SCHEMA = pa.schema(
    list(TRANSCRIPTS_SCHEMA)
    + list(EXTRACTED_COLUMNS)
    + [
        ("conv_n_turns", pa.int32()),
        ("is_final_turn", pa.bool_()),
        ("prev_role", pa.string()),
        ("part_id", pa.int32()),
        ("salt", pa.int32()),
    ]
)


def validate_transcripts_schema(schema: pa.Schema) -> None:
    """Fail fast when the input parquet does not look like a transcripts table."""
    names = set(schema.names)
    missing = [f.name for f in TRANSCRIPTS_SCHEMA if f.name not in names]
    if missing:
        raise UserError(
            f"input is missing required transcript columns: {missing}; "
            f"expected {TRANSCRIPTS_SCHEMA.names}"
        )
    for field in TRANSCRIPTS_SCHEMA:
        got = schema.field(field.name).type
        if got != field.type and not (
            pa.types.is_string(got) and pa.types.is_string(field.type)
        ):
            raise UserError(
                f"column {field.name!r} has type {got}, expected {field.type}"
            )
