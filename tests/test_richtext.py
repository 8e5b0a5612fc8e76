"""Rich-text kernels (functions/richtext.py): PII redaction goldens and
RE2-vs-DuckDB parity on adversarial near-misses, fence-split edge cases,
URL partial accounting, and rich fixture determinism."""

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from pdf_toolkit_ray.functions.richtext import (
    DOMAIN_PATTERN,
    PII_KINDS,
    PII_PATTERNS,
    URL_PATTERN,
    fenced_blocks,
    redact_pii,
    url_partials,
)

ADVERSARIAL = [
    "contact john.doe+spam@example.co.uk or admin@local",
    "card 4111-1111-1111-1111 exp 12/26",
    "ssn 123-45-6789 and phone 555-123-4567",
    "call (212) 555-0198 or +1 415-555-0000",
    "server at 192.168.0.1 port 8080, version 1.2.3",
    "agent 007-12-345 case 12-34",
    "dual 10.0.0.1 and 10.0.0.2, mail a_b%c@x.io.",
    "16 digits 4111111111111111 no separators",
    "",
    "edge 999.999.999.999 still ip-shaped",
]


def test_redact_goldens():
    red, counts = redact_pii(pa.array(ADVERSARIAL))
    red = red.to_pylist()
    assert red[0] == "contact <EMAIL> or admin@local"
    assert red[1] == "card <CC> exp 12/26"
    assert red[2] == "ssn <ID> and phone <PHONE>"
    assert red[3] == "call <PHONE> or +1 <PHONE>"
    assert red[4] == "server at <IP> port 8080, version 1.2.3"
    assert red[5] == "agent 007-12-345 case 12-34"  # near-misses untouched
    assert red[7] == "16 digits 4111111111111111 no separators"
    assert counts["email"].to_pylist()[0] == 1
    assert counts["ip"].to_pylist()[6] == 2
    assert counts["phone"].to_pylist()[3] == 2


def test_redact_duckdb_parity():
    """The sequential Arrow RE2 chain must agree with chained DuckDB
    regexp_replace / regexp_extract_all on every adversarial string —
    the exact mechanism the SQL twins rely on."""
    con = duckdb.connect()
    cur_arrow = pa.array(ADVERSARIAL)
    cur_sql = list(ADVERSARIAL)
    for kind, pat, repl in PII_PATTERNS:
        n_arrow = pc.count_substring_regex(cur_arrow, pat).to_pylist()
        cur_arrow = pc.replace_substring_regex(cur_arrow, pat, repl)
        for i, t in enumerate(cur_sql):
            n_sql, r_sql = con.execute(
                "SELECT length(regexp_extract_all(?, ?)), "
                "regexp_replace(?, ?, ?, 'g')",
                [t, pat, t, pat, repl],
            ).fetchone()
            assert n_sql == n_arrow[i], (kind, t)
            cur_sql[i] = r_sql
    assert cur_arrow.to_pylist() == cur_sql


def _fence_table(texts):
    return pa.table(
        {
            "conv_id": pa.array([f"c{i}" for i in range(len(texts))]),
            "turn_idx": pa.array(range(len(texts)), pa.int32()),
            "text": pa.array(texts, pa.string()),
        }
    )


def test_fenced_blocks_edges():
    texts = [
        "intro\n```python\nprint(1)\nprint(2)\n```\ntail ```js\nx=1\n``` end",
        "no fences here",
        "```\nbare block\n```",
        "odd fence ``` trailing not a block",
        "``````",  # two fences -> one empty block
        "```lang-only-no-newline```",
    ]
    out = fenced_blocks(_fence_table(texts))
    rows = {
        (r["conv_id"], r["block_idx"]): r for r in out.to_pylist()
    }
    r0 = rows[("c0", 0)]
    assert (r0["lang"], r0["n_lines"], r0["n_chars"]) == ("python", 3, 18)
    r01 = rows[("c0", 1)]
    assert (r01["lang"], r01["n_lines"]) == ("js", 2)
    assert ("c1", 0) not in rows
    # an unclosed opening fence runs to EOF (CommonMark rule): the odd
    # split position makes it a block on both the Arrow and SQL sides
    r3 = rows[("c3", 0)]
    assert (r3["lang"], r3["n_lines"], r3["n_chars"]) == (
        "trailing not a block", 0, 0)
    r2 = rows[("c2", 0)]
    assert (r2["lang"], r2["n_lines"], r2["n_chars"]) == ("", 2, 11)
    r4 = rows[("c4", 0)]
    assert (r4["lang"], r4["n_lines"], r4["n_chars"]) == ("", 0, 0)
    r5 = rows[("c5", 0)]
    # no newline: whole segment is the lang line, empty body
    assert (r5["lang"], r5["n_lines"], r5["n_chars"]) == (
        "lang-only-no-newline", 0, 0)


def test_fenced_blocks_matches_sql_ordinal_rule():
    """Python parity with the twin's even-ordinal unnest filter."""
    con = duckdb.connect()
    texts = [
        "a```b```c```d",           # two blocks: b (idx 0) and d? NO: d is pos 3
        "x``` only-open",
        "pre``` mid ```post``` tail2 ```fin",
    ]
    out = fenced_blocks(_fence_table(texts)).to_pylist()
    for i, t in enumerate(texts):
        sql_parts = con.execute(
            "SELECT part FROM (SELECT unnest(string_split(?, '```')) AS part,"
            " generate_subscripts(string_split(?, '```'), 1) AS ord)"
            " WHERE ord % 2 = 0",
            [t, t],
        ).fetchall()
        got = [r for r in out if r["conv_id"] == f"c{i}"]
        assert len(got) == len(sql_parts)


def test_url_partials_accounting():
    batch = pa.table(
        {
            "conv_id": pa.array(["a", "a", "b", "b"]),
            "turn_idx": pa.array([0, 1, 0, 1], pa.int32()),
            "text": pa.array(
                [
                    "see https://x.com/a and https://x.com/b and http://y.io/c",
                    "again https://x.com/d.",
                    "(https://x.com/e) ftp://nope",
                    "no links",
                ]
            ),
        }
    )
    out = url_partials(batch).to_pylist()
    got = {(r["domain"], r["conv_id"]): (r["n_urls"], r["n_turns"]) for r in out}
    assert got[("x.com", "a")] == (3, 2)
    assert got[("y.io", "a")] == (1, 1)
    assert got[("x.com", "b")] == (1, 1)
    assert ("nope", "b") not in got


def test_url_regex_duckdb_parity():
    import re

    con = duckdb.connect()
    rx = re.compile(URL_PATTERN)
    drx = re.compile(DOMAIN_PATTERN)
    cases = [
        "see https://example.com/a/b?q=1 and http://x.io.",
        "(https://en.wikipedia.org/wiki/Foo) [http://a.b/c] 'https://q.r'",
        "trailing comma https://h.st/p,q;r then text",
        "bare scheme https:// nothing",
    ]
    for t in cases:
        py = rx.findall(t)
        sql = con.execute(
            "SELECT regexp_extract_all(?, ?)", [t, URL_PATTERN]
        ).fetchone()[0]
        assert py == sql
        for u in py:
            m = drx.match(u)
            pyd = m.group(1) if m else ""
            sqld = con.execute(
                "SELECT regexp_extract(?, ?, 1)", [u, DOMAIN_PATTERN]
            ).fetchone()[0]
            assert pyd == sqld


def test_rich_fixture_deterministic_and_planted():
    from pdf_toolkit_ray.sources.fixtures import generate_rich_table

    a = generate_rich_table("smoke")
    b = generate_rich_table("smoke")
    assert a.equals(b)
    # (conv_id, turn_idx) unique — the redaction twin depends on it
    keys = a.select(["conv_id", "turn_idx"])
    assert keys.group_by(["conv_id", "turn_idx"]).aggregate([]).num_rows == a.num_rows
    texts = a.column("text").to_pylist()
    assert sum("contact:" in t for t in texts) > 10
    assert sum("```" in t for t in texts) > 5
    assert sum("http" in t for t in texts) > 10
    _, counts = redact_pii(a.column("text"))
    assert all(sum(counts[k].to_pylist()) > 0 for k in PII_KINDS)


def test_repetition_runs_engineered(ray_session, tmp_path):
    """Vectorized run accounting vs hand-computed goldens, including
    case/punct folding, cross-run tails and punct-only rows."""
    import pyarrow.parquet as _pq

    from pdf_toolkit_ray import queries

    tbl = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c", "d", "e"]),
            "text": pa.array(
                [
                    "one one one two two three",   # runs: 3,2,1
                    "loop",                        # single word
                    "...",                         # no tokens
                    "x X x!x",                     # case/punct fold -> run 4
                    "end end",                     # run of 2 at buffer tail
                ]
            ),
        }
    )
    _pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = queries.repetition_runs_documents(str(tmp_path)).to_pylist()
    rows = {r["doc_id"]: r for r in got}
    assert rows["a"] == {"doc_id": "a", "n_words": 6, "max_run": 3, "n_run2plus": 2}
    assert rows["b"] == {"doc_id": "b", "n_words": 1, "max_run": 1, "n_run2plus": 0}
    assert rows["c"] == {"doc_id": "c", "n_words": 0, "max_run": 0, "n_run2plus": 0}
    assert rows["d"] == {"doc_id": "d", "n_words": 4, "max_run": 4, "n_run2plus": 1}
    assert rows["e"] == {"doc_id": "e", "n_words": 2, "max_run": 2, "n_run2plus": 1}
