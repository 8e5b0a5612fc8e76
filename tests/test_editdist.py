"""Edit-distance kernel + fuzzy_lev_pairs pipeline tests.

The kernel's contract is BYTE-level Levenshtein identical to DuckDB's
``levenshtein`` (the twin's verify predicate), so the property test
checks three-way agreement: vectorized batch kernel == pure-python
reference DP == DuckDB, over random unicode strings."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_toolkit_ray.functions.editdist import levenshtein_batch, levenshtein_ref


def test_known_distances():
    cases = [
        ("", "", 0),
        ("", "abc", 3),
        ("abc", "", 3),
        ("kitten", "sitting", 3),
        ("flaw", "lawn", 2),
        ("abc", "abc", 0),
        # DuckDB counts BYTES: é is 2 UTF-8 bytes -> substitution costs 2
        ("héllo", "hello", 2),
    ]
    got = levenshtein_batch([a for a, _, _ in cases], [b for _, b, _ in cases])
    assert got.tolist() == [d for _, _, d in cases]


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcdé€ ", max_size=16),
            st.text(alphabet="abcdé€ ", max_size=16),
        ),
        min_size=0,
        max_size=20,
    )
)
def test_batch_matches_reference_and_duckdb(pairs):
    left = [a for a, _ in pairs]
    right = [b for _, b in pairs]
    got = levenshtein_batch(left, right)
    assert got.dtype == np.int64 and len(got) == len(pairs)
    con = duckdb.connect()
    for (a, b), g in zip(pairs, got):
        assert g == levenshtein_ref(a, b)
        assert g == con.execute("select levenshtein(?, ?)", [a, b]).fetchone()[0]


def test_batch_mixed_lengths_exact_corners():
    # pairs whose (len_a, len_b) corners interleave verify the per-row
    # capture logic (answers recorded mid-loop must not be overwritten)
    left = ["a" * n for n in range(0, 40, 3)]
    right = ["b" * n for n in reversed(range(0, 40, 3))]
    got = levenshtein_batch(left, right)
    for a, b, g in zip(left, right, got):
        assert g == levenshtein_ref(a, b)


def _planted_corpus() -> pa.Table:
    """60 base docs + 6 near-dup pairs differing by small in-place word
    edits (within Levenshtein 8 of each other's 64-char prefix), plus
    one far pair that candidates must reject at verify."""
    rng = np.random.default_rng(7)
    vocab = np.array(
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu".split()
    )
    ids, texts = [], []
    for i in range(60):
        words = rng.choice(vocab, size=30).tolist()
        ids.append(i)
        texts.append(" ".join(words))
    for k in range(6):
        base = texts[k * 3].split(" ")
        mutated = list(base)
        mutated[20] = "zz"  # late edit: shared 5-gram prefix band intact
        ids.append(100 + k)
        texts.append(" ".join(mutated))
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})


FUZZY_CAND_VERIFY_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM docs),
s AS (
  SELECT doc_id, unnest(CASE WHEN len(words) >= 5 THEN
      list_distinct(list_transform(range(1, len(words) - 3),
        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2] || ' '
             || words[i+3] || ' ' || words[i+4]))
    ELSE [array_to_string(words, ' ')] END) AS sh
  FROM w),
ok AS (SELECT sh FROM s GROUP BY sh HAVING count(*) <= 50),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM s x JOIN s y ON x.sh = y.sh AND x.doc_id < y.doc_id
  WHERE x.sh IN (SELECT sh FROM ok)),
k AS (SELECT doc_id, substr(text, 1, 64) AS key FROM docs)
SELECT c.a, c.b, CAST(levenshtein(ka.key, kb.key) AS BIGINT) AS lev
FROM cand c JOIN k ka ON ka.doc_id = c.a JOIN k kb ON kb.doc_id = c.b
WHERE levenshtein(ka.key, kb.key) <= 8
ORDER BY a, b
"""


def _run_fuzzy(ray, tbl: pa.Table, **kw):
    from pdf_toolkit_ray.stages.dedup import fuzzy_lev_pairs

    ds = ray.data.from_arrow(tbl)
    out = (
        fuzzy_lev_pairs(ds, "doc_id", "text", **kw)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    return out


def test_fuzzy_lev_pairs_matches_sql_twin(ray_session):
    tbl = _planted_corpus()
    out = _run_fuzzy(ray_session, tbl)
    con = duckdb.connect()
    con.register("docs", tbl)
    ref = con.execute(FUZZY_CAND_VERIFY_SQL).fetchdf()
    assert len(out) == len(ref) and len(out) >= 6
    assert out["a"].tolist() == ref["a"].tolist()
    assert out["b"].tolist() == ref["b"].tolist()
    assert out["lev"].tolist() == ref["lev"].tolist()


def test_fuzzy_lev_pairs_join_path_matches_broadcast(ray_session):
    tbl = _planted_corpus()
    broadcast = _run_fuzzy(ray_session, tbl)
    joined = _run_fuzzy(ray_session, tbl, broadcast_pair_limit=0)  # force scale path
    assert broadcast.equals(joined)


def test_fuzzy_lev_pairs_empty_result_is_typed(ray_session):
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            # share no 5-gram: no candidates at all
            "text": pa.array(["a b c d e f g h", "q r s t u v w x"]),
        }
    )
    from pdf_toolkit_ray.stages.dedup import fuzzy_lev_pairs

    ds = ray_session.data.from_arrow(tbl)
    out = fuzzy_lev_pairs(ds, "doc_id", "text")
    schema = out.schema()
    schema = getattr(schema, "base_schema", schema)
    assert schema.names == ["a", "b", "lev"]
    assert out.count() == 0


def test_fuzzy_shingle_cap_drops_stop_shingles(ray_session):
    # every doc shares one hot shingle; cap=3 must suppress the explosion
    hot = "x x x x x"
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(10)), pa.int64()),
            "text": pa.array([f"{hot} unique{i} a b c d" for i in range(10)]),
        }
    )
    from pdf_toolkit_ray.stages.dedup import fuzzy_lev_pairs

    ds = ray_session.data.from_arrow(tbl)
    out = fuzzy_lev_pairs(ds, "doc_id", "text", shingle_cap=3)
    # the only shared shingles sit above the cap -> no candidates survive
    assert out.count() == 0
