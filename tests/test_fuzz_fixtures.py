"""The fuzz-fixture generator's own contract: deterministic per seed,
schema-identical to the driver's testdata, and internally consistent —
a generator bug would otherwise masquerade as (or hide) a cross-engine
divergence in the sweep it feeds."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from tools.make_fuzz_fixtures import build_tables

TESTDATA = "/root/testdata/sf0.001"


def test_deterministic_per_seed():
    a = build_tables(7)
    b = build_tables(7)
    assert set(a) == set(b)
    for name in a:
        assert a[name].equals(b[name]), name


def test_seeds_differ():
    a = build_tables(7)
    b = build_tables(8)
    assert not a["events"].equals(b["events"])
    assert not a["documents"].equals(b["documents"])


def test_schemas_match_testdata():
    tables = build_tables(11)
    paths = glob.glob(os.path.join(TESTDATA, "*.parquet"))
    assert paths, f"no testdata at {TESTDATA} — schema contract unchecked"
    for path in paths:
        name = os.path.basename(path)[: -len(".parquet")]
        want = pq.read_schema(path)
        got = tables[name].schema
        assert got.names == want.names, name
        for field in want:
            assert got.field(field.name).type == field.type, (
                f"{name}.{field.name}: {got.field(field.name).type} != {field.type}"
            )


def test_internal_consistency():
    tables = build_tables(13)
    docs = tables["documents"].to_pydict()
    for text, n_chars in zip(docs["text"], docs["n_chars"]):
        if text is None:
            assert n_chars is None
        else:
            assert n_chars == len(text)
    li = tables["lineitem"].to_pydict()
    # linenumbers are 1..k per order, in order
    seen: dict[int, int] = {}
    for ok, ln in zip(li["l_orderkey"], li["l_linenumber"]):
        assert ln == seen.get(ok, 0) + 1
        seen[ok] = ln
    emb = tables["embeddings"].to_pydict()
    for v in emb["embedding"]:
        assert v is None or len(v) == 64
    # every table non-empty (degeneracy is the adversarial sweep's job;
    # the fuzz sweep must actually exercise the operators)
    for name, t in tables.items():
        assert t.num_rows > 0, name
