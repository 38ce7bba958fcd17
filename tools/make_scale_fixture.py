"""Shape-preserving xN replication of an sf dir (VERDICT r10 #1).

The 100 TB story needs a third measured scale point above sf0.1; the
driver ships no sf1. This generator builds one by replicating every
table N times with per-copy key offsets, preserving the EXACT
per-copy distributions (row widths, null rates, skew, time range,
join fan-outs) that the sf dirs have — unlike the fuzz generator,
whose dimension tables stay tiny at any scale.

Key handling keeps referential integrity bit-for-bit: every key domain
gets ONE offset unit (its max+1 in the source), applied identically to
the key column and every foreign key referencing it. user_id shares
the customer unit because queries join events.user_id = c_custkey.
nation/region are shared dimensions and are copied once, unoffset —
exactly TPC-H's scaling rule.

Content columns are carried verbatim EXCEPT document text in copies
> 0: roughly one token in three is replaced by a copy-salted token, so
cross-copy documents land well below every near-dup threshold (a
verbatim copy would make each doc a 10-way near-dup group and the
pair-generating queries' OUTPUT would grow quadratically by fixture
construction, polluting the scale curve). Within-copy duplicate and
near-duplicate structure is preserved untouched. n_chars is
recomputed for rewritten texts. Embedding vectors replicate verbatim
(vector ops are top-k/argmin-bounded, so identical cross-copy vectors
cannot blow up any output).

Usage: python tools/make_scale_fixture.py [N] [src_dir] [out_dir]
Defaults: N=10, src=/root/testdata/sf0.1, out=/tmp/sf_scale_x<N>.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

#: table -> {column: key-domain} (every column listed gets its domain's
#: offset unit added, per copy)
KEYED: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "cust"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
#: key domain -> (table, column) that defines its offset unit (max+1)
DOMAIN_DEF: dict[str, tuple[str, str]] = {
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "order": ("orders", "o_orderkey"),
    "event": ("events", "event_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}
SHARED_DIMS = ("region", "nation")


def _salt_text(text: str | None, copy: int) -> str | None:
    if text is None or copy == 0:
        return text
    toks = text.split(" ")
    for i in range(len(toks)):
        if (i * 2654435761 + copy) % 3 == 0:
            toks[i] = f"z{copy}w{i % 13}"
    return " ".join(toks)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/sf_scale_x{n}"
    os.makedirs(out, exist_ok=True)

    units: dict[str, int] = {}
    for dom, (tbl, col) in DOMAIN_DEF.items():
        t = pq.read_table(os.path.join(src, f"{tbl}.parquet"), columns=[col])
        units[dom] = int(pc.max(t[col]).as_py()) + 1

    for dim in SHARED_DIMS:
        pq.write_table(
            pq.read_table(os.path.join(src, f"{dim}.parquet")),
            os.path.join(out, f"{dim}.parquet"),
        )
        print(f"{dim}: shared dim, copied once")

    for tbl, keycols in KEYED.items():
        t = pq.read_table(os.path.join(src, f"{tbl}.parquet"))
        copies = []
        for c in range(n):
            cols = {}
            for name in t.column_names:
                col = t[name]
                if name in keycols and c > 0:
                    off = units[keycols[name]] * c
                    col = pc.add(col, pa.scalar(off, type=col.type))
                cols[name] = col
            if tbl == "documents" and c > 0:
                texts = [_salt_text(v.as_py(), c) for v in cols["text"]]
                cols["text"] = pa.chunked_array([pa.array(texts, type=pa.string())])
                cols["n_chars"] = pa.chunked_array([
                    pa.array(
                        [None if s is None else len(s) for s in texts],
                        type=pa.int64(),
                    )
                ])
            copies.append(pa.table(cols))
        big = pa.concat_tables(copies)
        # ~128k-row row groups: a row group is Spark's minimum split
        # unit, so a single-group file would serialize the whole scan
        # into one task — the opposite of what a scale fixture is for
        pq.write_table(
            big, os.path.join(out, f"{tbl}.parquet"), row_group_size=131072
        )
        print(f"{tbl}: {t.num_rows} -> {big.num_rows} rows")


if __name__ == "__main__":
    main()
