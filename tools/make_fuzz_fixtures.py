"""Seeded-random differential fuzz fixtures (round 5).

The adversarial fixtures (`make_adversarial_fixtures.py`) pin HAND-PICKED
degenerate shapes; this generator samples the space BETWEEN the seed-42
testdata and those extremes: every fixture property that could plausibly
differ between Spark and DuckDB is drawn at random per seed —

- per-column NULL rates drawn per seed (0 .. 25%), independently for
  join keys, measures, timestamps, text, vectors, labels;
- Zipf-skewed foreign keys (user_id, o_custkey, l_partkey) with a
  per-seed skew exponent — heavy keys exercise AQE skew paths and
  tie-dense windows;
- full-precision random doubles in measures (not 2-dp money shapes) —
  stresses the micro-unit quantization contracts at random mantissas;
- random timestamps with per-user clustering plus exact-duplicate
  collisions (window-function tie order) and NULLs;
- documents sampled from the testdata vocabulary with random lengths
  (0 .. ~300 tokens), seeded exact-duplicate and near-duplicate pairs,
  unicode/emoji injections, repeated-token spam, and NULL/empty text;
- JSON props: mostly {"k": int}, with extra keys, non-int values,
  malformed fragments, empty strings and NULLs at random rates;
- embeddings: gaussian clusters around random centroids plus zero,
  duplicate, NULL and high-magnitude vectors.

Domains (region/nation names, event_type values, Brand#N, segments,
priorities, flag pairs) mirror `/root/testdata` exactly so every
literal-keyed query (region='ASIA' shapes, 'purchase' funnels, BRAND
prefixes, 'en' stopwords) engages its interesting path on every seed.

The point is parity, not plausibility: `tools/oracle_check.py
/tmp/sf_fuzz_<seed>` must report zero failures for EVERY seed — any
failure is a real cross-engine semantics bug on inputs the fixed
fixtures never produce.

Usage: python tools/make_fuzz_fixtures.py SEED [out_dir] [--scale N] [--hotkey]
Default out dir: /tmp/sf_fuzz_<SEED> (suffix `_x<N>` / `_hot` as flagged)

`--scale N` multiplies the fact-table row-count draws (orders,
lineitem, events, documents, embeddings) — a scaled seed pushes every
partition across engine vector/batch boundaries (DuckDB's 2048-row
vectors, Spark's columnar batches), where chunk-edge bugs like the
v1.0.0 NULL-partition window split live.

`--hotkey` concentrates 50-70% (per-seed draw) of events onto ONE
user_id — the hot-key shape that breaks per-key windows (as-of
union-merge: one key's timeline = one sorted task). At default scale
the full oracle gate still runs (the hot key is a few hundred rows);
at --scale 700+ it is the ~10⁶-row-hot-key stress fixture for
`tools/asof_hotkey_bench.py` (the join-based oracle SQL cannot run
there — DuckDB materializes |L_k|×|R_k| pairs — so certification at
that scale is bucketed-vs-unbucketed bit-equality, Spark vs Spark).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DIM = 64

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
EVENT_TYPES = ["signup", "click", "error", "view", "purchase"]
LANGS = ["en", "zh", "de", "es", "fr"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PART_ADJ = ["cold", "small", "large", "blue", "hot", "green", "red", "shiny"]
PART_NOUN = ["widget", "bolt", "rod", "gear", "plate", "wheel"]
FLAG_STATUS = [("A", "F"), ("N", "F"), ("N", "O"), ("R", "F"), ("R", "O"), ("A", "O")]
# the testdata documents' vocabulary (sampled from sf0.001) + extras
VOCAB = (
    "the fast key order sort table scan merge part window small hash join "
    "batch stream spark group query row data slow filter customer line "
    "value agg column big a vector".split()
)
UNICODE_TOKENS = ["café", "naïve", "über", "straße", "\U0001f680", "日本語", "ñandú"]


def _rate(rng: np.random.Generator, hi: float = 0.25) -> float:
    """A per-seed null/defect rate: often 0, otherwise uniform (0, hi]."""
    return 0.0 if rng.random() < 0.3 else float(rng.uniform(0.005, hi))


def _null_mask(rng: np.random.Generator, n: int, rate: float) -> np.ndarray:
    return rng.random(n) < rate


def _money(rng: np.random.Generator, n: int, lo: float, hi: float) -> np.ndarray:
    """Full-precision doubles in [lo, hi) — deliberately NOT rounded to
    2 dp, so quantization contracts face arbitrary mantissas."""
    return rng.uniform(lo, hi, n)


def _ts_us(rng: np.random.Generator, n: int, start: str, span_days: float) -> np.ndarray:
    base = np.datetime64(start, "us")
    offs = (rng.random(n) * span_days * 86_400e6).astype("int64")
    return base + offs.astype("timedelta64[us]")


def build_tables(seed: int, scale: int = 1, hotkey: bool = False) -> dict[str, pa.Table]:
    rng = np.random.default_rng(seed)
    tables: dict[str, pa.Table] = {}

    # ---- region / nation: exact testdata domains (literal-keyed queries)
    tables["region"] = pa.table(
        {
            "r_regionkey": pa.array(range(5), type=pa.int32()),
            "r_name": pa.array(REGIONS, type=pa.string()),
        }
    )
    n_nation = 25
    nat_region = [i % 5 for i in range(n_nation)]
    nat_null = _null_mask(rng, n_nation, _rate(rng, 0.1))
    tables["nation"] = pa.table(
        {
            "n_nationkey": pa.array(range(n_nation), type=pa.int32()),
            "n_name": pa.array([f"NATION_{i}" for i in range(n_nation)], type=pa.string()),
            "n_regionkey": pa.array(
                [None if nat_null[i] else nat_region[i] for i in range(n_nation)],
                type=pa.int32(),
            ),
        }
    )

    # ---- supplier
    n_supp = int(rng.integers(8, 20))
    sk = np.arange(n_supp) + 1
    s_nat_null = _null_mask(rng, n_supp, _rate(rng, 0.15))
    s_bal = _money(rng, n_supp, -999.0, 9999.0)
    s_bal_null = _null_mask(rng, n_supp, _rate(rng, 0.15))
    tables["supplier"] = pa.table(
        {
            "s_suppkey": pa.array(sk, type=pa.int64()),
            "s_name": pa.array([f"Supplier#{k:09d}" for k in sk], type=pa.string()),
            "s_nationkey": pa.array(
                [None if s_nat_null[i] else int(rng.integers(0, n_nation)) for i in range(n_supp)],
                type=pa.int32(),
            ),
            "s_acctbal": pa.array(
                [None if s_bal_null[i] else float(s_bal[i]) for i in range(n_supp)],
                type=pa.float64(),
            ),
        }
    )

    # ---- customer: Zipf-skewed nation assignment, tie plateaus in acctbal
    n_cust = int(rng.integers(100, 200))
    ck = np.arange(n_cust) + 1
    c_nat_null = _null_mask(rng, n_cust, _rate(rng, 0.15))
    c_bal = _money(rng, n_cust, -999.0, 9999.0)
    # plateau: a random fraction of customers share one exact balance
    plateau = rng.random(n_cust) < rng.uniform(0.0, 0.3)
    c_bal[plateau] = round(float(rng.uniform(0, 5000)), 2)
    c_bal_null = _null_mask(rng, n_cust, _rate(rng, 0.1))
    tables["customer"] = pa.table(
        {
            "c_custkey": pa.array(ck, type=pa.int64()),
            "c_name": pa.array([f"Customer#{k:09d}" for k in ck], type=pa.string()),
            "c_nationkey": pa.array(
                [None if c_nat_null[i] else int(rng.integers(0, n_nation)) for i in range(n_cust)],
                type=pa.int32(),
            ),
            "c_acctbal": pa.array(
                [None if c_bal_null[i] else float(c_bal[i]) for i in range(n_cust)],
                type=pa.float64(),
            ),
            "c_mktsegment": pa.array(
                [SEGMENTS[int(i)] for i in rng.integers(0, len(SEGMENTS), n_cust)],
                type=pa.string(),
            ),
        }
    )

    # ---- part
    n_part = int(rng.integers(120, 250))
    pk = np.arange(n_part) + 1
    tables["part"] = pa.table(
        {
            "p_partkey": pa.array(pk, type=pa.int64()),
            "p_name": pa.array(
                [
                    f"{PART_ADJ[int(a)]} {PART_NOUN[int(b)]}"
                    for a, b in zip(
                        rng.integers(0, len(PART_ADJ), n_part),
                        rng.integers(0, len(PART_NOUN), n_part),
                    )
                ],
                type=pa.string(),
            ),
            "p_brand": pa.array(
                [f"Brand#{int(b)}" for b in rng.integers(1, 25, n_part)],
                type=pa.string(),
            ),
            "p_type": pa.array(
                [PTYPES[int(i)] for i in rng.integers(0, len(PTYPES), n_part)],
                type=pa.string(),
            ),
            "p_size": pa.array(rng.integers(1, 51, n_part), type=pa.int32()),
            "p_retailprice": pa.array(_money(rng, n_part, 100.0, 2000.0), type=pa.float64()),
        }
    )

    # ---- orders: Zipf-skewed custkey (+ dangling + NULL), 1995-2001 dates
    n_ord = int(rng.integers(800, 1600)) * scale
    ok = np.arange(n_ord) + 1
    zipf_a = float(rng.uniform(1.1, 2.2))
    o_cust = (rng.zipf(zipf_a, n_ord) % (n_cust + 5)) + 1  # a few dangle past n_cust
    o_cust_null = _null_mask(rng, n_ord, _rate(rng, 0.1))
    o_price = _money(rng, n_ord, 900.0, 200_000.0)
    o_price_null = _null_mask(rng, n_ord, _rate(rng, 0.1))
    o_dates = _ts_us(rng, n_ord, "1995-01-01", 365.0 * 6.6).astype("datetime64[D]").astype("datetime64[us]")
    o_date_null = _null_mask(rng, n_ord, _rate(rng, 0.05))
    tables["orders"] = pa.table(
        {
            "o_orderkey": pa.array(ok, type=pa.int64()),
            "o_custkey": pa.array(
                [None if o_cust_null[i] else int(o_cust[i]) for i in range(n_ord)],
                type=pa.int64(),
            ),
            "o_orderstatus": pa.array(
                [["F", "O", "P"][int(i)] for i in rng.integers(0, 3, n_ord)],
                type=pa.string(),
            ),
            "o_totalprice": pa.array(
                [None if o_price_null[i] else float(o_price[i]) for i in range(n_ord)],
                type=pa.float64(),
            ),
            "o_orderdate": pa.array(
                [None if o_date_null[i] else o_dates[i].item() for i in range(n_ord)],
                type=pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array(
                [PRIORITIES[int(i)] for i in rng.integers(0, len(PRIORITIES), n_ord)],
                type=pa.string(),
            ),
        }
    )

    # ---- lineitem: 1-7 lines per order, Zipf-skewed partkey
    lines_per = rng.integers(1, 8, n_ord)
    n_li = int(lines_per.sum())
    li_ok = np.repeat(ok, lines_per)
    li_ln = np.concatenate([np.arange(1, c + 1) for c in lines_per])
    li_part = (rng.zipf(zipf_a, n_li) % (n_part + 5)) + 1
    li_part_null = _null_mask(rng, n_li, _rate(rng, 0.08))
    li_supp = (rng.integers(0, n_supp + 2, n_li)) + 1  # some dangling
    li_qty = rng.integers(1, 51, n_li).astype("float64")
    # a random slice of quantities become full-precision doubles
    frac = rng.random(n_li) < rng.uniform(0.0, 0.5)
    li_qty[frac] = rng.uniform(0.5, 50.0, int(frac.sum()))
    li_price = _money(rng, n_li, 900.0, 100_000.0)
    li_price_null = _null_mask(rng, n_li, _rate(rng, 0.08))
    li_disc = np.round(rng.uniform(0.0, 0.11, n_li), 2)
    li_tax = np.round(rng.uniform(0.0, 0.09, n_li), 2)
    li_disc_null = _null_mask(rng, n_li, _rate(rng, 0.05))
    fs = [FLAG_STATUS[int(i)] for i in rng.integers(0, len(FLAG_STATUS), n_li)]
    ship_off = rng.integers(1, 122, n_li).astype("timedelta64[D]")
    o_date_by_key = {int(k): d for k, d in zip(ok, o_dates)}
    li_ship = [
        None
        if o_date_null[int(o) - 1] or rng.random() < 0.02
        else (o_date_by_key[int(o)] + ship_off[i]).item()
        for i, o in enumerate(li_ok)
    ]
    tables["lineitem"] = pa.table(
        {
            "l_orderkey": pa.array(li_ok, type=pa.int64()),
            "l_partkey": pa.array(
                [None if li_part_null[i] else int(li_part[i]) for i in range(n_li)],
                type=pa.int64(),
            ),
            "l_suppkey": pa.array(li_supp, type=pa.int64()),
            "l_linenumber": pa.array(li_ln, type=pa.int32()),
            "l_quantity": pa.array(li_qty, type=pa.float64()),
            "l_extendedprice": pa.array(
                [None if li_price_null[i] else float(li_price[i]) for i in range(n_li)],
                type=pa.float64(),
            ),
            "l_discount": pa.array(
                [None if li_disc_null[i] else float(li_disc[i]) for i in range(n_li)],
                type=pa.float64(),
            ),
            "l_tax": pa.array(li_tax, type=pa.float64()),
            "l_returnflag": pa.array([f for f, _ in fs], type=pa.string()),
            "l_linestatus": pa.array([s for _, s in fs], type=pa.string()),
            "l_shipdate": pa.array(li_ship, type=pa.timestamp("us")),
        }
    )

    # ---- events: Zipf users, clustered + colliding timestamps, fuzzed props
    n_ev = int(rng.integers(600, 1400)) * scale
    ev_id = np.arange(n_ev) + 1
    n_users = int(rng.integers(20, 60))
    ev_user = (rng.zipf(zipf_a, n_ev) % n_users) + 1
    if hotkey:
        # Route a per-seed 50-70% slice of events to user 1: one key's
        # timeline dominates every per-user window/as-of merge. The
        # remaining rows keep their Zipf draw so the fixture still has
        # a long tail of ordinary keys.
        hot = rng.random(n_ev) < rng.uniform(0.5, 0.7)
        ev_user[hot] = 1
    ev_user_null = _null_mask(rng, n_ev, _rate(rng, 0.1))
    # per-user session anchor + small offsets -> natural session clusters
    anchors = _ts_us(rng, n_users, "2024-01-01", 29.0)
    ev_ts = anchors[ev_user - 1] + (
        (rng.exponential(600.0, n_ev) * 1e6).astype("int64").astype("timedelta64[us]")
    )
    # exact ts collisions inside a user: copy a neighbor's timestamp
    collide = rng.random(n_ev) < rng.uniform(0.0, 0.2)
    for i in np.nonzero(collide)[0]:
        j = int(rng.integers(0, n_ev))
        if ev_user[i] == ev_user[j]:
            ev_ts[i] = ev_ts[j]
    ev_ts_null = _null_mask(rng, n_ev, _rate(rng, 0.08))
    ev_val = _money(rng, n_ev, -50.0, 500.0)
    big = rng.random(n_ev) < 0.02
    ev_val[big] = rng.uniform(1e4, 9e4, int(big.sum()))  # keep micro-unit sums < 2^53
    ev_val_null = _null_mask(rng, n_ev, _rate(rng, 0.12))
    props: list[str | None] = []
    for i in range(n_ev):
        r = rng.random()
        if r < 0.04:
            props.append(None)
        elif r < 0.08:
            props.append("")
        elif r < 0.12:
            props.append('{"k": 3')  # malformed
        elif r < 0.16:
            props.append(json.dumps({"k": int(rng.integers(0, 100)), "j": int(rng.integers(0, 9))}))
        elif r < 0.20:
            props.append(json.dumps({"k": "notint"}))
        elif r < 0.23:
            props.append(json.dumps({"k": {"nested": 1}}))
        # numeric-but-not-integer shapes (review finding: TRY_CAST of
        # '3.5' to INT rounds in DuckDB but NULLs in Spark — the
        # exact-integer rule must face these on every seed)
        elif r < 0.26:
            props.append(json.dumps({"k": float(rng.uniform(0, 100))}))   # fractional
        elif r < 0.28:
            props.append(json.dumps({"k": f"{rng.uniform(0, 100):.2f}"}))  # numeric string
        elif r < 0.30:
            props.append(json.dumps({"k": bool(rng.integers(0, 2))}))      # boolean
        elif r < 0.31:
            props.append(json.dumps({"k": [1, 2]}))                        # array
        elif r < 0.32:
            props.append(json.dumps({"k": int(9e18) + int(rng.integers(0, 100))}))  # near-overflow
        elif r < 0.335:
            # > int64 max (DuckDB json_type 'UBIGINT'): try_cast to
            # BIGINT is NULL, so the oracle's range conjunct must
            # coalesce to FALSE or bool_and skips it (ADVICE r5 #1)
            props.append(json.dumps({"a": int(rng.integers(0, 9)),
                                     "b": (1 << 64) - 1 - int(rng.integers(0, 50))}))
        else:
            props.append(json.dumps({"k": int(rng.integers(0, 100))}))
    tables["events"] = pa.table(
        {
            "event_id": pa.array(ev_id, type=pa.int64()),
            "ts": pa.array(
                [None if ev_ts_null[i] else ev_ts[i].item() for i in range(n_ev)],
                type=pa.timestamp("us"),
            ),
            "user_id": pa.array(
                [None if ev_user_null[i] else int(ev_user[i]) for i in range(n_ev)],
                type=pa.int64(),
            ),
            "event_type": pa.array(
                [EVENT_TYPES[int(i)] for i in rng.integers(0, len(EVENT_TYPES), n_ev)],
                type=pa.string(),
            ),
            "value": pa.array(
                [None if ev_val_null[i] else float(ev_val[i]) for i in range(n_ev)],
                type=pa.float64(),
            ),
            "props": pa.array(props, type=pa.string()),
        }
    )

    # ---- documents: vocab sampling + seeded dup/near-dup/degenerate mix
    n_doc = int(rng.integers(150, 400)) * scale
    texts: list[str | None] = []
    for i in range(n_doc):
        r = rng.random()
        if r < 0.02:
            texts.append(None)
        elif r < 0.04:
            texts.append("")
        elif r < 0.05:
            texts.append("   \t ")
        elif r < 0.07:
            tok = VOCAB[int(rng.integers(0, len(VOCAB)))]
            texts.append((tok + " ") * int(rng.integers(5, 60)))  # spam
        else:
            k = int(rng.geometric(1.0 / 40.0))
            k = max(1, min(k, 300))
            words = [VOCAB[int(j)] for j in rng.integers(0, len(VOCAB), k)]
            # sprinkle unicode/emoji
            if rng.random() < 0.15:
                pos = int(rng.integers(0, len(words)))
                words[pos] = UNICODE_TOKENS[int(rng.integers(0, len(UNICODE_TOKENS)))]
            texts.append(" ".join(words))
    # seeded exact duplicates and near-duplicates of earlier docs
    for i in range(n_doc):
        if texts[i] is None or i < 10:
            continue
        r = rng.random()
        if r < 0.05:
            j = int(rng.integers(0, i))
            if texts[j]:
                texts[i] = texts[j]  # exact dup
        elif r < 0.10:
            j = int(rng.integers(0, i))
            if texts[j] and len(texts[j]) > 20:
                w = texts[j].split(" ")
                w[int(rng.integers(0, len(w)))] = VOCAB[int(rng.integers(0, len(VOCAB)))]
                texts[i] = " ".join(w)  # near dup
    lang_null = _null_mask(rng, n_doc, _rate(rng, 0.08))
    src_null = _null_mask(rng, n_doc, _rate(rng, 0.08))
    tables["documents"] = pa.table(
        {
            "doc_id": pa.array(np.arange(n_doc) + 1, type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(
                [None if lang_null[i] else LANGS[int(rng.integers(0, len(LANGS)))] for i in range(n_doc)],
                type=pa.string(),
            ),
            "source": pa.array(
                [None if src_null[i] else f"src{int(rng.integers(0, 20))}" for i in range(n_doc)],
                type=pa.string(),
            ),
            "n_chars": pa.array(
                [None if t is None else len(t) for t in texts], type=pa.int64()
            ),
        }
    )

    # ---- embeddings: gaussian clusters + zero/dup/NULL/huge vectors
    n_vec = int(rng.integers(150, 400)) * scale
    n_clusters = int(rng.integers(3, 12))
    centroids = rng.normal(0.0, 1.0, (n_clusters, DIM))
    assign = rng.integers(0, n_clusters, n_vec)
    vecs: list[list[float] | None] = []
    labels: list[int | None] = []
    vec_null_rate = _rate(rng, 0.06)
    label_null_rate = _rate(rng, 0.1)
    for i in range(n_vec):
        r = rng.random()
        if r < vec_null_rate:
            vecs.append(None)
        elif r < vec_null_rate + 0.02:
            vecs.append([0.0] * DIM)  # zero vector
        elif r < vec_null_rate + 0.04 and vecs and vecs[-1] is not None:
            vecs.append(list(vecs[-1]))  # exact duplicate
        elif r < vec_null_rate + 0.05:
            vecs.append(list(np.float32(rng.normal(0.0, 1e4, DIM))))  # huge magnitude
        else:
            v = centroids[assign[i]] + rng.normal(0.0, 0.3, DIM)
            vecs.append(list(np.float32(v)))
        labels.append(None if rng.random() < label_null_rate else int(assign[i]))
    # NULL ids on otherwise-valid vectors (r10): exercises the
    # family-wide ANN id fence on random geometry, not just the fixed
    # adversarial row; query ids (vec_id < 5) stay intact
    id_null_rate = _rate(rng, 0.03)
    ids: list[int | None] = [
        None if (i >= 5 and rng.random() < id_null_rate) else i + 1
        for i in range(n_vec)
    ]
    tables["embeddings"] = pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array(
                [None if v is None else [float(x) for x in v] for v in vecs],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(labels, type=pa.int32()),
        }
    )
    return tables


def main() -> int:
    argv = list(sys.argv[1:])
    scale = 1
    hotkey = False
    if "--hotkey" in argv:
        hotkey = True
        argv.remove("--hotkey")
    if "--scale" in argv:
        i = argv.index("--scale")
        if i + 1 >= len(argv) or not argv[i + 1].isdigit():
            print(__doc__)
            return 2
        scale = int(argv[i + 1])
        del argv[i : i + 2]
    if not argv:
        print(__doc__)
        return 2
    seed = int(argv[0])
    out = argv[1] if len(argv) > 1 else (
        f"/tmp/sf_fuzz_{seed}"
        + ("" if scale == 1 else f"_x{scale}")
        + ("_hot" if hotkey else "")
    )
    os.makedirs(out, exist_ok=True)
    for name, table in build_tables(seed, scale=scale, hotkey=hotkey).items():
        pq.write_table(table, os.path.join(out, f"{name}.parquet"))
        print(f"{name}: {table.num_rows} rows -> {out}/{name}.parquet")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
