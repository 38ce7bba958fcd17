"""Generate a degenerate "adversarial" fixture directory (VERDICT r4 #4).

Every registry query normally runs on well-formed seed-42 synthetic data.
This generator produces the same 10-table star schema but populated with
the classic cross-engine divergence surface:

- an EMPTY table (supplier) — empty-input aggregates, joins against
  nothing, MIN/MAX/SUM over zero rows (NULL vs error vs 0 semantics);
- all-NULL / partially-NULL join keys (customer.c_nationkey,
  orders.o_custkey, lineitem.l_partkey) — three-valued IN/NOT IN logic,
  inner-join null-drop, left-join null-fill;
- dangling foreign keys (no matching dimension row);
- single-row partitions (one user with exactly one event, one customer
  with exactly one order) — window functions over a 1-row frame;
- ties-only partitions (identical values AND identical timestamps) —
  rank/row_number determinism, quantile interpolation on plateaus;
- NULLs in measure columns (value, acctbal, totalprice, discount, tax);
- degenerate documents (empty string, whitespace-only, single char,
  NULL text, byte-identical duplicates, 1-char-off near-duplicates,
  unicode/emoji, one-token spam) — tokenizer/shingle/hash edge cases;
- degenerate embeddings (zero vector — cosine division by zero,
  byte-identical duplicates, NULL vector, NULL label).

Domains (event_type values, lang codes, name prefixes, timestamp
ranges) mirror the driver's testdata so queries whose semantics key on
specific values ('purchase' funnels, 'en' stopwords, BRAND# prefixes)
still engage their interesting paths.

Usage: python tools/make_adversarial_fixtures.py [out_dir]
Default out dir: /tmp/sf_adversarial
"""

from __future__ import annotations

import os
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s: str):
    return pd.Timestamp(s)


def build_tables() -> dict[str, pa.Table]:
    tables: dict[str, pa.Table] = {}

    # ---- region: standard names + a NULL-named region nothing points at
    tables["region"] = pa.table(
        {
            "r_regionkey": pa.array([0, 1, 2, 3, 99], type=pa.int32()),
            "r_name": pa.array(
                ["AFRICA", "AMERICA", "ASIA", "EUROPE", None], type=pa.string()
            ),
        }
    )

    # ---- nation: NULL regionkey, dangling regionkey, duplicate names
    tables["nation"] = pa.table(
        {
            "n_nationkey": pa.array([0, 1, 2, 3, 4, 5, 6, 7], type=pa.int32()),
            "n_name": pa.array(
                [
                    "ALGERIA", "BRAZIL", "CHINA", "FRANCE",
                    "DUPLAND", "DUPLAND",  # duplicate name, different keys
                    "NOWHERE",  # NULL regionkey
                    "ORPHAN",   # dangling regionkey
                ],
                type=pa.string(),
            ),
            "n_regionkey": pa.array(
                [0, 1, 2, 3, 2, 3, None, 42], type=pa.int32()
            ),
        }
    )

    # ---- customer: NULL/dangling nationkeys, tie-only acctbals, NULL
    #      segment, quote/unicode names, customers with no orders
    n = 24
    custkey = list(range(1, n + 1))
    nationkey = []
    for k in custkey:
        if k in (4, 8, 12, 16):
            nationkey.append(None)          # NULL join key
        elif k == 20:
            nationkey.append(77)            # dangling
        else:
            nationkey.append(k % 8)
    acctbal = []
    for k in custkey:
        if k in (5, 10):
            acctbal.append(None)            # NULL measure
        elif k % 3 == 0:
            acctbal.append(100.0)           # ties-only plateau
        else:
            acctbal.append(round(1000.0 + 7.5 * k, 2))
    seg = []
    for k in custkey:
        if k in (7, 14):
            seg.append(None)
        else:
            seg.append(["BUILDING", "AUTOMOBILE", "MACHINERY"][k % 3])
    names = [
        f"Customer#{k:09d}" if k not in (3, 9)
        else ("O'Brían élève \U0001f600" if k == 3 else 'Quote"Back\\slash')
        for k in custkey
    ]
    tables["customer"] = pa.table(
        {
            "c_custkey": pa.array(custkey, type=pa.int64()),
            "c_name": pa.array(names, type=pa.string()),
            "c_nationkey": pa.array(nationkey, type=pa.int32()),
            "c_acctbal": pa.array(acctbal, type=pa.float64()),
            "c_mktsegment": pa.array(seg, type=pa.string()),
        }
    )

    # ---- supplier: EMPTY (schema-only parquet)
    tables["supplier"] = pa.table(
        {
            "s_suppkey": pa.array([], type=pa.int64()),
            "s_name": pa.array([], type=pa.string()),
            "s_nationkey": pa.array([], type=pa.int32()),
            "s_acctbal": pa.array([], type=pa.float64()),
        }
    )

    # ---- part: duplicate brands, tie-only retailprice, NULL size/type,
    #      regex-special characters in names
    pk = list(range(1, 13))
    tables["part"] = pa.table(
        {
            "p_partkey": pa.array(pk, type=pa.int64()),
            "p_name": pa.array(
                [
                    "azure polished brass", "rose (special) metal*",
                    "plum.dotted+steel", "azure polished brass",  # dup name
                    "midnight [bracket] tin", "spring^caret$copper",
                    "ivory|pipe?nickel", "navy\\escape\\zinc",
                    "plain old part", "plain old part ii",
                    "tiny", "x",
                ],
                type=pa.string(),
            ),
            "p_brand": pa.array(
                ["Brand#11", "Brand#11", "Brand#22", "Brand#22",
                 "Brand#33", "Brand#33", "Brand#33", "Brand#44",
                 "Brand#44", "Brand#44", "Brand#55", None],
                type=pa.string(),
            ),
            "p_type": pa.array(
                ["PROMO BRUSHED STEEL", "PROMO ANODIZED TIN", None,
                 "STANDARD PLATED COPPER", "PROMO BURNISHED NICKEL",
                 "ECONOMY POLISHED BRASS", None, "STANDARD BRUSHED TIN",
                 "MEDIUM PLATED STEEL", "PROMO POLISHED COPPER",
                 "SMALL ANODIZED NICKEL", "LARGE BURNISHED BRASS"],
                type=pa.string(),
            ),
            "p_size": pa.array(
                [5, 5, 5, None, 10, 10, None, 1, 50, None, 5, 5],
                type=pa.int32(),
            ),
            "p_retailprice": pa.array(
                [50.0] * 6 + [None, 50.0, 901.0, 902.01, 0.0, 50.0],
                type=pa.float64(),
            ),
        }
    )

    # ---- orders: NULL/dangling custkeys, single-order customer, skewed
    #      customer, tie-only totalprice + identical orderdates, epoch
    #      date, NULL measures/status
    rows = []
    # customer 1: 20 orders (skew), identical totalprice plateau for 10
    for i in range(20):
        rows.append(
            (
                100 + i, 1, ["O", "F", "P"][i % 3],
                1000.0 if i < 10 else round(500.0 + 13.25 * i, 2),
                _ts("1996-03-01 00:00:00") + pd.Timedelta(days=i % 4),  # heavy date ties
                f"{1 + i % 5}-PRIORITY",
            )
        )
    # customer 2: exactly ONE order (single-row partition)
    rows.append((200, 2, "O", 42.42, _ts("1995-06-15 12:00:00"), "1-URGENT"))
    # customers 3..11: two orders each, one pair sharing the exact same
    # timestamp AND price (rank over pure ties)
    for k in range(3, 12):
        rows.append((300 + 2 * k, k, "F", 777.0, _ts("1997-01-01 00:00:00"), "3-MEDIUM"))
        rows.append((301 + 2 * k, k, "F", 777.0, _ts("1997-01-01 00:00:00"), "3-MEDIUM"))
    # NULL custkeys
    for i in range(5):
        rows.append((400 + i, None, "O", 99.99, _ts("1998-05-05 05:05:05"), "5-LOW"))
    # dangling custkey
    rows.append((500, 999, "F", 12.0, _ts("1995-01-01 00:00:00"), "2-HIGH"))
    # epoch-adjacent date + NULL status/priority/price
    rows.append((501, 6, None, None, _ts("1970-01-01 00:00:00"), None))
    rows.append((502, 6, "O", 3.0, None, "4-NOT SPECIFIED"))  # NULL orderdate
    df = pd.DataFrame(
        rows,
        columns=[
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority",
        ],
    )
    tables["orders"] = pa.table(
        {
            "o_orderkey": pa.array(df.o_orderkey, type=pa.int64()),
            "o_custkey": pa.array(
                [None if pd.isna(v) else int(v) for v in df.o_custkey],
                type=pa.int64(),
            ),
            "o_orderstatus": pa.array(df.o_orderstatus, type=pa.string()),
            "o_totalprice": pa.array(df.o_totalprice, type=pa.float64()),
            "o_orderdate": pa.array(df.o_orderdate, type=pa.timestamp("us")),
            "o_orderpriority": pa.array(df.o_orderpriority, type=pa.string()),
        }
    )
    order_keys = [int(k) for k in df.o_orderkey]

    # ---- lineitem: NULL/dangling part+order keys, all suppkeys dangle
    #      (supplier is empty), tie-only quantities/prices, NULL measures,
    #      shipdate before orderdate, NULL shipdate
    li = []
    ln = {}

    def add_li(ok, pkk, sk, qty, px, disc, tax, rf, ls, ship):
        num = ln.get(ok, 0) + 1
        ln[ok] = num
        li.append((ok, pkk, sk, num, qty, px, disc, tax, rf, ls, ship))

    ship0 = _ts("1996-03-05 00:00:00")
    for i, ok in enumerate(order_keys[:20]):  # customer-1 orders
        # identical quantity/price plateau across the whole order group
        add_li(ok, 1 + i % 12, 1 + i % 3, 10.0, 50.0, 0.05, 0.02, "N", "O",
               ship0 + pd.Timedelta(days=i % 3))
        add_li(ok, 1 + (i + 5) % 12, 2, 10.0, 50.0, 0.0, 0.0, "R", "F",
               ship0 + pd.Timedelta(days=i % 3))
    add_li(200, 11, 1, 1.0, 0.0, None, None, "A", "F", _ts("1995-06-20 00:00:00"))
    for k in range(3, 12):
        ok = 300 + 2 * k
        add_li(ok, None, None, 7.0, 777.0, 0.1, 0.08, "N", "O",
               _ts("1996-12-25 00:00:00"))  # ship BEFORE 1997 orderdate
        add_li(ok + 1, 999, 999, 7.0, 777.0, 0.1, 0.08, None, None, None)
    for i in range(3):  # dangling + NULL orderkeys
        add_li(9000 + i, 2, 5, 3.0, 30.0, 0.02, 0.01, "R", "F",
               _ts("1998-01-01 00:00:00"))
        add_li(None, 3, 6, 3.0, 30.0, 0.02, 0.01, "R", "F",
               _ts("1998-01-02 00:00:00"))
    dfl = pd.DataFrame(
        li,
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate",
        ],
    )
    tables["lineitem"] = pa.table(
        {
            "l_orderkey": pa.array(
                [None if pd.isna(v) else int(v) for v in dfl.l_orderkey],
                type=pa.int64(),
            ),
            "l_partkey": pa.array(
                [None if pd.isna(v) else int(v) for v in dfl.l_partkey],
                type=pa.int64(),
            ),
            "l_suppkey": pa.array(
                [None if pd.isna(v) else int(v) for v in dfl.l_suppkey],
                type=pa.int64(),
            ),
            "l_linenumber": pa.array(dfl.l_linenumber, type=pa.int32()),
            "l_quantity": pa.array(dfl.l_quantity, type=pa.float64()),
            "l_extendedprice": pa.array(dfl.l_extendedprice, type=pa.float64()),
            "l_discount": pa.array(dfl.l_discount, type=pa.float64()),
            "l_tax": pa.array(dfl.l_tax, type=pa.float64()),
            "l_returnflag": pa.array(dfl.l_returnflag, type=pa.string()),
            "l_linestatus": pa.array(dfl.l_linestatus, type=pa.string()),
            "l_shipdate": pa.array(dfl.l_shipdate, type=pa.timestamp("us")),
        }
    )

    # ---- events: single-event user, ties-only user (same value AND same
    #      ts), NULL value/type/props, malformed + empty-string props,
    #      NULL ts; still spans >15 min of event time for watermarks
    ev = []
    t0 = _ts("2024-01-01 00:00:00")

    def add_ev(eid, ts, uid, etype, value, props):
        ev.append((eid, ts, uid, etype, value, props))

    # user 501: exactly one event
    add_ev(1, t0, 501, "purchase", 10.0, '{"k": 1}')
    # user 502: five events, identical value AND identical timestamp
    for i in range(5):
        add_ev(2 + i, t0 + pd.Timedelta(hours=1), 502, "view", 5.0, '{"k": 2}')
    # user 503: full funnel at one-minute spacing, with NULL values
    for i, et in enumerate(["view", "click", "signup", "purchase", "error"]):
        add_ev(10 + i, t0 + pd.Timedelta(hours=2, minutes=i), 503, et,
               None if i % 2 else 2.5 * (i + 1), '{"k": 3}')
    # user 504: values form an exact plateau then a step (quantiles)
    for i in range(8):
        add_ev(20 + i, t0 + pd.Timedelta(hours=3, minutes=10 * i), 504,
               "click", 4.0 if i < 6 else 400.0, '{"k": 4}')
    # degenerate props: NULL, empty string, malformed JSON, nested JSON
    add_ev(30, t0 + pd.Timedelta(hours=4), 505, "view", 1.0, None)
    add_ev(31, t0 + pd.Timedelta(hours=4, minutes=1), 505, "view", 2.0, "")
    add_ev(32, t0 + pd.Timedelta(hours=4, minutes=2), 505, "view", 3.0, "{not json")
    add_ev(33, t0 + pd.Timedelta(hours=4, minutes=3), 505, "view", 4.0,
           '{"k": 5, "nested": {"a": [1, 2]}}')
    # NULL event_type and NULL user_id
    add_ev(40, t0 + pd.Timedelta(hours=5), 506, None, 6.0, '{"k": 6}')
    add_ev(41, t0 + pd.Timedelta(hours=5, minutes=5), None, "error", 7.0, '{"k": 7}')
    # NULL ts (no event time at all)
    add_ev(42, None, 507, "view", 8.0, '{"k": 8}')
    # negative + zero + huge values
    add_ev(43, t0 + pd.Timedelta(hours=6), 508, "purchase", -50.0, '{"k": 9}')
    add_ev(44, t0 + pd.Timedelta(hours=6, minutes=1), 508, "purchase", 0.0, '{"k": 10}')
    add_ev(45, t0 + pd.Timedelta(hours=6, minutes=2), 508, "purchase", 1.0e9, '{"k": 11}')
    dfe = pd.DataFrame(
        ev, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    tables["events"] = pa.table(
        {
            "event_id": pa.array(dfe.event_id, type=pa.int64()),
            "ts": pa.array(dfe.ts, type=pa.timestamp("us")),
            "user_id": pa.array(
                [None if pd.isna(v) else int(v) for v in dfe.user_id],
                type=pa.int64(),
            ),
            "event_type": pa.array(dfe.event_type, type=pa.string()),
            "value": pa.array(dfe.value, type=pa.float64()),
            "props": pa.array(dfe.props, type=pa.string()),
        }
    )

    # ---- documents: tokenizer/shingle/dedup edge cases
    docs = [
        (1, "", "en", "src1"),                       # empty string
        (2, "   \t  \n ", "en", "src1"),             # whitespace only
        (3, "x", "en", "src2"),                      # single char
        (4, None, "en", "src2"),                     # NULL text
        (5, "the quick brown fox jumps over the lazy dog near the river bank today", "en", "src3"),
        (6, "the quick brown fox jumps over the lazy dog near the river bank today", "en", "src4"),  # exact dup of 5
        (7, "the quick brown fox jumps over the lazy dog near the river bank t0day", "en", "src4"),  # near-dup (1 char)
        (8, "spam " * 40, "en", "src5"),             # one repeated token
        (9, "café naïve über straße \U0001f680 emoji mix with unicode tokens here", None, "src5"),
        (10, "der schnelle braune fuchs springt über den faulen hund am flussufer heute morgen", "de", None),
    ]
    tables["documents"] = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], type=pa.int64()),
            "text": pa.array([d[1] for d in docs], type=pa.string()),
            "lang": pa.array([d[2] for d in docs], type=pa.string()),
            "source": pa.array([d[3] for d in docs], type=pa.string()),
            "n_chars": pa.array(
                [None if d[1] is None else len(d[1]) for d in docs],
                type=pa.int64(),
            ),
        }
    )

    # ---- embeddings: zero vector, exact duplicates, NULL vector/label
    dim = 64
    def unit(i):
        v = [0.0] * dim
        v[i % dim] = 1.0
        return v

    vecs = [
        (1, [0.0] * dim, 0),       # zero vector: cosine denominator 0
        (2, unit(0), 0),
        (3, unit(0), 0),           # exact duplicate of 2
        (4, unit(1), 1),
        (5, [0.5] * dim, 1),
        (6, [-0.5] * dim, 1),      # antipodal of 5
        (7, None, 2),              # NULL vector
        (8, unit(2), None),        # NULL label
        (9, [float(j % 7 - 3) for j in range(dim)], 2),
        (None, unit(3), 0),        # NULL id with a valid vector (r10):
                                   # exercises the ANN-family id fences
    ]
    tables["embeddings"] = pa.table(
        {
            "vec_id": pa.array([v[0] for v in vecs], type=pa.int64()),
            "embedding": pa.array(
                [v[1] for v in vecs], type=pa.list_(pa.float32())
            ),
            "label": pa.array([v[2] for v in vecs], type=pa.int32()),
        }
    )
    return tables


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--empty"]
    empty = "--empty" in sys.argv
    out = argv[0] if argv else (
        "/tmp/sf_empty" if empty else "/tmp/sf_adversarial"
    )
    os.makedirs(out, exist_ok=True)
    for name, table in build_tables().items():
        if empty:
            # the "empty partition day": same schemas, zero rows — every
            # query must return an empty result, never crash
            table = table.slice(0, 0)
        pq.write_table(table, os.path.join(out, f"{name}.parquet"))
        print(f"{name}: {table.num_rows} rows -> {out}/{name}.parquet")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
