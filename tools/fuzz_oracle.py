#!/usr/bin/env python
"""Cross-engine differential fuzz harness (VERDICT r14 task #1).

Three consecutive rounds of hand-driven review each found real latent
Spark-vs-DuckDB divergences that only adversarial inputs expose (r14
alone: zero-token docs minting non-NULL LSH band keys, `sequence(1,0)`
crashing bigram queries on sub-2-token docs, byte-vs-char word length in
the Gopher oracle, ns floor-division landing the last 43 ms of a day on
the next date). This harness stops relying on review luck: a SEEDED
generative corpus builder writes adversarial parquet twins of the ten
driver tables — same physical schemas as /root/testdata (TESTDATA.md),
hostile content — and EVERY oracle-expressible registry query is run on
them through the exact driver-shaped compare
(`testing.compare.compare_with_oracle`, hostile session).

Adversarial classes (the prescribed set):
- documents: zero-token (""), whitespace-only, one-token, NULL text,
  non-ASCII (CJK / emoji / combining / RTL), control chars, quote/
  backslash soup, one huge 5000-char token, a 20k-char doc, massive
  single-token repetition, exact dups and near-dup shingle pairs.
- events: timestamps on exact day/hour boundaries, last-microsecond of a
  day, pre-epoch (negative) timestamps, NULL value/props/user_id,
  malformed / empty / nested / unicode / non-object JSON props.
- lineitem/orders/customer: NULLs in measures, zero quantities, zero and
  maximal discounts, negative prices, orphan foreign keys, customers
  with no orders, boundary dates.
- embeddings: the all-zero vector (norm 0), exact duplicate vectors,
  huge/tiny magnitudes, NULL label.
- variant "empty": every FACT table (orders lineitem events documents
  embeddings) written with ZERO rows (schema-only parquet) — the
  empty-partition class; dims stay populated.

A finding is: result mismatch, or one engine erroring while the other
answers, or both erroring (production queries must not crash on hostile
rows). Exit 0 iff no findings. Wired into tools/close_round.py as a
round gate.

Usage:
    python tools/fuzz_oracle.py [--seed 42] [--variant both]
        [--names q1,q2] [--keep-dir DIR]
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import random
import shutil
import sys
import tempfile
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FACTS = ("orders", "lineitem", "events", "documents", "embeddings")

# Vocabulary matching the driver generator's documents, so retrieval /
# LSH / tf-idf queries do real work on the fuzz corpus too.
WORDS = (
    "the fast key order sort table scan merge part window small hash join "
    "batch stream spark dup group query row data slow filter customer line "
    "value agg column big a vector"
).split()

ADVERSARIAL_TEXTS = [
    "",  # zero-token
    " ",  # whitespace-only
    "\t\n  \r\n",  # whitespace soup
    "spark",  # one token
    "élève résumé naïve",  # latin diacritics
    "日本語の文書 中文文档",  # CJK
    "\U0001f600 \U0001f680 emoji doc \U0001f4a9",  # emoji
    "café combining mark",  # combining accent
    "العربية rtl text",  # RTL Arabic
    "quote\"and'backslash\\soup `tick`",  # repr-sensitive chars
    "ctrl\x01chars\x02here\x03",  # control chars
    "tab\tsep\ttokens newline\nsplit",  # embedded separators
    "x" * 5000,  # one huge token
    ("spark " * 40).strip(),  # massive single-token repetition
    "123 456 789 0",  # digits-only tokens
    "!!! ??? ... ---",  # punctuation-only tokens
    "MiXeD CaSe ToKeNs MIXED case",  # case traps
    "a " * 1 + "b",  # two one-char tokens
]

PROPS_ADVERSARIAL = [
    None,  # NULL props
    "",  # empty string (not JSON)
    "{}",  # empty object
    "{bad json",  # malformed
    '{"k": null}',  # JSON null value
    '{"k": {"nested": 1}}',  # nested object
    '{"k": [1, 2, 3]}',  # array value
    '{"k": 1e308}',  # huge double
    '{"k": -7}',  # negative
    '{"k": 0.5}',  # float where int expected
    '{"日本": 3}',  # unicode key
    "[1, 2]",  # non-object JSON
    '"just a string"',  # scalar JSON
]


def _ts(y, mo, d, h=0, mi=0, s=0, us=0):
    return dt.datetime(y, mo, d, h, mi, s, us)


def build_corpus(out_dir: str, seed: int = 42, variant: str = "adversarial") -> None:
    """Write the ten tables with the exact physical schemas of
    /root/testdata (pyarrow types pinned below) and hostile content."""
    rng = random.Random(seed)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    empty = variant == "empty"

    def write(name, schema, cols):
        n = len(next(iter(cols.values()))) if cols else 0
        if empty and name in FACTS:
            cols = {f.name: [] for f in schema}
        tbl = pa.Table.from_pydict(
            {f.name: pa.array(cols[f.name], type=f.type) for f in schema},
            schema=schema,
        )
        pq.write_table(tbl, out / f"{name}.parquet")
        return n

    # --- dims (always populated; domains mirror the driver generator) ---
    write(
        "region",
        pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]),
        {
            "r_regionkey": [0, 1, 2, 3, 4],
            "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
        },
    )
    write(
        "nation",
        pa.schema(
            [
                ("n_nationkey", pa.int32()),
                ("n_name", pa.string()),
                ("n_regionkey", pa.int32()),
            ]
        ),
        {
            "n_nationkey": list(range(25)),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": [i % 5 for i in range(25)],
        },
    )

    n_cust = 60
    write(
        "customer",
        pa.schema(
            [
                ("c_custkey", pa.int64()),
                ("c_name", pa.string()),
                ("c_nationkey", pa.int32()),
                ("c_acctbal", pa.float64()),
                ("c_mktsegment", pa.string()),
            ]
        ),
        {
            "c_custkey": list(range(n_cust)),
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": [i % 25 for i in range(n_cust)],
            # NULL, zero and negative balances in the mix.
            "c_acctbal": [
                None if i == 7 else 0.0 if i == 8 else round(rng.uniform(-1000, 10000), 2)
                for i in range(n_cust)
            ],
            "c_mktsegment": [
                ["HOUSEHOLD", "FURNITURE", "BUILDING", "AUTOMOBILE", "MACHINERY"][i % 5]
                for i in range(n_cust)
            ],
        },
    )
    write(
        "supplier",
        pa.schema(
            [
                ("s_suppkey", pa.int64()),
                ("s_name", pa.string()),
                ("s_nationkey", pa.int32()),
                ("s_acctbal", pa.float64()),
            ]
        ),
        {
            "s_suppkey": list(range(10)),
            "s_name": [f"Supplier#{i:09d}" for i in range(10)],
            "s_nationkey": [i % 25 for i in range(10)],
            "s_acctbal": [round(rng.uniform(-500, 9000), 2) for _ in range(10)],
        },
    )
    n_part = 50
    write(
        "part",
        pa.schema(
            [
                ("p_partkey", pa.int64()),
                ("p_name", pa.string()),
                ("p_brand", pa.string()),
                ("p_type", pa.string()),
                ("p_size", pa.int32()),
                ("p_retailprice", pa.float64()),
            ]
        ),
        {
            "p_partkey": list(range(n_part)),
            "p_name": [
                f"{rng.choice(['cold', 'small', 'large', 'hot'])} "
                f"{rng.choice(['widget', 'bolt', 'gear'])}"
                for _ in range(n_part)
            ],
            "p_brand": [f"Brand#{rng.randrange(1, 25)}" for _ in range(n_part)],
            "p_type": [
                rng.choice(["ECONOMY", "SMALL", "LARGE", "STANDARD", "MEDIUM", "PROMO"])
                for _ in range(n_part)
            ],
            "p_size": [0 if i == 3 else rng.randrange(1, 50) for i in range(n_part)],
            "p_retailprice": [
                0.0 if i == 4 else round(rng.uniform(100, 2000), 2) for i in range(n_part)
            ],
        },
    )

    # --- orders: boundary dates, orphan custkey, zero/negative totals ---
    n_ord = 300
    statuses, prios = ["F", "O", "P"], [
        "1-URGENT",
        "2-HIGH",
        "3-MEDIUM",
        "4-NOT SPECIFIED",
        "5-LOW",
    ]
    o_date = []
    for i in range(n_ord):
        if i == 0:
            o_date.append(_ts(1995, 1, 1))  # min boundary
        elif i == 1:
            o_date.append(_ts(2001, 12, 31))  # max boundary
        elif i == 2:
            o_date.append(_ts(1969, 12, 31))  # pre-epoch
        else:
            o_date.append(
                _ts(1995 + rng.randrange(7), 1 + rng.randrange(12), 1 + rng.randrange(28))
            )
    write(
        "orders",
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_orderstatus", pa.string()),
                ("o_totalprice", pa.float64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderpriority", pa.string()),
            ]
        ),
        {
            "o_orderkey": list(range(n_ord)),
            # custkeys 55-59 never order (customers with no orders);
            # orderkey 5 is an orphan pointing past the customer table.
            "o_custkey": [
                999_999 if i == 5 else rng.randrange(0, 55) for i in range(n_ord)
            ],
            "o_orderstatus": [rng.choice(statuses) for _ in range(n_ord)],
            "o_totalprice": [
                0.0 if i == 6 else -12.5 if i == 7 else round(rng.uniform(1000, 400000), 2)
                for i in range(n_ord)
            ],
            "o_orderdate": o_date,
            "o_orderpriority": [rng.choice(prios) for _ in range(n_ord)],
        },
    )

    # --- lineitem: zero qty, 100% discount, negative price, orphans ---
    n_li = 800
    li_ship = []
    for i in range(n_li):
        if i == 0:
            li_ship.append(_ts(1995, 1, 1))
        elif i == 1:
            li_ship.append(_ts(2001, 12, 31, 23, 59, 59, 999999))
        else:
            li_ship.append(
                _ts(1995 + rng.randrange(7), 1 + rng.randrange(12), 1 + rng.randrange(28))
            )
    write(
        "lineitem",
        pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_partkey", pa.int64()),
                ("l_suppkey", pa.int64()),
                ("l_linenumber", pa.int32()),
                ("l_quantity", pa.float64()),
                ("l_extendedprice", pa.float64()),
                ("l_discount", pa.float64()),
                ("l_tax", pa.float64()),
                ("l_returnflag", pa.string()),
                ("l_linestatus", pa.string()),
                ("l_shipdate", pa.timestamp("us")),
            ]
        ),
        {
            "l_orderkey": [rng.randrange(0, n_ord) for _ in range(n_li)],
            "l_partkey": [
                888_888 if i == 2 else rng.randrange(0, n_part) for i in range(n_li)
            ],
            "l_suppkey": [rng.randrange(0, 10) for _ in range(n_li)],
            "l_linenumber": [1 + (i % 7) for i in range(n_li)],
            "l_quantity": [
                0.0 if i == 0 else float(rng.randrange(1, 51)) for i in range(n_li)
            ],
            "l_extendedprice": [
                -50.0 if i == 1 else round(rng.uniform(900, 100000), 2)
                for i in range(n_li)
            ],
            "l_discount": [
                1.0 if i == 0 else 0.0 if i == 1 else round(rng.randrange(0, 11) / 100, 2)
                for i in range(n_li)
            ],
            "l_tax": [round(rng.randrange(0, 9) / 100, 2) for _ in range(n_li)],
            "l_returnflag": [rng.choice(["R", "N", "A"]) for _ in range(n_li)],
            "l_linestatus": [rng.choice(["O", "F"]) for _ in range(n_li)],
            "l_shipdate": li_ship,
        },
    )

    # --- events: boundary/negative timestamps, hostile props ---
    n_ev = 500
    etypes = ["signup", "click", "error", "view", "purchase"]
    ev_ts, ev_props, ev_user, ev_val = [], [], [], []
    boundary_ts = [
        _ts(2024, 1, 1, 0, 0, 0, 0),  # exact day boundary
        _ts(2024, 1, 15, 23, 59, 59, 999999),  # last us of a day
        _ts(2024, 1, 15, 0, 0, 0, 1),  # first us after midnight
        _ts(2024, 1, 10, 12, 0, 0, 0),  # exact hour boundary
        _ts(2024, 1, 10, 12, 59, 59, 999999),  # last us of an hour
        _ts(1969, 12, 31, 23, 59, 59, 999999),  # negative epoch us
        _ts(1969, 12, 31, 0, 0, 0, 0),  # negative, day boundary
        _ts(1970, 1, 1, 0, 0, 0, 0),  # epoch zero
    ]
    for i in range(n_ev):
        if i < len(boundary_ts):
            ev_ts.append(boundary_ts[i])
        else:
            ev_ts.append(
                _ts(2024, 1, 1 + rng.randrange(30), rng.randrange(24), rng.randrange(60),
                    rng.randrange(60), rng.randrange(1_000_000))
            )
        ev_props.append(
            PROPS_ADVERSARIAL[i - 8] if 8 <= i < 8 + len(PROPS_ADVERSARIAL)
            else json.dumps({"k": rng.randrange(0, 100)}, separators=(", ", ": "))
        )
        ev_user.append(None if i == 30 else rng.randrange(0, 60))
        ev_val.append(None if i == 31 else round(rng.uniform(0, 330), 2))
    write(
        "events",
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        ),
        {
            "event_id": list(range(n_ev)),
            "ts": ev_ts,
            "user_id": ev_user,
            "event_type": [etypes[i % 5] for i in range(n_ev)],
            "value": ev_val,
            "props": ev_props,
        },
    )

    # --- documents: the adversarial text classes + organic word salad ---
    n_doc = 200
    texts: list[str | None] = list(ADVERSARIAL_TEXTS)
    texts.append(None)  # NULL text
    while len(texts) < n_doc - 21:
        texts.append(" ".join(rng.choice(WORDS) for _ in range(rng.randrange(8, 120))))
    # exact duplicates and near-dup shingle pairs on organic docs
    for i in range(10):
        texts.append(texts[len(ADVERSARIAL_TEXTS) + 1 + i])  # exact dup
    for i in range(10):
        base = texts[len(ADVERSARIAL_TEXTS) + 11 + i]
        toks = base.split()
        toks[rng.randrange(len(toks))] = rng.choice(WORDS)  # ~1-token edit
        texts.append(" ".join(toks))
    texts.append("x" * 20000)  # one giant doc
    texts = texts[:n_doc]
    langs = ["en", "zh", "fr", "es", "de"]
    write(
        "documents",
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text", pa.string()),
                ("lang", pa.string()),
                ("source", pa.string()),
                ("n_chars", pa.int64()),
            ]
        ),
        {
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": [None if i == 40 else langs[i % 5] for i in range(len(texts))],
            "source": [
                None if i == 41 else f"src{i % 20}" for i in range(len(texts))
            ],
            "n_chars": [None if t is None else len(t) for t in texts],
        },
    )

    # --- embeddings: zero vector, exact dups, extreme magnitudes ---
    n_vec, dim = 300, 64
    vecs = []
    for i in range(n_vec):
        if i == 0:
            vecs.append([0.0] * dim)  # all-zero (norm 0)
        elif i == 1:
            # large-but-in-domain magnitude: the exact-value DuckDB
            # oracles verify dot products on a DECIMAL(30,15) lattice
            # (15 integer digits), so |x| <= 1e3 over dim 64 stays exact;
            # beyond that BOTH engines leave the documented numeric
            # domain (float32 squares overflow) and the comparison is
            # meaningless rather than diagnostic.
            vecs.append([1e3] * dim)
        elif i == 2:
            vecs.append([1e-6] * dim)  # tiny magnitude
        else:
            vecs.append([round(rng.gauss(0, 1), 4) for _ in range(dim)])
    vecs[10] = list(vecs[3])  # exact duplicate pair
    write(
        "embeddings",
        pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
                ("label", pa.int32()),
            ]
        ),
        {
            "vec_id": list(range(n_vec)),
            "embedding": vecs,
            "label": [None if i == 5 else i % 10 for i in range(n_vec)],
        },
    )


def sweep(spark, sf_dir: str, only: set[str] | None = None) -> list[tuple[str, str]]:
    """Run every oracle-expressible registry query on the corpus through
    the driver-shaped compare. Returns (query, finding) pairs."""
    from near_public_lakehouse_spark.queries import all_queries
    from near_public_lakehouse_spark.testing.compare import (
        compare_with_oracle,
        duckdb_oracle,
    )

    con = duckdb_oracle(sf_dir)
    findings: list[tuple[str, str]] = []
    for name, q in sorted(all_queries().items()):
        if q.oracle is None or (only and name not in only):
            continue
        try:
            sdf = q.fn(spark, sf_dir)
        except Exception as exc:  # plan-build crash
            findings.append((name, f"spark_plan_error: {type(exc).__name__}: {exc}"))
            continue
        try:
            problems = compare_with_oracle(sdf, con, q.oracle)
        except Exception as exc:
            msg = str(exc).split("\n")[0][:300]
            findings.append((name, f"exec_error: {type(exc).__name__}: {msg}"))
            continue
        if problems:
            findings.append((name, "; ".join(problems)[:500]))
    return findings


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument(
        "--variant", default="both", choices=["both", "adversarial", "empty"]
    )
    ap.add_argument("--names", default="", help="comma-separated subset")
    ap.add_argument("--keep-dir", default="", help="build corpora here and keep them")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    only = {n for n in args.names.split(",") if n} or None
    variants = ["adversarial", "empty"] if args.variant == "both" else [args.variant]
    base = Path(args.keep_dir) if args.keep_dir else Path(tempfile.mkdtemp(prefix="fuzz_"))
    total_bad = 0
    try:
        for variant in variants:
            vdir = base / f"{variant}_s{args.seed}"
            build_corpus(str(vdir), seed=args.seed, variant=variant)
            findings = sweep(spark, str(vdir), only)
            checked = len(
                [
                    n
                    for n, q in __import__(
                        "near_public_lakehouse_spark.queries", fromlist=["all_queries"]
                    ).all_queries().items()
                    if q.oracle is not None and (not only or n in only)
                ]
            )
            for name, finding in findings:
                print(f"[{variant}] {name} FINDING: {finding}", flush=True)
            print(
                f"[{variant}] checked={checked} findings={len(findings)}", flush=True
            )
            total_bad += len(findings)
    finally:
        if not args.keep_dir:
            shutil.rmtree(base, ignore_errors=True)
    print(f"FUZZ DONE findings={total_bad}")
    return 1 if total_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
