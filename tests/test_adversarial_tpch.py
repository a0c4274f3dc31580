"""Adversarial relational-tier differential: every oracle query that
touches only the TPC-H-shaped tables runs on Spark AND DuckDB over a
small fixture with consistent foreign keys but dirty values — negative
quantities and prices, 100% discounts (zero revenue denominators),
empty-string statuses/names, unicode names, 1970/2199 dates, extreme
magnitudes — and must match value-for-value.

Round-5 findings this suite pins: pivot cells with no rows COUNT to 0
(Spark's pivot left them NULL where the filtered-count oracle says 0),
and the DOCUMENTED deviation that edit distance is character-based
(Spark) while DuckDB's levenshtein counts bytes — the two fuzzy-match
queries are compared here with their unicode rows' engine-correct
character semantics asserted directly instead.
"""

from __future__ import annotations

import datetime
import os
import re

import pytest

from imp_etl_spark import schemas
from imp_etl_spark.queries import REGISTRY
from tests.test_oracle import _rows


def _dt(y, m, d):
    return datetime.datetime(y, m, d)


def _fixture_tables():
    region = [(0, ""), (1, "EUROPE"), (2, "ASIA 亚洲")]
    nation = [(0, "GERMANY", 1), (1, "FRANCE", 1),
              (2, "中国", 2), (3, "NO-REGION", 0)]
    customer = [
        (i, f"Customer#{i:09d}", i % 4,
         float((-1) ** i * 10 ** (i % 7)),
         ["BUILDING", "", "AUTOMOBILE", "机械"][i % 4])
        for i in range(1, 9)
    ]
    supplier = [
        (1, "Supplier#1", 0, 0.0),
        (2, "Supplïer#2 ünïcode", 2, -999999.99),
        (3, "", 3, 1e9),
    ]
    part = [
        (1, "forest green ring", "B1", "TYPE A", 1, 0.01),
        (2, "forest green rïng", "B1", "TYPE A", 2, 1e8),
        (3, "", "B2", "TYPE B", 0, -5.0),
        (4, "ring ring ring", "B2", "TYPE B", 100, 0.0),
        (5, "翡翠 绿 环", "B3", "TYPE C", 50, 123.45),
    ]
    orders, lineitem, ok = [], [], 0
    for c in range(1, 9):
        for _j in range(2):
            ok += 1
            odate = [_dt(1970, 1, 1), _dt(1992, 6, 1), _dt(1998, 8, 2),
                     _dt(2199, 12, 31)][ok % 4]
            orders.append((ok, c, ["O", "F", "P"][ok % 3],
                           float((-1) ** ok * 10 ** (ok % 6)),
                           odate, ["1-URGENT", "", "5-LOW"][ok % 3]))
            for ln in range(1, 3):
                pk = (ok + ln) % 5 + 1
                sk = (ok + ln) % 3 + 1
                lineitem.append((ok, pk, sk, ln,
                                 float(ln * ((-1) ** ok)),
                                 float((-1) ** ln * 10 ** (ok % 6)),
                                 [0.0, 1.0, 0.5, 0.1][(ok + ln) % 4],
                                 0.08,
                                 ["A", "N", "R", ""][(ok + ln) % 4],
                                 ["O", "F", ""][(ok + ln) % 3],
                                 odate + datetime.timedelta(days=ln)))
    # round-6 (ADVICE): monetary magnitudes whose cents exceed ~9.2e11 —
    # the old bigint rank-packing in rfm_customer_segments wrapped on
    # these; the decimal(38,0) packing must rank them correctly
    for sign in (1.0, -1.0):
        ok += 1
        odate = _dt(1995, 1, ok % 28 + 1)
        orders.append((ok, ok % 8 + 1, "F", sign * 9.99e13, odate,
                       "1-URGENT"))
        # lineitem prices stay inside the engine's decimal(18,6) money
        # domain — the wrap stress is the ORDER total, which feeds the
        # rank packing
        for ln in range(1, 3):
            lineitem.append((ok, (ok + ln) % 5 + 1, (ok + ln) % 3 + 1,
                             ln, float(ln), sign * 1e6, 0.0, 0.08,
                             "N", "O", odate + datetime.timedelta(days=ln)))
    # round-6 (fuzz seed 30): a part whose every lineitem has NULL
    # extendedprice aggregates to NULL revenue; the Pareto ranking must
    # order it LAST on both engines (Spark's asc-nulls-first default
    # ranked it first, shifting every rnk below it). NULL quantity
    # rides along for the rollup/cube sums.
    part.append((6, "null revenue part", "B3", "TYPE C", 9, 1.0))
    ok += 1
    orders.append((ok, 1, "F", 10.0, _dt(1995, 6, 1), "5-LOW"))
    lineitem.append((ok, 6, 1, 1, None, None, 0.0, 0.08, "N", "O",
                     _dt(1995, 6, 2)))
    lineitem.append((ok, 6, 2, 2, None, None, 0.5, 0.0, "A", "F",
                     _dt(1995, 6, 3)))
    return {"region": region, "nation": nation, "customer": customer,
            "supplier": supplier, "part": part, "orders": orders,
            "lineitem": lineitem}


_REL_TABLES = ["region", "nation", "customer", "supplier", "part",
               "orders", "lineitem"]
_EXCLUDED_TABLES = ["documents", "embeddings", "events"]

# engine contract is character-based edit distance; DuckDB's levenshtein
# counts bytes, so these two are checked by direct assertion instead of
# the oracle compare (see fuzzy_part_pairs docstring)
_BYTE_LEVENSHTEIN_DEVIATION = {"fuzzy_part_pairs", "snm_part_pairs"}

RELATIONAL_ONLY = [
    n for n, (_f, s) in REGISTRY.items()
    if s is not None
    and any(re.search(rf"\b{t}\b", s.lower()) for t in _REL_TABLES)
    and not any(re.search(rf"\b{t}\b", s.lower()) for t in _EXCLUDED_TABLES)
    and n not in _BYTE_LEVENSHTEIN_DEVIATION
]


@pytest.fixture(scope="module")
def adv_rel_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_reladv")
    for name, rows in _fixture_tables().items():
        spark.createDataFrame(rows, schemas.FIXTURE_TABLES[name]) \
            .write.mode("overwrite").parquet(
                os.path.join(str(d), f"{name}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def adv_rel_duck(adv_rel_dir):
    import duckdb

    con = duckdb.connect()
    for name in _REL_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{adv_rel_dir}/{name}.parquet/*.parquet')")
    return con


def test_relational_queries_cover_the_tier():
    for must in ("q1_pricing_summary", "q14_promo_effect",
                 "pivot_status_counts", "topk_orders",
                 "q2_min_cost_supplier", "j4_merge_preview"):
        assert must in RELATIONAL_ONLY


@pytest.mark.parametrize("name", RELATIONAL_ONLY)
def test_query_matches_oracle_on_adversarial_relational(
        spark, adv_rel_duck, adv_rel_dir, name):
    fn, sql = REGISTRY[name]
    sdf = fn(spark, adv_rel_dir)
    rel = adv_rel_duck.sql(sql)
    duck_cols = [c.lower() for c in rel.columns]
    spark_rows = [
        tuple(row[c] for c in duck_cols)
        for row in (r.asDict() for r in sdf.collect())
    ]
    duck_rows = [tuple(r) for r in rel.fetchall()]
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}")
    sn, dn = _rows(spark_rows), _rows(duck_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(sn, dn)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_fuzzy_pairs_use_character_level_edit_distance(spark, adv_rel_dir):
    # the documented deviation: 'rïng' is ONE substitution from 'ring'
    fn, _ = REGISTRY["fuzzy_part_pairs"]
    got = {(r["name_a"], r["name_b"]): r["edit_dist"]
           for r in fn(spark, adv_rel_dir).collect()}
    assert got[("forest green ring", "forest green rïng")] == 1


def test_pareto_zero_total_revenue_drops_every_row(spark, tmp_path):
    # curated seed-88 regression (the generator stream changed in r7
    # when the dangling-FK class was added, so seed 88 no longer
    # regenerates the finding fixture — this pins the finding class
    # deterministically): pooled +/- revenues cancel to an EXACT zero
    # total, making every cumulative share 0/0. try_divide yields NULL
    # on Spark, double/0 yields NULL on DuckDB, and the <= 0.8 cut
    # drops all rows on BOTH engines — neither inf nor a crash.
    import duckdb

    d = _dt(1995, 6, 1)
    rows = [
        (1, 1, 1, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", d),
        (2, 2, 1, 1, 1.0, -100.0, 0.0, 0.0, "N", "O", d),
    ]
    spark.createDataFrame(rows, schemas.FIXTURE_TABLES["lineitem"]) \
        .write.mode("overwrite").parquet(
            os.path.join(str(tmp_path), "lineitem.parquet"))
    fn, sql = REGISTRY["parts_pareto_cumshare"]
    assert fn(spark, str(tmp_path)).count() == 0
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{tmp_path}/lineitem.parquet/*.parquet')")
    assert con.sql(sql).fetchall() == []
    con.close()
