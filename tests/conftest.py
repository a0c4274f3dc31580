from __future__ import annotations

import os

import pytest

from imp_etl_spark.session import get_spark

# sf0.001 keeps unit tests fast; the oracle differential test overrides via
# SPARK_GRAFT_TEST_SF (the driver's gate runs at sf0.01).
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")

# ---------------------------------------------------------------------------
# Scheduled tier (r13, VERDICT r12 item 1): the default suite must fit the
# verify budget (<20 min); it had grown to 655 tests / ~34-38 min because
# every multi-minute equivalence LEDGER (randomized differential seeds,
# N^2 verify-vs-posting-join equivalence, mode-bitequality sweeps) ran on
# every invocation. Those ledgers re-prove properties that are already
# pinned by a kept representative AND/OR re-checked by the driver's own
# oracle gate every round, so they move to a scheduled tier: set
# IMP_ETL_SLOW_TESTS=1 to run them (CI cron / before a release), while
# the default run skips them visibly (reported as skipped, never silently
# deselected). Every skipped nodeid is listed here with the coverage that
# remains.
_SLOW_TIER = (
    # randomized differential ledger: ~570 s for 6 of 7 pinned seeds.
    # Seed 88 stays as the representative (cheapest full pass); the
    # regressions the others caught are each pinned by dedicated unit
    # tests and the driver re-runs every declared query vs the oracle.
    "test_fuzz_differential.py::test_randomized_differential_seed_is_clean[30]",
    "test_fuzz_differential.py::test_randomized_differential_seed_is_clean[501]",
    "test_fuzz_differential.py::test_randomized_differential_seed_is_clean[713]",
    "test_fuzz_differential.py::test_randomized_differential_seed_is_clean[36]",
    "test_fuzz_differential.py::test_randomized_differential_seed_is_clean[224]",
    "test_fuzz_differential.py::test_randomized_differential_seed919_forced_seq_is_clean",
    # trailing-window mode-equivalence sweeps (~116 s): the dispatch
    # boundary + derived-support test stays, as do the lag-dispatch
    # mode tests, covering the same dispatch surface at unit cost.
    "test_skew.py::test_trailing_time_sums_modes_bitequal",
    "test_skew.py::test_trailing_time_sums_auto_dispatch",
    # probe-memo cap behavior builds 65+ distinct plans (~23 s); the
    # memo hit/release tests remain.
    "test_skew.py::test_probe_memo_cap",
    # dedup equivalence ledgers (~128 s): all-pairs-vs-posting-join and
    # star-fallback cluster preservation are algebraic equivalences
    # re-proved per run over full cross products; the capped-pair unit
    # pins, the index round-trip pin and the driver's oracle rows for
    # every dedup-tier query remain.
    "test_dedup_cap.py::test_pairwise_verify_equals_posting_join_on_all_pairs",
    "test_dedup_cap.py::test_capped_star_fallback_preserves_clusters_and_survivors",
    "test_dedup_cap.py::test_three_epoch_incremental_crawl_equals_batch_first_wins",
    # two-algorithm equivalence (star vs union-find, ~15 s): the CC
    # result pins remain in the kept graph tests.
    "test_graph.py::test_star_algorithm_matches_union_find",
    # oracle rows that the driver's own correctness gate samples every
    # round anyway and that cost >20 s each here (streaming waits, IVF
    # builds); the in-repo oracle sweep keeps every other row.
    "test_oracle.py::test_query_matches_oracle[stream_interval_join]",
    "test_oracle.py::test_query_matches_oracle[ivf_cosine_topk]",
    "test_oracle.py::test_query_matches_oracle[ivf_indexed_topk]",
    # adversarial-text rerun of the full clustering pipeline (~48 s):
    # cross_corpus_survivors (kept) exercises the same banded verify
    # path on the same adversarial corpus.
    "test_adversarial_text.py::test_query_matches_oracle_on_adversarial_text[dedup_cluster_assign]",
)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: scheduled-tier ledger test; runs when IMP_ETL_SLOW_TESTS=1")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("IMP_ETL_SLOW_TESTS"):
        return
    skip = pytest.mark.skip(
        reason="scheduled tier (set IMP_ETL_SLOW_TESTS=1)")
    for item in items:
        if ("slow" in item.keywords
                or any(item.nodeid.endswith(s) for s in _SLOW_TIER)):
            item.add_marker(skip)

FIXTURE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    s = get_spark("imp-etl-spark-tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for name in FIXTURE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{ORACLE_SF_DIR}/{name}.parquet')"
        )
    return con
