"""Driver-contract invariants for __spark_entry__.py.

The round driver consumes exactly three callables; these tests pin the
contract so refactors can't silently break the verification pipeline.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod

from qpmodel_spark import registry


def test_queries_and_oracles_align():
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert set(os_) <= set(qs), "oracle without a query"
    # every oracle is a non-empty SELECT/WITH statement
    for name, sql in os_.items():
        head = sql.strip().split(None, 1)[0].upper()
        assert head in ("SELECT", "WITH"), (name, head)
    # rows-only entries are the documented PRNG/sketch set, nothing else
    # (r4: the sampler/HLL entries gained validation-summary oracles —
    # deterministic invariants compare exactly, PRNG-dependent cells are
    # bounds-checked in-query and surface as booleans)
    # (the ANN trio gained recall-validation oracles in r4 too)
    rows_only = set(qs) - set(os_)
    assert rows_only == {"dedup_simhash"}, rows_only


def test_driver_order_fronts_unverified():
    """ordered_specs puts driver-unverified entries before verified ones."""
    verified = registry._driver_verified()
    names = list(entry_mod.queries())
    seen_verified = False
    for n in names:
        if n in verified:
            seen_verified = True
        else:
            assert not seen_verified, f"unverified '{n}' after a verified entry"


def test_entry_runs_and_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "l_returnflag" in df.columns
