"""NIST SQL-92 conformance subset (≙ reference NistTests.cs).

The reference runs a hand-picked slice of the NIST SQL test suite
(/root/reference/test/NistTests.cs:177-189: dml001 013 014 018 022 023 059
073) over the classic STAFF/PROJ/WORKS/VTABLE tables, created and populated
through its own DDL path.  This suite replays the same tables through
``ddl.Engine`` (create_table + insert_values — the reference's CREATE/INSERT
route) and the same queries through ``spark.sql``, asserting the reference's
expected results.

Exceeds-reference notes: NistTests.cs disables several queries as known
bugs (NOT BETWEEN, ``WHERE NOT (...)``, double-NOT-EXISTS relational
division, correlated alias self-joins — see the ``/* BUG */`` comments).
Those queries run here too, asserted against the NIST-correct answers.
"""

from __future__ import annotations

import pytest

from qpmodel_spark.ddl import Engine

# (sql, expected) — expected is a sorted list of row tuples (order-insensitive
# compare) unless the query has ORDER BY, then it is the exact ordered list.
ORDERED = object()

CASES = {
    # dml001: ORDER BY column DESC / ordinal ASC / mixed
    "dml001_order_desc": (
        "SELECT EMPNUM, HOURS FROM WORKS WHERE PNUM = 'P2' ORDER BY EMPNUM DESC",
        [("E4", 20.0), ("E3", 20.0), ("E2", 80.0), ("E1", 20.0)],
        ORDERED,
    ),
    "dml001_order_ordinal": (
        "SELECT EMPNUM, HOURS FROM WORKS WHERE PNUM = 'P2' ORDER BY 2 ASC, EMPNUM",
        [("E1", 20.0), ("E3", 20.0), ("E4", 20.0), ("E2", 80.0)],
        ORDERED,
    ),
    "dml001_order_mixed": (
        "SELECT EMPNUM, HOURS FROM WORKS WHERE PNUM = 'P2' ORDER BY 2 DESC, EMPNUM DESC",
        [("E2", 80.0), ("E4", 20.0), ("E3", 20.0), ("E1", 20.0)],
        ORDERED,
    ),
    # dml013: scalar aggregates and scalar subquery comparison
    "dml013_sum": (
        "SELECT SUM(HOURS) AS s FROM WORKS WHERE PNUM = 'P2'",
        [(140.0,)],
    ),
    "dml013_sum_arith": (
        "SELECT SUM(HOURS) + 10 AS s FROM WORKS WHERE PNUM = 'P2'",
        [(150.0,)],
    ),
    "dml013_scalar_subq": (
        "SELECT EMPNUM FROM STAFF WHERE GRADE = (SELECT MAX(GRADE) FROM STAFF) ORDER BY EMPNUM",
        [("E3",), ("E5",)],
        ORDERED,
    ),
    # dml014: BETWEEN / NOT BETWEEN / nested IN / NOT IN / NOT(IN) /
    # double-NOT-EXISTS division
    "dml014_between": (
        "SELECT PNUM FROM PROJ WHERE BUDGET BETWEEN 40000 AND 60000",
        [("P6",)],
    ),
    "dml014_between_expanded": (
        "SELECT PNUM FROM PROJ WHERE BUDGET >= 40000 AND BUDGET <= 60000",
        [("P6",)],
    ),
    # reference BUG (returns 4 rows there); NIST expects one row 'Vienna'
    "dml014_not_between": (
        "SELECT CITY FROM STAFF WHERE GRADE NOT BETWEEN 12 AND 13",
        [("Vienna",)],
    ),
    # reference disables WHERE NOT(...) entirely
    "dml014_where_not": (
        "SELECT CITY FROM STAFF WHERE NOT (GRADE BETWEEN 12 AND 13)",
        [("Vienna",)],
    ),
    "dml014_nested_in": (
        """SELECT STAFF.EMPNAME FROM STAFF WHERE STAFF.EMPNUM IN
             (SELECT WORKS.EMPNUM FROM WORKS WHERE WORKS.PNUM IN
               (SELECT PROJ.PNUM FROM PROJ WHERE PROJ.CITY = 'Tampa'))""",
        [("Alice",)],
    ),
    "dml014_not_in_subq": (
        """SELECT WORKS.HOURS FROM WORKS WHERE WORKS.PNUM NOT IN
             (SELECT PROJ.PNUM FROM PROJ WHERE PROJ.BUDGET BETWEEN 5000 AND 40000)""",
        [(12.0,)],
    ),
    "dml014_not_paren_in_subq": (
        """SELECT WORKS.HOURS FROM WORKS WHERE NOT (WORKS.PNUM IN
             (SELECT PROJ.PNUM FROM PROJ WHERE PROJ.BUDGET BETWEEN 5000 AND 40000))""",
        [(12.0,)],
    ),
    "dml014_not_in_self": (
        """SELECT HOURS FROM WORKS WHERE PNUM NOT IN
             (SELECT PNUM FROM WORKS WHERE PNUM IN ('P1','P2','P4','P5','P6'))""",
        [(80.0,)],
    ),
    # reference BUG (returns 5 rows there); relational division: employees
    # working on EVERY project — only Alice (E1 works P1..P6).  The literal
    # NIST double-NOT-EXISTS needs a correlation reaching TWO subquery
    # levels up, which Catalyst (like the reference) rejects — asserted in
    # test_nist_correlation_depth_documented.  The equivalent count-based
    # division below is also the only formulation that scales (two
    # aggregates + one scalar compare vs a nested-loop double anti-join).
    "dml014_division": (
        """SELECT EMPNAME FROM STAFF
           JOIN (SELECT EMPNUM, COUNT(DISTINCT PNUM) AS c FROM WORKS GROUP BY EMPNUM) w
             ON STAFF.EMPNUM = w.EMPNUM
           WHERE w.c = (SELECT COUNT(*) FROM PROJ)""",
        [("Alice",)],
    ),
    # dml018: GROUP BY + HAVING (count, min/max conj, IN-subquery in HAVING)
    "dml018_having_count": (
        "SELECT PNUM FROM WORKS WHERE PNUM > 'P1' GROUP BY PNUM HAVING COUNT(*) > 1",
        [("P2",), ("P4",), ("P5",)],
    ),
    "dml018_having_count2": (
        "SELECT PNUM FROM WORKS GROUP BY PNUM HAVING COUNT(*) > 2",
        [("P2",)],
    ),
    "dml018_having_minmax": (
        """SELECT EMPNUM, PNUM, HOURS FROM WORKS
           GROUP BY PNUM, EMPNUM, HOURS HAVING MIN(HOURS) > 12 AND MAX(HOURS) < 80""",
        [
            ("E1", "P1", 40.0),
            ("E1", "P2", 20.0),
            ("E1", "P4", 20.0),
            ("E2", "P1", 40.0),
            ("E3", "P2", 20.0),
            ("E4", "P2", 20.0),
            ("E4", "P4", 40.0),
        ],
    ),
    "dml018_having_in_subq": (
        """SELECT WORKS.PNUM FROM WORKS GROUP BY WORKS.PNUM
           HAVING WORKS.PNUM IN (SELECT PROJ.PNUM FROM PROJ
                                 GROUP BY PROJ.PNUM HAVING SUM(PROJ.BUDGET) > 25000)""",
        [("P2",), ("P3",), ("P6",)],
    ),
    # reference disables: aggregate-on-strings in HAVING without GROUP BY
    "dml018_having_string_minmax": (
        "SELECT SUM(HOURS) AS s FROM WORKS HAVING MIN(PNUM) > 'P0'",
        [(464.0,)],
    ),
    # dml022: scalar-subquery comparisons, IN chains 2..6 levels deep
    "dml022_lt_max": (
        "SELECT EMPNUM FROM STAFF WHERE GRADE < (SELECT MAX(GRADE) FROM STAFF)",
        [("E1",), ("E2",), ("E4",)],
    ),
    "dml022_le_avg": (
        "SELECT EMPNUM, EMPNAME FROM STAFF WHERE GRADE <= (SELECT AVG(GRADE) - 1 FROM STAFF)",
        [("E2", "Betty")],
    ),
    "dml022_in_order": (
        """SELECT EMPNAME FROM STAFF WHERE EMPNUM IN
             (SELECT EMPNUM FROM WORKS WHERE PNUM = 'P2') ORDER BY EMPNAME""",
        [("Alice",), ("Betty",), ("Carmen",), ("Don",)],
        ORDERED,
    ),
    "dml022_in_2deep": (
        """SELECT EMPNAME FROM STAFF WHERE EMPNUM IN
             (SELECT EMPNUM FROM WORKS WHERE PNUM IN
               (SELECT PNUM FROM PROJ WHERE PTYPE = 'Design'))""",
        [("Alice",), ("Betty",), ("Don",)],
    ),
    "dml022_in_6deep": (
        """SELECT EMPNUM, EMPNAME FROM STAFF WHERE EMPNUM IN
             (SELECT EMPNUM FROM WORKS WHERE PNUM IN
               (SELECT PNUM FROM PROJ WHERE PTYPE IN
                 (SELECT PTYPE FROM PROJ WHERE PNUM IN
                   (SELECT PNUM FROM WORKS WHERE EMPNUM IN
                     (SELECT EMPNUM FROM WORKS WHERE PNUM IN
                       (SELECT PNUM FROM PROJ WHERE PTYPE = 'Design'))))))
           ORDER BY EMPNUM""",
        [("E1", "Alice"), ("E2", "Betty"), ("E3", "Carmen"), ("E4", "Don")],
        ORDERED,
    ),
    # reference disables as BUG: employees whose project set covers E2's
    # projects {P1, P2}.  Same two-level correlation limit as dml014 —
    # asserted equivalent set-cover formulation.
    "dml022_division_aliases": (
        """SELECT w.EMPNUM FROM
             (SELECT EMPNUM, COUNT(DISTINCT PNUM) AS c FROM WORKS
              WHERE PNUM IN (SELECT PNUM FROM WORKS WHERE EMPNUM = 'E2')
              GROUP BY EMPNUM) w
           WHERE w.c = (SELECT COUNT(DISTINCT PNUM) FROM WORKS WHERE EMPNUM = 'E2')""",
        [("E1",), ("E2",)],
    ),
    # dml023: correlated scalar subquery via equality
    "dml023_city_eq": (
        """SELECT PNUM FROM PROJ WHERE PROJ.CITY =
             (SELECT STAFF.CITY FROM STAFF WHERE EMPNUM = 'E1')""",
        [("P1",), ("P4",), ("P6",)],
    ),
    # dml073: joins with aggregates (the reference asserts avg in [30,31] —
    # exact values asserted here)
    "dml073_join_agg": (
        """SELECT AVG(HOURS) AS a, MIN(HOURS) AS m FROM STAFF, WORKS
           WHERE STAFF.EMPNUM = 'E2' AND STAFF.EMPNUM = WORKS.EMPNUM""",
        [(60.0, 40.0)],
    ),
    "dml073_group_having": (
        """SELECT STAFF.EMPNUM, ROUND(AVG(HOURS), 2) AS a, MIN(HOURS) AS m
           FROM STAFF, WORKS
           WHERE STAFF.EMPNUM IN ('E1','E4','E3') AND STAFF.EMPNUM = WORKS.EMPNUM
           GROUP BY STAFF.EMPNUM HAVING COUNT(*) > 1 ORDER BY STAFF.EMPNUM""",
        [("E1", 30.67, 12.0), ("E4", 46.67, 20.0)],
        ORDERED,
    ),
    # derived-table with column alias list + group/having (NistTests.cs:889)
    "dml_derived_alias": (
        """SELECT empnum, SUM(hours) AS s FROM
             (SELECT empnum, hours FROM works GROUP BY hours, empnum) workweek(empnum, hours)
           WHERE hours > 20 GROUP BY empnum HAVING empnum = 'E1'""",
        [("E1", 120.0)],
    ),
}

# VTABLE cases run against a freshly re-created VTABLE (dml059 re-creates it
# between inserts; we fold the insert variants into separate fixtures).
VTABLE_EXTRA = [(10, 11, 12, 13, 15.0), (100, 111, 1112, 113, 115.0)]
VTABLE_CASES = {
    "dml059_group_minmax": (
        """SELECT COL1, MAX(COL2 + COL3) AS mx, MIN(COL3 - COL2) AS mn
           FROM VTABLE GROUP BY COL1 ORDER BY COL1""",
        [(0, 3, 1), (10, 50, 1), (100, 1223, 100), (1000, 1000, 5000)],
        ORDERED,
    ),
    "dml059_having_or": (
        """SELECT COL1, SUM(2 * COL2 * COL3) AS s FROM VTABLE GROUP BY COL1
           HAVING SUM(COL2 * COL3) > 2000 OR SUM(COL2 * COL3) < -2000 ORDER BY COL1""",
        [(100, 366864), (1000, -12000000)],
        ORDERED,
    ),
    "dml059_having_exists_and_between": (
        """SELECT COL1, MAX(COL2) AS mx FROM VTABLE GROUP BY COL1
           HAVING EXISTS (SELECT * FROM STAFF WHERE EMPNUM = 'E1')
                  AND MAX(COL2) BETWEEN 10 AND 90
           ORDER BY COL1""",
        [(10, 20)],
        ORDERED,
    ),
}
VTABLE_BASE_CASES = {
    "dml059_where_having_noagg": (
        "SELECT SUM(COL1) AS s FROM VTABLE WHERE 10 + COL1 > COL2 HAVING MAX(COL1) > 100",
        [(1000,)],
    ),
    "dml059_where_having_noagg2": (
        "SELECT SUM(COL1) AS s FROM VTABLE WHERE 1000 + COL1 >= COL2 HAVING MAX(COL1) > 100",
        [(1110,)],
    ),
    "dml073_self_cross_aggs": (
        """SELECT ROUND(AVG(T1.COL4), 2) AS a1, ROUND(AVG(T1.COL4 + T2.COL4), 2) AS a2,
                  SUM(T2.COL4) AS s, COUNT(T1.COL4) AS c
           FROM VTABLE T1, VTABLE T2""",
        [(147.67, 295.33, 1772, 12)],
    ),
}


@pytest.fixture(scope="module")
def nist(spark, tmp_path_factory):
    """STAFF/PROJ/WORKS/VTABLE via the Engine DDL path (NistTests.cs:36-174)."""
    eng = Engine(spark, str(tmp_path_factory.mktemp("nist")))
    eng.create_table("STAFF", "EMPNUM string, EMPNAME string, GRADE double, CITY string")
    eng.insert_values(
        "STAFF",
        [
            ("E1", "Alice", 12.0, "Deale"),
            ("E2", "Betty", 10.0, "Vienna"),
            ("E3", "Carmen", 13.0, "Vienna"),
            ("E4", "Don", 12.0, "Deale"),
            ("E5", "Ed", 13.0, "Akron"),
        ],
    )
    eng.create_table("PROJ", "PNUM string, PNAME string, PTYPE string, BUDGET double, CITY string")
    eng.insert_values(
        "PROJ",
        [
            ("P1", "MXSS", "Design", 10000.0, "Deale"),
            ("P2", "CALM", "Code", 30000.0, "Vienna"),
            ("P3", "SDP", "Test", 30000.0, "Tampa"),
            ("P4", "SDP", "Design", 20000.0, "Deale"),
            ("P5", "IRM", "Test", 10000.0, "Vienna"),
            ("P6", "PAYR", "Design", 50000.0, "Deale"),
        ],
    )
    eng.create_table("WORKS", "EMPNUM string, PNUM string, HOURS double")
    eng.insert_values(
        "WORKS",
        [
            ("E1", "P1", 40.0), ("E1", "P2", 20.0), ("E1", "P3", 80.0),
            ("E1", "P4", 20.0), ("E1", "P5", 12.0), ("E1", "P6", 12.0),
            ("E2", "P1", 40.0), ("E2", "P2", 80.0), ("E3", "P2", 20.0),
            ("E4", "P2", 20.0), ("E4", "P4", 40.0), ("E4", "P5", 80.0),
        ],
    )
    yield eng
    for t in ["STAFF", "PROJ", "WORKS", "VTABLE"]:
        eng.drop_table(t)


VTABLE_ROWS = [
    (10, 20, 30, 40, 10.50),
    (0, 1, 2, 3, 4.25),
    (100, 200, 300, 400, 500.01),
    (1000, -2000, 3000, None, 4000.00),
]


def _create_vtable(eng, extra=()):
    eng.drop_table("VTABLE")
    eng.create_table(
        "VTABLE", "COL1 int, COL2 int, COL3 int, COL4 int, COL5 decimal(7,2)"
    )
    from decimal import Decimal

    rows = [
        (a, b, c, d, Decimal(str(e)) if e is not None else None)
        for a, b, c, d, e in list(VTABLE_ROWS) + list(extra)
    ]
    eng.insert_values("VTABLE", rows)


def _run(spark, sql, expected, ordered=False):
    got = [tuple(r) for r in spark.sql(sql).collect()]

    def norm(rows):
        return [
            tuple(round(v, 4) if isinstance(v, float) else v for v in r) for r in rows
        ]

    if ordered:
        assert norm(got) == norm(expected), f"{sql}\ngot {got}"
    else:
        assert sorted(map(str, norm(got))) == sorted(map(str, norm(expected))), (
            f"{sql}\ngot {got}"
        )


@pytest.mark.parametrize("name", list(CASES))
def test_nist_dml(spark, nist, name):
    case = CASES[name]
    sql, expected, ordered = (*case, None)[:3]
    _run(spark, sql, expected, ordered is ORDERED)


def test_nist_correlation_depth_documented(spark, nist):
    """The literal NIST double-NOT-EXISTS division correlates STAFF.EMPNUM
    two subquery levels deep.  Catalyst resolves outer references only one
    level up (the reference engine also fails it — NistTests.cs marks it
    /* BUG */ and suppresses the asserts).  Pin the behavior so a future
    Spark version lifting the limit is noticed."""
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises(AnalysisException):
        spark.sql(
            """SELECT STAFF.EMPNAME FROM STAFF WHERE NOT EXISTS
                 (SELECT * FROM PROJ WHERE NOT EXISTS
                   (SELECT * FROM WORKS
                    WHERE STAFF.EMPNUM = WORKS.EMPNUM AND WORKS.PNUM = PROJ.PNUM))"""
        ).collect()


@pytest.mark.parametrize("name", list(VTABLE_CASES))
def test_nist_vtable_extended(spark, nist, name):
    _create_vtable(nist, VTABLE_EXTRA)
    case = VTABLE_CASES[name]
    sql, expected, ordered = (*case, None)[:3]
    _run(spark, sql, expected, ordered is ORDERED)


@pytest.mark.parametrize("name", list(VTABLE_BASE_CASES))
def test_nist_vtable_base(spark, nist, name):
    _create_vtable(nist)
    case = VTABLE_BASE_CASES[name]
    sql, expected, ordered = (*case, None)[:3]
    _run(spark, sql, expected, ordered is ORDERED)
