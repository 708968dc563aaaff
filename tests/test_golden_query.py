"""The reference's golden end-to-end query test, re-expressed.

Mirrors ``tests/integration/golden_query_test.go:16-240``: create a 6-col
sales table, insert 9 deterministic rows, run
``GROUP BY category: COUNT(*), SUM(price*quantity), AVG(price)`` and check
hand-computed values; then verify snapshot isolation across an extra
insert.
"""

import pytest

from mini_lakehouse_control_plane_executor_spark.plans.query import Aggregate, SimpleQuery
from mini_lakehouse_control_plane_executor_spark.table.schema import Field

SCHEMA = [
    Field("id", "int64"),
    Field("category", "string"),
    Field("product", "string"),
    Field("price", "float64"),
    Field("quantity", "int64"),
    Field("date", "string"),
]

ROWS = [
    (1, "Electronics", "Laptop", 1000.00, 2, "2024-01-01"),
    (2, "Electronics", "Mouse", 25.00, 5, "2024-01-01"),
    (3, "Electronics", "Keyboard", 75.00, 3, "2024-01-02"),
    (4, "Electronics", "Monitor", 300.00, 1, "2024-01-02"),
    (5, "Furniture", "Chair", 150.00, 4, "2024-01-03"),
    (6, "Furniture", "Desk", 400.00, 2, "2024-01-03"),
    (7, "Furniture", "Lamp", 50.00, 6, "2024-01-04"),
    (8, "Books", "Novel", 15.00, 10, "2024-01-05"),
    (9, "Books", "Textbook", 80.00, 3, "2024-01-05"),
]

EXPECTED = {  # category -> (count, revenue, avg_price)
    "Books": (2, 390.0, 47.5),
    "Electronics": (4, 2650.0, 350.0),
    "Furniture": (3, 1700.0, 200.0),
}


@pytest.fixture()
def sales(lake, spark):
    lake.create_table("sales", SCHEMA)
    df = spark.createDataFrame(ROWS, "id long, category string, product string, price double, quantity long, date string")
    lake.insert("sales", df)
    return lake


def test_golden_sql(sales):
    rows = sales.sql(
        """
        SELECT category,
               COUNT(*) AS item_count,
               SUM(price * quantity) AS total_revenue,
               AVG(price) AS avg_price
        FROM sales GROUP BY category ORDER BY category
        """
    ).collect()
    assert len(rows) == 3
    for r in rows:
        count, revenue, avg = EXPECTED[r["category"]]
        assert r["item_count"] == count
        assert abs(r["total_revenue"] - revenue) < 0.01
        assert abs(r["avg_price"] - avg) < 0.01


def test_golden_structured_query(sales):
    # Same query via the SimpleQuery surface (count + avg are expressible;
    # sum-over-expression needs SQL, as in the reference's aspirational SQL).
    rows = sales.query(
        SimpleQuery(
            table_name="sales",
            group_by=["category"],
            aggregates=[
                Aggregate("count", "*", "item_count"),
                Aggregate("avg", "price", "avg_price"),
                Aggregate("min", "price"),
                Aggregate("max", "price"),
            ],
        )
    ).collect()
    assert [r["category"] for r in rows] == ["Books", "Electronics", "Furniture"]
    for r in rows:
        count, _, avg = EXPECTED[r["category"]]
        assert r["item_count"] == count
        assert abs(r["avg_price"] - avg) < 0.01
    # default alias rule <fn>_<col>
    assert "min_price" in rows[0].asDict() and "max_price" in rows[0].asDict()


def test_structured_query_filter_and_projection(sales):
    rows = sales.query(
        SimpleQuery(
            table_name="sales",
            filter="price > 100",
            projection=["product", "price"],
            order_by=["price"],
        )
    ).collect()
    assert [r["product"] for r in rows] == ["Chair", "Monitor", "Desk", "Laptop"]
    assert rows[0].asDict().keys() == {"product", "price"}


def test_snapshot_isolation_across_insert(sales, spark):
    t = sales.table("sales")
    v_before = t.log.latest_version()
    q = SimpleQuery(
        table_name="sales",
        aggregates=[Aggregate("count", "*", "n")],
        version=v_before,
    )
    assert sales.query(q).collect()[0]["n"] == 9

    extra = spark.createDataFrame(
        [(10, "Books", "Atlas", 60.0, 1, "2024-01-06")],
        "id long, category string, product string, price double, quantity long, date string",
    )
    sales.insert("sales", extra)

    # Pinned version still sees 9; latest sees 10.
    assert sales.query(q).collect()[0]["n"] == 9
    q_latest = SimpleQuery(table_name="sales", aggregates=[Aggregate("count", "*", "n")])
    assert sales.query(q_latest).collect()[0]["n"] == 10
