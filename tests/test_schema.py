"""SchemaSpec tests — commonmodel parity (SURVEY §1.1/§1.2): declared
fields, unique_on keep-latest conformance, implementations mapping."""

import pyspark.sql.functions as F

from snapflow_spark.schema import Relation, SchemaSpec

CUSTOMER = SchemaSpec(
    name="Customer",
    fields={"cust_id": "bigint", "email": "string", "updated_at": "timestamp"},
    unique_on=["cust_id"],
    latest_by="updated_at",
    implementations={
        "CrmContact": {
            "cust_id": "contact_id",
            "email": "lower(raw_email)",
            "updated_at": "modified",
        }
    },
)


def test_conform_casts_and_keeps_latest(spark):
    raw = spark.createDataFrame(
        [
            ("1", "a@x.com", "2024-01-01 00:00:00"),
            ("1", "b@x.com", "2024-02-01 00:00:00"),  # later -> wins
            ("2", "c@x.com", "2024-01-15 00:00:00"),
        ],
        "cust_id string, email string, updated_at string",
    )
    out = CUSTOMER.conform(raw)
    assert dict(out.dtypes) == {
        "cust_id": "bigint", "email": "string", "updated_at": "timestamp"
    }
    rows = {r.cust_id: r.email for r in out.collect()}
    assert rows == {1: "b@x.com", 2: "c@x.com"}


def test_conform_via_implementation_mapping(spark):
    crm = spark.createDataFrame(
        [(7, "UPPER@X.COM", "2024-03-01 00:00:00")],
        "contact_id long, raw_email string, modified string",
    )
    out = CUSTOMER.conform(crm, from_schema="CrmContact")
    r = out.first()
    assert (r.cust_id, r.email) == (7, "upper@x.com")
    assert dict(out.dtypes)["updated_at"] == "timestamp"


def test_validate_reports_structural_problems(spark):
    bad = spark.createDataFrame([(1, 2)], "cust_id long, email int")
    problems = CUSTOMER.validate(bad)
    assert "column email: expected string, got int" in problems
    assert "missing column updated_at" in problems
    good = spark.createDataFrame(
        [], CUSTOMER.struct_type
    )
    assert CUSTOMER.validate(good) == []


ORDER_SPEC = SchemaSpec(
    name="Order",
    fields={"order_id": "bigint", "cust_id": "bigint", "total": "double"},
    relations={
        "customer": Relation(schema="Customer", on={"cust_id": "cust_id"}),
        "items": Relation(
            schema="OrderItem",
            on={"order_id": "order_id"},
            cardinality="one_to_many",
        ),
    },
)


def test_relation_join_compiles_declared_fk(spark):
    """A declared many_to_one relation compiles to a broadcast
    dimension join with prefixed target columns; left rows without a
    match survive (how='left')."""
    orders = spark.createDataFrame(
        [(1, 7, 10.0), (2, 8, 20.0), (3, 99, 30.0)],
        "order_id long, cust_id long, total double",
    )
    customers = spark.createDataFrame(
        [(7, "alice"), (8, "bob")], "cust_id long, name string"
    )
    out = ORDER_SPEC.join_relation(orders, "customer", customers)
    rows = {r.order_id: r.customer_name for r in out.collect()}
    assert rows == {1: "alice", 2: "bob", 3: None}
    # many_to_one default -> broadcast hash join in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

    items = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "order_id long, sku string"
    )
    fan = ORDER_SPEC.join_relation(orders, "items", items, how="inner")
    assert fan.count() == 3
    assert set(fan.columns) == {"order_id", "cust_id", "total", "items_order_id", "items_sku"}
