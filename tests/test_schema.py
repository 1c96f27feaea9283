"""SchemaSpec tests — commonmodel parity (SURVEY §1.1/§1.2): declared
fields, unique_on keep-latest conformance, implementations mapping."""

import pyspark.sql.functions as F

from snapflow_spark.schema import SchemaSpec

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
