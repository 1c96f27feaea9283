"""Cluster deployment profile (session.tune_cluster): runtime confs
actually land on the session, launch-only confs are returned (never
silently dropped), tune()'s own contracts are preserved, and the
profile is idempotent. The sandbox cannot verify a real cluster —
these tests pin the conf CONTRACT; SCALE.md §deploy maps each
locally-verified plan shape to its cluster analogue."""

from snapflow_spark.session import CLUSTER_LAUNCH_CONFS, tune_cluster


def test_runtime_confs_applied(spark):
    out = tune_cluster(spark)
    for k, v in out["applied"].items():
        assert spark.conf.get(k) == v, k
    # tune()'s base contracts still hold
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    assert "InferFiltersFromGenerate" in spark.conf.get(
        "spark.sql.optimizer.excludedRules"
    )
    # restore the test-session shuffle width for later suites
    spark.conf.set("spark.sql.shuffle.partitions", "32")


def test_launch_confs_are_returned_not_set(spark):
    out = tune_cluster(spark, shuffle_partitions=None)
    assert out["launch_required"] == CLUSTER_LAUNCH_CONFS
    # none of them is a runtime-settable SQL conf we could have applied
    assert not set(out["launch_required"]) & set(out["applied"])
    # the non-negotiables for a 100 TB object-store deployment
    lr = out["launch_required"]
    assert lr["spark.hadoop.fs.s3a.committer.name"] == "magic"
    assert lr["spark.dynamicAllocation.enabled"] == "true"
    assert lr["spark.shuffle.service.enabled"] == "true"
    spark.conf.set("spark.sql.shuffle.partitions", "32")


def test_profile_knobs_and_idempotence(spark):
    out1 = tune_cluster(
        spark, target_partition_mb=64, scan_partition_mb=512,
        broadcast_mb=32, shuffle_partitions=4096,
    )
    assert out1["applied"][
        "spark.sql.adaptive.advisoryPartitionSizeInBytes"] == "64m"
    assert out1["applied"]["spark.sql.files.maxPartitionBytes"] == "512m"
    assert out1["applied"]["spark.sql.autoBroadcastJoinThreshold"] == "32m"
    assert spark.conf.get("spark.sql.shuffle.partitions") == "4096"
    out2 = tune_cluster(
        spark, target_partition_mb=64, scan_partition_mb=512,
        broadcast_mb=32, shuffle_partitions=4096,
    )
    assert out1 == out2
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.files.maxPartitionBytes")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
