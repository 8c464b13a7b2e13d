"""get_spark must be cluster-deployable: it only sets local[n] when no
master was configured externally (spark-submit --master, $MASTER, or an
already-active session)."""

from __future__ import annotations

from ml_data_wrangler_spark.session import _master_externally_configured, get_spark


def test_master_detection_env(monkeypatch, spark):
    # `spark` fixture is active → always externally configured here
    assert _master_externally_configured()

    # env-var signals are honored even without an active session
    monkeypatch.setenv("PYSPARK_SUBMIT_ARGS", "--master yarn pyspark-shell")
    assert _master_externally_configured()
    monkeypatch.delenv("PYSPARK_SUBMIT_ARGS")
    monkeypatch.setenv("MASTER", "spark://host:7077")
    assert _master_externally_configured()
    monkeypatch.delenv("MASTER")
    monkeypatch.setenv("SPARK_MASTER", "k8s://https://host")
    assert _master_externally_configured()


def test_get_spark_reuses_active_session(spark):
    # with an active session, get_spark must not fight over master
    s2 = get_spark(app_name="reuse-check")
    assert s2 is spark or s2.sparkContext is spark.sparkContext
