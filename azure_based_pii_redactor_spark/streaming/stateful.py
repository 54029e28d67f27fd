"""Custom stateful streaming operator: per-domain running totals via
``applyInPandasWithState`` (the north-star 'custom stateful operators'
surface; no reference equivalent -- its state is per-session UI state).

State per domain: (n_docs, n_kept, n_entities) accumulated across
micro-batches; each batch emits the updated totals for domains seen in
that batch (update semantics)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "domain string, n_docs long, n_kept long, n_entities long"
)
STATE_SCHEMA = "n_docs long, n_kept long, n_entities long"


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def use_rocksdb_state_store(
    spark, changelog_checkpointing: bool = True
) -> dict:
    """Point NEW streaming queries of this session at the RocksDB state
    store provider (ships with Spark 4; JNI lib bundled).  The default
    HDFS-backed provider keeps every key of every stateful operator in
    executor heap -- at 10^12-doc scale the watermark-window state of
    dedup / interval-join / running-totals wants RocksDB's off-heap,
    spill-to-disk store with changelog checkpointing (only the delta
    ships to the checkpoint per epoch, not a full snapshot).

    Returns the previous values of every conf it touched so callers can
    restore them (``None`` for confs that were unset)."""
    conf = {
        "spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER,
        "spark.sql.streaming.stateStore.rocksdb."
        "changelogCheckpointing.enabled":
            str(bool(changelog_checkpointing)).lower(),
    }
    prev: dict = {}
    for k, v in conf.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    return prev


def restore_state_store_conf(spark, prev: dict) -> None:
    """Undo ``use_rocksdb_state_store`` (test/tooling helper)."""
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _update(key, pdfs, state: GroupState):
    n_docs = n_kept = n_entities = 0
    if state.exists:
        n_docs, n_kept, n_entities = state.get
    for pdf in pdfs:
        n_docs += len(pdf)
        n_kept += int(pdf["keep"].sum())
        n_entities += int(pdf["n_entities"].sum())
    state.update((n_docs, n_kept, n_entities))
    yield pd.DataFrame(
        {
            "domain": [key[0]],
            "n_docs": [n_docs],
            "n_kept": [n_kept],
            "n_entities": [n_entities],
        }
    )


def running_domain_counts(scrubbed_stream: DataFrame) -> DataFrame:
    """Streaming kernel output -> per-domain running totals (stateful).
    Domain extraction is ``engine.metrics.with_domain`` -- the SAME
    expression the batch metrics (and the tests' ground truth) use, so
    the two surfaces cannot diverge."""
    from ..engine.metrics import with_domain

    return (
        with_domain(scrubbed_stream).groupBy("domain")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
