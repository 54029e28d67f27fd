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
    """Streaming kernel output -> per-domain running totals (stateful)."""
    from ..engine.metrics import DOMAIN_RE

    with_domain = scrubbed_stream.withColumn(
        "domain", F.regexp_extract("url", DOMAIN_RE, 1)
    )
    return (
        with_domain.groupBy("domain")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
