"""Custom stateful streaming operator: per-key sketch state.

``applyInPandasWithState`` variant of the sketch maintainer — state is
the serialized sketch itself, living in the stream's state store
(checkpointed, recoverable). Each micro-batch updates the key's digest
with the batch's values and emits the refreshed estimate row, i.e. a
continuously-updating quantile view per conversation — the streaming
generalization of the reference's poll-refresh /data/ endpoint
(main.rs:736-777) where every poll re-answers over what has arrived.

vs streaming/stream_agg.py (foreachBatch → checkpoint store): use THIS
when estimates must flow downstream as a stream; use foreachBatch when
external jobs must read the sketch blobs at rest.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any, Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType([StructField("blob", BinaryType(), True)])

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("n", LongType(), False),
        StructField("p50", DoubleType(), True),
        StructField("p95", DoubleType(), True),
    ]
)


def _make_update_fn(factory: Callable, value_col: str):
    deser = None

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        nonlocal deser
        sk = factory()
        if deser is None:
            deser = type(sk).deserialize
        if state.exists:
            (blob,) = state.get
            sk = deser(bytes(blob))
        for pdf in pdfs:
            sk.update(pdf[value_col])
        state.update((bytearray(sk.serialize()),))
        est = sk.quantile([0.5, 0.95])
        n = sk.count  # protocol-uniform across TDigest/KLL/DDSketch
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n": [int(n)],
                "p50": [float(est[0])],
                "p95": [float(est[1])],
            }
        )

    return update


def stateful_sketch_stream(
    stream_df: DataFrame,
    key_col: str,
    value_col: str,
    factory: Callable,
):
    """stream → per-key updating quantile estimates (update mode).

    Returns the transformed streaming DataFrame; caller starts the sink.
    """
    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            _make_update_fn(factory, value_col),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
