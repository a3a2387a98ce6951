"""Shared contract for the stream_user_top_purchases stateful operator:
one emission algorithm, two Spark stateful APIs.

``transformWithStateInPandas`` (Spark 4's arbitrary-stateful-processing
successor to ``applyInPandasWithState``) expresses the state as TYPED
handles — a ValueState counter and a ListState of top values. Its Python
driver worker needs protobuf (absent from this container and not
installable here), so ``tws_available()`` gates the path on a real
import check; the processor's own logic is pure Python and unit-tested
against the contract with a fake handle (tests/test_streaming.py).

``update_top_purchases`` is the ``applyInPandasWithState`` twin with the
identical per-batch emission: the top-k list tuple-encoded into the flat
GroupState schema. Both paths must emit the same rows for the same
micro-batch sequence — that equivalence is what the unit test pins, and
the registered query's DuckDB oracle value-checks whichever path ran.
"""

from __future__ import annotations

from typing import Iterator

TOP_K = 3
TOP_PURCHASES_SCHEMA = (
    "user_id long, n_purchases long, top1 double, top2 double, top3 double"
)


def tws_available() -> bool:
    """transformWithStateInPandas needs the protobuf runtime for its
    Python driver worker; absent protobuf, callers fall back to the
    applyInPandasWithState twin."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _merge_top(n: int, vals: list[float], pdfs) -> tuple[int, list[float]]:
    """The shared per-batch state transition: fold the batch's purchase
    values into (count, running top-TOP_K desc)."""
    for pdf in pdfs:
        n += len(pdf)
        vals.extend(float(v) for v in pdf["value"])
    return n, sorted(vals, reverse=True)[:TOP_K]


def _emission(user_id, n: int, vals: list[float]):
    import pandas as pd

    pad: list[float | None] = list(vals) + [None] * (TOP_K - len(vals))
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "n_purchases": [n],
            "top1": [pad[0]],
            "top2": [pad[1]],
            "top3": [pad[2]],
        }
    )


def update_top_purchases(key, pdfs: Iterator, state):
    """applyInPandasWithState form: state is the flat tuple
    (n, v1, v2, v3) with None padding."""
    if state.exists:
        n, *vs = state.get
        vals = [v for v in vs if v is not None]
    else:
        n, vals = 0, []
    n, vals = _merge_top(n, vals, pdfs)
    pad = list(vals) + [None] * (TOP_K - len(vals))
    state.update((n, pad[0], pad[1], pad[2]))
    yield _emission(key[0], n, vals)


def top_purchases_processor():
    """transformWithStateInPandas form: typed ValueState + ListState.
    Constructed lazily so importing this module never requires the
    stateful-processor machinery."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TopPurchases(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._count = handle.getValueState("n_purchases", "n long")
            self._top = handle.getListState("top_values", "v double")

        def handleInputRows(self, key, rows, timerValues):
            n = self._count.get()[0] if self._count.exists() else 0
            vals = [r[0] for r in self._top.get()]
            n, vals = _merge_top(n, vals, rows)
            self._count.update((n,))
            self._top.clear()
            self._top.put([(v,) for v in vals])
            yield _emission(key[0], n, vals)

        def close(self) -> None:
            pass

    return TopPurchases()
