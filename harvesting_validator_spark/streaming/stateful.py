"""Custom stateful streaming operator: cross-batch first-seen dedup via
``applyInPandasWithState`` (task brief: "applyInPandasWithState for custom
stateful operators").

The batch engine dedupes with a hash-groupBy (`dedup_exact`) or the
processed-docs ledger (incremental.py, storage-level anti-join). On an
unbounded stream neither works per-microbatch — a duplicate arriving three
batches later would be re-emitted. This operator keeps the seen-set in
Spark's versioned state store instead, keyed by content hash:

* first occurrence of a content hash -> emit one (content_hash, keep_doc)
  row (the keeper: lexicographically-min doc_id in the first batch);
* later occurrences (same batch, later batch, or after a stream RESTART —
  state recovers from the checkpoint) -> emit nothing, bump a counter;
* optional processing-time TTL bounds state size for web-scale streams
  (an expired hash is forgotten and would re-emit — the standard
  time-windowed dedup trade-off; without TTL state grows with the number
  of distinct documents ever seen, which at 10^12 docs must be bounded).

Scale notes: state is partitioned by the groupBy key (content hash —
uniform by construction, no skew), lives in the executor state store
(RocksDB-backed on a real cluster via
spark.sql.streaming.stateStore.providerClass), and the pandas function
sees Arrow batches per key group — no per-row Python.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame

OUTPUT_SCHEMA = "content_hash string, keep_doc string"
STATE_SCHEMA = "n_seen long"


def _make_dedup_fn(ttl_ms: int | None):
    def fn(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:
            # TTL expiry: forget the hash (it may re-emit if seen again)
            state.remove()
            return
        n_new = 0
        keep = None
        for pdf in pdfs:
            n_new += len(pdf)
            m = pdf["doc_id"].min()
            keep = m if keep is None else min(keep, m)
        first_time = not state.exists
        n_prev = 0 if first_time else state.get[0]
        state.update((n_prev + n_new,))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        if first_time and n_new > 0:
            yield pd.DataFrame({"content_hash": [key[0]], "keep_doc": [keep]})

    return fn


def stream_dedup_first_seen(
    docs: "DataFrame", ttl_minutes: int | None = None
) -> "DataFrame":
    """docs: a STREAMING DataFrame with (content_hash, doc_id) columns.
    Returns the append-mode stream of first-seen keeper rows."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    ttl_ms = int(ttl_minutes) * 60_000 if ttl_minutes else None
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms
        else GroupStateTimeout.NoTimeout
    )
    return docs.groupBy("content_hash").applyInPandasWithState(
        _make_dedup_fn(ttl_ms), OUTPUT_SCHEMA, STATE_SCHEMA, "append", timeout
    )


def docs_with_content_hash(sources: "DataFrame") -> "DataFrame":
    """(repo, path, commit, lang, content) stream -> (content_hash, doc_id)
    using the same deterministic ids as the batch pipeline."""
    from pyspark.sql import functions as F

    return sources.select(
        F.sha2(F.col("content"), 256).alias("content_hash"),
        F.sha2(F.concat_ws("\x1f", "repo", "path", "commit"), 256).alias(
            "doc_id"
        ),
    )
