"""Streaming Markov-transition extraction — the stateful twin of
``plans/functions_sweep.event_type_transitions`` (lead over
(ts, event_id) per user).

Event-time correctness rule: the pair (e_i, e_i+1) is FINAL once the
LATER event's timestamp is STRICTLY below the watermark — any event that
could still insert between them would carry ts <= e_i+1.ts < watermark,
and Spark drops rows with eventTime < watermark before they reach the
state store (equal-to-watermark rows are still admitted, hence strict). So
the operator buffers, per user, the last MATURE event (the pairing
anchor) plus the not-yet-watermarked tail, and emits a pair exactly when
its later event matures. PER-USER state is bounded by the watermark
horizon × the user's event rate plus one anchor row — the same budget a
stream-stream interval join holds. TOTAL state is not: a bare anchor
waits indefinitely for the user's next event, so without a TTL the store
grows with ever-seen-user cardinality (every user retains one anchor row
forever). Pass ``anchor_ttl_s`` to bound the total: idle anchors are
dropped once the watermark passes anchor_ts + TTL, trading away the
transition pair of any user who returns after a gap longer than the TTL.

At 100 TB the state store shards by user across executors; a skewed user
bounds its state by the watermark window, never by history length.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PAIR_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("prev_type", StringType()),
        StructField("next_type", StringType()),
        StructField("prev_us", LongType()),
        StructField("next_us", LongType()),
    ]
)

# buffered events: parallel arrays sorted by (us, event_id) — the last
# mature event (anchor) plus the young tail
_STATE_SCHEMA = StructType(
    [
        StructField("us", ArrayType(LongType())),
        StructField("ids", ArrayType(LongType())),
        StructField("types", ArrayType(StringType())),
    ]
)


def transitions_with_state(
    events: DataFrame,
    watermark: str = "1 hour",
    anchor_ttl_s: int | None = None,
) -> DataFrame:
    """Per-user consecutive (prev_type, next_type) pairs, emitted as each
    pair becomes final under the watermark. Aggregating the emitted pairs
    reproduces the batch transition matrix restricted to matured events.

    ``anchor_ttl_s``: optional idle TTL (seconds). When set, the rule is
    PAIR-LEVEL and deterministic: a pair spanning a gap longer than the
    TTL is never emitted, REGARDLESS of how arrivals pack into
    micro-batches (an event-level drop would depend on whether the
    user's return landed in the same batch as the watermark advance —
    replay with different batch boundaries would emit different pairs).
    Idle anchors are additionally freed once the watermark passes
    anchor_ts + TTL (they can no longer produce an admissible pair: any
    future event carries ts >= watermark > anchor + TTL), bounding TOTAL
    state by active users instead of ever-seen users. ``None`` (default)
    keeps the lossless behavior: anchors persist until the user's next
    event."""
    import pandas as pd  # noqa: F401 — executor-side dependency

    ttl_us = anchor_ttl_s * 1_000_000 if anchor_ttl_s is not None else None

    def fn(
        key: Any, pdfs: Iterator["pd.DataFrame"], state: Any
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        (user_id,) = key
        buf: list[tuple[int, int, str]] = []
        if state.exists:
            us, ids, types = state.get
            buf = list(zip(us, ids, types))
        if not state.hasTimedOut:
            for pdf in pdfs:
                for ts, eid, et in zip(
                    pdf["ts"], pdf["event_id"], pdf["event_type"]
                ):
                    buf.append((ts.value // 1000, int(eid), et))
        buf.sort()
        wm_us = state.getCurrentWatermarkMs() * 1000
        pairs: list[tuple] = []
        j = 0  # index of the last event whose pair-behind is emitted
        # STRICT <, mirroring Spark's late-row rule (rows with
        # eventTime == watermark are still ADMITTED): a pair whose later
        # event equals the watermark is not final — an equal-timestamp,
        # smaller-event-id row can still arrive and sort between them
        while j + 1 < len(buf) and buf[j + 1][0] < wm_us:
            a, b = buf[j], buf[j + 1]
            if ttl_us is None or b[0] - a[0] <= ttl_us:
                pairs.append((user_id, a[2], b[2], a[0], b[0]))
            j += 1
        buf = buf[j:]
        if ttl_us is not None and len(buf) == 1 and wm_us > buf[0][0] + ttl_us:
            # idle anchor STRICTLY past its TTL: pure state GC — any
            # future event carries ts >= watermark > anchor + TTL, so
            # its gap exceeds the TTL and the pair-level rule above
            # would drop the pair anyway; freeing the anchor changes no
            # output, only bounds total state (strict >, because an
            # event at exactly anchor + TTL is admissible at
            # wm == anchor + TTL and its pair DOES emit)
            buf = []
        if buf:
            state.update((
                [e[0] for e in buf],
                [e[1] for e in buf],
                [e[2] for e in buf],
            ))
            if len(buf) > 1:
                # young tail pending: fire once the watermark can pass
                # its newest event (timeout must sit above the current
                # watermark per the GroupState contract)
                state.setTimeoutTimestamp(
                    max(buf[-1][0] // 1000 + 1, state.getCurrentWatermarkMs() + 1)
                )
            elif ttl_us is not None:
                # bare anchor under a TTL: fire once the watermark can
                # expire it, so the drop happens without a new event
                state.setTimeoutTimestamp(
                    max(
                        (buf[0][0] + ttl_us) // 1000 + 1,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
            # a bare anchor with no TTL sets NO timeout: it waits (O(1)
            # per-user state) to pair with the user's next event, like
            # join state — total state then grows with ever-seen users
        elif state.exists:
            state.remove()
        if pairs:
            yield pd.DataFrame(
                pairs,
                columns=["user_id", "prev_type", "next_type", "prev_us", "next_us"],
            )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            PAIR_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
