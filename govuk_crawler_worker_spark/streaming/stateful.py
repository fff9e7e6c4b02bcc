"""Custom stateful streaming operator: per-host politeness auditing.

The reference worker has no event-time stream (its queue IS the stream), but
a production crawl fleet emits a fetch-event firehose, and the politeness
contract ("≥ crawl-delay between any two requests to one host,
cluster-wide") is exactly a per-key stateful streaming invariant.  This
module checks it with ``applyInPandasWithState``:

* key   = host
* state = wall-clock of the host's last observed fetch (carried ACROSS
  micro-batches — the whole point of the stateful operator)
* output = violation rows (fetch gaps shorter than the host's crawl delay)

Plan shape: groupBy(host) → applyInPandasWithState, i.e. the state shuffle
is keyed by host; a hot host's state is one scalar, so skew is bounded by
event volume, not state size.  Watermark/late events: the auditor orders
within a batch by event time; duplicate-delivery is tolerated (gap 0 counts
once per event, and re-emitted violations are idempotent on (host, ts)).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

VIOLATION_SCHEMA = "host string, ts timestamp, gap_s double"
STATE_SCHEMA = "last_ts double"


def host_rate_violations(
    events: DataFrame,
    delay_by_host: dict[str, float],
    default_delay_s: float = 0.0,
) -> DataFrame:
    """Streaming DataFrame of fetch events (host string, ts timestamp) →
    streaming DataFrame of politeness violations.

    Works on a streaming OR batch input: on a stream the state persists in
    the state store across micro-batches (tested); on a batch frame Spark
    runs it as one pass per key.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    delays = dict(delay_by_host)

    def audit(key, pdfs, state):
        host = key[0]
        delay = delays.get(host, default_delay_s)
        last = state.get[0] if state.exists else None
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for r in pdf.itertuples(index=False):
                t = r.ts.timestamp()
                if last is not None and delay > 0 and (t - last) < delay:
                    out.append(
                        {"host": host, "ts": r.ts, "gap_s": round(t - last, 6)}
                    )
                last = t
        if last is not None:
            state.update((float(last),))
        yield pd.DataFrame(out, columns=["host", "ts", "gap_s"])

    return events.groupBy("host").applyInPandasWithState(
        audit,
        outputStructType=VIOLATION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
