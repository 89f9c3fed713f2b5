"""Custom stateful streaming operators via applyInPandasWithState.

The escape hatch for stateful semantics the built-in windowed aggs
can't express (SURVEY.md §7 / build-brief 'custom stateful operators').
State lives in Spark's state store (checkpointed, partitioned by key,
scale-out); the Python side sees Arrow batches per key + a typed state
handle — no driver involvement per batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_stats(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Running (count, sum, max) per key across micro-batches.

    Output one row per key per batch with the accumulated totals —
    the kind of lifetime-aggregate a watermarked window can't express
    (state never expires here; production would use a TTL timeout).
    """

    # thread key_col + its real type through the output schema — the
    # old hardcoded "user_id long" silently mislabeled any other key
    # column and crashed Arrow conversion for non-long keys (the v2
    # twin running_user_stats_tws already did this correctly).
    key_type = events.schema[key_col].dataType.simpleString()

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        if state.exists:
            cnt, total, mx = state.get
        else:
            cnt, total, mx = 0, 0.0, float("-inf")
        for pdf in pdfs:
            cnt += len(pdf)
            total += float(pdf[value_col].sum())
            if len(pdf):
                mx = max(mx, float(pdf[value_col].max()))
        state.update((cnt, total, mx))
        yield pd.DataFrame(
            {
                key_col: [key_val],
                "n_events": [cnt],
                "total_value": [total],
                "max_value": [mx],
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"{key_col} {key_type}, n_events long, "
            "total_value double, max_value double"
        ),
        stateStructType="cnt long, total double, mx double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_heavy_hitters(
    events: DataFrame,
    *,
    value_col: str = "event_type",
    k: int = 64,
    num_shards: int = 8,
) -> DataFrame:
    """Continuous Misra-Gries heavy hitters over an unbounded stream.

    Values are hash-sharded (``xxhash64 % num_shards``) so state
    parallelizes; a value always routes to the same shard, so each
    shard's Misra-Gries dict (operators/sketch semantics, ≤ ``k``
    counters in the state store regardless of stream cardinality) is
    a faithful MG summary of that value's ENTIRE substream. Any value
    with substream frequency > N_shard/(k+1) is guaranteed present in
    its shard's emitted candidates — the batch-side guarantee, carried
    over micro-batches by the state store (checkpointed; survives
    restart).

    Emits (shard, value, mg_weight lower bound) per shard per batch in
    update mode; a downstream consumer takes top-m across shards or
    recounts exactly. Contrast with the built-in windowed count: this
    never stores one state row per distinct value.
    """
    from ..operators.sketch import _mg_reduce

    keyed = events.select(
        # pmod, not abs(...)%: abs(Long.MIN_VALUE) aborts under ANSI
        # and % keeps the sign (negative shard) — the repo convention
        # (operators/relational.py) has neither failure mode
        F.pmod(F.xxhash64(F.col(value_col)), F.lit(num_shards)).alias(
            "shard"
        ),
        F.col(value_col).cast("string").alias("value"),
    )

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (shard,) = key
        if state.exists:
            values, weights = state.get
            counters = dict(zip(values, weights))
        else:
            counters = {}
        for pdf in pdfs:
            for value, cnt in pdf["value"].value_counts().items():
                counters[value] = counters.get(value, 0) + int(cnt)
            counters = _mg_reduce(counters, k)
        state.update((list(counters.keys()), [int(v) for v in counters.values()]))
        yield pd.DataFrame(
            {
                "shard": [shard] * len(counters),
                "value": list(counters.keys()),
                "mg_weight": [int(v) for v in counters.values()],
            }
        )

    return keyed.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType="shard long, value string, mg_weight long",
        stateStructType="values array<string>, weights array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _simhash_py(text: str) -> int:
    """Python twin of operators/dedup.simhash's per-doc fingerprint:
    same tokens, same 60-bit md5-prefix token hash, same
    count-weighted bit votes, same signed-64-bit assembly —
    differential-tested (fixed + randomized) against the batch
    operator in tests/test_streaming_near_dup.py.

    Tokenizer parity is exact, not approximate: Spark's ``trim``
    strips ASCII spaces only, its ``\\s`` is the Java ASCII class
    (U+00A0 etc. are NOT separators), and ``split`` with limit -1
    KEEPS empty tokens from edge whitespace — all mirrored here.
    (Caveat: ``str.lower`` vs UTF8String.toLowerCase can differ on
    locale-special casing like U+0130; identical on ASCII and common
    Unicode.)"""
    import hashlib
    import re
    from collections import Counter

    counts = Counter(re.split(r"[ \t\n\x0b\f\r]+", text.lower().strip(" ")))
    votes = [0] * 64
    for tok, cnt in counts.items():
        h = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:15], 16)
        for j in range(64):
            votes[j] += cnt if (h >> j) & 1 else -cnt
    fp = 0
    for j in range(64):
        if votes[j] > 0:
            fp |= 1 << j
    # two's-complement into signed 64-bit (bit 63 = long MIN_VALUE)
    return fp - (1 << 64) if fp >= (1 << 63) else fp


def stream_near_dup_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
    max_state_per_band: int = 10_000,
) -> DataFrame:
    """Streaming SimHash near-dup detection: emits a verified
    (doc_id, matched_doc_id, hamming, band) event whenever an arriving
    doc is within ``max_hamming`` of any previously-seen doc sharing a
    fingerprint band.

    The batch pipeline's shape, streamed: (1) a STATELESS Arrow stage
    fingerprints each doc (no streaming agg, so no watermark coupling),
    (2) each doc explodes into its ``bands`` 16-bit band keys, (3) a
    stateful per-(band, key) verify — state holds the (id, fingerprint)
    pairs seen under that band key, new arrivals are checked by exact
    hamming against ONLY those (the pigeonhole guarantee: a pair within
    hamming ≤ bands-1 shares ≥ 1 exact band). State per group is tiny
    (band keys are selective); ``max_state_per_band`` hard-caps
    pathological hot keys FIFO, trading recall for boundedness — the
    same contract as the streaming heavy-hitters sketch.

    A pair that agrees on b bands is emitted b times (once per band);
    consumers dedupe on (doc_id, matched_doc_id) — kept that way so the
    operator stays single-stage (chaining a second stateful agg would
    couple watermarks).

    Raises ValueError when ``max_hamming > bands - 1``: past that the
    pigeonhole guarantee behind the banded state lookup no longer
    holds and pairs would be silently missed.
    """
    if max_hamming > bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} breaks the pigeonhole full-recall "
            f"guarantee for bands={bands}: require max_hamming <= bands-1"
        )
    fp_schema = f"{id_col} long, simhash long"

    def fingerprint(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # r14: vectorized twin of _simhash_py — the r13 per-row map
        # ran an interpreted 64-iteration bit loop PER TOKEN and
        # re-hashed every repeated token, and was the pipeline's
        # input-side bind (the verify stage went SWAR in r13; this
        # stage stayed scalar). Same integer arithmetic exactly:
        # identical tokenizer, md5 15-hex-digit 60-bit hash, int64
        # count-weighted ±1 votes, votes>0 bit assembly — the bit
        # matrix is just the j-loop transposed onto numpy, and the
        # per-TASK hash cache (guide §4.5) only memoizes a pure
        # function. Differential-tested against _simhash_py.
        import hashlib
        import re as _re
        from collections import Counter

        import numpy as np

        shifts = np.arange(64, dtype=np.uint64)
        ws = _re.compile(r"[ \t\n\x0b\f\r]+")
        # r15 (ADVICE r14): the memo is capped — a high-vocabulary
        # partition could otherwise grow executor memory without
        # bound. Past the cap new tokens just hash (md5 is cheap);
        # cached values stay valid, so results are unchanged.
        cache: dict[str, int] = {}
        cache_cap = 1 << 18

        def fp_one(text: str) -> int:
            counts = Counter(ws.split(text.lower().strip(" ")))
            hs = np.empty(len(counts), dtype=np.uint64)
            cs = np.empty(len(counts), dtype=np.int64)
            for j, (tok, cnt) in enumerate(counts.items()):
                h = cache.get(tok)
                if h is None:
                    h = int(
                        hashlib.md5(tok.encode("utf-8")).hexdigest()[:15], 16
                    )
                    if len(cache) < cache_cap:
                        cache[tok] = h
                hs[j] = h
                cs[j] = cnt
            bits = (
                (hs[:, None] >> shifts[None, :]) & np.uint64(1)
            ).astype(np.int64)
            votes = (cs[:, None] * (2 * bits - 1)).sum(axis=0)
            fp = int(
                np.bitwise_or.reduce(
                    (votes > 0).astype(np.uint64) << shifts, initial=np.uint64(0)
                )
            )
            return fp - (1 << 64) if fp >= (1 << 63) else fp

        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "simhash": pd.Series(
                        [fp_one(t) for t in pdf[text_col]], dtype="int64"
                    ),
                }
            )

    fps = docs.select(id_col, text_col).mapInPandas(fingerprint, schema=fp_schema)
    # shared banding: partitions the 60 INFORMATIVE fingerprint bits
    # (the 60-bit token hash leaves bits 60-63 constant) — see
    # operators/dedup._simhash_bands; identical keys to the batch twin.
    from ..operators.dedup import _simhash_bands

    banded = _simhash_bands(fps, id_col, bands)

    out_schema = (
        f"{id_col} long, matched_doc_id long, hamming int, band int"
    )
    state_schema = "ids array<long>, fps array<long>"

    def verify(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        # SWAR popcount over the WHOLE stored-state vector per arriving
        # doc (numpy 1.x has no bitwise_count; unsigned arithmetic
        # wraps like C by design). The r12 per-doc Python loop was the
        # pipeline's bind on duplicate-heavy streams: 2k docs/s x up to
        # max_state_per_band stored fingerprints = millions of
        # interpreted xor/popcount iterations per trigger (1.6k rows/s
        # end-to-end). The vectorized scan is one C pass per doc.
        _M1 = np.uint64(0x5555555555555555)
        _M2 = np.uint64(0x3333333333333333)
        _M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
        _H01 = np.uint64(0x0101010101010101)

        def _hammings(stored: "np.ndarray", fp: int) -> "np.ndarray":
            v = stored ^ np.uint64(fp & ((1 << 64) - 1))
            v = v - ((v >> np.uint64(1)) & _M1)
            v = (v & _M2) + ((v >> np.uint64(2)) & _M2)
            v = (v + (v >> np.uint64(4))) & _M4
            return (v * _H01) >> np.uint64(56)

        if state.exists:
            ids, fps_seen = state.get
            ids, fps_seen = list(ids), list(fps_seen)
        else:
            ids, fps_seen = [], []
        # pre-batch state snapshot as vectors; in-batch arrivals are
        # appended to the (small) tail lists and scanned interpreted —
        # per trigger per band key the tail is a handful of docs while
        # the stored state can be thousands
        base_ids = np.asarray(ids, dtype=np.int64)
        base_fps = np.asarray(fps_seen, dtype=np.int64).view(np.uint64)
        tail_ids: list[int] = []
        tail_fps: list[int] = []
        # emission is vectorized too: on duplicate-heavy streams the
        # match amplification runs ~state-size pairs PER DOC, so a
        # per-pair rows.append() burns more interpreter time than the
        # hamming scan it follows — matches accumulate as numpy column
        # chunks and concatenate once per trigger
        out_rid: list["np.ndarray"] = []
        out_sid: list["np.ndarray"] = []
        out_ham: list["np.ndarray"] = []
        for pdf in batches:
            # deterministic within-batch order: ids ascending, so the
            # earlier doc is always the "matched" side
            pdf = pdf.sort_values(id_col)
            known = set(ids)
            known.update(tail_ids)
            for rid, fp in zip(pdf[id_col], pdf["simhash"]):
                rid, fp = int(rid), int(fp)
                if rid in known:
                    # at-least-once re-delivery (or an in-batch dup):
                    # already fingerprinted — matching it against its
                    # own stored copy would emit a self-pair (rid, rid,
                    # 0) and a duplicate state entry that double-emits
                    # every future match and burns a state slot
                    continue
                known.add(rid)
                if len(base_ids):
                    ham = _hammings(base_fps, fp)
                    hits = np.nonzero(ham <= max_hamming)[0]
                    if len(hits):
                        out_rid.append(
                            np.full(len(hits), rid, dtype=np.int64)
                        )
                        out_sid.append(base_ids[hits])
                        out_ham.append(ham[hits].astype(np.int32))
                tail_hits = [
                    (sid, h)
                    for sid, sfp in zip(tail_ids, tail_fps)
                    if (h := bin((fp ^ sfp) & ((1 << 64) - 1)).count("1"))
                    <= max_hamming
                ]
                if tail_hits:
                    out_rid.append(
                        np.full(len(tail_hits), rid, dtype=np.int64)
                    )
                    out_sid.append(
                        np.array([t[0] for t in tail_hits], dtype=np.int64)
                    )
                    out_ham.append(
                        np.array([t[1] for t in tail_hits], dtype=np.int32)
                    )
                tail_ids.append(rid)
                tail_fps.append(fp)
        ids.extend(tail_ids)
        fps_seen.extend(tail_fps)
        if len(ids) > max_state_per_band:
            ids = ids[-max_state_per_band:]
            fps_seen = fps_seen[-max_state_per_band:]
        state.update((ids, fps_seen))
        if out_rid:
            n = int(sum(len(a) for a in out_rid))
            yield pd.DataFrame(
                {
                    id_col: np.concatenate(out_rid),
                    "matched_doc_id": np.concatenate(out_sid),
                    "hamming": np.concatenate(out_ham),
                    "band": np.full(n, int(key[0]), dtype=np.int32),
                }
            )
        else:
            yield pd.DataFrame(
                {
                    id_col: np.array([], dtype=np.int64),
                    "matched_doc_id": np.array([], dtype=np.int64),
                    "hamming": np.array([], dtype=np.int32),
                    "band": np.array([], dtype=np.int32),
                }
            )

    return banded.groupBy("band", "key").applyInPandasWithState(
        verify,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_gapfill_locf(
    hourly: DataFrame,
    *,
    key_col: str = "event_type",
    hour_col: str = "hour",
) -> DataFrame:
    """Streaming twin of the batch LOCF gap-fill
    (plans.q_gapfill_locf_hourly): per key, emit a DENSE hourly series
    — arriving hours pass through, missing hours between the last seen
    hour and a new arrival are emitted with the last observed mean
    carried forward and ``is_gap = 1``. State per key is two scalars
    (last hour epoch, last mean), so the state store stays O(|keys|)
    forever — the gap EMISSION is driven by arrivals, not timers,
    which is what keeps this expressible without processing-time
    triggers. Input must be pre-aggregated to hourly rows
    (event_type, hour, n_events, hourly_avg); rows at or before the
    last seen hour are late arrivals and are dropped (the batch twin
    recomputes them; the stream contract is monotone append).
    """

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (etype,) = key
        batch = pd.concat(list(pdfs))
        if not len(batch):
            return
        batch = batch.sort_values(hour_col)
        if state.exists:
            last_epoch, last_avg = state.get
        else:
            last_epoch, last_avg = -1, float("nan")
        out_hours, out_n, out_avg, out_gap = [], [], [], []
        hour_s = 3600
        for _, row in batch.iterrows():
            epoch = int(pd.Timestamp(row[hour_col]).timestamp())
            if epoch <= last_epoch:
                continue  # late arrival; batch twin owns corrections
            if last_epoch >= 0:
                for g in range(last_epoch + hour_s, epoch, hour_s):
                    out_hours.append(pd.Timestamp(g, unit="s"))
                    out_n.append(0)
                    out_avg.append(last_avg)
                    out_gap.append(1)
            out_hours.append(pd.Timestamp(epoch, unit="s"))
            out_n.append(int(row["n_events"]))
            out_avg.append(float(row["hourly_avg"]))
            out_gap.append(0)
            last_epoch, last_avg = epoch, float(row["hourly_avg"])
        state.update((last_epoch, last_avg))
        if out_hours:
            yield pd.DataFrame(
                {
                    key_col: [etype] * len(out_hours),
                    hour_col: out_hours,
                    "n_events": out_n,
                    "filled_avg": out_avg,
                    "is_gap": out_gap,
                }
            )

    # key/hour columns thread NAME AND TYPE through the output schema —
    # the old hardcoded "event_type string, hour" mislabeled any other
    # key column and crashed Arrow conversion for non-string keys
    key_type = hourly.schema[key_col].dataType.simpleString()
    return hourly.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"{key_col} {key_type}, {hour_col} timestamp, n_events long, "
            "filled_avg double, is_gap int"
        ),
        stateStructType="last_epoch long, last_avg double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_stats_tws(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    value_col: str = "value",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """`running_user_stats` on transformWithStateInPandas (Spark 4.0's
    stateful-processing v2) — the successor API to
    applyInPandasWithState, and the one new stateful features land on.

    What v2 buys at 100 TB state:
    - typed, NAMED state variables (value/list/map) instead of one
      monolithic state tuple — partial updates touch only the variable
      that changed;
    - per-state TTL (``state_ttl_ms``) enforced by the store itself —
      lifetime aggregates age out without hand-rolled timeout code
      (the v1 operator's documented production gap);
    - event-time/processing-time timers for scheduled emission;
    - initial-state bootstrap and state-schema evolution.

    Requires the RocksDB state store provider (TWS does not run on the
    HDFS-backed provider) — compose with ``session.rocksdb_state`` —
    and, at RUNTIME only, the protobuf python package (Spark's TWS
    state protocol; plan construction works without it, execution
    raises STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE if absent —
    this container ships no google.protobuf, so the equivalence test
    gates on importability).  Output schema and semantics match
    ``running_user_stats`` exactly (asserted in
    tests/test_stateful_and_properties.py::
    test_transform_with_state_matches_v1; plan surface always checked
    by test_transform_with_state_plan_builds).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "stats",
                "cnt long, total double, mx double",
                ttlDurationMs=state_ttl_ms,
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                cnt, total, mx = self._state.get()
            else:
                cnt, total, mx = 0, 0.0, float("-inf")
            for pdf in rows:
                cnt += len(pdf)
                total += float(pdf[value_col].sum())
                if len(pdf):
                    mx = max(mx, float(pdf[value_col].max()))
            self._state.update((cnt, total, mx))
            # key_col threads through to the OUTPUT column name too —
            # hardcoding "user_id" would silently mislabel the key when
            # called with a different grouping column
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "n_events": [cnt],
                    "total_value": [total],
                    "max_value": [mx],
                }
            )

        def close(self) -> None:
            pass

    key_type = events.schema[key_col].dataType.simpleString()
    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=_RunningStats(),
        outputStructType=(
            f"{key_col} {key_type}, n_events long, total_value double, "
            "max_value double"
        ),
        outputMode="Update",
        timeMode="None",
    )


def ewma_smooth_batch(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    value_col: str = "value",
    order_col: str = "event_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Batch twin of :func:`streaming_ewma`: the exact recursive EWMA
    s_t = α·x_t + (1-α)·s_{t-1} folded per key in ``order_col`` order
    via one grouped-map pass (an inherently sequential-per-key
    recursion; keys fan out across executors, so parallelism is
    per-key — the right shape, since EWMA state is per-series)."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        s = None
        out = []
        for v in pdf[value_col].astype(float):
            s = v if s is None else alpha * v + (1.0 - alpha) * s
            out.append(s)
        return pdf.assign(ewma=out)[[key_col, order_col, value_col, "ewma"]]

    return df.select(key_col, order_col, value_col).groupBy(key_col).applyInPandas(
        fold,
        schema=f"{key_col} long, {order_col} long, {value_col} double, "
        "ewma double",
    )


def streaming_ewma(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    value_col: str = "value",
    order_col: str = "event_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Per-key exponential smoothing across micro-batches: O(1) state
    (the last smoothed value) carries the ENTIRE history's recursion
    s_t = α·x_t + (1-α)·s_{t-1} — the streaming form of
    :func:`ewma_smooth_batch`, equal row-for-row to running the batch
    fold over the concatenated stream (asserted in
    tests/test_stateful_and_properties.py). Rows are folded in
    ``order_col`` order within each batch; emits every row with its
    smoothed value. The anomaly-baseline / sensor-smoothing shape:
    unbounded history, constant state, no watermark needed."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        s = state.get[0] if state.exists else None
        for pdf in pdfs:
            pdf = pdf.sort_values(order_col)
            out = []
            for v in pdf[value_col].astype(float):
                s = float(v) if s is None else alpha * float(v) + (1.0 - alpha) * s
                out.append(s)
            if len(pdf):
                yield pd.DataFrame(
                    {
                        key_col: pdf[key_col].astype("int64"),
                        order_col: pdf[order_col].astype("int64"),
                        value_col: pdf[value_col].astype(float),
                        "ewma": out,
                    }
                )
        if s is not None:
            state.update((float(s),))

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} long, {order_col} long, "
        f"{value_col} double, ewma double",
        stateStructType="s double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def holt_smooth_batch(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    value_col: str = "value",
    order_col: str = "event_id",
    alpha: float = 0.5,
    beta: float = 0.3,
) -> DataFrame:
    """Batch twin of :func:`streaming_holt`: Holt's linear-trend
    double exponential smoothing l_t = α·x_t + (1-α)(l+b),
    b_t = β(l_t-l) + (1-β)b folded per key in ``order_col`` order
    (init: l = first value, b = 0). The trend-aware sibling of
    :func:`ewma_smooth_batch` — same grouped-map shape, two floats
    of state instead of one. The registry's calendar-bounded
    single-series form is plans/queries.q_holt_linear_revenue; this
    is the per-key (millions of series) form."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        lv = bv = None
        levels, trends = [], []
        for v in pdf[value_col].astype(float):
            if lv is None:
                lv, bv = float(v), 0.0
            else:
                nl = alpha * float(v) + (1.0 - alpha) * (lv + bv)
                bv = beta * (nl - lv) + (1.0 - beta) * bv
                lv = nl
            levels.append(lv)
            trends.append(bv)
        return pdf.assign(level=levels, trend=trends)[
            [key_col, order_col, value_col, "level", "trend"]
        ]

    return (
        df.select(key_col, order_col, value_col)
        .groupBy(key_col)
        .applyInPandas(
            fold,
            schema=f"{key_col} long, {order_col} long, "
            f"{value_col} double, level double, trend double",
        )
    )


def streaming_holt(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    value_col: str = "value",
    order_col: str = "event_id",
    alpha: float = 0.5,
    beta: float = 0.3,
) -> DataFrame:
    """Per-key Holt linear-trend smoothing across micro-batches: O(1)
    state (level, trend — two doubles) carries the entire history's
    recursion; equal row-for-row to :func:`holt_smooth_batch` over
    the concatenated stream (asserted in
    tests/test_stateful_and_properties.py). The trend-aware upgrade
    of :func:`streaming_ewma` for drifting series — EWMA's baseline
    lags a trending signal by design; Holt's explicit trend state
    doesn't. Unbounded history, constant state, no watermark."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        lv, bv = state.get if state.exists else (None, None)
        for pdf in pdfs:
            pdf = pdf.sort_values(order_col)
            levels, trends = [], []
            for v in pdf[value_col].astype(float):
                if lv is None:
                    lv, bv = float(v), 0.0
                else:
                    nl = alpha * float(v) + (1.0 - alpha) * (lv + bv)
                    bv = beta * (nl - lv) + (1.0 - beta) * bv
                    lv = nl
                levels.append(lv)
                trends.append(bv)
            if len(pdf):
                yield pd.DataFrame(
                    {
                        key_col: pdf[key_col].astype("int64"),
                        order_col: pdf[order_col].astype("int64"),
                        value_col: pdf[value_col].astype(float),
                        "level": levels,
                        "trend": trends,
                    }
                )
        if lv is not None:
            state.update((float(lv), float(bv)))

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} long, {order_col} long, "
        f"{value_col} double, level double, trend double",
        stateStructType="l double, b double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_weighted_reservoir(
    events: DataFrame,
    *,
    group_col: str = "event_type",
    id_col: str = "event_id",
    weight_col: str = "value",
    k: int = 5,
) -> DataFrame:
    """Weighted sampling without replacement over an unbounded stream,
    O(k) state per group: the Efraimidis–Spirakis scheme with the
    repo's md5-derived deterministic keys (operators/relational.
    weighted_sample_per_group). Because the E-S key is a PURE FUNCTION
    of the row (no RNG, no arrival-order dependence), "keep the k
    largest keys seen so far" commutes with any batch split — so the
    stream's final reservoir equals the batch operator on the
    concatenated history exactly (asserted in
    tests/test_stateful_and_properties.py), a property a
    random-number reservoir (Algorithm R) cannot offer.

    The key computes NATIVELY (codegen md5/log) before the stateful
    stage; Python only merges two k-bounded lists per (group, batch).
    Emits the full current reservoir per group per batch (update
    mode): (group, id, es_key, rank).
    """
    from ..operators.relational import efraimidis_spirakis_key

    es = efraimidis_spirakis_key(id_col, weight_col)
    keyed = (
        events.filter(F.col(weight_col) > 0)
        .select(F.col(group_col), F.col(id_col), es.alias("_es"))
    )

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (g,) = key
        if state.exists:
            ids, keys = list(state.get[0]), list(state.get[1])
        else:
            ids, keys = [], []
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf[id_col])
            keys.extend(float(x) for x in pdf["_es"])
        order = sorted(range(len(ids)), key=lambda i: (-keys[i], ids[i]))[:k]
        ids = [ids[i] for i in order]
        keys = [keys[i] for i in order]
        state.update((ids, keys))
        yield pd.DataFrame(
            {
                group_col: [g] * len(ids),
                id_col: ids,
                "es_key": keys,
                "rank": list(range(1, len(ids) + 1)),
            }
        )

    return keyed.groupBy(group_col).applyInPandasWithState(
        update,
        outputStructType=f"{group_col} string, {id_col} long, "
        "es_key double, rank int",
        stateStructType="ids array<long>, keys array<double>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cusum_batch(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    value_col: str = "value",
    order_col: str = "event_id",
    target: float = 0.0,
    threshold: float = float("inf"),
) -> DataFrame:
    """Batch twin of :func:`streaming_cusum` via the NON-recursive
    closed form: the one-sided CUSUM recursion
    s_t = max(0, s_{t-1} + (x_t − target)) equals
    S_t − min(0, min_{j≤t} S_j) for the running raw sum S (the
    max-plus prefix identity also used by the cusum_drift_days
    registry query) — so the batch path is two cumulative windows
    sharing one shuffle on the key, fully native, no iteration.
    stream==batch equality is asserted bit-for-bit on dyadic-exact
    fixtures in tests/test_stateful_and_properties.py (the identity
    is exact in exact arithmetic; IEEE doubles realize it exactly
    when every deviation is exactly representable)."""
    w = Window.partitionBy(key_col).orderBy(order_col)
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    dev = F.col(value_col) - F.lit(target)
    with_s = df.select(
        key_col, order_col, value_col, F.sum(dev).over(wrun).alias("_S")
    )
    cusum = F.col("_S") - F.least(F.min("_S").over(wrun), F.lit(0.0))
    return with_s.select(
        key_col,
        order_col,
        value_col,
        cusum.alias("cusum"),
        (cusum > F.lit(threshold)).alias("drift"),
    )


def streaming_cusum(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    value_col: str = "value",
    order_col: str = "event_id",
    target: float = 0.0,
    threshold: float = float("inf"),
) -> DataFrame:
    """Per-key one-sided CUSUM change detection across micro-batches:
    O(1) carried state (the clamped cumulative deviation) runs the
    classic recursion s_t = max(0, s_{t-1} + (x_t − target)) against a
    FIXED reference level, emitting every row with its statistic and a
    drift flag once s exceeds ``threshold`` — the production shape of
    the batch cusum_drift_days query (there the reference mean comes
    from the full history; here it is a trained baseline parameter,
    as a monitor must decide before the data is complete). Equal
    row-for-row to :func:`cusum_batch` over the concatenated stream."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        s = state.get[0] if state.exists else 0.0
        for pdf in pdfs:
            pdf = pdf.sort_values(order_col)
            out = []
            for v in pdf[value_col].astype(float):
                s = max(0.0, s + (float(v) - target))
                out.append(s)
            if len(pdf):
                yield pd.DataFrame(
                    {
                        key_col: pdf[key_col].astype("int64"),
                        order_col: pdf[order_col].astype("int64"),
                        value_col: pdf[value_col].astype(float),
                        "cusum": out,
                        "drift": [x > threshold for x in out],
                    }
                )
        state.update((float(s),))

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} long, {order_col} long, "
        f"{value_col} double, cusum double, drift boolean",
        stateStructType="s double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def interval_merge_blocks_batch(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    start_col: str = "s",
    end_col: str = "e",
) -> DataFrame:
    """Batch twin of :func:`streaming_interval_merge`: merge
    overlapping [start, end) intervals per key into maximal blocks —
    the native gaps-and-islands-over-ranges plan (one cumulative-max
    window flags block starts, a running sum numbers blocks, one
    groupBy folds each block; all three share the key shuffle).
    Returns (key, block_start, block_end)."""
    w = Window.partitionBy(key_col).orderBy(start_col)
    prior = w.rowsBetween(Window.unboundedPreceding, -1)
    flagged = df.withColumn(
        "_nb",
        F.when(F.max(end_col).over(prior).isNull(), 1)
        .when(F.col(start_col) > F.max(end_col).over(prior), 1)
        .otherwise(0),
    )
    blocks = flagged.withColumn(
        "_bid", F.sum("_nb").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        blocks.groupBy(key_col, "_bid")
        .agg(
            F.min(start_col).alias("block_start"),
            F.max(end_col).alias("block_end"),
        )
        .drop("_bid")
    )


def streaming_interval_merge(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    start_col: str = "s",
    end_col: str = "e",
) -> DataFrame:
    """Merge overlapping intervals per key across micro-batches with
    O(1) carried state (the one OPEN block): an arriving interval that
    overlaps the open block extends it; one that starts past its end
    CLOSES it (emitted) and opens a new block — the uptime-stitching /
    activity-coverage monitor as a stream. Contract: interval starts
    must arrive in non-decreasing order per key across batches (the
    tracker shape; out-of-order starts would need a watermark buffer).
    Emits CLOSED blocks only — each key's final block stays open in
    state, so the emitted set equals :func:`interval_merge_blocks_batch`
    over the concatenated history minus each key's last block
    (asserted in tests/test_stateful_and_properties.py)."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        bs, be = state.get if state.exists else (None, None)
        for pdf in pdfs:
            pdf = pdf.sort_values(start_col)
            closed_s, closed_e = [], []
            for s, e in zip(
                pdf[start_col].astype("int64"), pdf[end_col].astype("int64")
            ):
                s, e = int(s), int(e)
                if bs is None:
                    bs, be = s, e
                elif s <= be:
                    be = max(be, e)
                else:
                    closed_s.append(bs)
                    closed_e.append(be)
                    bs, be = s, e
            if closed_s:
                yield pd.DataFrame(
                    {
                        key_col: [k] * len(closed_s),
                        "block_start": closed_s,
                        "block_end": closed_e,
                    }
                )
        if bs is not None:
            state.update((int(bs), int(be)))

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} long, block_start long, "
        "block_end long",
        stateStructType="bs long, be long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def psi_batch(
    df: DataFrame,
    *,
    key_col: str = "event_type",
    value_col: str = "value",
    edges: list[float],
    ref_shares: list[float],
) -> DataFrame:
    """Batch twin of :func:`streaming_psi`: bucket values against the
    FIXED reference edges, then PSI = Σ (q_i − p_i)·ln(q_i/p_i) with
    the 1e-6 zero-share floor — one groupBy per key, bucket count
    bounded by len(edges)+1. ``ref_shares`` is the reference
    distribution the monitor was armed with (len(edges)+1 shares).

    NULL and NaN values are EXCLUDED from bucketing on both paths (a
    NULL has no bucket; Spark would order NaN above every edge while
    pandas' ``NaN > e`` is False — and a float64 Arrow batch cannot
    even distinguish the two worker-side), so a key whose every value
    is NULL/NaN appears in NEITHER output — the one convention both
    engines can honor exactly."""
    n_b = len(edges) + 1
    v = F.col(value_col).cast("double")
    bucket = sum(
        [(F.col(value_col) > F.lit(e)).cast("int") for e in edges],
        F.lit(0),
    )
    counts = (
        df.filter(v.isNotNull() & ~F.isnan(v))
        .select(key_col, bucket.alias("_b"))
        .groupBy(key_col)
        .pivot("_b", list(range(n_b)))
        .count()
        .na.fill(0)
    )

    def psi_expr():
        total = sum(
            [F.coalesce(F.col(f"{i}"), F.lit(0)) for i in range(n_b)],
            F.lit(0),
        ).cast("double")
        terms = []
        for i in range(n_b):
            q = F.greatest(
                F.coalesce(F.col(f"{i}"), F.lit(0)).cast("double") / total,
                F.lit(1e-6),
            )
            p = F.lit(max(ref_shares[i], 1e-6))
            terms.append(
                ((q - p) * F.log(q / p)).cast("decimal(28,12)")
            )
        return sum(terms[1:], terms[0])

    return counts.select(
        key_col, F.round(psi_expr().cast("double"), 6).alias("psi")
    )


def streaming_psi(
    events: DataFrame,
    *,
    key_col: str = "event_type",
    value_col: str = "value",
    edges: list[float],
    ref_shares: list[float],
) -> DataFrame:
    """Streaming PSI drift monitor: per key, O(len(edges)+1) carried
    bucket counts accumulate across micro-batches against a FIXED
    reference distribution (armed at deploy time — the production ML
    monitoring shape: the reference never changes mid-release), and
    each batch emits the key's lifetime PSI so far. Equal to
    :func:`psi_batch` over the concatenated stream (asserted in
    tests/test_stateful_and_properties.py): the counts are integers,
    so the only float math is the final closed form on the same
    integer state. NULL/NaN values are excluded from bucketing (the
    psi_batch convention — a float64 Arrow batch can't tell them
    apart worker-side), and a key with no bucketable rows yet emits
    NOTHING, matching its absence from the batch output."""
    import math

    n_b = len(edges) + 1
    ref = [max(s, 1e-6) for s in ref_shares]

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        counts = list(state.get[0]) if state.exists else [0] * n_b
        for pdf in pdfs:
            for v in pdf[value_col].astype(float):
                if math.isnan(v):  # NULL or NaN: no bucket
                    continue
                b = 0
                for e in edges:
                    if v > e:
                        b += 1
                counts[b] += 1
        state.update(([int(c) for c in counts],))
        total = float(sum(counts))
        if total == 0:
            return  # nothing bucketable yet: batch has no row either
        psi = 0.0
        for i in range(n_b):
            q = max(counts[i] / total, 1e-6)
            psi += (q - ref[i]) * math.log(q / ref[i])
        yield pd.DataFrame({key_col: [k], "psi": [round(psi, 6)]})

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} string, psi double",
        stateStructType="counts array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
