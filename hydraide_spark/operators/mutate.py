"""The mutation surface: Set modes, Delete/Shift, conditional
Increments, structural Patch on struct bodies, Uint32Slice set ops
(SURVEY.md §2.10).

Every operator here is a *pure transformation*: (current state,
mutation spec) -> (new state, per-key status rows). The reference
returns per-key statuses (NEW/UPDATED/NOTHING_CHANGED,
proto:1031-1039; patch codes proto:3192-3249) from inside its per-key
guard; the Spark engine computes the same statuses relationally — a
null-safe diff join in the same batch — and the storage layer
(sources.store) persists new state + emits change events. Concurrency
collapses to per-partition single-writer batch semantics (SURVEY §3.2).

Scale notes: the state/updates join is an equi-join on the key (hash
shuffle both sides or broadcast for small update batches); statuses are
a projection of that same join — no second pass over state.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from typing import Any, Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F

from ..query.filters import Pred, translate

STATUS_NEW = "NEW"
STATUS_UPDATED = "UPDATED"
STATUS_NOTHING_CHANGED = "NOTHING_CHANGED"
STATUS_NOT_CREATED = "NOT_CREATED"  # insert-only hit existing / update-only miss
STATUS_DELETED = "DELETED"
STATUS_PATCHED = "PATCHED"
STATUS_CONDITION_NOT_MET = "CONDITION_NOT_MET"
STATUS_NOT_FOUND = "NOT_FOUND"


def set_treasures(
    base: DataFrame,
    updates: DataFrame,
    key_col: str = "key",
    create_if_not_exist: bool = True,
    overwrite: bool = True,
) -> DataFrame:
    """Reference ``Set`` (gateway.go:194-333): upsert / insert-only /
    update-only via the CreateIfNotExist x Overwrite flags (proto:916-931),
    with per-key status NEW / UPDATED / NOTHING_CHANGED / NOT_CREATED.

    Returns one row per key in (base ∪ updates) with the post-set value
    columns plus ``set_status``. Value columns = all shared non-key
    columns of the two frames; unchanged detection is a null-safe
    column-wise comparison (the reference's changed-field detection,
    swamp.go:2174-2176).
    """
    value_cols = [c for c in updates.columns if c != key_col and c in base.columns]
    b = base.select(key_col, *value_cols).alias("b")
    u = updates.select(key_col, *value_cols).alias("u")
    j = b.join(u, F.col(f"b.{key_col}") == F.col(f"u.{key_col}"), "full_outer")

    in_base = F.col(f"b.{key_col}").isNotNull()
    in_upd = F.col(f"u.{key_col}").isNotNull()
    same = F.lit(True)
    for c in value_cols:
        same = same & F.col(f"b.{c}").eqNullSafe(F.col(f"u.{c}"))

    take_update = (
        (in_upd & ~in_base & F.lit(create_if_not_exist))
        | (in_upd & in_base & F.lit(overwrite))
    )
    status = (
        F.when(~in_upd, F.lit(STATUS_NOTHING_CHANGED))  # untouched existing row
        .when(~in_base & F.lit(create_if_not_exist), F.lit(STATUS_NEW))
        .when(~in_base, F.lit(STATUS_NOT_CREATED))  # update-only miss
        .when(~F.lit(overwrite), F.lit(STATUS_NOT_CREATED))  # insert-only hit
        .when(same, F.lit(STATUS_NOTHING_CHANGED))
        .otherwise(F.lit(STATUS_UPDATED))
    )

    out_cols = [
        F.coalesce(F.col(f"b.{key_col}"), F.col(f"u.{key_col}")).alias(key_col)
    ]
    for c in value_cols:
        out_cols.append(
            F.when(take_update, F.col(f"u.{c}")).otherwise(F.col(f"b.{c}")).alias(c)
        )
    out_cols.append(status.alias("set_status"))
    return j.select(*out_cols)


def delete_treasures(
    base: DataFrame, keys: Sequence[str], key_col: str = "key"
) -> tuple[DataFrame, DataFrame]:
    """Reference ``Delete`` (gateway.go:1326-1395): returns
    (remaining, deleted). Deleted rows double as the shadow-delete
    tombstones for subscribers (swamp.go:2551-2575)."""
    cond = F.col(key_col).isin(list(keys))
    return base.filter(~cond), base.filter(cond)


def shift_by_keys(
    base: DataFrame, keys: Sequence[str], key_col: str = "key"
) -> tuple[DataFrame, DataFrame]:
    """Reference ``ShiftByKeys`` (proto:127-157): atomic read+delete by
    key list (queue ack). Returns (claimed, remaining) — the claimed
    rows are the operator's output, the remaining frame is the new
    state."""
    remaining, claimed = delete_treasures(base, keys, key_col)
    return claimed, remaining


@dataclass(frozen=True)
class IncrementMeta:
    """``IncrementRequestMetadata`` (proto:1591-1597): what to stamp on
    the treasure when the increment targets it — one instance for
    newly-created keys (``SetIfNotExist``), one for pre-existing keys
    (``SetIfExist``). ``created_at``/``updated_at`` are stamp-now
    booleans; the *_by fields are identity strings; ``expired_at`` is an
    absolute epoch-µs TTL."""

    created_at: bool = False
    created_by: Optional[str] = None
    updated_at: bool = False
    updated_by: Optional[str] = None
    expired_at: Optional[int] = None  # epoch µs


_META_FIELDS = (
    ("created_at_us", "created_at", True),
    ("created_by", "created_by", False),
    ("updated_at_us", "updated_at", True),
    ("updated_by", "updated_by", False),
    ("expired_at_us", "expired_at", False),
)


def _meta_value(meta: Optional[IncrementMeta], attr: str, is_now: bool, now_us: int):
    if meta is None:
        return F.lit(None).cast("long" if is_now or attr == "expired_at" else "string")
    v = getattr(meta, attr)
    if is_now:
        return F.lit(now_us if v else None).cast("long")
    if attr == "expired_at":
        return F.lit(v).cast("long")
    return F.lit(v).cast("string")


def increment(
    base: DataFrame,
    value_col: str,
    delta: float,
    condition: Optional[Pred] = None,
    key_col: str = "key",
    keys: Optional[Sequence[str]] = None,
    meta_if_not_exist: Optional[IncrementMeta] = None,
    meta_if_exist: Optional[IncrementMeta] = None,
    now_us: Optional[int] = None,
) -> DataFrame:
    """The 10 ``Increment<T>`` RPCs as ONE generic conditional add
    (reference burns ~900 LoC on per-type copies, swamp.go:1274-2017;
    Spark's numeric tower needs a single expression).

    Returns key, old_value, new_value, applied — applied=False rows keep
    their value (condition failed), matching the reference's
    returns-new-value + applied flag contract (proto:420-455).

    ``keys`` switches to the reference's get-or-create mode
    (swamp.go:1277-1280: ``beaconKey.Get`` → ``CreateTreasure``):
    missing keys are created with value 0 before the conditional add,
    and the output gains a ``created`` flag.

    ``meta_if_not_exist`` / ``meta_if_exist`` stamp per-key metadata
    (proto:1591; swamp.go:1219 ``setMetaForIncrement``) — created keys
    take the first, pre-existing keys the second, and the stamp happens
    whether or not the condition passes (the reference stamps inside
    the guard BEFORE the condition check). When either is given the
    output gains created_at_us/created_by/updated_at_us/updated_by/
    expired_at_us (the ``IncrementResponseMetadata`` analogue,
    proto:1599). ``now_us`` pins the stamp clock (deterministic
    replays); defaults to wall-clock."""
    work = base
    created = F.lit(False)
    if keys is not None:
        # requested keys are a SET (duplicates would double result rows
        # and, through the store path, duplicate persisted key rows)
        keys = list(dict.fromkeys(keys))
        spark = base.sparkSession
        kdf = spark.createDataFrame([(k,) for k in keys], f"{key_col} string")
        # Scale shape: the key list is a driver-side argument (small by
        # contract), so the probe is a broadcast semi-join and the
        # created-key set is resolved with ONE bounded collect
        # (<= len(keys) rows) — a keys-left outer join would instead
        # shuffle the full base on the key, and caching the hit frame
        # would pin an entry in the CacheManager for the driver's
        # lifetime. Cost: the key column is scanned twice (probe +
        # action), both times with the key filter pushed down.
        hits = base.join(F.broadcast(kdf), key_col, "left_semi")
        hit_keys = {
            r[0] for r in hits.select(key_col).collect()
        }  # bounded by len(keys)
        created_keys = [k for k in keys if k not in hit_keys]
        # created rows carry the FULL base schema (typed nulls except
        # the value, which starts at 0 — swamp.go:1292 Void -> 0), so
        # conditions referencing any base column still resolve.
        # Membership (not value-nullness) decides `created`: an
        # existing key whose value is NULL is not created, it just
        # can't be incremented (applied=False).
        miss = spark.createDataFrame(
            [(k,) for k in created_keys], f"{key_col} string"
        )
        for c, t in base.dtypes:
            if c != key_col:
                miss = miss.withColumn(
                    c,
                    F.lit(0).cast(t) if c == value_col else F.lit(None).cast(t),
                )
        work = hits.withColumn("_created", F.lit(False)).unionByName(
            miss.withColumn("_created", F.lit(True))
        )
        created = F.col("_created")
    cond = translate(condition, work) if condition is not None else F.lit(True)
    old = F.col(value_col)
    new = F.when(cond, old + F.lit(delta)).otherwise(old)
    cols = [
        F.col(key_col),
        old.alias("old_value"),
        new.alias("new_value"),
        (cond & old.isNotNull()).alias("applied"),
        created.alias("created"),
    ]
    if meta_if_not_exist is not None or meta_if_exist is not None:
        import time as _time

        now = int(now_us if now_us is not None else _time.time_ns() // 1_000)
        for out_name, attr, is_now in _META_FIELDS:
            cols.append(
                F.when(
                    created, _meta_value(meta_if_not_exist, attr, is_now, now)
                )
                .otherwise(_meta_value(meta_if_exist, attr, is_now, now))
                .alias(out_name)
            )
    return work.select(*cols)


# ---------------------------------------------------------------------------
# Structural patch on struct-typed body columns


class PatchKind(Enum):
    SET = "set"
    DELETE = "delete"
    INC = "inc"
    APPEND = "append"
    PREPEND = "prepend"
    REMOVE_AT = "remove_at"
    REMOVE_VAL = "remove_val"
    MERGE = "merge"


@dataclass(frozen=True)
class PatchOp:
    kind: PatchKind
    path: str  # dotted path inside the body struct
    value: Any = None


def _apply_patch_op(body: Column, op: PatchOp, structural: bool = True) -> Column:
    """One structural op on a struct column via withField/dropFields —
    Spark's native struct surgery replaces the reference's msgpack
    byte-level patching (msgpackpatch pkg); untouched fields are
    untouched columns by construction.

    ``structural``: whether schema-changing ops are allowed. A row-gated
    (conditional) patch must keep the schema uniform across rows, so
    DELETE degrades to nulling the field."""
    path = op.path
    if op.kind is PatchKind.SET:
        return body.withField(path, F.lit(op.value))
    if op.kind is PatchKind.DELETE:
        if not structural:
            target = _get_path(body, path)
            typed_null = F.when(F.lit(False), target)  # NULL of target's type
            return body.withField(path, typed_null)
        return body.dropFields(path)
    if op.kind is PatchKind.INC:
        return body.withField(path, _get_path(body, path) + F.lit(op.value))
    if op.kind is PatchKind.APPEND:
        arr = _get_path(body, path)
        return body.withField(path, F.concat(arr, F.array(F.lit(op.value))))
    if op.kind is PatchKind.PREPEND:
        arr = _get_path(body, path)
        return body.withField(path, F.concat(F.array(F.lit(op.value)), arr))
    if op.kind is PatchKind.REMOVE_AT:
        arr = _get_path(body, path)
        idx = int(op.value)
        return body.withField(
            path,
            F.filter(arr, lambda x, i: i != idx),
        )
    if op.kind is PatchKind.REMOVE_VAL:
        arr = _get_path(body, path)
        return body.withField(path, F.array_remove(arr, op.value))
    if op.kind is PatchKind.MERGE:
        out = body
        for k, v in dict(op.value).items():
            out = out.withField(f"{path}.{k}" if path else k, F.lit(v))
        return out
    raise ValueError(f"unknown patch kind {op.kind}")


def _get_path(body: Column, path: str) -> Column:
    out = body
    for seg in path.split("."):
        out = out[seg]
    return out


@dataclass(frozen=True)
class PatchMeta:
    """``PatchMeta`` (proto:3140-3165): timestamp/identity metadata
    stamped on PATCHED rows. ``clear_expired_at`` takes precedence over
    ``set_expired_at`` (proto:3163). The proto's SetCreatedAt/
    SetCreatedBy fire only on treasures CREATED in the call and are
    "ignored on existing treasures" (proto:3159-3161) — this operator
    patches existing rows, so they are a reference-faithful no-op and
    deliberately absent (creation is ``set_treasures``' job)."""

    updated_at: bool = False
    updated_by: Optional[str] = None
    set_expired_at: Optional[int] = None  # epoch µs TTL
    clear_expired_at: bool = False


def patch_treasures(
    base: DataFrame,
    ops: Sequence[PatchOp],
    condition: Optional[Pred] = None,
    key_col: str = "key",
    body_col: str = "body",
    meta: Optional[PatchMeta] = None,
    expired_col: str = "expired_at",
    now_us: Optional[int] = None,
) -> DataFrame:
    """Reference ``PatchTreasures`` (proto:2988-3177, msgpackpatch pkg):
    an ordered op-list applied atomically per row, gated by an optional
    per-row PatchCondition. Untouched fields stay identical (the
    reference's core invariant, property_test.go) — here structurally
    guaranteed by withField.

    ``meta`` stamps PATCHED rows (proto:3140-3165): updated_at_us /
    updated_by top-level columns (added as typed nulls if absent), and
    the TTL column ``expired_col`` slid to ``set_expired_at`` or
    cleared — the same timestamp column the claims operators
    (shift/patch-expired) read, so a patch-time TTL slide immediately
    affects claimability. Unpatched rows keep their existing values.
    ``now_us`` pins the stamp clock for deterministic replays.

    Returns all rows with the (possibly) patched body and
    ``patch_status`` ∈ PATCHED / CONDITION_NOT_MET."""
    structural = condition is None
    patched = F.col(body_col)
    for op in ops:
        patched = _apply_patch_op(patched, op, structural=structural)
    if structural:
        new_body = patched
        cond = F.lit(True)
    else:
        cond = translate(condition, base)
        new_body = F.when(cond, patched).otherwise(F.col(body_col))
    status = F.when(cond, F.lit(STATUS_PATCHED)).otherwise(F.lit(STATUS_CONDITION_NOT_MET))
    # one projection: both expressions must bind to the ORIGINAL body —
    # chaining withColumn would re-resolve the condition against the
    # already-patched body and misreport rows the patch pushed across
    # the condition boundary
    cols = {body_col: new_body, "patch_status": status}
    if meta is not None:
        import time as _time

        now = int(now_us if now_us is not None else _time.time_ns() // 1_000)

        def keep(col_name: str, dtype: str):
            return (
                F.col(col_name)
                if col_name in base.columns
                else F.lit(None).cast(dtype)
            )

        if meta.updated_at:
            cols["updated_at_us"] = F.when(cond, F.lit(now)).otherwise(
                keep("updated_at_us", "long")
            )
        if meta.updated_by is not None:
            cols["updated_by"] = F.when(cond, F.lit(meta.updated_by)).otherwise(
                keep("updated_by", "string")
            )
        if meta.clear_expired_at:  # precedence over set (proto:3163)
            cols[expired_col] = F.when(
                cond, F.lit(None).cast("timestamp")
            ).otherwise(keep(expired_col, "timestamp"))
        elif meta.set_expired_at is not None:
            cols[expired_col] = F.when(
                cond, F.timestamp_micros(F.lit(int(meta.set_expired_at)))
            ).otherwise(keep(expired_col, "timestamp"))
    return base.withColumns(cols)


@dataclass
class PatchBatch:
    """Result of :func:`patch_treasures_batch`: per-key status rows,
    the full new state, and the accepted (patched/created) rows for
    event emission. ``unpersist()`` releases the internal caches once
    the caller has consumed all three frames."""

    results: DataFrame
    new_state: DataFrame
    applied: DataFrame
    _cached: DataFrame
    _deps: tuple = ()

    def unpersist(self) -> None:
        self._cached.unpersist()
        for d in self._deps:
            d.unpersist()


def patch_treasures_batch(
    spark,
    base: DataFrame,
    keys: Sequence[str],
    ops: Sequence[PatchOp],
    condition: Optional[Pred] = None,
    key_col: str = "key",
    body_col: str = "body",
    create_if_not_exist: bool = False,
    seed_body=None,
    meta: Optional[PatchMeta] = None,
    now_us: Optional[int] = None,
    cap=None,
) -> PatchBatch:
    """The ``PatchTreasuresRequest`` batch as a pure transformation
    (proto:2988-3060): apply the op-list to the targeted keys (gated
    by the per-row PatchCondition), optionally creating missing keys
    from ``seed_body`` (CreateIfNotExist), with the reference's Cap
    quota semantics (proto:3023-3040, gateway_patch.go capPreCount +
    swamp_patch.go PatchFields):

    - the rows of ``base`` currently matching ``cap.filter`` are
      counted ONCE, giving a (no→yes) budget
      ``max_matching - current`` (floored at 0);
    - per key, IN REQUEST ORDER, only a patch that moves its row from
      non-matching to matching consumes budget — (yes→yes), (yes→no)
      and (no→no) patches always proceed;
    - an over-budget (no→yes) key reports CAP_EXCEEDED and its row is
      NOT mutated, while every accepted key still commits (per-key,
      not whole-request, rejection);
    - created rows never pre-match (swamp_patch.go:250-252 evaluates
      preMatched only when !isCreate), so a matching created row is a
      budget-consuming transition.

    A created row whose condition fails — or that loses the cap race —
    is rolled back out of ``new_state`` entirely, mirroring
    swamp_patch.go's deferred ``creatingTreasures.Delete`` on the
    unsaved path.

    Scale: targeted rows are bounded by ``len(keys)`` (a request-sized
    broadcast join against state), so the single-partition
    request-order window and the bounded collect are both O(request),
    never O(state); the cap pre-count is one scan-side aggregate.
    """
    from pyspark.sql import types as T
    from pyspark.sql.window import Window

    keys = list(dict.fromkeys(keys))
    if cap is not None and cap.max_matching <= 0:
        raise ValueError("Cap.max_matching must be > 0 (proto:3040)")
    # resolve the meta timestamp ONCE: the targeted and created legs
    # are patched by separate patch_treasures calls below and must
    # stamp the same updated_at
    if meta is not None and meta.updated_at and now_us is None:
        import time as _time

        now_us = int(_time.time_ns() // 1_000)
    kdf = spark.createDataFrame(
        [(k, i) for i, k in enumerate(keys)],
        f"{key_col} string, _req_idx int",
    )
    targeted = base.join(F.broadcast(kdf), key_col, "inner")

    # stash the pre-patch row (for CAP_EXCEEDED revert) and the
    # pre-patch cap membership; patch_treasures is a per-row
    # projection, so patching the targeted and created legs separately
    # and unioning is row-for-row identical to patching their union
    orig_cols = [c for c in base.columns if c != key_col]

    def _prep(frame):
        w = frame.withColumn(
            "_orig", F.struct(*[F.col(c) for c in orig_cols])
        )
        if cap is not None:
            w = w.withColumn(
                "_pre_match",
                F.when(F.col("_created"), F.lit(False)).otherwise(
                    F.coalesce(translate(cap.filter, w), F.lit(False))
                ),
            )
        return patch_treasures(
            w,
            ops,
            condition=condition,
            key_col=key_col,
            body_col=body_col,
            meta=meta,
            now_us=now_us,
        )

    # ONE state scan (r16, guide §1.2 fewer jobs): cache the patched
    # TARGETED rows and collect the hit keys FROM that cache — the
    # collect is itself the cache-fill action, where previously a
    # separate hit_keys job scanned the state before the cache-fill
    # scanned it again. Both frames are request-bounded (≤ len(keys)).
    patched0 = _prep(targeted.withColumn("_created", F.lit(False))).cache()
    hit_keys = {
        r[0] for r in patched0.select(key_col).collect()
    }  # bounded by len(keys)
    missing = [k for k in keys if k not in hit_keys]

    patched = patched0
    if create_if_not_exist and missing:
        body_type = base.schema[body_col].dataType
        created_raw = spark.createDataFrame(
            [(k, keys.index(k), seed_body) for k in missing],
            T.StructType(
                [
                    T.StructField(key_col, T.StringType(), False),
                    T.StructField("_req_idx", T.IntegerType(), False),
                    T.StructField(body_col, body_type, True),
                ]
            ),
        )
        for c, t in base.dtypes:
            if c not in (key_col, body_col):
                created_raw = created_raw.withColumn(c, F.lit(None).cast(t))
        patched = patched.unionByName(
            _prep(created_raw.withColumn("_created", F.lit(True)))
        )

    if cap is not None:
        # capPreCount: whole-swamp, once, pre-mutation — as a broadcast
        # 1-row aggregate folded into the same evaluation (the shift
        # Cap design; no separate driver-side count job)
        budget_df = base.agg(
            F.greatest(
                F.lit(0),
                F.lit(int(cap.max_matching))
                - F.count_if(
                    F.coalesce(translate(cap.filter, base), F.lit(False))
                ),
            ).alias("_budget")
        )
        is_patched = F.col("patch_status") == STATUS_PATCHED
        post_match = F.coalesce(translate(cap.filter, patched), F.lit(False))
        trans = is_patched & ~F.col("_pre_match") & post_match
        # running (no→yes) count in request order; the window is
        # request-bounded (≤ len(keys) rows), so the single partition
        # it implies is the same boundedness as the hit_keys collect
        running = F.sum(F.when(trans, 1).otherwise(0)).over(
            Window.orderBy("_req_idx").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        patched = patched.crossJoin(F.broadcast(budget_df)).withColumn(
            "_capped", trans & (running > F.col("_budget"))
        )
    else:
        patched = patched.withColumn("_capped", F.lit(False))
    # the fill reads patched0's cache (plus the budget aggregate's one
    # state scan under cap) — request-bounded rows, no second state scan
    patched = patched.cache()
    patched.count()

    status = (
        F.when(F.col("_capped"), F.lit("CAP_EXCEEDED"))
        .when(
            (F.col("patch_status") == STATUS_PATCHED) & F.col("_created"),
            F.lit("CREATED"),
        )
        .otherwise(F.col("patch_status"))
    )
    results = patched.select(key_col, status.alias("patch_status"))
    if missing and not create_if_not_exist:
        results = results.unionByName(
            spark.createDataFrame(
                [(k, "KEY_NOT_FOUND") for k in missing],
                f"{key_col} string, patch_status string",
            )
        )

    # new state: untargeted rows pass through; capped rows revert to
    # their stashed original; unsaved created rows (condition failed
    # or capped) are rolled back entirely
    applied_pred = (
        (F.col("patch_status") == STATUS_PATCHED) & ~F.col("_capped")
    )
    keep_row = ~F.col("_created") | applied_pred
    out_types = dict(patched.dtypes)
    aux = {key_col, "patch_status", "_created", "_orig", "_pre_match", "_capped", "_req_idx", "_budget"}
    value_exprs = []
    for c in patched.columns:
        if c in aux:
            continue
        orig_val = (
            F.col("_orig")[c] if c in orig_cols else F.lit(None).cast(out_types[c])
        )
        value_exprs.append(
            F.when(F.col("_capped"), orig_val).otherwise(F.col(c)).alias(c)
        )
    new_rows = patched.filter(keep_row).select(F.col(key_col), *value_exprs)
    untargeted = base.join(
        F.broadcast(kdf.select(key_col)), key_col, "left_anti"
    )
    new_rows_types = dict(new_rows.dtypes)
    for c in new_rows.columns:
        if c not in untargeted.columns:
            untargeted = untargeted.withColumn(c, F.lit(None).cast(new_rows_types[c]))
    new_state = untargeted.unionByName(new_rows)

    applied = patched.filter(applied_pred)
    return PatchBatch(results, new_state, applied, patched, (patched0,))


@dataclass
class PatchEachBatch:
    """Result of :func:`patch_each_batch`: one status row per patch
    ENTRY, the full new state, and the mutated rows for event emission.
    ``unpersist()`` releases the internal cache once all three frames
    are consumed."""

    results: DataFrame
    new_state: DataFrame
    changed: DataFrame
    _cached: DataFrame

    def unpersist(self) -> None:
        self._cached.unpersist()


def patch_each_batch(
    spark,
    base: DataFrame,
    patches: Sequence[tuple],
    key_col: str = "key",
    body_col: str = "body",
    meta: Optional[PatchMeta] = None,
    now_us: Optional[int] = None,
    expired_col: str = "expired_at",
    cap=None,
) -> PatchEachBatch:
    """The ``PatchTreasures`` request's EXACT shape (proto:2996-3010
    ``TreasurePatch``) as a pure transformation: every patch entry
    carries its own key, op-list, optional condition and optional
    per-patch meta — ``patches`` is a sequence of ``(key, ops,
    condition)`` or ``(key, ops, condition, meta)``.

    Duplicate keys are allowed and run sequentially in declaration
    order (proto:2995-3001): a later patch on the same key observes
    the earlier patch's mutated body, so per-key conditions can
    implement the proto's partial-accept-counter pattern. A per-patch
    meta FULLY REPLACES the request-level ``meta`` for that patch
    (proto:3063-3070, no merging).

    ``cap`` is the REQUEST-LEVEL quota (proto:3020-3040). Adjudicated
    against the reference this round: ``TreasurePatch`` has NO per-patch
    Cap field (proto:3045-3067 — Key/Ops/Condition/Meta only); the one
    Cap on ``PatchTreasuresRequest`` spans the whole batch, and
    gateway_patch.go:78-105 pre-counts matching records ONCE, then
    threads one running ``budgetLeft`` through every sequential
    ``PatchFields`` call (swamp_patch.go:244-261):

    - only an accepted (non-matching → matching) patch decrements the
      budget; (yes→yes), (yes→no) and (no→no) always proceed, and a
      (yes→no) patch does NOT refund budget (the reference's only
      budget write is the decrement);
    - a (no→yes) patch with no budget left reports CAP_EXCEEDED and its
      entry mutates nothing — a LATER entry on the same key then
      observes the unchanged body (sequential feedback, which is why
      the duplicate-key path cannot reuse the request-order window of
      :func:`patch_treasures_batch`);
    - pre/post matching is evaluated on the key's LIVE body at that
      entry's turn — i.e. after every earlier accepted entry.

    Plan shape: entries split into rounds (round r = every key's r-th
    patch); within a round, keys sharing an identical (ops, condition,
    meta) spec compile into one chained-CASE branch, and each round is
    a single projection over the running frame — no join anywhere (key
    membership is a request-bounded ``isin``). With ``cap`` set, each
    round additionally runs ONE bounded probe (the round's keys only —
    a scan-side isin filter, output ≤ len(entries) rows) to collect the
    (cond, pre-match, post-match) bits, and the budget walk happens
    driver-side in entry order — O(request) work, never O(state); the
    pre-count is one scan-side aggregate, exactly like
    :func:`patch_treasures_batch`.

    Returns one result row PER PATCH ENTRY: ``(patch_index, key,
    patch_status)`` with statuses PATCHED / CONDITION_NOT_MET /
    CAP_EXCEEDED / KEY_NOT_FOUND (creation belongs to
    :func:`patch_treasures_batch`'s CreateIfNotExist)."""
    import time as _time

    if cap is not None and cap.max_matching <= 0:
        raise ValueError("Cap.max_matching must be > 0 (proto:3040)")

    now = int(now_us if now_us is not None else _time.time_ns() // 1_000)

    if not patches:
        empty = spark.createDataFrame(
            [], f"patch_index int, {key_col} string, patch_status string"
        )
        return PatchEachBatch(empty, base, base.limit(0), base.limit(0))

    # split entries into rounds: round r holds each key's r-th patch
    rounds: list[list[tuple]] = []  # [(idx, key, ops, cond, meta)]
    occurrence: dict[str, int] = {}
    all_keys: list[str] = []
    for idx, entry in enumerate(patches):
        k, ops, cond = entry[0], entry[1], entry[2]
        per_meta = entry[3] if len(entry) > 3 else None
        eff_meta = per_meta if per_meta is not None else meta
        r = occurrence.get(k, 0)
        occurrence[k] = r + 1
        if r == len(rounds):
            rounds.append([])
        rounds[r].append((idx, k, tuple(ops), cond, eff_meta))
        if r == 0:
            all_keys.append(k)

    def _keep(df, col_name: str, dtype: str):
        return (
            F.col(col_name) if col_name in df.columns else F.lit(None).cast(dtype)
        )

    key_c = F.col(key_col)

    def _group(entries):
        # keys sharing an identical (ops, cond, meta) spec compile into
        # one CASE branch; unhashable op values fall back to repr-based
        # grouping (same projection, keyed by the spec's printed form)
        grouped: dict = {}
        for idx, k, ops, cond, m in entries:
            spec = (ops, cond, m)
            try:
                grouped.setdefault(spec, (spec, []))[1].append(k)
            except TypeError:
                grouped.setdefault(repr(spec), (spec, []))[1].append(k)
        return list(grouped.values())

    groups_by_round = [_group(entries) for entries in rounds]

    def _round_exprs(out, r, capped_keys):
        """This round's chained-CASE expressions bound to ``out`` (the
        running frame = the prior round's output, so a repeated key's
        condition and pre-match observe the earlier patch — the proto's
        sequential-observation rule)."""
        capped_c = key_c.isin(list(capped_keys)) if capped_keys else F.lit(False)
        body_expr = F.col(body_col)
        status_expr = F.lit(None).cast("string")
        hit = F.lit(False)
        ua = _keep(out, "updated_at_us", "long")
        ub = _keep(out, "updated_by", "string")
        ex = _keep(out, expired_col, "timestamp")
        stamps_meta = False
        for (ops, cond, m), ks in groups_by_round[r]:
            member = key_c.isin(ks)
            patched = F.col(body_col)
            for op in ops:
                # row-gated: schema must stay uniform across rows
                patched = _apply_patch_op(patched, op, structural=False)
            c = translate(cond, out) if cond is not None else F.lit(True)
            applies = member & c & ~capped_c
            body_expr = F.when(applies, patched).otherwise(body_expr)
            status_expr = F.when(
                member,
                F.when(~c, F.lit(STATUS_CONDITION_NOT_MET))
                .when(capped_c, F.lit("CAP_EXCEEDED"))
                .otherwise(F.lit(STATUS_PATCHED)),
            ).otherwise(status_expr)
            hit = hit | applies
            if m is not None:
                stamps_meta = True
                if m.updated_at:
                    ua = F.when(applies, F.lit(now)).otherwise(ua)
                if m.updated_by is not None:
                    ub = F.when(applies, F.lit(m.updated_by)).otherwise(ub)
                if m.clear_expired_at:  # precedence (proto:3163)
                    ex = F.when(
                        applies, F.lit(None).cast("timestamp")
                    ).otherwise(ex)
                elif m.set_expired_at is not None:
                    ex = F.when(
                        applies,
                        F.timestamp_micros(F.lit(int(m.set_expired_at))),
                    ).otherwise(ex)
        return body_expr, status_expr, hit, ua, ub, ex, stamps_meta

    def _apply_round(out, r, capped_keys):
        body_expr, status_expr, hit, ua, ub, ex, stamps_meta = _round_exprs(
            out, r, capped_keys
        )
        idx_pairs = []
        for idx, k, _, _, _ in rounds[r]:
            idx_pairs += [F.lit(k), F.lit(idx)]
        cols = {
            body_col: body_expr,
            f"_status_{r}": status_expr,
            f"_idx_{r}": F.create_map(*idx_pairs)[key_c],
            f"_hit_{r}": hit,
        }
        if stamps_meta:
            cols["updated_at_us"] = ua
            cols["updated_by"] = ub
            cols[expired_col] = ex
        return out.withColumns(cols)

    capped: list[set] = [set() for _ in rounds]
    found: "set | None" = None

    if cap is not None:
        # capPreCount (gateway_patch.go:98-105): whole-swamp, once,
        # pre-mutation; one scan-side aggregate, broadcast onto the
        # probe rows below so it needs no job of its own
        budget_df = base.agg(
            F.greatest(
                F.lit(0),
                F.lit(int(cap.max_matching))
                - F.count_if(
                    F.coalesce(translate(cap.filter, base), F.lit(False))
                ),
            ).alias("_budget")
        )

        def _chain(upto):
            out = base
            for rr in range(upto):
                out = _apply_round(out, rr, capped[rr])
            return out

        def _probe_frame(r):
            """The (cond, pre, post) bits of round r's keys as a lazy
            frame, post-match on the candidate-patched row (meta stamps
            included, matching patch_treasures_batch). The isin filter
            rides the untouched key column down to the scan; output is
            <= len(rounds[r]) rows."""
            out_r = _chain(r)
            body_expr, status_expr, _, ua, ub, ex, stamps_meta = _round_exprs(
                out_r, r, ()
            )
            round_keys = [k for _, k, _, _, _ in rounds[r]]
            probe_cols = {
                "_cond_ok": F.coalesce(
                    status_expr == F.lit(STATUS_PATCHED), F.lit(False)
                ),
                "_pre": F.coalesce(translate(cap.filter, out_r), F.lit(False)),
                body_col: body_expr,
            }
            if stamps_meta:
                probe_cols["updated_at_us"] = ua
                probe_cols["updated_by"] = ub
                probe_cols[expired_col] = ex
            probe = out_r.filter(key_c.isin(round_keys)).withColumns(probe_cols)
            return probe.select(
                key_c.alias("_k"),
                "_cond_ok",
                "_pre",
                F.coalesce(
                    translate(cap.filter, probe), F.lit(False)
                ).alias("_post"),
            )

        def _probe(r):
            return {
                row["_k"]: (row["_cond_ok"], row["_pre"], row["_post"])
                for row in _probe_frame(r).collect()
            }

        # ONE upfront job for EVERY round's bits plus the budget (r16,
        # guide §1.2 fewer jobs; previously one pre-count job + one job
        # per round): the union is computed optimistically with NO
        # capped keys — valid because a probe row is only wrong for a
        # key one of whose EARLIER entries got capped, which is exactly
        # the staleness the walk below already tracks and lazily
        # re-probes.
        union = None
        for r in range(len(rounds)):
            pf = _probe_frame(r).withColumn("_round", F.lit(r))
            union = pf if union is None else union.unionByName(pf)
        probe_rows = union.crossJoin(F.broadcast(budget_df)).collect()
        probes: dict[int, dict] = {r: {} for r in range(len(rounds))}
        stale: dict[int, set] = {r: set() for r in range(len(rounds))}
        budget = None
        for row in probe_rows:
            probes[row["_round"]][row["_k"]] = (
                row["_cond_ok"], row["_pre"], row["_post"],
            )
            budget = row["_budget"]
        if budget is None:
            # every requested key is missing: no probe row carried the
            # broadcast budget — irrelevant to the walk (nothing can
            # spend), but keep the variable an int
            budget = 0
        budget = int(budget)
        # round-0 probes cover every key's first occurrence, so the
        # request's present-key set falls out of the same job
        found = set(probes[0])

        # Budget walk in GLOBAL entry order (gateway_patch.go threads
        # one budgetLeft through the patches loop) — NOT round order:
        # round r of one key can precede round r-1 entries of another
        # key in the request. An entry's bits depend only on its OWN
        # key's earlier decisions (always at smaller indices), so a
        # round's probe stays valid for a key until one of that key's
        # earlier entries gets capped — then just that round re-probes
        # (re-probes are bounded by the number of cap rejections that
        # precede same-key later entries; typically zero).
        flat = sorted(
            (idx, k, r)
            for r, ents in enumerate(rounds)
            for idx, k, _, _, _ in ents
        )
        for idx, k, r in flat:
            if k in stale[r]:
                probes[r] = _probe(r)
                stale[r] = set()
            bits = probes[r].get(k)
            if bits is None:
                continue  # missing key -> KEY_NOT_FOUND, no cap check
            cond_ok, pre, post = bits
            if cond_ok and not pre and post:
                if budget > 0:
                    budget -= 1  # accepted (no->yes) spends; never refunded
                else:
                    capped[r].add(k)
                    for r2 in stale:
                        if r2 > r:
                            stale[r2].add(k)

    out = base
    for r in range(len(rounds)):
        out = _apply_round(out, r, capped[r])
    any_patched_cols = [f"_hit_{r}" for r in range(len(rounds))]

    aux = [
        c
        for r in range(len(rounds))
        for c in (f"_status_{r}", f"_idx_{r}", f"_hit_{r}")
    ]
    out = out.cache()
    if found is None:
        # the present-key collect IS the cache-fill action (one job;
        # bounded by len(patches)) — the cap path already knows the
        # set from its probe job and only needs the fill
        found = {
            row[0]
            for row in out.filter(key_c.isin(all_keys))
            .select(key_col)
            .collect()
        }
    else:
        out.count()

    per_round = [
        out.filter(F.col(f"_status_{r}").isNotNull()).select(
            F.col(f"_idx_{r}").alias("patch_index"),
            key_c,
            F.col(f"_status_{r}").alias("patch_status"),
        )
        for r in range(len(rounds))
    ]
    results = per_round[0]
    for p in per_round[1:]:
        results = results.unionByName(p)
    nf = [
        (idx, k)
        for r_entries in rounds
        for idx, k, _, _, _ in r_entries
        if k not in found
    ]
    if nf:
        results = results.unionByName(
            spark.createDataFrame(
                [(idx, k, "KEY_NOT_FOUND") for idx, k in nf],
                f"patch_index int, {key_col} string, patch_status string",
            )
        )

    new_state = out.drop(*aux)
    hit_any = F.lit(False)
    for c in any_patched_cols:
        hit_any = hit_any | F.col(c)
    changed = out.filter(hit_any)
    return PatchEachBatch(results, new_state, changed, out)


# ---------------------------------------------------------------------------
# Uint32Slice set-valued cell ops (proto:378-418)


def uint32slice_push(base: DataFrame, values: Sequence[int], ids_col: str = "ids") -> DataFrame:
    """Push with auto-dedup (proto:960-964: set semantics)."""
    lits = F.array(*[F.lit(int(v)) for v in values]).cast("array<bigint>")
    return base.withColumn(ids_col, F.array_distinct(F.concat(F.col(ids_col), lits)))


def uint32slice_delete(base: DataFrame, values: Sequence[int], ids_col: str = "ids") -> DataFrame:
    """Delete; missing values ignored."""
    lits = F.array(*[F.lit(int(v)) for v in values]).cast("array<bigint>")
    return base.withColumn(ids_col, F.array_except(F.col(ids_col), lits))


def uint32slice_size(base: DataFrame, ids_col: str = "ids") -> Column:
    return F.size(F.col(ids_col))


def uint32slice_is_value_exist(base: DataFrame, value: int, ids_col: str = "ids") -> Column:
    return F.array_contains(F.col(ids_col), F.lit(int(value)).cast("bigint"))
