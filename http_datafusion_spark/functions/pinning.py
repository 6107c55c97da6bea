"""``pin(df)`` — the repo's single frame-materialization primitive.

Every multi-consumer BOUNDED frame in the registry is pinned so its
plan stops re-deriving the fact scan per consumer (the r14/r15
scan-audit remediation). Until r16 each site spelled the idiom raw
(``.localCheckpoint(eager=True)``); this module centralizes it behind
one name so (a) the checkpoint-inventory test derives the live
call-site count (the only canonical number — don't restate it here),
and (b) the CLUSTER story is a config switch instead of a
per-site rewrite.

Cluster story (the r15 verdict's structural note): a local checkpoint
is **executor-local and non-replicated** — it severs lineage, so an
executor loss kills the job instead of recomputing. Locally (one JVM,
the test/bench environment) that is free determinism; on a 1000-executor
cluster you want one of:

- ``spark.http_datafusion.pin.mode=persist`` — replicated, spill-friendly
  ``MEMORY_AND_DISK_2`` persist. Lineage is KEPT (recoverable: a lost
  replica recomputes), at the cost of plan-depth growth across
  iterative loops (the reason localCheckpoint was chosen locally).
- ``spark.http_datafusion.pin.mode=reliable`` — a reliable
  ``df.checkpoint()`` into ``spark.http_datafusion.pin.dir`` (HDFS/S3):
  lineage severed AND replicated by the filesystem; survives executor
  loss. The right choice for the long iterative contractions
  (connected components / LPA) at 100k-task scale.

Per-site escape hatches:

- ``storage=`` overrides the storage level in local/persist modes —
  e.g. ``StorageLevel.DISK_ONLY`` for the biggest LPA round frames,
  whose eager MEMORY_AND_DISK blocks competed with aggregation memory
  in one unified pool and OOM'd the sf25 modularity probe below 48 g
  (BASELINE r15; the r16 fix).
- ``fact_scale=True`` declares the frame proportional to a FACT table
  (not a bounded aggregate). Fact-scale frames are never
  local-checkpointed: unreplicated executor storage of a fact is both
  a memory cliff and an availability bug (r15 ADVICE on
  events_ks_two_sample). They get a lineage-recoverable
  ``MEMORY_AND_DISK`` persist in every mode instead.

Call style: ``df.transform(pin)`` (chain-preserving), or
``df.transform(pin, storage=...)`` / ``pin(df)`` directly.

Lifecycle (r17 verdict, What's-wrong #2): a pin's storage outlives the
query that created it — nothing unpersists a localCheckpoint's blocks
or a persist's cache except driver GC + ContextCleaner, whose timing
is a JVM-GC accident (``spark.cleaner.periodicGC.interval`` defaults
to 30 MINUTES). In a long-lived service session executing hundreds of
pin-bearing queries, executor storage grows until a GC cycle happens
to run. ``pin_scope()`` bounds that: harness code wraps each query
execution (plan build + action) in a scope, and on scope exit every
pin created inside it is unpersisted immediately. Tracking is OPT-IN —
``pin()`` outside any scope behaves exactly as before (GC-reclaimed),
so library consumers that hold pinned frames across calls are
unaffected. Scopes are thread-local: concurrent service threads each
release only their own query's pins (releasing another in-flight
query's local checkpoint would kill it — lineage is severed).
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

PIN_MODE_KEY = "spark.http_datafusion.pin.mode"  # local | persist | reliable
PIN_DIR_KEY = "spark.http_datafusion.pin.dir"  # reliable-mode checkpoint dir

_SCOPES = threading.local()


def _scope_stack() -> list:
    stack = getattr(_SCOPES, "stack", None)
    if stack is None:
        stack = _SCOPES.stack = []
    return stack


def _track(release) -> None:
    stack = _scope_stack()
    if stack:
        stack[-1].append(release)


def _persist_release(df: DataFrame):
    def release() -> None:
        df.unpersist(blocking=False)

    return release


def _checkpoint_release(df: DataFrame):
    # A checkpointed Dataset's logical plan IS the RDD leaf (LogicalRDD);
    # capture the JVM RDD now — DataFrame.unpersist goes through the
    # CacheManager and cannot see checkpoint blocks.
    jrdd = df._jdf.queryExecution().logical().rdd()

    def release() -> None:
        jrdd.unpersist(False)

    return release


@contextmanager
def pin_scope():
    """Release every pin created (by this thread) inside the ``with``
    block when it exits — AFTER the consuming action has run.

    Releasing is best-effort: the query's results are already out when
    the scope exits, so a failed unpersist (stopped session, lost
    executor) logs nothing and raises nothing — the blocks fall back to
    the pre-scope GC + ContextCleaner path. Reliable-mode pins
    (``df.checkpoint()`` files) are not tracked: their storage is
    filesystem-managed (``spark.cleaner.referenceTracking.
    cleanCheckpoints`` reclaims on GC), and deleting files under a
    frame someone may still hold is not this scope's call."""
    stack = _scope_stack()
    entries: list = []
    stack.append(entries)
    try:
        yield
    finally:
        stack.pop()
        for release in reversed(entries):
            try:
                release()
            except Exception:  # noqa: BLE001 — best-effort cleanup only
                pass


def pin(
    df: DataFrame,
    *,
    storage: StorageLevel | None = None,
    fact_scale: bool = False,
    eager: bool = False,
) -> DataFrame:
    """Materialize ``df`` once so every downstream consumer reads the
    stored frame instead of re-deriving its lineage.

    Default (mode ``local``) is an eager ``localCheckpoint`` — identical
    behavior to the pre-r16 raw idiom, byte-for-byte the same plans
    (the adoption was verified scan-audit-histogram-identical). See the
    module docstring for the cluster modes and the per-site knobs.

    ``eager=True`` guarantees the frame is FULLY materialized before
    this call returns in EVERY mode. Persist-based paths (mode
    ``persist``, and ``fact_scale=True`` in any mode) are otherwise
    lazy — callers that delete the source files right after pinning
    (the streaming scratch-dir reclaims) would hand back a frame whose
    first action reads already-deleted inputs. Those read-then-delete
    sites must pass ``eager=True``.
    """
    if fact_scale:
        # Lineage-recoverable in every mode: a fact-sized frame must
        # never sit solely in unreplicated executor storage.
        out = df.persist(storage or StorageLevel.MEMORY_AND_DISK)
        if eager:
            out.count()
        _track(_persist_release(out))
        return out
    mode = df.sparkSession.conf.get(PIN_MODE_KEY, "local")
    if mode == "local":
        out = df.localCheckpoint(eager=True, storageLevel=storage)
        _track(_checkpoint_release(out))
        return out
    if mode == "persist":
        out = df.persist(storage or StorageLevel.MEMORY_AND_DISK_2)
        if eager:
            out.count()
        _track(_persist_release(out))
        return out
    if mode == "reliable":
        spark = df.sparkSession
        ckdir = spark.conf.get(PIN_DIR_KEY, None)
        if ckdir:
            spark.sparkContext.setCheckpointDir(ckdir)
        elif spark.sparkContext.getCheckpointDir() is None:
            raise ValueError(
                f"{PIN_MODE_KEY}=reliable requires a checkpoint directory: "
                f"set {PIN_DIR_KEY} (or SparkContext.setCheckpointDir)"
            )
        return df.checkpoint(eager=True)
    raise ValueError(
        f"{PIN_MODE_KEY}={mode!r}: expected 'local', 'persist', or 'reliable'"
    )
