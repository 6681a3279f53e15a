"""Business-level locks: the reference's ``Lock``/``Unlock`` RPC pair
(``proto/hydraide.proto:14-31,658-687``; ``app/core/hydra/lock/
lock.go``) — per-key FIFO queues, blocking acquire, TTL auto-release,
and LockID tokens that must match on release.

These are COORDINATION primitives, not data-path operators: the
reference uses them to serialize business flows (e.g. "one crawler per
domain") across clients. The engine analogue is a driver-side manager
with identical semantics; on a multi-driver deployment the same
interface fronts an external coordinator (a Delta/JDBC lock table or
ZooKeeper) — the CONTRACT (FIFO fairness, TTL deadline, token-checked
release) is what this module pins, and what the tests prove.

Semantics matched to the reference:

- ``lock`` blocks until the caller reaches the HEAD of the key's FIFO
  queue (lock.go:14-21 "queues requests based on a unique key"), or
  until ``timeout`` (the gRPC context deadline analogue) — then it
  returns None and leaves the queue.
- The returned LockID is required by ``unlock``; a stale or wrong id
  fails (proto:26-27), including after a TTL auto-release.
- TTL expiry releases the lock automatically and promotes the next
  waiter (proto:30, lock.go's auto-unlock watchdog).
"""

from __future__ import annotations

import threading
import uuid
from collections import deque
from typing import Optional


class _Caller:
    __slots__ = ("lock_id", "ready", "timer")

    def __init__(self):
        self.lock_id = uuid.uuid4().hex
        self.ready = threading.Event()
        self.timer: Optional[threading.Timer] = None


class LockManager:
    """Per-key FIFO business locks with TTL auto-release."""

    def __init__(self):
        self._mu = threading.Lock()
        self._queues: dict[str, deque[_Caller]] = {}

    # -- internals ---------------------------------------------------------

    def _promote_head_locked(self, key: str) -> None:
        """Wake the queue head and arm its TTL watchdog. Caller holds
        the mutex."""
        q = self._queues.get(key)
        if not q:
            self._queues.pop(key, None)
            return
        head = q[0]
        if not head.ready.is_set():
            head.ready.set()

    def _arm_ttl(self, key: str, caller: _Caller, ttl_sec: float) -> None:
        def expire():
            # auto-release IF this caller still holds the lock
            with self._mu:
                q = self._queues.get(key)
                if q and q[0] is caller:
                    q.popleft()
                    self._promote_head_locked(key)
                    if not q:
                        self._queues.pop(key, None)

        caller.timer = threading.Timer(ttl_sec, expire)
        caller.timer.daemon = True
        caller.timer.start()

    # -- API (reference Lock/Unlock) ---------------------------------------

    def lock(
        self, key: str, ttl_sec: float, timeout: Optional[float] = None
    ) -> Optional[str]:
        """Blocking FIFO acquire. Returns the LockID, or None if
        ``timeout`` elapsed first (the caller is removed from the
        queue, like a cancelled gRPC context)."""
        me = _Caller()
        with self._mu:
            q = self._queues.setdefault(key, deque())
            q.append(me)
            if q[0] is me:
                me.ready.set()
        if not me.ready.wait(timeout):
            with self._mu:
                q = self._queues.get(key)
                if q is not None and me in q:
                    was_head = q[0] is me
                    q.remove(me)
                    if was_head:
                        self._promote_head_locked(key)
                    if not q:
                        self._queues.pop(key, None)
                    return None
                # we became head in the race window between wait timeout
                # and taking the mutex: we DID acquire — fall through
        with self._mu:
            self._arm_ttl(key, me, ttl_sec)
        return me.lock_id

    def unlock(self, key: str, lock_id: str) -> None:
        """Release; the (key, LockID) pair must name the CURRENT holder
        or the call fails (proto:26-27) — including after the TTL
        watchdog already freed it."""
        with self._mu:
            q = self._queues.get(key)
            if not q or q[0].lock_id != lock_id:
                raise KeyError(
                    f"no active lock for key={key!r} with that LockID "
                    f"(wrong id, or TTL already released it)"
                )
            holder = q.popleft()
            if holder.timer is not None:
                holder.timer.cancel()
            self._promote_head_locked(key)
            if not q:
                self._queues.pop(key, None)

    def holder(self, key: str) -> Optional[str]:
        """Current holder's LockID (observability; not in the RPC
        surface)."""
        with self._mu:
            q = self._queues.get(key)
            return q[0].lock_id if q else None
