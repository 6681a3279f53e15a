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


# ---------------------------------------------------------------------------
# Cross-process backend


class FileLeaseLockManager:
    """Cross-PROCESS business locks behind the same interface as
    :class:`LockManager` — the reference contract is cross-client
    (``proto/hydraide.proto:14-31``, docs/features/built-in-business-
    lock.md), so the driver-local manager alone under-delivers on
    multi-driver deployments. This backend keeps every state
    transition on a shared filesystem:

    - a per-key **meta file** serializes transitions via ``flock`` —
      advisory, cross-process, and released by the KERNEL if a holder
      dies mid-section (no stuck mutex from a crash);
    - a per-key **lease file** holds ``{lock_id, expires_at}``; expiry
      is enforced LAZILY by wall clock at acquire/unlock, so a crashed
      holder's lease is simply overtaken once stale (the watchdog
      semantics without a watchdog process) and a post-expiry
      ``unlock`` raises exactly like the in-process TTL path;
    - a per-key **ticket directory** provides FIFO fairness: waiters
      enqueue ``<time_ns>-<uuid>`` tickets and only the lexicographic
      head may take the lease. Waiters touch their ticket every poll;
      tickets not refreshed for ``stale_sec`` (a dead waiter) are
      skipped and garbage-collected so a crash cannot head-block the
      queue.

    Single-writer NFS-style caveats apply as with any file lease; on
    object stores front it with a conditional-put (the interface is
    the contract, exactly as the module docstring says).
    """

    def __init__(self, root: str, poll_sec: float = 0.02, stale_sec: float = 2.0):
        import os

        self._root = root
        self._poll = poll_sec
        self._stale = stale_sec
        os.makedirs(root, exist_ok=True)

    # -- internals ---------------------------------------------------------

    def _paths(self, key: str):
        import hashlib
        import os

        h = hashlib.sha256(key.encode()).hexdigest()[:24]
        return (
            os.path.join(self._root, f"{h}.mu"),
            os.path.join(self._root, f"{h}.lease"),
            os.path.join(self._root, f"{h}.q"),
        )

    class _Flock:
        def __init__(self, path: str):
            self._path = path

        def __enter__(self):
            import fcntl
            import os

            self._fd = os.open(self._path, os.O_CREAT | os.O_RDWR, 0o644)
            fcntl.flock(self._fd, fcntl.LOCK_EX)
            return self

        def __exit__(self, *exc):
            import fcntl
            import os

            fcntl.flock(self._fd, fcntl.LOCK_UN)
            os.close(self._fd)
            return False

    def _critical(self, path: str):
        """Context manager serializing this key's state transitions.
        The base backend uses ``flock`` (kernel-released on crash);
        :class:`CasLeaseLockManager` overrides this with an atomic
        create-excl marker for filesystems/stores where flock does not
        coordinate across hosts."""
        return self._Flock(path)

    @staticmethod
    def _read_lease(path: str):
        import json

        try:
            with open(path) as f:
                return json.load(f)
        except (FileNotFoundError, ValueError):
            return None

    def _live_head(self, qdir: str, now: float) -> Optional[str]:
        """Oldest ticket refreshed within stale_sec; reaps dead ones."""
        import os

        try:
            names = sorted(os.listdir(qdir))
        except FileNotFoundError:
            return None
        for name in names:
            p = os.path.join(qdir, name)
            try:
                if now - os.stat(p).st_mtime > self._stale:
                    os.unlink(p)  # dead waiter: never head-block the queue
                    continue
            except FileNotFoundError:
                continue
            return name
        return None

    # -- API (reference Lock/Unlock) ---------------------------------------

    def lock(
        self, key: str, ttl_sec: float, timeout: Optional[float] = None
    ) -> Optional[str]:
        """Blocking FIFO acquire across processes. Returns the LockID,
        or None if ``timeout`` elapsed first (ticket withdrawn)."""
        import json
        import os
        import time

        mu, lease, qdir = self._paths(key)
        os.makedirs(qdir, exist_ok=True)
        lock_id = uuid.uuid4().hex
        ticket = f"{time.time_ns():020d}-{lock_id}"
        tpath = os.path.join(qdir, ticket)
        with open(tpath, "w"):
            pass
        deadline = None if timeout is None else time.monotonic() + timeout
        try:
            while True:
                with self._critical(mu):
                    now = time.time()
                    try:
                        os.utime(tpath)  # heartbeat: we are a live waiter
                    except FileNotFoundError:
                        # a peer reaped our ticket (we were starved of
                        # the flock past stale_sec — heavy contention,
                        # slow FS, or a clock jump): re-enqueue at the
                        # tail instead of crashing; FIFO position is
                        # lost, liveness is kept
                        ticket = f"{time.time_ns():020d}-{lock_id}"
                        tpath = os.path.join(qdir, ticket)
                        with open(tpath, "w"):
                            pass
                    if self._live_head(qdir, now) == ticket:
                        cur = self._read_lease(lease)
                        if cur is None or cur["expires_at"] <= now:
                            with open(lease, "w") as f:
                                json.dump(
                                    {"lock_id": lock_id, "expires_at": now + ttl_sec},
                                    f,
                                )
                            os.unlink(tpath)
                            return lock_id
                if deadline is not None and time.monotonic() >= deadline:
                    with self._critical(mu):
                        try:
                            os.unlink(tpath)
                        except FileNotFoundError:
                            pass
                    return None
                time.sleep(self._poll)
        except BaseException:
            try:
                os.unlink(tpath)
            except FileNotFoundError:
                pass
            raise

    def unlock(self, key: str, lock_id: str) -> None:
        """Release; the (key, LockID) pair must name the CURRENT,
        UNEXPIRED holder or the call fails (proto:26-27) — a lease past
        its TTL is already logically released even before a successor
        overtakes it."""
        import os
        import time

        mu, lease, _ = self._paths(key)
        with self._critical(mu):
            cur = self._read_lease(lease)
            if (
                cur is None
                or cur["lock_id"] != lock_id
                or cur["expires_at"] <= time.time()
            ):
                raise KeyError(
                    f"no active lock for key={key!r} with that LockID "
                    f"(wrong id, or TTL already released it)"
                )
            os.unlink(lease)

    def holder(self, key: str) -> Optional[str]:
        """Current unexpired holder's LockID (observability)."""
        import time

        mu, lease, _ = self._paths(key)
        with self._critical(mu):
            cur = self._read_lease(lease)
            if cur is None or cur["expires_at"] <= time.time():
                return None
            return cur["lock_id"]


class CasLeaseLockManager(FileLeaseLockManager):
    """Cross-HOST business locks: the same lease/ticket state machine
    as :class:`FileLeaseLockManager`, with the per-key critical section
    serialized by an atomic CREATE-EXCL marker file instead of
    ``flock``. flock coordinates only through one kernel and is
    advisory-broken on many NFS deployments; the primitives used here —
    exclusive create, rename, unlink — are atomic on NFS v3+ and map
    1:1 onto conditional writes elsewhere (object-store conditional put
    / If-None-Match, DynamoDB conditional expressions, a store-versioned
    CAS row), so the identical state machine runs anywhere the path is
    shared, which is the reference's cross-client contract
    (``proto/hydraide.proto:14-31``).

    Crash recovery: a process dying inside the (milliseconds-long)
    critical section leaves the marker file; any waiter breaks it after
    ``mutex_stale_sec`` via a single-winner atomic rename-steal — the
    lazy analogue of the kernel releasing a dead holder's flock. The
    marker carries its owner's nonce, and release only unlinks a marker
    it still owns, so a stolen marker cannot take the thief's section
    down with it. Do not mix flock and CAS managers on one root: they
    would serialize against different primitives.
    """

    def __init__(
        self,
        root: str,
        poll_sec: float = 0.02,
        stale_sec: float = 2.0,
        mutex_stale_sec: float = 10.0,
    ):
        super().__init__(root, poll_sec=poll_sec, stale_sec=stale_sec)
        self._mutex_stale = mutex_stale_sec

    class _CasMutex:
        def __init__(self, path: str, stale_sec: float, poll_sec: float = 0.002):
            self._path = path
            self._stale = stale_sec
            self._poll = poll_sec
            self._nonce = uuid.uuid4().hex

        def __enter__(self):
            import os
            import time

            while True:
                try:
                    fd = os.open(
                        self._path, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644
                    )
                    try:
                        os.write(fd, self._nonce.encode())
                    finally:
                        os.close(fd)
                    return self
                except FileExistsError:
                    try:
                        age = time.time() - os.stat(self._path).st_mtime
                    except FileNotFoundError:
                        continue  # freed between open and stat: retry now
                    if age > self._stale:
                        # dead owner: single-winner steal — rename is
                        # atomic, the losers' rename raises ENOENT.
                        # Post-rename age re-check: between our stat and
                        # rename the dead marker can be released and a
                        # FRESH owner's marker created; stealing that
                        # would strip a live owner — put it back if the
                        # path is still free (create-excl, never a
                        # clobbering rename-back). Residual window, by
                        # design: if a third waiter creates its marker
                        # between our rename and the restore, the
                        # displaced fresh owner stays displaced (same
                        # outcome as a legitimate staleness steal — its
                        # release sees the mismatch and leaves the new
                        # marker alone). File primitives can narrow but
                        # not close this; closing it needs a compare-
                        # and-swap store (the CasLeaseLockManager
                        # docstring's conditional-put mapping).
                        stale = f"{self._path}.stale-{uuid.uuid4().hex}"
                        try:
                            os.rename(self._path, stale)
                            if time.time() - os.stat(stale).st_mtime > self._stale:
                                os.unlink(stale)
                            else:
                                self._restore(stale)
                        except FileNotFoundError:
                            pass
                        continue
                    time.sleep(self._poll)

        def _restore(self, private_path: str) -> None:
            """Undo a mistaken rename-away: re-create the shared marker
            with the displaced owner's content IF the path is still
            free. If a third process claimed the path meanwhile, the
            displaced owner is treated as stolen (its release will see
            a nonce mismatch and leave the thief's marker alone) — the
            same outcome a legitimate staleness steal produces."""
            import os

            try:
                with open(private_path, "rb") as f:
                    content = f.read()
                fd = os.open(
                    self._path, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644
                )
                try:
                    os.write(fd, content)
                finally:
                    os.close(fd)
            except (FileExistsError, FileNotFoundError):
                pass
            finally:
                try:
                    os.unlink(private_path)
                except FileNotFoundError:
                    pass

        def __exit__(self, *exc):
            import os

            # Single-winner release (mirrors the steal): read-then-
            # unlink on the SHARED path is not atomic — between reading
            # our own nonce and unlinking, a peer can stale-steal the
            # marker and a new owner can create a fresh one; the unlink
            # would then delete the NEW owner's marker and let a third
            # process into the critical section. Instead: check
            # ownership, then rename to a private name (atomic; raises
            # ENOENT if already stolen), re-verify the nonce on the
            # renamed file, and only then unlink. A mismatch after the
            # rename (we displaced a brand-new owner in the microsecond
            # window) is undone via create-excl restore.
            try:
                with open(self._path) as f:
                    if f.read() != self._nonce:
                        return False  # stolen: the thief owns the marker
                rel = f"{self._path}.rel-{self._nonce}"
                os.rename(self._path, rel)
                with open(rel) as f:
                    if f.read() == self._nonce:
                        os.unlink(rel)
                    else:
                        self._restore(rel)
            except FileNotFoundError:
                pass
            return False

    def _critical(self, path: str):
        return self._CasMutex(path + ".cas", self._mutex_stale)
