"""Business locks (reference Lock/Unlock, proto:14-31,658-687;
lock.go FIFO queues): fairness order, token-checked release, TTL
auto-release, and acquire timeouts."""

from __future__ import annotations

import threading
import time

import pytest

from hydraide_spark.operators.locks import LockManager


def test_fifo_fairness_under_contention():
    lm = LockManager()
    order: list[int] = []
    first = lm.lock("k", ttl_sec=30)
    started = []

    def worker(i):
        started.append(i)
        lid = lm.lock("k", ttl_sec=30)
        order.append(i)
        lm.unlock("k", lid)

    threads = []
    for i in range(4):
        t = threading.Thread(target=worker, args=(i,))
        threads.append(t)
        t.start()
        while len(started) <= i:  # enqueue strictly in i order
            time.sleep(0.005)
        time.sleep(0.03)
    lm.unlock("k", first)
    for t in threads:
        t.join(timeout=10)
    assert order == [0, 1, 2, 3], f"queue is not FIFO: {order}"


def test_unlock_requires_matching_lock_id():
    lm = LockManager()
    lid = lm.lock("res", ttl_sec=30)
    with pytest.raises(KeyError):
        lm.unlock("res", "not-the-token")
    with pytest.raises(KeyError):
        lm.unlock("other-key", lid)
    lm.unlock("res", lid)  # correct pair succeeds
    with pytest.raises(KeyError):
        lm.unlock("res", lid)  # double release fails


def test_ttl_auto_release_promotes_next_and_invalidates_token():
    lm = LockManager()
    lid = lm.lock("k", ttl_sec=0.2)
    got = {}

    def waiter():
        got["lid"] = lm.lock("k", ttl_sec=30, timeout=5)

    t = threading.Thread(target=waiter)
    t.start()
    t.join(timeout=10)
    # the TTL watchdog freed the first lock and promoted the waiter
    assert got["lid"] is not None
    # the expired holder's token is no longer valid (proto:26-30)
    with pytest.raises(KeyError):
        lm.unlock("k", lid)
    lm.unlock("k", got["lid"])


def test_acquire_timeout_leaves_queue_clean():
    lm = LockManager()
    lid = lm.lock("k", ttl_sec=30)
    assert lm.lock("k", ttl_sec=30, timeout=0.1) is None
    # the timed-out waiter left the queue: releasing the holder leaves
    # the key free, and a fresh acquire succeeds instantly
    lm.unlock("k", lid)
    lid2 = lm.lock("k", ttl_sec=30, timeout=0.1)
    assert lid2 is not None
    lm.unlock("k", lid2)
    assert lm.holder("k") is None


def test_independent_keys_do_not_contend():
    lm = LockManager()
    a = lm.lock("a", ttl_sec=30)
    b = lm.lock("b", ttl_sec=30, timeout=0.5)
    assert a and b
    lm.unlock("a", a)
    lm.unlock("b", b)
