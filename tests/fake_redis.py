"""Minimal in-repo fake of the redis-py surface RedisJobStore/KV use.

No redis daemon or redis-py ships in this image, so the Redis backends are
exercised against this fake (same command semantics incl. WATCH/MULTI
optimistic transactions with version checking)."""
from __future__ import annotations

import threading


class WatchError(Exception):
    pass


class FakeRedis:
    def __init__(self):
        self._data: dict[str, str] = {}
        self._zsets: dict[str, dict[str, float]] = {}
        self._versions: dict[str, int] = {}
        self._lock = threading.RLock()

    # -- basics ---------------------------------------------------------
    def ping(self):
        return True

    def get(self, key):
        with self._lock:
            return self._data.get(key)

    def mget(self, keys):
        with self._lock:
            return [self._data.get(k) for k in keys]

    def set(self, key, value):
        with self._lock:
            self._data[key] = value
            self._versions[key] = self._versions.get(key, 0) + 1
        return True

    def setex(self, key, ttl, value):
        return self.set(key, value)

    def delete(self, *keys):
        with self._lock:
            n = 0
            for k in keys:
                if k in self._data:
                    del self._data[k]
                    self._versions[k] = self._versions.get(k, 0) + 1
                    n += 1
            return n

    # -- sorted sets ------------------------------------------------------
    def zadd(self, key, mapping):
        with self._lock:
            self._zsets.setdefault(key, {}).update(mapping)

    def zrange(self, key, start, stop):
        with self._lock:
            members = sorted(
                self._zsets.get(key, {}).items(), key=lambda kv: (kv[1], kv[0])
            )
            ids = [m for m, _ in members]
            stop = len(ids) if stop == -1 else stop + 1
            return ids[start:stop]

    def zrem(self, key, member):
        with self._lock:
            self._zsets.get(key, {}).pop(member, None)

    # -- pipeline / transactions -----------------------------------------
    def pipeline(self):
        return FakePipeline(self)


class FakePipeline:
    def __init__(self, r: FakeRedis):
        self._r = r
        self._watched: dict[str, int] = {}
        self._queued: list = []
        self._in_multi = False

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def watch(self, *keys):
        for k in keys:
            self._watched[k] = self._r._versions.get(k, 0)

    def unwatch(self):
        self._watched.clear()

    def get(self, key):  # immediate mode (pre-multi), like redis-py
        return self._r.get(key)

    def multi(self):
        self._in_multi = True
        self._queued = []

    def set(self, key, value):
        assert self._in_multi
        self._queued.append(("set", key, value))

    def execute(self):
        with self._r._lock:
            for k, v in self._watched.items():
                if self._r._versions.get(k, 0) != v:
                    self._watched.clear()
                    self._in_multi = False
                    raise WatchError(f"watched key {k} changed")
            for op, key, value in self._queued:
                self._r.set(key, value)
        self._watched.clear()
        self._in_multi = False
        return []
