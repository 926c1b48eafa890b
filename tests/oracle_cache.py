"""Content-addressed cache for the scalar oracle (VERDICT r4 item 7).

The oracle (tests/scalar_ref.py, a literal transcription of renderer.cl)
costs ~0.1-0.2 s/pixel in pure Python on this 1-core host, and the parity
suite evaluates ~1500 fixed, fully deterministic pixels — recomputing
identical values every run is what made the full suite 30+ minutes (so it
rarely ran: the incentive problem the VERDICT flags). This wraps a Scene
with a cache keyed by SHA-256 over EVERYTHING that determines the output:
the opts dict (array bytes + scalars), volume bytes, MC table bytes, and
pixel id. Any change to scene inputs misses the cache; the oracle CODE
itself hashes in via scalar_ref.py's file bytes, so editing the oracle
invalidates every entry.

Set ORACLE_CACHE=0 to bypass (full recompute, e.g. for release audits).
The cache file (tests/goldens/oracle_cache.npz) is committed; stale
entries are pruned on save.
"""

import atexit
import hashlib
import os

import numpy as np

_PATH = os.path.join(os.path.dirname(__file__), "goldens", "oracle_cache.npz")
_ENABLED = os.environ.get("ORACLE_CACHE", "1") != "0"

with open(os.path.join(os.path.dirname(__file__), "scalar_ref.py"), "rb") as f:
    _ORACLE_CODE_HASH = hashlib.sha256(f.read()).hexdigest()[:16]

_cache = {}
_touched = set()
_dirty = False
if _ENABLED and os.path.exists(_PATH):
    try:
        with np.load(_PATH) as z:
            _cache = {k: z[k] for k in z.files}
    except Exception:
        _cache = {}


def _save():
    if not _dirty:
        return
    os.makedirs(os.path.dirname(_PATH), exist_ok=True)
    # prune entries not touched this run only when the oracle hash rolled
    # (otherwise partial runs would evict other tests' entries)
    live = {k: v for k, v in _cache.items()
            if k in _touched or k.startswith(_ORACLE_CODE_HASH)}
    np.savez_compressed(_PATH, **live)


atexit.register(_save)


def _hash_dict(d):
    h = hashlib.sha256()
    for k in sorted(d):
        v = d[k]
        h.update(k.encode())
        if isinstance(v, np.ndarray):
            h.update(str(v.dtype).encode())
            h.update(str(v.shape).encode())
            h.update(v.tobytes())
        else:
            h.update(repr(v).encode())
    return h


class CachedScene:
    """Drop-in for scalar_ref.Scene: render_pixel(pid) with caching."""

    def __init__(self, scene_cls, opts_dict, vol, table):
        self._scene = None
        self._mk = lambda: scene_cls(opts_dict, vol, table)
        h = _hash_dict(opts_dict)
        vol = np.asarray(vol)
        table = np.asarray(table)
        h.update(vol.tobytes())
        h.update(str(vol.shape).encode())
        h.update(table.tobytes())
        self._base = _ORACLE_CODE_HASH + h.hexdigest()[:24]

    def render_pixel(self, pid):
        global _dirty
        key = f"{self._base}/{int(pid)}"
        if _ENABLED and key in _cache:
            _touched.add(key)
            return _cache[key]
        if self._scene is None:
            self._scene = self._mk()
        val = np.asarray(self._scene.render_pixel(pid))
        if _ENABLED:
            _cache[key] = val
            _touched.add(key)
            _dirty = True
        return val
