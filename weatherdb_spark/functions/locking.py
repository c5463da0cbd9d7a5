"""Pluggable warehouse-mutex backends for :meth:`Broker.activate`.

The default backend is an ``O_EXCL`` lock file — atomic on every POSIX
filesystem, which covers local disks and NFS4+. On S3-class object
stores a bare file create is NOT a mutex (two writers can both "win"
the PUT race), so the backend is a three-method interface a deployment
can swap for a conditional-put / lease / catalog-transaction
implementation (S3 conditional writes with If-None-Match, a DynamoDB
or etcd lease, a Hive/Glue lock manager, ...). The broker resolves the
backend from the ``[engine] lock_backend`` user-config knob:

- ``posix`` (default) — :class:`PosixExclLockBackend`.
- ``package.module:attr`` — imported; the attribute is either a
  ready :class:`LockBackend` instance or a zero-arg factory returning
  one. This is how a cluster deployment plugs its store-native lock
  without forking the broker.

Reference parity: the reference serializes brokers through a
``broker_active`` settings flag (broker.py:619-677); the backend
interface keeps that contract while making the atomicity primitive a
deployment choice instead of a hidden filesystem assumption.
"""

from __future__ import annotations

import os
from importlib import import_module


class LockBackend:
    """Mutex primitive: ``acquire`` must be ATOMIC — exactly one of N
    concurrent callers wins — and ``release`` idempotent. ``path`` is an
    opaque lock identity (the broker passes its warehouse lock path)."""

    def acquire(self, path: str, payload: str) -> bool:
        """Try to take the lock, storing ``payload`` (holder metadata)
        where an operator can inspect it. True iff THIS call created the
        lock; False when somebody already holds it."""
        raise NotImplementedError

    def release(self, path: str) -> None:
        """Drop the lock; no-op when not held."""
        raise NotImplementedError

    def held(self, path: str) -> bool:
        """Whether ANY holder (this or another process) has the lock."""
        raise NotImplementedError


class PosixExclLockBackend(LockBackend):
    """``open(O_CREAT | O_EXCL)`` lock file — the default. Atomic on
    POSIX filesystems; NOT safe on S3-class object stores (plug a
    conditional-put backend there via ``[engine] lock_backend``)."""

    def acquire(self, path: str, payload: str) -> bool:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as fh:
            fh.write(payload)
        return True

    def release(self, path: str) -> None:
        try:
            os.remove(path)
        except FileNotFoundError:
            pass

    def held(self, path: str) -> bool:
        return os.path.exists(path)


def resolve_lock_backend(spec: str) -> LockBackend:
    """Resolve the ``[engine] lock_backend`` knob to a backend instance:
    ``posix`` or a ``module:attr`` dotted path (instance or zero-arg
    factory). Fails loudly on anything else — a silently-defaulted lock
    on an object store is exactly the bug this knob exists to prevent."""
    spec = (spec or "posix").strip()
    if spec == "posix":
        return PosixExclLockBackend()
    if ":" not in spec:
        raise ValueError(
            f"lock_backend {spec!r} is neither 'posix' nor a "
            "'package.module:attr' path to a LockBackend"
        )
    mod_name, attr = spec.split(":", 1)
    obj = getattr(import_module(mod_name), attr)
    backend = obj() if callable(obj) and not isinstance(obj, LockBackend) else obj
    if not isinstance(backend, LockBackend):
        raise TypeError(
            f"lock_backend {spec!r} resolved to {type(backend).__name__}, "
            "not a LockBackend"
        )
    return backend
