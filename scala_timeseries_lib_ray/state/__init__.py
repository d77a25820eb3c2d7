"""Shared small-side state: broadcast once via ``ray.put``, read per actor/task.

The pattern for every small lookup side in this engine (ANN query matrices, dedup
verification texts, per-source series bounds, last-rank maps): never shuffle-join a
small side — ``broadcast`` it once and resolve inside the batch kernel.
"""

from __future__ import annotations

from typing import Any

import ray


def broadcast(obj: Any) -> "ray.ObjectRef":
    """Put a small object in the object store ONCE; workers read it zero-copy-ish
    per task/actor via ``resolve``. Plain alias that names the pattern."""
    return ray.put(obj)


def resolve(ref: "ray.ObjectRef") -> Any:
    return ray.get(ref)


class BroadcastOnce:
    """Lazily broadcast state for actor-pool stages: built in ``__init__`` (once per
    actor) from a ref captured at pipeline construction."""

    def __init__(self, ref: "ray.ObjectRef"):
        self.value = ray.get(ref)
