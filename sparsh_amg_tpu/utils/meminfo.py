"""Device-memory accounting (SURVEY.md §2 C23: the reference tracks GPU
hierarchy bytes to decide level placement; here the frozen pytrees make the
count a tree walk).

Two views:
- `tree_device_bytes(obj)`: bytes of every jax.Array leaf in a pytree —
  the persistent footprint of a frozen hierarchy / df64 operator.
- `device_memory_stats()`: the live allocator view from the backend
  (peak / in use), when the platform exposes it (TPU does; CPU returns {}).
"""
from __future__ import annotations

import jax


def tree_device_bytes(obj) -> int:
    """Total bytes of jax.Array leaves in a pytree (0 for host leaves)."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(obj):
        if isinstance(leaf, jax.Array):
            total += leaf.nbytes
    return total


def device_memory_stats(device=None) -> dict:
    """Allocator stats from the backend (bytes_in_use, peak_bytes_in_use,
    bytes_limit, ...) or {} when the platform doesn't report them."""
    if device is None:
        device = jax.local_devices()[0]
    try:
        stats = device.memory_stats()
    except Exception:
        return {}
    return dict(stats) if stats else {}
