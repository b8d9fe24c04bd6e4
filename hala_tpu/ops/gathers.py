"""Row-gather strategies for TPU.

TPU has no hardware gather: XLA lowers `jnp.take` to element-wise loads
(~1 element/cycle), which made the per-bounce attribute fetches the
largest term in the frame profile. For small tables the MXU is the
gather unit: a one-hot matmul `onehot(idx) @ table` fetches whole rows
at matrix-multiply throughput. Above the one-hot threshold the
materialized (N, T) one-hot stops paying for itself and we fall back to
the native gather.
"""

from __future__ import annotations

import jax.numpy as jnp

# Above this many table rows the (N, T) one-hot matmul costs more HBM
# traffic than the element-wise gather it replaces.
ONEHOT_MAX_ROWS = 2048


def take_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table: (T, C) f32; idx: (N,) int -> (N, C) f32 row gather."""
    t = table.shape[0]
    if t <= ONEHOT_MAX_ROWS:
        onehot = (
            idx[:, None] == jnp.arange(t, dtype=idx.dtype)[None, :]
        ).astype(jnp.float32)
        return jnp.dot(
            onehot, table, preferred_element_type=jnp.float32
        )
    return jnp.take(table, idx, axis=0)
