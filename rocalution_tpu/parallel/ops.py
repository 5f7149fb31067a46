"""Per-shard distributed operations under `shard_map`.

Reference parity: GlobalMatrix::Apply with overlapped halo exchange
(src/base/global_matrix.cpp:924-1009) and GlobalVector reductions
(global_vector.cpp:547-585). The TPU formulation: boundary values are
gathered by a static take, exchanged with one `all_gather` over the mesh
axis (fixed-size buffers → deterministic, collective rides ICI), and the
interior SpMV is issued before the ghost SpMV so XLA's latency-hiding
scheduler overlaps it with the collective — the role of the reference's
interior/ghost HIP streams.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .partition import GlobalCSR


class ShardView:
    """Per-shard (inside shard_map) view of a GlobalCSR: leading P axis
    squeezed away."""

    __slots__ = ("A",)

    def __init__(self, A: GlobalCSR):
        self.A = A

    def __getattr__(self, name):
        v = getattr(self.A, name)
        if isinstance(v, jnp.ndarray) and v.ndim >= 1:
            return v[0]
        return v


def shard_spmv(A: GlobalCSR, x_local: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """y_local = (A @ x)_local with halo exchange (call inside shard_map)."""
    v = ShardView(A)
    nl = A.n_local
    # 1. gather boundary entries into the fixed-size send buffer
    send = x_local[v.send_idx]
    # 2. exchange boundary buffers across the mesh axis (ICI collective);
    #    issued before the interior SpMV so XLA overlaps the two
    all_send = jax.lax.all_gather(send, axis_name)          # (P, max_send)
    # 3. interior SpMV (overlaps with the collective under XLA scheduling)
    y = jax.ops.segment_sum(
        v.int_data * x_local[v.int_cols], v.int_rows,
        num_segments=nl, indices_are_sorted=True,
    )
    # 4. ghost SpMV on the received boundary values
    ghost_vals = all_send.reshape(-1)[v.recv_idx]           # (max_ghost,)
    y = y + jax.ops.segment_sum(
        v.ghost_data * ghost_vals[v.ghost_cols], v.ghost_rows,
        num_segments=nl, indices_are_sorted=True,
    )
    return y


def shard_operator(A: GlobalCSR, axis_name: str):
    """Closure x_local -> (A @ x)_local for use by any solver."""
    return lambda x: shard_spmv(A, x, axis_name)
