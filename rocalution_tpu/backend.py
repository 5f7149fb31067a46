"""Backend / platform management.

TPU-native replacement for the reference runtime layer
(reference: src/base/backend_manager.cpp:110 `init_rocalution`,
:213 `stop_rocalution`, :287 `info_rocalution`). On TPU there are no
handles or streams to create: JAX owns the runtime. What remains useful:

* `init(...)`   — optional `jax.distributed.initialize` for multi-host runs
                  (replaces MPI_Init + per-rank device selection),
* `info()`      — platform dump,
* `stop()`      — no-op kept for API parity,
* `sync()`      — block until all pending work is done (used by benchmarks,
                  analog of `_rocalution_sync()`).
"""

from __future__ import annotations

from typing import Optional

import jax

from .config import get_config

_initialized = False


def init(coordinator_address: Optional[str] = None,
         num_processes: Optional[int] = None,
         process_id: Optional[int] = None) -> None:
    """Initialize the runtime (analog of init_rocalution, backend_manager.cpp:110).

    Single-process use needs no arguments. Multi-host use passes the
    coordinator address (replaces MPI_Init + `init_rocalution(rank, dev)`).
    """
    global _initialized
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    _initialized = True


def stop() -> None:
    """API-parity no-op (analog of stop_rocalution, backend_manager.cpp:213)."""
    global _initialized
    _initialized = False


def sync() -> None:
    """Block until all in-flight device work completes (analog _rocalution_sync)."""
    for d in jax.local_devices():
        try:
            jax.device_put(0, d).block_until_ready()
        except Exception:  # pragma: no cover - defensive
            pass


def info() -> str:
    """Platform description (analog of info_rocalution, backend_manager.cpp:287)."""
    cfg = get_config()
    lines = [
        "rocalution_tpu platform info:",
        f"  jax version      : {jax.__version__}",
        f"  backend          : {jax.default_backend()}",
        f"  process          : {jax.process_index()}/{jax.process_count()}",
        f"  local devices    : {jax.local_devices()}",
        f"  global devices   : {jax.device_count()}",
        f"  default dtype    : {cfg.default_dtype}",
        f"  index dtype      : {cfg.index_dtype}",
        f"  x64 enabled      : {jax.config.jax_enable_x64}",
    ]
    out = "\n".join(lines)
    if cfg.verbose >= 1:
        print(out)
    return out
