"""Ray Data execution-context defaults for this engine.

Central place for the DataContext knobs we rely on; callers invoke
:func:`quiet_ray_data` once per process (idempotent). We do NOT touch the
Ray session itself.
"""

from __future__ import annotations

_DONE = False


def quiet_ray_data(preserve_order: bool = False) -> None:
    """Quiet progress bars and set deterministic-friendly defaults.

    ``preserve_order=False`` lets the streaming executor run fully
    pipelined; every operator in this engine is written to be
    order-insensitive (sorted-within-group outputs), so block order never
    affects results.
    """
    global _DONE
    import logging

    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    ctx.execution_options.preserve_order = preserve_order
    # NOTE on shuffle strategy: Ray 2.49's HASH_SHUFFLE is ~1.7x faster per
    # keyed exchange in isolation, but its per-operator aggregator actors
    # accumulate across the many pipelines a session runs (measured: 160+
    # worker processes and a 3-4x slowdown after a few pipelines). The
    # default sort-based shuffle is stable under repeated pipelines, so we
    # keep it; revisit when the aggregator-pool lifecycle improves.
    for name in ("ray.data", "ray"):
        logging.getLogger(name).setLevel(logging.ERROR)
    _DONE = True
