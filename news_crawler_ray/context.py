"""Central Ray Data execution configuration for the engine.

Call :func:`configure` once per process after ``ray.init`` (tests,
bench, CLI). It does NOT call ``ray.init`` itself — the driver contract
(/root/repo/__ray_entry__.py) owns the Ray session.

Choices:
* ``HASH_SHUFFLE`` — key-based ``repartition(keys=...)`` (the frontier
  dedup shuffle) and hash-partitioned joins require it; hash shuffle is
  also the right strategy for the engine's groupby-heavy workloads at
  cluster scale (partition-by-key, no global ordering cost).
* ``target_max_block_size`` stays at the 128 MiB default unless a
  page-store with wide binary rows is flowing; ``for_images`` bumps it
  so ~MB-scale rows do not split into absurdly small blocks.
"""

from __future__ import annotations

from ray.data import DataContext
from ray.data.context import ShuffleStrategy


def configure(
    *,
    preserve_order: bool = False,
    quiet: bool = True,
    image_payloads: bool = False,
    shuffle_parallelism: int | None = None,
) -> DataContext:
    import ray

    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    # Size shuffle aggregator pools to the actual cluster instead of the
    # 200-partition default: on a 4-CPU test session the default queues
    # ~200 aggregator actor starts per shuffle op and a trivial groupby
    # takes minutes. Rule: 2 partitions per CPU, min 4.
    if shuffle_parallelism is None:
        try:
            ncpu = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            ncpu = 8
        # 2 partitions/CPU, capped: every partition is an aggregator
        # actor, and past ~32 the per-op startup swamps small shuffles
        # (at real cluster scale, raise the cap with the node count)
        shuffle_parallelism = min(32, max(4, 2 * ncpu))
    ctx.default_hash_shuffle_parallelism = shuffle_parallelism
    ctx.min_parallelism = shuffle_parallelism
    ctx.execution_options.preserve_order = preserve_order
    if quiet:
        ctx.enable_progress_bars = False
    if image_payloads:
        # wide binary rows: bigger blocks, fewer of them
        ctx.target_max_block_size = 256 * 1024 * 1024
    return ctx
