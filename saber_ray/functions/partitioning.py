"""Size-adaptive partition counts for shuffle coalescing.

Sort-based ``groupby().aggregate`` in Ray Data creates one reduce
partition per input block, so the engine coalesces small partial
streams with ``repartition(n)`` before aggregating (measured win:
canonicalize_edges 11.2 s -> 3.5 s at sf0.1). A FIXED ``n`` is wrong at
scale: ``repartition(16)`` on a 256-node cluster caps shuffle
parallelism at 16 and makes reduce blocks enormous.

``shuffle_partitions`` derives ``n`` from the live cluster width (every
CPU gets a reduce partition) and, when the caller still holds the file
read, from the input fragment count — whichever is largest, floored at
the small-scale optimum the constant used to encode.
"""

from __future__ import annotations


#: On-disk bytes of upstream input per coalesced reduce partition.
TARGET_PARTITION_BYTES = 64 << 20


def shuffle_partitions(floor: int = 16, upstream=None) -> int:
    """Partition count for coalescing a partial stream before a
    sort-aggregate: ``max(floor, min(input_bytes / 64 MB, 2 × CPUs))``.

    * ``floor`` — the measured small-scale optimum (reduce-task overhead
      dominates below it; measured costs of over-fanning at 32 cpus on
      sf0.1: an unconditional-CPU-term policy +20-45% on kg_edges /
      minhash, a fragment-COUNT policy +35% on synthetic_kg because
      staged outputs are many tiny files);
    * input bytes — summed from the upstream Dataset's ``input_files()``
      metadata (no execution), so the reduce fan-out grows only when
      the DATA does: one partition per ~64 MB of input;
    * ``2 × cluster CPUs`` — caps the fan-out; on a 4N-node cluster the
      cap is 4x, so reduce parallelism scales with the cluster when the
      data is big enough to need it.

    Derived (non-file-backed) datasets report no input files and stay
    at ``floor`` — callers that still hold the original file-backed
    Dataset should pass it as ``upstream``. Non-local paths where sizes
    can't be stat'd cheaply also fall back to ``floor``.
    """
    import os

    import ray

    input_bytes = 0
    if upstream is not None:
        try:
            input_bytes = sum(
                os.path.getsize(f) for f in upstream.input_files()
            )
        except Exception:
            pass
    cpus = 0
    try:
        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        pass
    return max(floor, min(input_bytes // TARGET_PARTITION_BYTES, 2 * cpus))


def pinned_pool(cap: int = 8, frac_num: int = 1, frac_den: int = 2) -> tuple[int, int]:
    """Pinned (min == max) actor-pool bounds: ``frac`` of cluster CPUs,
    capped, floored at 1.

    Pinned, not autoscaling: Ray Data's autoscaling actor pool upscales
    roughly one actor per second, so a ``(1, 8)`` pool spends most of a
    short job far below width (measured on a trivial 4-s-ideal pool job:
    17.6 s autoscaled from 2 vs 7.0 s pinned at width). Actor setup for
    these stages is milliseconds, so eager actors cost only their idle
    CPU reservation for the life of the stage — which a dedicated
    pipeline stage wants anyway. Keep ``cap``/``frac`` below cluster
    width so stateless task operators up/downstream never starve.

    ``cap`` is a PER-32-CPU tuning (the sandbox reference node): on a
    wider cluster the effective cap is ``cap x (cpus // 32)``, so a
    256-node / 8192-cpu cluster gets 256x the pool width, not a pool
    frozen at the single-node optimum. At <= 32 cpus the behavior is
    bit-identical to the tuned values (see SCALING.md).
    """
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    cap = cap * max(1, cpus // 32)
    width = max(1, min(cap, cpus * frac_num // frac_den))
    return (width, width)

