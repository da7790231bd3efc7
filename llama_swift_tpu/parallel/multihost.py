"""Multi-host initialization + launch runbook.

The reference is single-process/single-host by construction (SURVEY.md
§5.8).  Scaling past one host on TPU is: one Python process per host, all
running the SAME program; ``jax.distributed.initialize`` forms the process
group; a global mesh spans every chip; ICI carries intra-slice collectives
and DCN carries cross-slice traffic — all inserted by XLA from the sharding
annotations in ``parallel/sharding.py``.

Runbook (v5e-16, 2 hosts × 8 chips, 65B Q4_0):

1. Same code + model file path on every host (or shard-load: each host
   reads only its tensors' byte ranges via the mmap loader).
2. On every host simultaneously::

       python serve.py --coordinator=host0:8476 --num-processes=2 \
                       --process-id=$HOST_INDEX

   where serve.py starts with ``init_distributed(...)`` below.
3. Build the global mesh with ``make_mesh(tp=16)`` (or ``dp×tp``); shard
   params with ``shard_params`` — each host only materializes its
   addressable shards.
4. Every host drives the same jitted step in lockstep; only process 0
   samples/streams tokens (logits are fully replicated after the final
   all-gather; or sample on the vocab-sharded logits and broadcast ids).

Tested via the CPU flag ``xla_force_host_platform_device_count`` (single
process, 8 virtual devices) — the driver's ``dryrun_multichip`` and
``tests/test_sharding.py`` exercise exactly the code path that runs
multi-host, since mesh code is process-count agnostic.
"""

from __future__ import annotations

from typing import Optional

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Form the multi-host process group (no-op single-process when no
    coordinator is given).  Must run before any other jax call."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_primary() -> bool:
    return jax.process_index() == 0


def local_device_count() -> int:
    return jax.local_device_count()
