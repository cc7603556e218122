"""Multi-host launch + auto-requeue — the TPU-native replacement for the
reference's SLURM/submitit launcher (reference: run_with_submitit.py:19-117
resubmits the job on preemption and resumes from checkpoint.pth; and
torch.distributed.launch env rendezvous, util/misc.py:387-417).

On TPU pods there is no SLURM: every host runs the SAME program and the
runtime wires the mesh. The launch recipe is:

    # one process per host, e.g. via `gcloud compute tpus tpu-vm ssh
    # --worker=all --command=...` or GKE JobSet:
    python main.py --config ... \
        # jax.distributed.initialize() picks the coordinator and process
        # ids up from the TPU metadata automatically on Cloud TPU; on
        # other fabrics set:
        #   JAX_COORDINATOR_ADDRESS=host0:1234
        #   JAX_NUM_PROCESSES=4  JAX_PROCESS_ID=$RANK

Preemption recovery is in-process: `run_with_requeue` wraps the training
entry, catches infrastructure failures, and re-enters from the latest
Orbax checkpoint (engine/checkpoint.py) — the submitit
`checkpoint() -> resubmit(--resume checkpoint.pth)` loop without a
scheduler.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional, Sequence


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> tuple[int, int]:
    """Initialize jax.distributed from args or env and return
    (process_index, process_count). Single-process (no env, no args) is a
    no-op returning (0, 1) — the reference's non-distributed fallback
    (util/misc.py:395-399)."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    on_cloud_tpu = os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS"
    )
    if coordinator_address or on_cloud_tpu:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def run_with_requeue(
    train_fn: Callable[[bool], object],
    max_restarts: int = 100,
    retry_on: Sequence[type] = (),
    backoff_seconds: float = 10.0,
    logger: Optional[Callable[[str], None]] = None,
):
    """Call `train_fn(resume)` with automatic requeue on infrastructure
    failure (reference: run_with_submitit.py:58-68 `Trainer.checkpoint`
    resubmits with --resume).

    train_fn receives resume=False on the first attempt and resume=True on
    every requeue (it should then restore the latest checkpoint via
    engine/checkpoint.py). Exceptions whose type is in `retry_on` (plus
    jax's RuntimeError family for preempted/unavailable backends) trigger
    a requeue; anything else propagates."""
    log = logger or (lambda m: print(m, flush=True))
    try:
        from jax.errors import JaxRuntimeError

        infra_errors = (JaxRuntimeError, OSError) + tuple(retry_on)
    except ImportError:  # pragma: no cover
        infra_errors = (OSError,) + tuple(retry_on)

    attempt = 0
    while True:
        try:
            return train_fn(attempt > 0)
        except infra_errors as e:
            attempt += 1
            if attempt > max_restarts:
                log(f"requeue budget exhausted after {max_restarts} restarts")
                raise
            log(
                f"requeue {attempt}/{max_restarts} after "
                f"{type(e).__name__}: {e}"
            )
            time.sleep(backoff_seconds)
