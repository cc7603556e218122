"""Multi-host launch helpers: requeue loop semantics (reference:
run_with_submitit.py:58-68) and single-process init fallback."""

import pytest

from rlipv2_tpu.engine.launch import init_distributed, run_with_requeue


def test_init_distributed_single_process(monkeypatch):
    for var in ["JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID", "TPU_WORKER_HOSTNAMES",
                "MEGASCALE_COORDINATOR_ADDRESS"]:
        monkeypatch.delenv(var, raising=False)
    rank, world = init_distributed()
    assert (rank, world) == (0, 1)


def test_requeue_resumes_after_failures():
    calls = []

    class Preempted(OSError):
        pass

    def train_fn(resume):
        calls.append(resume)
        if len(calls) < 3:
            raise Preempted("worker preempted")
        return "done"

    logs = []
    out = run_with_requeue(
        train_fn, max_restarts=5, backoff_seconds=0.0, logger=logs.append
    )
    assert out == "done"
    assert calls == [False, True, True]  # requeues resume from checkpoint
    assert len(logs) == 2


def test_requeue_budget_exhausted():
    def train_fn(resume):
        raise OSError("always down")

    with pytest.raises(OSError):
        run_with_requeue(
            train_fn, max_restarts=2, backoff_seconds=0.0, logger=lambda m: None
        )


def test_non_infra_errors_propagate_immediately():
    calls = []

    def train_fn(resume):
        calls.append(resume)
        raise ValueError("a bug, not an outage")

    with pytest.raises(ValueError):
        run_with_requeue(train_fn, backoff_seconds=0.0, logger=lambda m: None)
    assert calls == [False]
