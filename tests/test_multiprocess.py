"""Multi-process plate execution (parallel/multiprocess.py).

The real validation is the 2-process CPU launch: jax.distributed init over
a localhost coordinator, per-process decode, make_array_from_process_local_
data feeding, result all-gather - asserted BIT-IDENTICAL to the single-
process PlateRunner on the same (hosts, wells) mesh. The same launcher runs
inside `dryrun_multichip` (step 5); here it gates the CPU suite.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parents[1] / "tools"))


@pytest.mark.slow
def test_two_process_plate_bit_identical():
    from dryrun_multiprocess import launch_and_verify

    launch_and_verify(n_proc=2)


def test_initialize_rejects_reuse_after_backend(monkeypatch):
    """initialize_distributed must be callable only before backend init -
    document the failure mode with a clear error rather than a hang."""
    import jax

    from arcadia_microscopy_tools_tpu.parallel.multiprocess import (
        initialize_distributed,
    )

    jax.devices()  # force backend init in this test process
    with pytest.raises(RuntimeError):
        initialize_distributed("localhost:1", 1, 0)
