"""2-process CPU dryrun of the multi-process plate path.

Validates, without multi-host hardware, that
`parallel.multiprocess.run_plate_multiprocess` - jax.distributed init,
`make_array_from_process_local_data` feeding, result all-gather - produces
results BIT-IDENTICAL to the single-process `PlateRunner.run` on the same
(hosts, wells) mesh. Invoked by `__graft_entry__.dryrun_multichip` (and
runnable standalone: `python tools/dryrun_multiprocess.py`).

Child mode (internal): `python tools/dryrun_multiprocess.py child <pid>
<nproc> <port> <out_csv>` - one process of the distributed run, 4 virtual
CPU devices each.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_WELLS = 12  # not divisible by the global batch (8): exercises a tail batch
SHAPE = (2, 64, 64)


def _well_ids():
    return [f"A{i + 1:02d}" for i in range(N_WELLS)]


def _source(well_id: str):
    import numpy as np

    idx = int(well_id[1:]) - 1
    rng = np.random.default_rng(1000 + idx)
    return (rng.random(SHAPE) * 4000).astype(np.uint16)


def _plate_config():
    from arcadia_microscopy_tools_tpu.parallel.plate import PlateRunConfig

    return PlateRunConfig(max_cells=64, min_size=4, batch_size=8)


def _results_csv(results) -> str:
    frames = []
    for wid in sorted(results.tables):
        t = results.tables[wid]
        assert t is not None, f"well {wid} failed"
        t = t.copy()
        t.insert(0, "well", wid)
        frames.append(t)
    import pandas as pd

    return pd.concat(frames, ignore_index=True).to_csv(index=False)


def child_main(pid: int, nproc: int, port: int, out: str) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "force_host_platform_device_count" in flags:
        os.environ["XLA_FLAGS"] = " ".join(
            f for f in flags.split() if "force_host_platform_device_count" not in f
        )
    # config updates must precede ANY jax operation (package imports below
    # may initialize a backend), so they happen here, not in
    # initialize_distributed
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8 // nproc)

    from arcadia_microscopy_tools_tpu.core.microplate import MicroplateLayout, Well
    from arcadia_microscopy_tools_tpu.parallel.multiprocess import (
        initialize_distributed,
        run_plate_multiprocess,
    )

    initialize_distributed(f"localhost:{port}", nproc, pid)
    layout = MicroplateLayout([Well(id=w) for w in _well_ids()])
    results = run_plate_multiprocess(layout, _source, _plate_config())
    if pid == 0:
        Path(out).write_text(_results_csv(results))


def launch_and_verify(n_proc: int = 2) -> None:
    """Spawn the 2-process distributed run and assert bit-identity with the
    single-process PlateRunner on the same (hosts, wells) mesh."""
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    except RuntimeError:
        pass  # backend already initialized (e.g. called from dryrun_multichip)
    port = _free_port()
    out = Path(tempfile.mkstemp(suffix=".csv", prefix="amt_mp_")[1])
    repo = Path(__file__).resolve().parent.parent
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_NUM_CPU_DEVICES", None)
    env["PYTHONPATH"] = str(repo) + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                str(Path(__file__).resolve()),
                "child",
                str(pid),
                str(n_proc),
                str(port),
                str(out),
            ],
            env=env,
            cwd=str(repo),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in range(n_proc)
    ]
    logs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for pid, (p, log) in enumerate(zip(procs, logs)):
        if p.returncode != 0:
            raise RuntimeError(
                f"multi-process child {pid} failed (rc={p.returncode}):\n"
                + log[-3000:]
            )

    # single-process reference on the same (hosts, wells) mesh topology
    from arcadia_microscopy_tools_tpu.core.microplate import MicroplateLayout, Well
    from arcadia_microscopy_tools_tpu.parallel.mesh import (
        MeshConfig,
        create_multihost_mesh,
    )
    from arcadia_microscopy_tools_tpu.parallel.plate import PlateRunner

    mesh = create_multihost_mesh(n_proc, MeshConfig(n_devices=8))
    runner = PlateRunner(_plate_config(), mesh=mesh)
    layout = MicroplateLayout([Well(id=w) for w in _well_ids()])
    ref = runner.run(layout, _source)
    ref_csv = _results_csv(ref)
    got_csv = out.read_text()
    out.unlink()
    if got_csv != ref_csv:
        raise AssertionError(
            "2-process plate run diverged from the single-process run "
            f"({len(got_csv)} vs {len(ref_csv)} bytes)"
        )
    n_rows = got_csv.count("\n") - 1
    print(
        f"[dryrun] 2-process multi-host feeding OK ({N_WELLS} wells, "
        f"{n_rows} cells, bit-identical to single-process)"
    )


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child_main(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), sys.argv[5])
    else:
        launch_and_verify()
