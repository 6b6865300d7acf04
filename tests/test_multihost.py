"""Multi-host bootstrap (parallel.multihost): env parsing + a REAL
two-process ``jax.distributed`` run over localhost (Gloo CPU collectives) —
the entry a real pod slice runs unmodified (SURVEY.md §5 dist-comm row)."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

from gflownet_spai_tpu.parallel.multihost import multihost_env


def test_multihost_env_parsing():
    assert multihost_env({}) is None
    cfg = multihost_env({"GFNSPAI_COORDINATOR": "h:1", "GFNSPAI_NUM_PROCS": "4",
                         "GFNSPAI_PROC_ID": "2"})
    assert cfg == {"coordinator_address": "h:1", "num_processes": 4,
                   "process_id": 2}
    # JAX's standard names are honored too
    cfg = multihost_env({"JAX_COORDINATOR_ADDRESS": "h:1",
                         "JAX_NUM_PROCESSES": "2", "JAX_PROCESS_ID": "0"})
    assert cfg["num_processes"] == 2
    with pytest.raises(ValueError, match="all three"):
        multihost_env({"GFNSPAI_COORDINATOR": "h:1"})
    with pytest.raises(ValueError, match="outside"):
        multihost_env({"GFNSPAI_COORDINATOR": "h:1", "GFNSPAI_NUM_PROCS": "2",
                       "GFNSPAI_PROC_ID": "2"})


_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["GFNSPAI_COORDINATOR"] = "localhost:%PORT%"
    os.environ["GFNSPAI_NUM_PROCS"] = "2"
    os.environ["GFNSPAI_PROC_ID"] = sys.argv[1]
    sys.path.insert(0, %REPO%)
    import jax
    jax.config.update("jax_platforms", "cpu")
    from gflownet_spai_tpu.parallel.multihost import (
        initialize_from_env, global_mesh, process_summary)
    assert initialize_from_env()
    assert jax.process_count() == 2
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    mesh = global_mesh(dp=1, rows=jax.device_count())
    out = jax.jit(shard_map(lambda x: jax.lax.psum(x, "rows"), mesh=mesh,
                  in_specs=P("rows"), out_specs=P()))(
        jnp.arange(float(jax.device_count())))
    assert float(out[0]) == sum(range(jax.device_count())), out
    print("OK", process_summary())
""")


def test_two_process_distributed_psum(tmp_path):
    """Spawn two OS processes, bootstrap via initialize_from_env, run a
    cross-process psum on the process-spanning mesh."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(
        _WORKER.replace("%PORT%", str(port)).replace("%REPO%", repr(repo)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for out, p in zip(outs, procs):
        assert p.returncode == 0, out[-2000:]
        assert "OK" in out
