"""Two-process jax.distributed smoke test (VERDICT r1 #10).

The multi-host story (SURVEY §5.8: DCN across hosts, 'ch' axis spanning
hosts) executed for real: two CPU processes form a global mesh via
parallel.mesh.init_multihost, run one channel-sharded demod step on
global arrays, and cross-host-reduce a scalar.  This is the minimum
credible DCN exercise short of real multi-host hardware.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from isee3_decoder_tpu.parallel.mesh import init_multihost, make_mesh
    from isee3_decoder_tpu.ops.carrier import PMConfig, init_carry, pm_demod_block

    coord, pid = sys.argv[1], int(sys.argv[2])
    init_multihost(coordinator=coord, num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    ndev = len(jax.devices())
    assert ndev == 4, ndev  # 2 virtual devices per process

    # 'ch' axis spans hosts (4 channels, one per global device)
    mesh = make_mesh(n_channels_axis=4, n_state_axis=1)
    cfg = PMConfig(samprate=8192.0, binsize=8.0)  # fftsize 1024
    B = 4
    t = np.arange(cfg.fftsize)

    def local_block(idx):
        c = idx[0].start if isinstance(idx[0], slice) else 0
        return None  # unused; we build via callback below

    sharding = NamedSharding(mesh, P("ch", None))
    def cb(idx):
        rows = range(*idx[0].indices(B))
        return np.stack([
            3000 * np.exp(1j * 2 * np.pi * (400 + 40 * c) * t / cfg.samprate)
            for c in rows
        ]).astype(np.complex64)
    iq = jax.make_array_from_callback((B, cfg.fftsize), sharding, cb)

    @jax.jit
    def step(iq):
        carry, out = pm_demod_block(init_carry(B, cfg), iq, cfg)
        # cross-host reduction over the channel axis rides DCN
        return out.carrier_freq, jnp.mean(out.cn0)

    freq, mean_cn0 = step(iq)
    want = 400 + 40 * np.arange(B)
    checked = 0
    for shard in freq.addressable_shards:
        rows = range(*shard.index[-1].indices(B))
        local = np.asarray(shard.data).reshape(-1)
        for j, c in enumerate(rows):
            assert abs(local[j] - want[c]) < 2.0, (c, local[j])
            checked += 1
    assert checked == 2  # two local channels per process
    # the jnp.mean over the 'ch' axis all-reduced across both processes;
    # the result is replicated, so every process can read it
    assert float(mean_cn0) > 20.0
    print(f"proc {pid} OK", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_distributed_demod(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    addr = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), addr, str(i)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out.decode())
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and (
            "UNIMPLEMENTED" in out or "does not support" in out
        ):
            pytest.skip(f"distributed CPU collectives unavailable: {out[-300:]}")
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"proc {i} OK" in out
