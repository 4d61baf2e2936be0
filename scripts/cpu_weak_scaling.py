"""Weak-scaling of the fused sharded receive chain on a virtual CPU mesh.

VERDICT r4 next #4a: fixed channels PER DEVICE, device count 1→2→4→8
(each in a fresh process — the virtual device count is process-global).
On the 2-core host anything past n=2 oversubscribes physical cores, so
the numbers bound collective/program overhead rather than measure real
scaling; the per-step ICI traffic model lives in docs/ROADMAP.md.

Usage: python scripts/cpu_weak_scaling.py [ch_per_dev]
"""

import json
import os
import subprocess
import sys

CH_PER_DEV = int(sys.argv[1]) if len(sys.argv) > 1 else 2

INNER = r"""
import os, sys, time, json
n = int(sys.argv[1]); chd = int(sys.argv[2])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={n}"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath("build/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
from isee3_decoder_tpu.models.pipeline import PipelineConfig
from isee3_decoder_tpu.models.decode import unpack_block_buffer
from isee3_decoder_tpu.ops.carrier import PMConfig
from isee3_decoder_tpu.ops.symbols import SymConfig
from isee3_decoder_tpu.parallel import make_mesh, receive_block_sharded
from isee3_decoder_tpu.utils import testsignal

mesh = make_mesh(n_channels_axis=n, n_state_axis=1)
cfg = PipelineConfig(
    pm=PMConfig(samprate=32768.0, binsize=32.0, search_width=400.0),
    sym=SymConfig(samprate=32768.0, symrate=1024.0),
)
B = n * chd
frames = testsignal.random_frames(np.random.default_rng(0), 4)
chans = []
for c in range(B):
    chans.append(testsignal.synthesize_iq(
        frames, samprate=32768.0, symrate=1024.0,
        carrier=4000.0 + 60.0 * (c % chd), noise_std=800.0,
        lead_symbols=20, rng=np.random.default_rng(300 + c),
    ))
L = min(len(q) for q in chans)
iq = jnp.asarray(np.stack([q[:L] for q in chans]))
buf = np.asarray(receive_block_sharded(iq, 1, cfg, mesh))  # warm/compile
data, good, *_ = unpack_block_buffer(buf, B, 1)
assert good.all(), "sharded chain failed"
reps = 3
t0 = time.perf_counter()
for _ in range(reps):
    buf = np.asarray(receive_block_sharded(iq, 1, cfg, mesh))
dt = (time.perf_counter() - t0) / reps
print(json.dumps({"n": n, "channels": B, "t_block_s": round(dt, 4),
                  "samples": B * L}))
"""


def main():
    results = []
    for n in (1, 2, 4, 8):
        proc = subprocess.run(
            [sys.executable, "-c", INNER, str(n), str(CH_PER_DEV)],
            capture_output=True, text=True, cwd=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))),
        )
        line = next(
            (l for l in proc.stdout.splitlines() if l.startswith("{")), None
        )
        if not line:
            print(f"n={n} FAILED:\n{proc.stderr[-2000:]}", file=sys.stderr)
            continue
        r = json.loads(line)
        results.append(r)
        base = results[0]["t_block_s"]
        eff = base / r["t_block_s"]
        print(
            f"devices {r['n']}: {r['channels']} ch, {r['t_block_s']:.3f} s"
            f"/block, weak-scaling eff {eff:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
