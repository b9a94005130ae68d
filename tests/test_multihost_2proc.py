"""REAL 2-process multi-host run on CPU (jax.distributed + gloo).

Two subprocesses, 2 virtual CPU devices each -> a 4-device global mesh.
Each process runs the SAME pipe.generate_batch over the global data axis:
the batch engine glues each host's local slice into global arrays
(parallel/batch._to_global), XLA/gloo handles the collectives, and
multihost.to_host process_allgathers the results so every host sees the
full batch. This is the standing test for SURVEY §2.3's multi-host story
(the reference has no distributed code at all).
"""
import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)

CHILD = """
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
pid, port = int(sys.argv[1]), sys.argv[2]
sys.path.insert(0, %r)
from guided_attention_tpu.parallel import multihost
multihost.initialize("127.0.0.1:" + port, 2, pid)
assert jax.device_count() == 4 and jax.local_device_count() == 2
import numpy as np, jax.numpy as jnp
from guided_attention_tpu.models.bundle import StableDiffusion
from guided_attention_tpu.runner import GuidedAttentionPipeline
from guided_attention_tpu.parallel.mesh import make_mesh

sd = StableDiffusion.create("micro", dtype=jnp.float32)
pipe = GuidedAttentionPipeline(sd)
mesh = make_mesh({"data": 4})
outs = pipe.generate_batch(
    [1, 2, 3, 4], meta_prompt="a [dog:.2,.3] x", mesh=mesh,
    num_inference_steps=2, thresholds={0: 0.5}, decode=False,
)
lat = np.stack([o.latents for o in outs])
assert np.isfinite(lat).all()
assert lat.shape[0] == 4  # every host sees the FULL batch after allgather
assert all(o.diagnostics.refine_iters[0] > 0 for o in outs)
assert multihost.is_primary() == (pid == 0)

# multi-prompt across processes: every host passes the FULL per-prompt
# emb/spec batch; _to_global must slice them by the local batch before
# gluing (parallel/batch.py) or the global batch would be B*nprocs
mouts = pipe.generate_batch(
    [1, 2, 1, 2],
    meta_prompts=["a [dog:.1,.1,.4,.4] x"] * 2 + ["a [dog:.5,.5,.4,.4] x"] * 2,
    mesh=mesh, num_inference_steps=2, thresholds={0: 0.5}, decode=False,
)
mlat = np.stack([o.latents for o in mouts])
assert mlat.shape[0] == 4 and np.isfinite(mlat).all()
# same seed, different BOX geometry -> different trajectories
assert not np.array_equal(mlat[0], mlat[2])
print("CHECKSUM", pid, "%%.6f %%.6f" %% (float(np.abs(lat).sum()), float(np.abs(mlat).sum())), flush=True)
""" % (REPO,)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_generate_batch(tmp_path):
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", CHILD, str(pid), port],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=REPO,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1500)
        outs.append(out)
        assert p.returncode == 0, f"child failed:\n{out[-3000:]}"
    sums = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("CHECKSUM"):
                parts = line.split()
                sums[parts[1]] = " ".join(parts[2:])
    assert set(sums) == {"0", "1"}, outs
    # both hosts gathered the same full batch
    assert sums["0"] == sums["1"], sums
