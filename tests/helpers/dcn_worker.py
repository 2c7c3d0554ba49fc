"""Multi-process (DCN-simulated) train-step worker.

Launched twice by tests/test_train.py::test_multiprocess_train_step — two OS
processes, each with 4 virtual CPU devices, form one 8-device global mesh via
`jax.distributed` (gloo collectives stand in for DCN). Each process:

  1. calls skyeye_tpu.parallel.initialize_distributed (the framework's replacement
     for torch.distributed.init_process_group, reference cli/train.py:17-21),
  2. builds the tiny detector with the SAME seed (replicated params),
  3. loads only its LOCAL half of the global batch and assembles global arrays
     with shard_batch_multihost (replaces DistributedSampler, loaders.py:57-61),
  4. runs ONE jitted train step over the global mesh — XLA inserts the cross-host
     gradient psum — and prints the loss for the parent to compare against the
     single-process value.

Usage: python dcn_worker.py <process_id> <coordinator_port>
"""
import os
import sys

proc_id = int(sys.argv[1])
port = sys.argv[2]
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")

import jax

jax.config.update("jax_platforms", "cpu")

# repo root on sys.path so `import skyeye_tpu` works when launched from anywhere
REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

# jax.distributed.initialize must run before ANYTHING touches the XLA backend —
# importing the skyeye_tpu package initializes it (module-level device arrays), so
# load parallel/mesh.py standalone to exercise the real initialize_distributed.
import importlib.util

_spec = importlib.util.spec_from_file_location(
    "_mesh_standalone", os.path.join(REPO, "skyeye_tpu", "parallel", "mesh.py")
)
_mesh_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mesh_mod)
_mesh_mod.initialize_distributed(coordinator_address=f"localhost:{port}",
                                 num_processes=2, process_id=proc_id)

import jax.numpy as jnp
import numpy as np

from skyeye_tpu.config import DEFAULT_HYP, ModelConfig
from skyeye_tpu.losses import ComputeLoss
from skyeye_tpu.models import SkyEyeDetectorModule
from skyeye_tpu.parallel import (
    create_mesh, is_main_process, replicate_multihost, shard_batch_multihost,
)
from skyeye_tpu.train import build_optimizer, create_train_state, make_train_step

assert jax.device_count() == 8 and jax.local_device_count() == 4
assert is_main_process() == (proc_id == 0)

cfg = ModelConfig(nc=3, base_channels=16, depth_multiple=0.33, width_multiple=0.25)
module = SkyEyeDetectorModule(config=cfg)
variables = module.init(jax.random.PRNGKey(0), jnp.zeros((2, 64, 64, 3)), train=True)

mesh = create_mesh(n_spatial=1)
assert mesh.devices.shape == (8, 1)

# deterministic global batch; this process keeps rows [proc_id*4, proc_id*4+4)
rng = np.random.default_rng(0)
B, M = 8, 8
images = rng.uniform(0, 1, (B, 64, 64, 3)).astype(np.float32)
targets = np.zeros((B, M, 6), np.float32)
mask = np.zeros((B, M), bool)
for b in range(B):
    for t in range(3):
        targets[b, t] = [0, rng.integers(0, 3), rng.uniform(0.3, 0.7),
                         rng.uniform(0.3, 0.7), rng.uniform(0.1, 0.3),
                         rng.uniform(0.1, 0.3)]
        mask[b, t] = True
lo = proc_id * 4
local = {"images": images[lo:lo + 4], "targets": targets[lo:lo + 4],
         "mask": mask[lo:lo + 4]}

tx = build_optimizer(lambda s: 0.05, DEFAULT_HYP, variables["params"], batch_size=64)
state = create_train_state(variables, tx)
step = jax.jit(make_train_step(module, ComputeLoss(jnp.asarray(cfg.anchors), cfg.nc),
                               tx))

with jax.set_mesh(mesh):
    g_state = jax.tree_util.tree_map(
        lambda x: np.asarray(x), state, is_leaf=lambda x: isinstance(x, jax.Array)
    )
    g_state = replicate_multihost(mesh, g_state)
    g_batch = shard_batch_multihost(mesh, local)
    new_state, metrics = step(g_state, g_batch)
    loss = float(metrics["loss"])
    # params after the update must be identical on every process (gradient psum)
    p0 = np.asarray(
        jax.tree_util.tree_leaves(new_state.params)[0].addressable_data(0)
    )

print(f"DCNRESULT proc={proc_id} loss={loss:.6f} p0sum={float(p0.sum()):.6f}",
      flush=True)
