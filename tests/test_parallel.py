"""SPMD sharding correctness on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from skyeye_tpu.config import ModelConfig
from skyeye_tpu.models import SkyEyeDetectorModule
from skyeye_tpu.parallel import (
    DATA_AXIS,
    SPATIAL_AXIS,
    batch_sharding,
    create_mesh,
    local_batch_size,
    replicated,
    shard_batch,
)

KEY = jax.random.PRNGKey(0)


def tiny():
    cfg = ModelConfig(nc=3, base_channels=16, depth_multiple=0.33, width_multiple=0.25)
    module = SkyEyeDetectorModule(config=cfg)
    variables = module.init(KEY, jnp.zeros((1, 64, 64, 3)), train=False)
    return cfg, module, variables


def test_mesh_shapes():
    mesh = create_mesh()
    assert mesh.shape[DATA_AXIS] == 8 and mesh.shape[SPATIAL_AXIS] == 1
    mesh2 = create_mesh(n_spatial=2)
    assert mesh2.shape[DATA_AXIS] == 4 and mesh2.shape[SPATIAL_AXIS] == 2
    assert local_batch_size(16, mesh2) == 4


def test_spatial_sharding_forward_matches_unsharded():
    """Forward with image rows sharded over the spatial axis must equal the
    unsharded result (GSPMD conv halo exchange correctness)."""
    cfg, module, variables = tiny()
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64, 3))

    def fwd(v, xx):
        outs = module.apply(v, xx, train=False)
        return [o.astype(jnp.float32) for o in outs]

    ref = jax.jit(fwd)(variables, x)

    mesh = create_mesh(n_spatial=2)
    xs = jax.device_put(x, batch_sharding(mesh, spatial_dim=1))
    vs = jax.device_put(variables, replicated(mesh))
    with jax.set_mesh(mesh):
        out = jax.jit(fwd)(vs, xs)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_shard_batch_places_arrays():
    mesh = create_mesh()
    batch = {
        "images": np.zeros((8, 32, 32, 3), np.uint8),
        "targets": np.zeros((8, 4, 6), np.float32),
        "mask": np.zeros((8, 4), bool),
    }
    dev = shard_batch(mesh, batch)
    assert dev["images"].sharding.spec[0] == DATA_AXIS
    assert dev["targets"].shape == (8, 4, 6)


def test_sharded_eval_decode_matches():
    """Sharded batched inference (decode) equals single-device inference."""
    from skyeye_tpu.models import decode_predictions

    cfg, module, variables = tiny()
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 64, 64, 3))

    def infer(v, xx):
        outs = module.apply(v, xx, train=False)
        return decode_predictions(outs, jnp.asarray(cfg.anchors), (64, 64))

    ref = jax.jit(infer)(variables, x)
    mesh = create_mesh()
    xs = jax.device_put(x, batch_sharding(mesh))
    vs = jax.device_put(variables, replicated(mesh))
    with jax.set_mesh(mesh):
        out = jax.jit(infer)(vs, xs)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-4, atol=1e-5)
