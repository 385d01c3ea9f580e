"""Multi-chip training step on the virtual 8-device CPU mesh: the DP x TP x
SP shard_map program must produce the same loss and the same updated params
as the single-device reference step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.core.config import MeshConfig
from tpu_flash.models import FlashTransformer, ModelConfig
from tpu_flash.parallel.mesh import build_mesh
from tpu_flash.parallel.train import make_train_step

requires_8 = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)

CFG = ModelConfig(
    name="tiny-train",
    vocab_size=64,
    hidden_size=32,
    num_layers=2,
    num_q_heads=4,
    num_kv_heads=2,
    head_dim=8,
    intermediate_size=64,
    dtype="float32",
)


def _single_device_step(model, params, tokens, lr):
    def loss_fn(p):
        return model.loss_fn(p, tokens)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    new_p = jax.tree.map(lambda w, g: w - lr * g, params, grads)
    return new_p, loss


@requires_8
@pytest.mark.parametrize(
    "mesh_cfg",
    [
        MeshConfig(data=2, model=2, seq=2),
        MeshConfig(data=1, model=2, seq=4),
        MeshConfig(data=8, model=1, seq=1),
    ],
)
def test_train_step_matches_single_device(mesh_cfg):
    model = FlashTransformer(CFG)
    params = model.init(jax.random.PRNGKey(0))
    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (8, 32), 0, CFG.vocab_size, jnp.int32
    )
    lr = 1e-2

    # Single-device expectation FIRST: the sharded step donates its params
    # (and device_put may alias buffers on CPU), consuming the originals.
    exp_p, exp_loss = _single_device_step(model, params, tokens, lr)

    mesh = build_mesh(mesh_cfg)
    shard_params, build = make_train_step(
        model, mesh, learning_rate=lr, interpret=True
    )
    step = build(params)
    sharded = shard_params(params)
    new_p, loss = step(sharded, tokens)
    np.testing.assert_allclose(float(loss), float(exp_loss), rtol=2e-4)
    flat_got = jax.tree.leaves(new_p)
    flat_exp = jax.tree.leaves(exp_p)
    for g, e in zip(flat_got, flat_exp):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(e), atol=2e-4, rtol=2e-3
        )


@requires_8
def test_two_steps_loss_decreases():
    model = FlashTransformer(CFG)
    params = model.init(jax.random.PRNGKey(0))
    tokens = jax.random.randint(
        jax.random.PRNGKey(2), (8, 32), 0, CFG.vocab_size, jnp.int32
    )
    mesh = build_mesh(MeshConfig(data=2, model=2, seq=2))
    shard_params, build = make_train_step(
        model, mesh, learning_rate=5e-2, interpret=True
    )
    step = build(params)
    p = shard_params(params)
    p, l1 = step(p, tokens)
    p, l2 = step(p, tokens)
    assert float(l2) < float(l1)
