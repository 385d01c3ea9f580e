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


def _setup():
    model = FlashTransformer(CFG)
    params = model.init(jax.random.PRNGKey(0))
    tokens = jax.random.randint(
        jax.random.PRNGKey(3), (8, 32), 0, CFG.vocab_size, jnp.int32
    )
    mesh = build_mesh(MeshConfig(data=2, model=2, seq=2))
    return model, params, mesh, tokens


class TestOptaxTraining:
    """Optax optimizer above the shard_map: sharded grads feed adamw whose
    state rides the param shardings; training resumes exactly from a
    TrainCheckpointManager checkpoint."""

    @requires_8
    def test_adamw_loss_decreases(self):
        import optax

        model, params, mesh, tokens = _setup()
        shard_params, build = make_train_step(
            model, mesh, optimizer=optax.adamw(3e-3), interpret=True
        )
        p = shard_params(params)
        opt = optax.adamw(3e-3)
        opt_state = jax.jit(opt.init)(p)
        step = build(p)
        losses = []
        for _ in range(5):
            p, opt_state, loss = step(p, opt_state, tokens)
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses

    @requires_8
    def test_checkpoint_resume_bitexact(self, tmp_path):
        import optax

        from tpu_flash.checkpoint import TrainCheckpointManager

        model, params, mesh, tokens = _setup()
        opt = optax.sgd(1e-2, momentum=0.9)
        shard_params, build = make_train_step(
            model, mesh, optimizer=opt, interpret=True
        )
        p = shard_params(params)
        opt_state = jax.jit(opt.init)(p)
        step = build(p)

        # 2 steps, checkpoint, 2 more → golden.
        for _ in range(2):
            p, opt_state, _ = step(p, opt_state, tokens)
        with TrainCheckpointManager(tmp_path / "t") as mgr:
            mgr.save(2, p, opt_state)
        golden = p
        for _ in range(2):
            golden, opt_state, _ = step(golden, opt_state, tokens)

        # Restore in "new process" (fresh trees) and continue 2 steps.
        # (On CPU, device_put aliases + the step donates — the original
        # `params` buffers are gone, so rebuild from the seed.)
        params2 = model.init(jax.random.PRNGKey(0))
        p2 = shard_params(params2)
        os2 = jax.jit(opt.init)(p2)
        with TrainCheckpointManager(tmp_path / "t") as mgr:
            step_idx, rp, ros = mgr.restore_latest(
                like_params=p2, like_opt_state=os2
            )
        assert step_idx == 2
        rp = shard_params(rp)
        ros = jax.tree.map(jnp.asarray, ros)
        for _ in range(2):
            rp, ros, _ = step(rp, ros, tokens)
        for a, b in zip(jax.tree.leaves(golden), jax.tree.leaves(rp)):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=1e-6,
            )


@requires_8
@pytest.mark.parametrize(
    "variant",
    [
        dict(sliding_window=12),
        dict(attn_softcap=8.0),
        dict(attn_sinks=True),
        dict(sliding_window=10, sliding_window_pattern=2,
             attn_softcap=6.0, attn_sinks=True),
    ],
    ids=["window", "softcap", "sinks", "gemma-like"],
)
def test_attention_variants_match_single_device(variant):
    """The sharded (ring) train step must optimize the SAME function as
    model.loss_fn when the model uses sliding windows (decomposed over
    ring blocks by chip distance), softcap, or attention sinks (folded
    once at the final normalization)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, **variant)
    model = FlashTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0))
    if cfg.attn_sinks:
        for li, layer in enumerate(params["layers"]):
            layer["sinks"] = (
                jax.random.normal(jax.random.PRNGKey(li),
                                  (cfg.num_q_heads,)) * 1.5
            )
    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (8, 32), 0, cfg.vocab_size, jnp.int32
    )
    lr = 1e-2
    exp_p, exp_loss = _single_device_step(model, params, tokens, lr)

    mesh = build_mesh(MeshConfig(data=2, model=2, seq=2))
    shard_params, build = make_train_step(
        model, mesh, learning_rate=lr, interpret=True
    )
    step = build(params)
    new_p, loss = step(shard_params(params), tokens)
    np.testing.assert_allclose(float(loss), float(exp_loss), rtol=2e-4)
    for g, e in zip(jax.tree.leaves(new_p), jax.tree.leaves(exp_p)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(e), atol=2e-4, rtol=2e-3
        )
