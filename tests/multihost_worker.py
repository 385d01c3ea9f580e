"""One rank of the 2-process DCN fleet driven by test_multihost.py.

Exercises the real multi-host path (parallel/multihost.py) that a single
pytest process cannot: ``jax.distributed`` init against a localhost
coordinator, a data-over-DCN mesh (data axis across processes, model axis
within), one sharded train step, and one TP-serving attention step. The
reference has no distributed tier at all (SURVEY.md §2 comm-backend row);
this pins ours actually runs multi-process, not just on virtual devices.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
Prints "MULTIHOST_OK <loss> <attn_err>" on success.
"""

import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # older jaxlib: single-host CPU collectives default

    from tpu_flash.parallel.multihost import initialize_multihost

    ok = initialize_multihost(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert ok, "initialize_multihost returned False with explicit args"
    assert initialize_multihost() is True, "second call must be idempotent"
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpu_flash.core.config import MeshConfig
    from tpu_flash.core.reference import reference_attention
    from tpu_flash.models import FlashTransformer, ModelConfig
    from tpu_flash.parallel.mesh import build_mesh
    from tpu_flash.parallel.sharded import sharded_flash_attention
    from tpu_flash.parallel.train import make_train_step

    # data axis outermost -> the only traffic crossing process (DCN)
    # boundaries is the data-parallel grad all-reduce (multihost.py module
    # docstring contract); seq (ring) and model (TP) stay intra-process.
    mesh = build_mesh(MeshConfig(data=nproc, seq=2, model=2))

    # --- one sharded train step ------------------------------------------
    cfg = ModelConfig(
        name="tiny-multihost",
        vocab_size=64,
        hidden_size=32,
        num_layers=1,
        num_q_heads=4,
        num_kv_heads=2,
        head_dim=8,
        intermediate_size=64,
        dtype="float32",
    )
    model = FlashTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0))
    shard_params, build = make_train_step(model, mesh, learning_rate=1e-2)
    train_step = build(params)
    params = shard_params(params)
    tokens_np = np.asarray(
        jax.random.randint(
            jax.random.PRNGKey(1), (2 * nproc, 32), 0, cfg.vocab_size,
            jnp.int32,
        )
    )
    tokens = jax.device_put(
        tokens_np, NamedSharding(mesh, P("data", None))
    )
    params, loss = train_step(params, tokens)
    loss = float(loss)
    assert np.isfinite(loss), loss

    # --- one TP-serving attention step ------------------------------------
    attn = sharded_flash_attention(mesh, causal=True, interpret=True)
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(2), 3)
    shape = (nproc, 4, 64, 64)  # batch over data, heads over model
    q = np.asarray(jax.random.normal(kq, shape, jnp.float32))
    k = np.asarray(jax.random.normal(kk, shape, jnp.float32))
    v = np.asarray(jax.random.normal(kv, shape, jnp.float32))
    spec = NamedSharding(mesh, P("data", "model", None, None))
    out = attn(
        jax.device_put(q, spec), jax.device_put(k, spec),
        jax.device_put(v, spec),
    )
    # Replicate across processes (a DCN all-gather) to compare vs oracle.
    out = jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))(out)
    ref = reference_attention(q, k, v, causal=True, sm_scale=64 ** -0.5)
    err = float(np.max(np.abs(np.asarray(out) - np.asarray(ref))))
    assert err < 1e-2, err

    print(f"MULTIHOST_OK {loss:.6f} {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
