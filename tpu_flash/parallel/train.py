"""Multi-chip training step: DP x TP x SP over one shard_map.

Manual-SPMD training for the flagship model (models/transformer.py):

  data  — batch sharded; gradients psum over "data".
  model — tensor parallelism: QKV/out-proj and MLP weights column/row
          sharded; per-layer psum("model") after out-proj and down-proj.
  seq   — sequence parallelism: tokens sharded along the sequence; exact
          attention over the full sequence via ring attention
          (parallel/ring.py, ring_attention_local); next-token targets at
          chunk boundaries arrive by ppermute.

The step is a single shard_map program, so the Pallas kernels run per-chip
on local blocks — the supported way to compose custom kernels with SPMD.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_flash.models.transformer import FlashTransformer, _rms_norm, apply_rope
from tpu_flash.parallel.ring import ring_attention_local


# Manual-TP boundary ops. With these, activations stay logically replicated
# across "model" and every replicated parameter's local gradient is already
# the full gradient (identical on each model shard) — so gradient reduction
# never psums over "model".


@jax.custom_vjp
def _enter_tp(x):
    """Identity forward; backward psums the cotangent over "model" (the
    replicated activation fans into per-shard branches)."""
    return x


def _enter_tp_fwd(x):
    return x, None


def _enter_tp_bwd(_, g):
    return (jax.lax.psum(g, "model"),)


_enter_tp.defvjp(_enter_tp_fwd, _enter_tp_bwd)


@jax.custom_vjp
def _exit_tp(x):
    """psum over "model" forward (combine partial products); identity
    backward (the cotangent is already replicated)."""
    return jax.lax.psum(x, "model")


def _exit_tp_fwd(x):
    return jax.lax.psum(x, "model"), None


def _exit_tp_bwd(_, g):
    return (g,)


_exit_tp.defvjp(_exit_tp_fwd, _exit_tp_bwd)


def param_specs(params) -> Any:
    """PartitionSpec pytree for the model params: attention heads and MLP
    hidden column-sharded on "model", their output projections row-sharded,
    everything else replicated."""

    def layer_spec(layer):
        spec = {
            "attn_norm": P(),
            "wq": P(None, "model"),
            "wk": P(None, "model"),
            "wv": P(None, "model"),
            "wo": P("model", None),
            "mlp_norm": P(),
            "w_gate": P(None, "model"),
            "w_up": P(None, "model"),
            "w_down": P("model", None),
        }
        if "sinks" in layer:
            # Per-q-head sink logits shard with the heads.
            spec["sinks"] = P("model")
        return spec

    return {
        "embed": P(),
        "layers": [layer_spec(l) for l in params["layers"]],
        "final_norm": P(),
        "lm_head": P(),
    }


def _replicated_leaves(specs) -> Any:
    return jax.tree.map(lambda s: all(a is None for a in s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def make_train_step(
    model: FlashTransformer,
    mesh: Mesh,
    *,
    learning_rate: float = 1e-3,
    optimizer=None,  # optax.GradientTransformation; None → plain SGD
    interpret: bool = True,
):
    """Build (shard_params, train_step) for the mesh.

    Without ``optimizer``: train_step(params, tokens) -> (params, loss)
    using plain SGD at ``learning_rate``. With an optax ``optimizer``:
    train_step(params, opt_state, tokens) -> (params, opt_state, loss);
    gradients come out of the shard_map sharded exactly like the params,
    and the optax update runs under the same jit — elementwise, so XLA
    keeps every state leaf on its param's sharding with zero extra
    collectives. Initialize state with ``optimizer.init(shard_params(p))``.

    Params sharded per param_specs; tokens [batch, seq] sharded
    P("data", "seq").
    """
    cfg = model.config
    n_model = mesh.shape["model"]
    n_seq = mesh.shape["seq"]
    n_data = mesh.shape["data"]
    if cfg.num_q_heads % n_model or cfg.num_kv_heads % n_model:
        raise ValueError(
            f"model axis ({n_model}) must divide q heads "
            f"({cfg.num_q_heads}) and kv heads ({cfg.num_kv_heads})"
        )

    def local_loss(p, tokens_local):
        """Per-chip loss over the local (data, seq) block."""
        b, s_local = tokens_local.shape
        seq_idx = jax.lax.axis_index("seq")
        pos0 = seq_idx * s_local
        positions = pos0 + jnp.arange(s_local)

        x = p["embed"][tokens_local].astype(model.dtype)
        for li, layer in enumerate(p["layers"]):
            xn = _enter_tp(_rms_norm(x, layer["attn_norm"], cfg.rms_eps))
            hq_l = cfg.num_q_heads // n_model
            hkv_l = cfg.num_kv_heads // n_model
            q = (xn @ layer["wq"]).reshape(b, s_local, hq_l, cfg.head_dim)
            k = (xn @ layer["wk"]).reshape(b, s_local, hkv_l, cfg.head_dim)
            v = (xn @ layer["wv"]).reshape(b, s_local, hkv_l, cfg.head_dim)
            if cfg.attn_alibi:
                # ALiBi replaces rope; position enters as the in-kernel
                # distance bias (n_seq == 1 enforced above).
                q = q.transpose(0, 2, 1, 3)
                k = k.transpose(0, 2, 1, 3)
            else:
                q = apply_rope(
                    q.transpose(0, 2, 1, 3), positions, model.freqs
                )
                k = apply_rope(
                    k.transpose(0, 2, 1, 3), positions, model.freqs
                )
                if getattr(model, "_q_mult", 1.0) != 1.0:
                    q = q * model._q_mult  # YaRN temperature (transformer)
            v = v.transpose(0, 2, 1, 3)
            attn = ring_attention_local(
                q, k, v, seq_axis="seq", n_ring=n_seq, causal=True,
                interpret=interpret,
                # Attention variants decompose over the ring (window by
                # chip distance, sinks folded once at finalize), so the
                # sharded step optimizes the SAME function as
                # model.loss_fn and every serving path.
                window=cfg.layer_window(li),
                softcap=cfg.attn_softcap,
                sinks=layer.get("sinks"),
                alibi=model.alibi_for(
                    hq_l, "model" if n_model > 1 else None
                ),
            )
            attn = attn.transpose(0, 2, 1, 3).reshape(
                b, s_local, hq_l * cfg.head_dim
            )
            # Row-sharded out-proj: partial products summed over "model".
            x = x + _exit_tp(attn @ layer["wo"])
            xn = _enter_tp(_rms_norm(x, layer["mlp_norm"], cfg.rms_eps))
            gate = jax.nn.silu((xn @ layer["w_gate"]).astype(jnp.float32))
            up = (xn @ layer["w_up"]).astype(jnp.float32)
            x = x + _exit_tp(((gate * up).astype(x.dtype)) @ layer["w_down"])
        x = _rms_norm(x, p["final_norm"], cfg.rms_eps)
        logits = (x @ p["lm_head"]).astype(jnp.float32)

        # Next-token targets: shift left; the boundary token comes from the
        # next seq shard via ppermute (ring of seq chunks).
        first_next = jax.lax.ppermute(
            tokens_local[:, :1], "seq",
            [(i, (i - 1) % n_seq) for i in range(n_seq)],
        )
        targets = jnp.concatenate([tokens_local[:, 1:], first_next], axis=1)
        # The global last position has no target.
        global_pos = pos0 + jnp.arange(s_local)
        valid = (global_pos < n_seq * s_local - 1).astype(jnp.float32)

        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        loss_sum = jnp.sum(nll * valid[None, :])
        count = jnp.sum(valid) * b
        return loss_sum, count

    def _specs_for(params):
        return param_specs(params)

    def step_fn(p, tokens_local):
        (loss_sum, count), grads = jax.value_and_grad(
            lambda pp: local_loss(pp, tokens_local), has_aux=True
        )(p)
        # Total loss over data and seq shards.
        loss_sum = jax.lax.psum(loss_sum, ("data", "seq"))
        count = jax.lax.psum(count, ("data", "seq"))
        loss = loss_sum / count

        # The _enter_tp/_exit_tp boundary ops make every replicated param's
        # local grad the full grad (identical across "model"), and sharded
        # params' grads are local by construction — so reduction is a psum
        # over the batch-varying axes only. Local grads are of the loss
        # *sum*; normalize by the global token count to get mean-loss grads.
        grads = jax.tree.map(
            lambda g: jax.lax.psum(g, ("data", "seq")) / count, grads
        )
        if optimizer is not None:
            # Hand the (param-sharded) grads out; optax runs above the
            # shard_map where its state pytree rides the same shardings.
            return grads, loss
        new_p = jax.tree.map(
            lambda w, g: (w - learning_rate * g.astype(jnp.float32)).astype(
                w.dtype
            ),
            p,
            grads,
        )
        return new_p, loss

    def build(params):
        specs = _specs_for(params)
        token_spec = P("data", "seq")
        step = shard_map(
            step_fn,
            mesh=mesh,
            in_specs=(specs, token_spec),
            out_specs=(specs, P()),
            check_vma=False,
        )
        if optimizer is None:
            return jax.jit(step, donate_argnums=(0,))

        def opt_step(p, opt_state, tokens):
            grads, loss = step(p, tokens)
            updates, opt_state = optimizer.update(grads, opt_state, p)
            new_p = jax.tree.map(
                lambda w, u: (w.astype(jnp.float32) + u).astype(w.dtype),
                p,
                updates,
            )
            return new_p, opt_state, loss

        return jax.jit(opt_step, donate_argnums=(0, 1))

    def shard_params(params):
        specs = _specs_for(params)
        return jax.tree.map(
            lambda w, s: jax.device_put(w, NamedSharding(mesh, s)),
            params,
            specs,
            is_leaf=lambda x: not isinstance(x, (dict, list)),
        )

    return shard_params, build
