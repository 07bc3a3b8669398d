"""Whisper fine-tuning step (sharded).

The reference ships no training (inference-only desktop app); this module
exists so the framework can fine-tune its engines (e.g. domain adaptation
for dictation jargon) and to exercise the full dp+tp sharded compute path:
encoder + teacher-forced decoder + cross-entropy + AdamW, jitted over a
('data', 'model') mesh with parameters sharded per parallel.mesh rules.

MoE-variant configs (cfg.moe_experts > 0) train through this step too:
routing gradients flow via the gate probability (Switch semantics), and
the objective adds the Switch load-balancing aux loss
(parallel.expert_parallel.moe_ffn aux_loss, summed over layers, each
weighted by moe_aux_weight — Switch Transformer's alpha=0.01 default)
so routing does not collapse onto few experts during long fine-tunes.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from spittle_tpu.models.whisper.config import WhisperConfig
from spittle_tpu.models.whisper.model import (
    decoder_forward,
    encode,
    encode_with_aux,
)


def cross_entropy_loss(
    params: Dict[str, Any],
    mel: jnp.ndarray,  # [B, n_mels, frames]
    tokens: jnp.ndarray,  # [B, T] input tokens
    targets: jnp.ndarray,  # [B, T] next-token labels
    mask: jnp.ndarray,  # [B, T] 1.0 where the label counts
    cfg: WhisperConfig,
    seq_sharding=None,  # NamedSharding for encoder activations (sp)
    remat: bool = False,
    moe_aux_weight: float = 0.01,  # Switch Transformer alpha
) -> jnp.ndarray:
    moe = bool(cfg.moe_experts)
    enc_fn = encode_with_aux if moe else encode
    dec_fn = decoder_forward
    if remat:
        # Rematerialization: save only the encoder/decoder boundary
        # activations; the backward pass recomputes the forwards. Trades
        # ~1 extra forward of FLOPs for activation memory that no longer
        # scales with depth — the standard TPU recipe for fitting larger
        # batches/models (HBM is the constraint, MXU FLOPs are cheap).
        enc_fn = jax.checkpoint(enc_fn, static_argnums=(2,))
        dec_fn = jax.checkpoint(decoder_forward, static_argnums=(3,))
    if moe:
        xa, aux = enc_fn(params, mel, cfg)
    else:
        xa, aux = enc_fn(params, mel, cfg), jnp.asarray(0.0, jnp.float32)
    if seq_sharding is not None:
        # Sequence parallelism: encoder output sharded along time; GSPMD
        # inserts the gathers the decoder's cross-attention needs.
        xa = jax.lax.with_sharding_constraint(xa, seq_sharding)
    logits = dec_fn(params, tokens, xa, cfg)  # [B, T, V]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    ce = jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return ce + moe_aux_weight * aux


def make_train_step(
    cfg: WhisperConfig,
    learning_rate: float = 1e-5,
    sequence_parallel_mesh=None,
    remat: bool = False,
    moe_aux_weight: float = 0.01,
):
    """Returns (init_opt_state, train_step).

    train_step(params, opt_state, batch) -> (params, opt_state, loss) where
    batch = dict(mel, tokens, targets, mask). Jit this under a Mesh with
    sharded params/batch; XLA inserts the dp gradient psum and tp
    collectives from the sharding annotations. Passing a mesh as
    sequence_parallel_mesh additionally shards encoder activations along
    the time axis over 'model' (sp).
    """
    tx = optax.adamw(learning_rate, weight_decay=0.01)
    seq_sharding = None
    if sequence_parallel_mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        seq_sharding = NamedSharding(
            sequence_parallel_mesh, P("data", "model", None)
        )

    def init_opt_state(params):
        return tx.init(params)

    @functools.partial(jax.jit, static_argnames=(), donate_argnums=(0, 1))
    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(cross_entropy_loss)(
            params, batch["mel"], batch["tokens"], batch["targets"],
            batch["mask"], cfg, seq_sharding, remat, moe_aux_weight,
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return init_opt_state, train_step
